"""Round-5 pre-registered from-scratch retrain (docs/ROUND5_PLAN.md).

Recipe (registered BEFORE the run; see the plan's evidence table):
  - from scratch, >=48k steps, batch 128, lr 1e-3, seed 31337 (the probe's
    seed discipline, scripts/probe_scratch_channels.py)
  - augs: add_reverb + reduce_volume (committed lineage) + gain_ramp
    (the within-clip fading analog the directional probe validated)
  - confuser textures: granular drone impact_chain crackle at frac 0.2,
    placement PROTECTED (the only variant that closed the real-music
    class, docs/FT_HISNR_r04.json)
  - SNR range: committed -5..20 dB (the -12 floor was rejected,
    docs/FT_SNRFLOOR_r04.json); no boundary weighting (rejected,
    docs/FT_BOUNDARY_r04.json)

This supervisor exists because the remote-TPU session dies SILENTLY
(memory: axon tcp_recvmsg hang): the trainer aborts with exit code 86
after --stall-abort seconds without progress, and this script RESUMES
from the latest 250-step checkpoint instead of restarting from zero —
ftlib.run()'s plain retry would re-run from scratch, wasting up to the
whole budget.  Restart-safe: rerunning this script resumes too.

The gate (run after training, scripts/quality_grid.py + compare_grids +
real_audio_check): adopt iff no condition regresses >0.005 parity frame
F1 vs docs/QUALITY_r04.json, v2_fading improves from 0.719, and music
false_fraction stays <0.10.

Usage: python scripts/train_r05.py --workdir /root/work_r05 [--steps 48000]
       [--quick]   # tiny CPU smoke of the full flag set
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RECIPE = {
    "steps": 48000,
    "batch_size": 128,
    "lr": "1e-3",
    "seed": 31337,
    "augment": ["add_reverb", "reduce_volume", "gain_ramp"],
    "noise_extra": ["granular", "drone", "impact_chain", "crackle"],
    "noise_extra_frac": 0.2,
    "noise_extra_policy": "protected",
    "snr": (-5.0, 20.0),
    "from_scratch": True,
    "plan": "docs/ROUND5_PLAN.md",
}


def ckpt_epoch(ckpt_dir: str) -> int:
    """Completed-steps counter of the latest resumable checkpoint (0 if
    none).  Runs in a subprocess: orbax restore in THIS process would
    initialize jax/backends before the trainer owns the device."""
    if not os.path.isdir(ckpt_dir):
        return 0
    code = (
        "import sys, os; sys.path.insert(0, %r)\n"
        "os.environ.setdefault('JAX_PLATFORMS', 'cpu')\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from softspoken_tpu import ckpt\n"
        "v, e = ckpt.load_any(%r)\n"
        "print('EPOCH', -1 if v is None else int(e))\n" % (REPO_ROOT, ckpt_dir)
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                             text=True, timeout=300, cwd=REPO_ROOT)
        for ln in out.stdout.splitlines():
            if ln.startswith("EPOCH "):
                return max(0, int(ln.split()[1]))
    except Exception as e:  # noqa: BLE001 — a probe failure just means "restart"
        print(f"ckpt probe failed ({e}); treating as no checkpoint", flush=True)
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/work_r05")
    ap.add_argument("--steps", type=int, default=RECIPE["steps"])
    ap.add_argument("--stall-abort", type=float, default=900.0)
    ap.add_argument("--max-attempts", type=int, default=12)
    ap.add_argument("--quick", action="store_true",
                    help="tiny smoke of the full flag set (CPU ok)")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    ckpt_dir = os.path.join(wd, "ckpt_r05")
    log_path = os.path.join(wd, "train_r05.log")
    total = 80 if args.quick else args.steps

    recipe = dict(RECIPE, steps=total, quick=bool(args.quick))
    rec_path = os.path.join(wd, "recipe.json")
    if os.path.exists(rec_path):
        with open(rec_path) as f:
            prev = json.load(f)
        if prev != json.loads(json.dumps(recipe)):
            raise SystemExit(
                f"{wd} holds a run with a different recipe ({prev}); "
                "use a fresh --workdir")
    else:
        with open(rec_path, "w") as f:
            json.dump(recipe, f, indent=1)

    attempt = 0
    t0 = time.time()
    while True:
        done = ckpt_epoch(ckpt_dir)
        if done >= total:
            break
        cmd = [sys.executable, "-m", "softspoken_tpu.cli", "train",
               "--synthetic",
               "--out", ckpt_dir,
               "--steps", str(total - done),
               "--batch-size", "2" if args.quick else str(RECIPE["batch_size"]),
               "--lr", RECIPE["lr"],
               "--seed", str(RECIPE["seed"]),
               "--augment", *RECIPE["augment"],
               "--noise-extra", *RECIPE["noise_extra"],
               "--noise-extra-frac", str(RECIPE["noise_extra_frac"]),
               "--noise-extra-policy", RECIPE["noise_extra_policy"],
               "--snr-min", str(RECIPE["snr"][0]),
               "--snr-max", str(RECIPE["snr"][1]),
               "--stall-abort", str(args.stall_abort)]
        if args.quick:
            cmd += ["--n-inner", "2", "--pool-size", "16"]
        if done > 0:
            cmd += ["--resume", ckpt_dir]
            print(f"resuming from step {done} ({total - done} to go)",
                  flush=True)
        print(f"+ {' '.join(cmd)}  (log: {log_path})", flush=True)
        with open(log_path, "a") as lf:
            lf.write(f"\n=== attempt {attempt} from step {done} "
                     f"at {time.strftime('%F %T')} ===\n")
            lf.flush()
            p = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                               cwd=REPO_ROOT)
        if p.returncode == 0:
            continue  # loop re-checks the epoch; exits when total reached
        attempt += 1
        if attempt >= args.max_attempts:
            raise SystemExit(
                f"giving up after {attempt} failed attempts "
                f"(last rc={p.returncode}) — see {log_path}")
        # 86 = stall watchdog (retry on a fresh connection); anything else
        # gets a bounded retry too, but only if the checkpoint is moving —
        # a deterministic crash would otherwise loop max_attempts times
        if p.returncode != 86 and ckpt_epoch(ckpt_dir) <= done:
            raise SystemExit(
                f"trainer exited rc={p.returncode} without progress "
                f"(step {done}) — not retrying a deterministic failure; "
                f"see {log_path}")
        print(f"trainer exited rc={p.returncode}; retry {attempt}/"
              f"{args.max_attempts} after checkpoint probe", flush=True)

    print(json.dumps({
        "ckpt": ckpt_dir, "steps": ckpt_epoch(ckpt_dir),
        "wall_s": round(time.time() - t0, 1), "recipe": recipe,
    }), flush=True)
    print("training complete — next: scripts/quality_grid.py --ckpt "
          f"{ckpt_dir} --out docs/QUALITY_r05_candidate.json", flush=True)


if __name__ == "__main__":
    main()
