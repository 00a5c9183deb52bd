"""Third-family-texture fine-tune experiment: train → gate → verdict
(VERDICT r3 next #7).

The out-of-family grids show generator-implementation overfit (the v2
generator exposed texture classes v1 never produced).  v2 stays strictly
eval-only, so this experiment attacks the overfit from the training side:
fine-tune the committed checkpoint with train/synth3.py's four
independent-DSP confuser textures (granular / drone / impact_chain /
crackle) mixed into the noise pool, then gate on the FULL round-4
36-condition grid.

Stages are fingerprinted (scripts/ftlib.py): a rerun with matching
parameters skips finished stages; different parameters in the same
workdir refuse instead of silently reusing a stale candidate.  Stages:

  1. fine-tune the committed checkpoint with
     `--noise-extra granular drone impact_chain crackle`
  2. full quality grid on the candidate (scripts/quality_grid.py)
  3. real-audio probe on the candidate (guards the music class)
  4. verdict JSON comparing candidate vs committed docs/QUALITY_r04.json

ADOPTION RULE (decided before measuring, verbatim from the round-3
verdict's done-criterion): adopt only if (a) NO grid condition's parity
frame F1 regresses more than 0.005, (b) the out-of-family worst case
improves, and (c) the real-audio music false_fraction does not grow more
than 0.05 absolute.  Otherwise the candidate is recorded as a measured
negative result and the committed checkpoint stays.

Usage:  python scripts/ft_synth3.py --workdir /tmp/ft_synth3
        [--steps 8000] [--lr 1e-4] [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ftlib import run, stage  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMMITTED = os.path.join(REPO_ROOT, "root/models/spec_unet_2d/model_checkpoint")
EXTRAS = ["granular", "drone", "impact_chain", "crackle"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ft_synth3")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--extra-frac", type=float, default=0.2,
                    help="fraction of the noise pool drawn from the "
                         "third-family kinds (train --noise-extra-frac)")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--quick", action="store_true",
                    help="tiny steps + --quick grids (plumbing smoke)")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    cand = os.path.join(wd, "candidate_ckpt")
    grid_json = os.path.join(wd, "grid_candidate.json")
    real_json = os.path.join(wd, "realaudio_candidate.json")
    verdict_json = os.path.join(wd, "VERDICT_ft_synth3.json")
    py = sys.executable

    steps = 4 if args.quick else args.steps
    bs = 2 if args.quick else args.batch_size
    recipe = {"steps": steps, "lr": args.lr, "extras": EXTRAS,
              "extra_frac": args.extra_frac, "batch_size": bs,
              "quick": bool(args.quick), "seed": 88042}

    def train():
        cmd = [py, "-m", "softspoken_tpu.cli", "train", "--synthetic",
               "--resume", COMMITTED, "--out", cand,
               "--steps", str(steps), "--batch-size", str(bs),
               "--lr", str(args.lr), "--noise-extra", *EXTRAS,
               "--noise-extra-frac", str(args.extra_frac),
               "--seed", "88042"]
        if args.quick:
            cmd += ["--n-inner", "2", "--pool-size", "16"]
        run(cmd, os.path.join(wd, "train.log"))

    stage("stage 1 (train)", os.path.join(cand, "manifest.ocdbt"),
          recipe, train)

    def grid():
        # explicit --out: quality_grid's --quick /tmp redirect only fires
        # for its default docs path, so the output lands here directly
        cmd = [py, "scripts/quality_grid.py", "--ckpt", cand,
               "--out", grid_json,
               "--cache-dir", os.path.join(wd, "grid_cache"),
               "--workdir", os.path.join(wd, "grid_work")]
        if args.quick:
            cmd.append("--quick")
        run(cmd, os.path.join(wd, "grid.log"))

    stage("stage 2 (grid)", grid_json, recipe, grid)

    def real():
        cmd = [py, "scripts/real_audio_check.py", "--ckpt", cand,
               "--out", real_json]
        if args.quick:
            cmd.append("--quick")
        run(cmd, os.path.join(wd, "real.log"))

    stage("stage 3 (real-audio)", real_json, recipe, real)

    # ---- stage 4: verdict ----------------------------------------------------
    def conditions_of(grid: dict) -> dict:
        return grid.get("conditions") or {}

    with open(grid_json) as f:
        grid_c = json.load(f)
    with open(real_json) as f:
        real_c = json.load(f)
    with open(os.path.join(REPO_ROOT, "docs/QUALITY_r04.json")) as f:
        grid_0 = json.load(f)
    with open(os.path.join(REPO_ROOT, "docs/QUALITY_r03_realaudio.json")) as f:
        real_0 = json.load(f)

    conds_c, conds_0 = conditions_of(grid_c), conditions_of(grid_0)
    regressions, per_condition = [], {}
    worst_c = 1.0
    for tag, res_c in conds_c.items():
        f1_c = res_c["parity"]["frame_f1"]
        if tag.startswith("v2"):
            worst_c = min(worst_c, f1_c)
        res_0 = conds_0.get(tag)
        if res_0 is None:
            continue
        f1_0 = res_0["parity"]["frame_f1"]
        per_condition[tag] = {"committed": f1_0, "candidate": f1_c,
                              "delta": round(f1_c - f1_0, 4)}
        if f1_c < f1_0 - 0.005:
            regressions.append(tag)

    music_0 = real_0["false_positives_on_real_audio"]["music_house"][
        "false_fraction"]
    music_c = real_c["false_positives_on_real_audio"]["music_house"][
        "false_fraction"]

    worst_0 = min(r["parity"]["frame_f1"]
                  for t, r in conds_0.items() if t.startswith("v2"))
    gate_grid = not regressions
    gate_worst = worst_c > worst_0
    gate_music = music_c <= music_0 + 0.05
    verdict = {
        "adopt": bool(gate_grid and gate_worst and gate_music),
        "gate_no_regression_ok": gate_grid,
        "gate_worst_improves_ok": gate_worst,
        "gate_music_ok": gate_music,
        "worst_out_of_family": {"committed": worst_0, "candidate": worst_c},
        "music_false_fraction": {"committed": music_0, "candidate": music_c},
        "regressed_conditions": regressions,
        "per_condition": per_condition,
        "recipe": recipe,
        "candidate": cand,
        "extras": EXTRAS,
        "rule": "adopt iff no condition drops >0.005 frame F1, the v2 "
                "worst case improves, and music false_fraction grows "
                "<= +0.05",
    }
    with open(verdict_json, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps({k: verdict[k] for k in
                      ("adopt", "gate_no_regression_ok",
                       "gate_worst_improves_ok", "gate_music_ok",
                       "worst_out_of_family", "music_false_fraction",
                       "regressed_conditions")}, indent=2), flush=True)
    print(f"wrote {verdict_json}", flush=True)


if __name__ == "__main__":
    main()
