"""Directional probe for the round-5 plan: from-scratch training WITH
channel augmentations vs without, at equal (small) step budgets.

All four round-4 fine-tunes from the committed checkpoint failed their
gates with one signature: marginal-SNR/reverberant conditions are
exquisitely sensitive to late distribution changes
(docs/FT_SNRFLOOR_r04.json ``round5_reading``).  The proposed round-5
remedy is hard channels INSIDE from-scratch training.  This probe tests
that direction cheaply before round 5 commits a full training budget:

  arm A: train from scratch, augs = add_reverb + reduce_volume (the
         committed checkpoint's lineage augs)
  arm B: same + gain_ramp (train/augment.py's fading analog)

Both arms run the same steps/seed; both are scored on the six conditions
that define the question (clean / fading / reverb08 x both generators,
small eval sets).  This is NOT an adoption experiment — 8k-step models
are far below the 48k committed checkpoint — it measures whether the
in-distribution-channel direction moves the fading/reverb conditions at
matched budget.  Output: docs/PROBE_SCRATCH_r04.json.

Usage: python scripts/probe_scratch_channels.py --workdir /tmp/probe_scratch
       [--steps 8000] [--files 4] [--seconds 60]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ftlib import run, stage  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONDS = [
    ("clean", dict()),
    ("fading", dict(degradations=["fading"])),
    ("reverb08", dict(degradations=["reverb08"])),
]


def build_eval_sets(workdir, n_files, seconds):
    """Synthesize the six eval sets ONCE (both arms score identical data;
    regenerating per arm duplicated the synthesis+convolution cost)."""
    from softspoken_tpu.train import evaluate as E

    sets = {}
    for gen in ("v1", "v2"):
        for ci, (cname, kw) in enumerate(CONDS):
            tag = f"{gen}_{cname}"
            d = os.path.join(workdir, f"eval_{tag}")
            labels = os.path.join(d, "labels.csv")
            # seeded + deterministic, so a restarted probe can reuse sets a
            # previous (possibly stalled) run already built — but only when
            # EVERY generation parameter matches this invocation: a count-
            # only check silently reused wrong-duration sets when --seconds
            # changed between runs (review r4), skewing the A/B comparison
            fp = {"n_files": n_files, "seconds": seconds, "seed": 7600 + ci,
                  "generator": gen, "kwargs": {k: list(v) if isinstance(v, list)
                                               else v for k, v in kw.items()}}
            fp_path = labels + ".fp.json"
            reusable = False
            if os.path.exists(labels) and os.path.exists(fp_path):
                with open(fp_path) as f:
                    reusable = json.load(f) == json.loads(json.dumps(fp))
            if not reusable:
                labels = E.make_eval_set(
                    d, n_files=n_files, seconds=seconds,
                    seed=7600 + ci, generator=gen, **kw)
                with open(fp_path, "w") as f:
                    json.dump(fp, f)
            sets[tag] = labels
    return sets


def score(ckpt_dir, eval_sets):
    import quality_grid as QG
    from softspoken_tpu import Config
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.train import evaluate as E

    cfg = Config()
    det = Detector(cfg, checkpoint_path=ckpt_dir)
    if getattr(det, "epoch", -1) < 0:
        raise SystemExit(f"checkpoint {ckpt_dir} did not load")
    out = {}
    for tag, labels in eval_sets.items():
        per_file = QG.detect_set(det, E.load_labels(labels))
        m = QG.metrics_from(per_file, cfg.engine.pad_seconds)
        out[tag] = {"frame_f1": m["parity"]["frame_f1"],
                    "event_f1": m["parity"]["event_f1"]}
        print(f"  {tag}: frame {out[tag]['frame_f1']}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/probe_scratch")
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    py = sys.executable
    steps = 8 if args.quick else args.steps
    n_files = 1 if args.quick else args.files
    seconds = 30.0 if args.quick else args.seconds

    arms = {
        "A_lineage": ["add_reverb", "reduce_volume"],
        "B_channels": ["add_reverb", "reduce_volume", "gain_ramp"],
    }
    eval_sets = build_eval_sets(wd, n_files, seconds)
    results = {}
    for arm, augs in arms.items():
        ckpt_dir = os.path.join(wd, f"ckpt_{arm}")
        recipe = {"steps": steps, "augs": augs, "seed": 31337,
                  "from_scratch": True, "quick": bool(args.quick)}

        def train(ckpt_dir=ckpt_dir, augs=augs):
            cmd = [py, "-m", "softspoken_tpu.cli", "train", "--synthetic",
                   "--out", ckpt_dir, "--steps", str(steps),
                   "--batch-size", "2" if args.quick else "128",
                   "--lr", "1e-3", "--seed", "31337",
                   "--augment", *augs]
            if args.quick:
                cmd += ["--n-inner", "2", "--pool-size", "16"]
            run(cmd, os.path.join(wd, f"train_{arm}.log"), retries=2)

        stage(f"train {arm}", os.path.join(ckpt_dir, "manifest.ocdbt"),
              recipe, train)
        print(f"scoring {arm} ({augs})", flush=True)
        results[arm] = score(ckpt_dir, eval_sets)

    deltas = {tag: {
        "frame_f1_A": results["A_lineage"][tag]["frame_f1"],
        "frame_f1_B": results["B_channels"][tag]["frame_f1"],
        "delta_B_minus_A": round(
            results["B_channels"][tag]["frame_f1"]
            - results["A_lineage"][tag]["frame_f1"], 4),
    } for tag in results["A_lineage"]}

    out = {
        "question": "Does gain_ramp (fading analog) inside from-scratch "
                    "training move the fading/reverb conditions at matched "
                    "step budget? Directional probe only — NOT an adoption "
                    "experiment (models are far below the committed 48k "
                    "checkpoint).",
        "steps": steps,
        "eval": {"files": n_files, "seconds": seconds,
                 "conditions": [c for c, _ in CONDS]},
        "arms": {k: {"augs": v} for k, v in arms.items()},
        "per_condition": deltas,
        "quick": bool(args.quick),
    }
    out_path = os.path.join(REPO_ROOT, "docs/PROBE_SCRATCH_r04.json")
    if args.quick:
        out_path = os.path.join(wd, "probe_quick.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(deltas, indent=1), flush=True)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
