"""Boundary-weighted-loss fine-tune experiment: train → gate → verdict
(VERDICT r3 next #3 — the training-side event-F1 lever).

Post-processing levers (hysteresis, grid median smoothing) measured
marginal on the round-4 grid (docs/QUALITY_r04.json smooth/hysteresis
sweeps): events fragment because of detection quality at boundaries, not
threshold flicker.  This experiment moves the gradient there instead:
fine-tune the committed checkpoint with
``train --boundary-weight W`` (train/loop.py::boundary_weights — extra
BCE weight within ~47 ms of every onset/offset, mean-normalized so the
threshold landscape is unchanged), then gate on the FULL round-4 grid.

ADOPTION RULE (decided before measuring): adopt only if (a) NO grid
condition's parity frame F1 regresses more than 0.005, (b) the
out-of-family worst-case EVENT F1 improves by at least +0.02, and (c)
mean v2 frame F1 does not drop.  Otherwise recorded as a measured
negative result.

Stages are fingerprinted (scripts/ftlib.py): rerunning with different
hyperparameters in the same workdir refuses instead of silently reusing
the stale candidate.

Usage:  python scripts/ft_boundary.py --workdir /tmp/ft_boundary
        [--steps 6000] [--lr 1e-4] [--weight 2.0] [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ftlib import run, stage  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COMMITTED = os.path.join(REPO_ROOT, "root/models/spec_unet_2d/model_checkpoint")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ft_boundary")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight", type=float, default=2.0)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    cand = os.path.join(wd, "candidate_ckpt")
    grid_json = os.path.join(wd, "grid_candidate.json")
    verdict_json = os.path.join(wd, "VERDICT_ft_boundary.json")
    py = sys.executable

    steps = 4 if args.quick else args.steps
    bs = 2 if args.quick else args.batch_size
    recipe = {"steps": steps, "lr": args.lr, "boundary_weight": args.weight,
              "batch_size": bs, "quick": bool(args.quick), "seed": 99077}

    def train():
        cmd = [py, "-m", "softspoken_tpu.cli", "train", "--synthetic",
               "--resume", COMMITTED, "--out", cand,
               "--steps", str(steps), "--batch-size", str(bs),
               "--lr", str(args.lr),
               "--boundary-weight", str(args.weight),
               "--seed", "99077"]
        if args.quick:
            cmd += ["--n-inner", "2", "--pool-size", "16"]
        run(cmd, os.path.join(wd, "train.log"))

    stage("stage 1 (train)", os.path.join(cand, "manifest.ocdbt"),
          recipe, train)

    def grid():
        cmd = [py, "scripts/quality_grid.py", "--ckpt", cand,
               "--out", grid_json,
               "--cache-dir", os.path.join(wd, "grid_cache"),
               "--workdir", os.path.join(wd, "grid_work"),
               "--no-postfilter-ab"]
        if args.quick:
            cmd.append("--quick")
        run(cmd, os.path.join(wd, "grid.log"))

    stage("stage 2 (grid)", grid_json, recipe, grid)

    with open(grid_json) as f:
        conds_c = json.load(f).get("conditions") or {}
    with open(os.path.join(REPO_ROOT, "docs/QUALITY_r04.json")) as f:
        conds_0 = json.load(f).get("conditions") or {}

    regressions, per_condition = [], {}
    for tag, res_c in conds_c.items():
        res_0 = conds_0.get(tag)
        if res_0 is None:
            continue
        f1_c, f1_0 = res_c["parity"]["frame_f1"], res_0["parity"]["frame_f1"]
        per_condition[tag] = {
            "frame": {"committed": f1_0, "candidate": f1_c,
                      "delta": round(f1_c - f1_0, 4)},
            "event": {"committed": res_0["parity"]["event_f1"],
                      "candidate": res_c["parity"]["event_f1"],
                      "delta": round(res_c["parity"]["event_f1"]
                                     - res_0["parity"]["event_f1"], 4)},
        }
        if f1_c < f1_0 - 0.005:
            regressions.append(tag)

    def v2_stats(conds, key):
        vals = [r["parity"][key] for t, r in conds.items()
                if t.startswith("v2") and t in per_condition]
        return (min(vals), sum(vals) / len(vals)) if vals else (0.0, 0.0)

    wev_0, mev_0 = v2_stats(conds_0, "event_f1")
    wev_c, mev_c = v2_stats(conds_c, "event_f1")
    wfr_0, mfr_0 = v2_stats(conds_0, "frame_f1")
    wfr_c, mfr_c = v2_stats(conds_c, "frame_f1")

    gate_grid = not regressions
    gate_event = wev_c >= wev_0 + 0.02
    gate_frame_mean = mfr_c >= mfr_0
    verdict = {
        "adopt": bool(gate_grid and gate_event and gate_frame_mean),
        "gate_no_regression_ok": gate_grid,
        "gate_event_improves_ok": gate_event,
        "gate_frame_mean_ok": gate_frame_mean,
        "v2_worst_event_f1": {"committed": wev_0, "candidate": wev_c},
        "v2_mean_event_f1": {"committed": round(mev_0, 4),
                             "candidate": round(mev_c, 4)},
        "v2_worst_frame_f1": {"committed": wfr_0, "candidate": wfr_c},
        "v2_mean_frame_f1": {"committed": round(mfr_0, 4),
                             "candidate": round(mfr_c, 4)},
        "regressed_conditions": regressions,
        "per_condition": per_condition,
        "recipe": recipe,
        "candidate": cand,
        "rule": "adopt iff no condition drops >0.005 frame F1, v2 worst "
                "event F1 improves >= +0.02, and v2 mean frame F1 holds",
    }
    with open(verdict_json, "w") as f:
        json.dump(verdict, f, indent=2)
    print(json.dumps({k: verdict[k] for k in
                      ("adopt", "gate_no_regression_ok",
                       "gate_event_improves_ok", "gate_frame_mean_ok",
                       "v2_worst_event_f1", "v2_mean_event_f1",
                       "regressed_conditions")}, indent=2), flush=True)
    print(f"wrote {verdict_json}", flush=True)


if __name__ == "__main__":
    main()
