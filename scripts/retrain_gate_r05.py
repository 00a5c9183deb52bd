"""Round-5 retrain adoption gate (docs/ROUND5_PLAN.md, pre-registered).

Runs the full evidence battery against the candidate checkpoint from
scripts/train_r05.py and records the adoption decision:

  stage 1: full 36-condition quality grid (scripts/quality_grid.py)
           → <workdir>/quality_candidate.json
  stage 2: real-audio probe (scripts/real_audio_check.py)
           → <workdir>/real_candidate.json
  stage 3: verdict vs the committed artifacts
           (docs/QUALITY_r04.json, docs/QUALITY_r03_realaudio.json)
           → docs/RETRAIN_GATE_r05.json

Gate (registered in docs/ROUND5_PLAN.md BEFORE the training run):
  adopt iff
    (a) no condition regresses >0.005 parity frame F1 vs QUALITY_r04
    (b) v2_fading (the 0.719 worst case) improves
    (c) real-music false_fraction < 0.10

Refuses partial grids the same way ft_hisnr does (review r4): a candidate
grid missing committed conditions aborts instead of trivially passing.

Usage: python scripts/retrain_gate_r05.py --workdir /root/work_r05
       [--ckpt <dir>] [--quick]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ftlib import run, stage  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/work_r05")
    ap.add_argument("--ckpt", default=None,
                    help="candidate checkpoint (default <workdir>/ckpt_r05)")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    wd = os.path.abspath(args.workdir)
    ckpt = args.ckpt or os.path.join(wd, "ckpt_r05")
    py = sys.executable
    n_files = 2 if args.quick else args.files
    seconds = 30.0 if args.quick else args.seconds
    recipe = {"ckpt": ckpt, "files": n_files, "seconds": seconds,
              "quick": bool(args.quick), "plan": "docs/ROUND5_PLAN.md"}

    grid_json = os.path.join(wd, "quality_candidate.json")
    real_json = os.path.join(wd, "real_candidate.json")

    def grid():
        cmd = [py, "scripts/quality_grid.py", "--ckpt", ckpt,
               "--out", grid_json, "--files", str(n_files),
               "--seconds", str(seconds),
               "--cache-dir", os.path.join(wd, "grid_cache")]
        if args.quick:
            cmd.append("--quick")
        run(cmd, os.path.join(wd, "grid.log"), retries=2)

    stage("stage 1 (grid)", grid_json, recipe, grid)

    def real():
        cmd = [py, "scripts/real_audio_check.py", "--ckpt", ckpt,
               "--out", real_json, "--workdir", os.path.join(wd, "real_wd")]
        if args.quick:
            cmd.append("--quick")
        run(cmd, os.path.join(wd, "real.log"), retries=2)

    stage("stage 2 (real-audio)", real_json, recipe, real)

    # ---- stage 3: verdict ---------------------------------------------------
    with open(grid_json) as f:
        grid_c = json.load(f)
    with open(real_json) as f:
        real_c = json.load(f)
    with open(os.path.join(REPO_ROOT, "docs/QUALITY_r04.json")) as f:
        grid_0 = json.load(f)
    with open(os.path.join(REPO_ROOT, "docs/QUALITY_r03_realaudio.json")) as f:
        real_0 = json.load(f)

    conds_c = grid_c.get("conditions") or {}
    conds_0 = grid_0.get("conditions") or {}
    missing = sorted(set(conds_0) - set(conds_c))
    if missing and not args.quick:
        raise SystemExit(
            f"candidate grid is missing {len(missing)} committed conditions "
            f"({missing[:5]}…) — refusing to gate on incomplete data")

    regressions, per_condition = [], {}
    for tag in sorted(set(conds_c) & set(conds_0)):
        f1_c = conds_c[tag]["parity"]["frame_f1"]
        f1_0 = conds_0[tag]["parity"]["frame_f1"]
        per_condition[tag] = {"committed": f1_0, "candidate": f1_c,
                              "delta": round(f1_c - f1_0, 4)}
        if f1_c < f1_0 - 0.005:
            regressions.append(tag)

    fading_0 = conds_0["v2_fading"]["parity"]["frame_f1"]
    fading_c = (conds_c.get("v2_fading") or {}).get(
        "parity", {}).get("frame_f1")
    music_0 = real_0["false_positives_on_real_audio"]["music_house"][
        "false_fraction"]
    music_c = real_c["false_positives_on_real_audio"]["music_house"][
        "false_fraction"]

    gate_grid = not regressions
    gate_fading = fading_c is not None and fading_c > fading_0
    gate_music = music_c < 0.10
    n_better = sum(1 for v in per_condition.values() if v["delta"] > 0)
    n_worse = sum(1 for v in per_condition.values() if v["delta"] < 0)
    worst_c = min(((t, v["candidate"]) for t, v in per_condition.items()),
                  key=lambda kv: kv[1], default=("", 1.0))
    verdict = {
        "adopt": bool(gate_grid and gate_fading and gate_music),
        "gate_no_regression_ok": gate_grid,
        "gate_fading_improves_ok": bool(gate_fading),
        "gate_music_ok": gate_music,
        "v2_fading": {"committed": fading_0, "candidate": fading_c},
        "music_false_fraction": {"committed": music_0, "candidate": music_c},
        "regressed_conditions": regressions,
        "conditions_better_worse": [n_better, n_worse],
        "worst_candidate_condition": {"condition": worst_c[0],
                                      "frame_f1": worst_c[1]},
        "per_condition": per_condition,
        "recipe": recipe,
        "grid_artifact": grid_json,
        "real_artifact": real_json,
    }
    out = os.path.join(wd if args.quick else os.path.join(REPO_ROOT, "docs"),
                       "RETRAIN_GATE_r05.json")
    with open(out, "w") as f:
        json.dump(verdict, f, indent=1)
    print(json.dumps({k: v for k, v in verdict.items()
                      if k != "per_condition"}, indent=1), flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
