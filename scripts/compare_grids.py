"""Compare two quality-grid JSONs (scripts/quality_grid.py output) condition
by condition at the parity operating point — the checkpoint A/B gate.

Usage: python scripts/compare_grids.py OLD.json NEW.json [--key eval]
Prints per-condition frame/event F1 deltas and the summary verdict line.
"""

import argparse
import json


def grid(d):
    # quality_grid.py output: per-condition results under "conditions";
    # the committed evidence doc nests a full grid under grid_after_finetune
    if "conditions" in d and isinstance(d["conditions"], dict):
        return d["conditions"]
    if "grid_after_finetune" in d:
        return grid(d["grid_after_finetune"])
    return {k: v for k, v in d.items()
            if isinstance(v, dict) and "parity" in v}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    args = ap.parse_args()
    a = grid(json.load(open(args.old)))
    b = grid(json.load(open(args.new)))
    common = [k for k in a if k in b]
    print(f"{'condition':22s} {'frameF1':>8s} {'Δframe':>8s} "
          f"{'eventF1':>8s} {'Δevent':>8s}")
    worst_old = worst_new = ("", 1.0)
    n_better = n_worse = 0
    for k in common:
        pa, pb = a[k]["parity"], b[k]["parity"]
        df = pb["frame_f1"] - pa["frame_f1"]
        de = pb["event_f1"] - pa["event_f1"]
        n_better += df > 0
        n_worse += df < 0
        if pa["frame_f1"] < worst_old[1]:
            worst_old = (k, pa["frame_f1"])
        if pb["frame_f1"] < worst_new[1]:
            worst_new = (k, pb["frame_f1"])
        print(f"{k:22s} {pb['frame_f1']:8.4f} {df:+8.4f} "
              f"{pb['event_f1']:8.4f} {de:+8.4f}")
    print(f"\nconditions better/worse (frame): {n_better}/{n_worse}")
    print(f"worst condition: old {worst_old[0]} {worst_old[1]:.4f} -> "
          f"new {worst_new[0]} {worst_new[1]:.4f}")


if __name__ == "__main__":
    main()
