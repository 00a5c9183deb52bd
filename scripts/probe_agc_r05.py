"""Directional probe: inference-side level normalization (AGC) for the
deep-fade recall collapse.

The round-5 per-event taxonomy (docs/QUALITY_r05.json) names v2_fading's
event gap: 52% of FNs are outright MISSES inside deep-fade segments plus
42 false alarms — a level problem, not a boundary problem — and it is the
one lever none of the eight rejected training experiments touched: the
fading channel (train/degrade.py: 8-20 s random-walk gain) drifts the
level the detector sees, while training clips are level-stationary.

This probe measures the cheapest possible inference-side counter: a slow
automatic gain control applied to the audio BEFORE detection —

    env(t) = sqrt(moving_avg(x^2, win))        (win ~ 3 s: longer than
                                                speech events, shorter
                                                than the fade timescale)
    y(t)   = x(t) * ref / max(env(t), floor)   (floor keeps silence from
                                                being amplified into a
                                                false-alarm bed)

A/B on the SAME synthesized eval files, parity operating point, with
collateral watch conditions (clean / snr5 / clip in both generators) so a
fading win that costs the rest is visible immediately.  This is a
HOST-SIDE prototype for direction only — a shippable version would live
in the fused engine as a causal per-chunk envelope with carry.  Output:
docs/PROBE_AGC_r05.json.

Usage: python scripts/probe_agc_r05.py [--files 4] [--seconds 90]
       [--workdir /root/work_r05/agc] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONDS = [
    ("fading", dict(degradations=["fading"])),
    ("clean", dict()),
    ("snr5", dict(snr_db=(5.0, 5.0))),
    ("clip", dict(degradations=["clip"])),
]


def agc(x: np.ndarray, sr: int, win_s: float = 3.0,
        floor_db: float = -45.0) -> np.ndarray:
    """Slow RMS-envelope normalization (zero-phase moving average)."""
    win = max(1, int(sr * win_s))
    k = np.ones(win, np.float64) / win
    env2 = np.convolve(x.astype(np.float64) ** 2, k, mode="same")
    env = np.sqrt(np.maximum(env2, 0.0))
    floor = 10.0 ** (floor_db / 20.0)
    ref = max(float(np.median(env)), floor)  # preserve the file's own level
    y = x.astype(np.float64) * (ref / np.maximum(env, floor))
    peak = np.abs(y).max()
    if peak > 0.99:  # the wire is int16; avoid clipping the normalized take
        y *= 0.99 / peak
    return y.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=90.0)
    ap.add_argument("--workdir", default="/root/work_r05/agc")
    ap.add_argument("--win", type=float, default=3.0)
    ap.add_argument("--floor-db", type=float, default=-45.0)
    ap.add_argument("--ckpt", default=os.path.join(
        REPO_ROOT, "root/models/spec_unet_2d/model_checkpoint"))
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import quality_grid as QG
    from softspoken_tpu import Config
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.io import wavio
    from softspoken_tpu.train import evaluate as E

    wd = os.path.abspath(args.workdir)
    os.makedirs(wd, exist_ok=True)
    cfg = Config()
    det = Detector(cfg, checkpoint_path=args.ckpt)
    if getattr(det, "epoch", -1) < 0:
        raise SystemExit("committed checkpoint did not load")

    out = {"win_s": args.win, "floor_db": args.floor_db,
           "files": args.files, "seconds": args.seconds, "conditions": {}}
    for gen in ("v1", "v2"):
        for ci, (cname, kw) in enumerate(CONDS):
            tag = f"{gen}_{cname}"
            d = os.path.join(wd, f"eval_{tag}")
            labels = os.path.join(d, "labels.csv")
            if not os.path.exists(labels):
                labels = E.make_eval_set(
                    d, n_files=args.files, seconds=args.seconds,
                    seed=9500 + ci, generator=gen, **kw)
            labeled = E.load_labels(labels)

            # AGC variants of the same files (written once, reused)
            labeled_agc = []
            for path, truth in labeled:
                ap_path = path[:-4] + "_agc.wav"
                if not os.path.exists(ap_path):
                    x, sr = wavio.read(path)
                    if x.ndim > 1:
                        x = x.mean(axis=1)
                    wavio.write(ap_path, agc(x, sr, args.win, args.floor_db),
                                sr, subtype="PCM_16")
                labeled_agc.append((ap_path, truth))

            row = {}
            for name, lab in (("baseline", labeled), ("agc", labeled_agc)):
                per_file = QG.detect_set(det, lab)
                m = QG.metrics_from(per_file, cfg.engine.pad_seconds)
                row[name] = {
                    "frame_f1": m["parity"]["frame_f1"],
                    "event_f1": m["parity"]["event_f1"],
                    "taxonomy": {
                        k: m["parity"]["event_error_taxonomy"][k]
                        for k in ("miss", "merged", "false_alarm")},
                }
            row["delta_frame"] = round(
                row["agc"]["frame_f1"] - row["baseline"]["frame_f1"], 4)
            row["delta_event"] = round(
                row["agc"]["event_f1"] - row["baseline"]["event_f1"], 4)
            out["conditions"][tag] = row
            print(f"{tag}: frame {row['baseline']['frame_f1']} -> "
                  f"{row['agc']['frame_f1']} ({row['delta_frame']:+.4f})  "
                  f"event {row['baseline']['event_f1']} -> "
                  f"{row['agc']['event_f1']} ({row['delta_event']:+.4f})",
                  flush=True)

    out_path = os.path.join(REPO_ROOT, "docs/PROBE_AGC_r05.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
