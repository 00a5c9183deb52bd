"""Grid-neutrality gate for the music post-filter (engine/postfilter.py).

The filter can only DROP detected regions, so its only possible harm on
the synthetic quality grid (docs/QUALITY_r03.json) is dropping true
speech regions.  This gate measures that directly and cheaply:

  Part 1 (scorer sweep, no NN): regenerate every grid condition's eval
  set (same seeds/conditions as scripts/quality_grid.py) and score each
  TRUTH region's context window with postfilter.music_score.  A region
  scoring >= the threshold would be dropped if the detector predicted it;
  the per-condition drop fraction and score distribution quantify the
  worst the filter could do to grid recall.

  Part 2 (full-pipeline A/B, CPU): detect a subset of conditions with the
  trained checkpoint, music_filter off vs on, and diff the interval lists
  — the conditions chosen are the ones with periodic artifacts most like
  a beat (hum, dropout) plus both generators' clean sets.

Output JSON feeds the "music_filter" section of
docs/QUALITY_r03_realaudio.json / README.  Usage:

  python scripts/music_filter_gate.py [--threshold 0.6] [--files 8]
      [--seconds 120] [--out /tmp/music_filter_gate.json] [--quick]
      [--skip-detect]
"""

import argparse
import json
import os
import sys
import tempfile
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import numpy as np

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)

from quality_grid import CONDITIONS  # noqa: E402  (same grid definition)


def score_truth_regions(labels_csv, sr_internal, threshold):
    """Score every truth region's context in one condition's eval set."""
    from softspoken_tpu.engine import postfilter as PF
    from softspoken_tpu.io import wavio
    from softspoken_tpu.io.resample import resample
    from softspoken_tpu.train import evaluate as E

    scores = []
    dropped = 0
    total = 0
    for path, truth in E.load_labels(labels_csv):
        x, sr = wavio.read(path)
        x = np.asarray(x, np.float32)
        if sr != sr_internal:
            x = resample(x, sr, sr_internal).astype(np.float32)
        dur = len(x) / sr_internal

        def read_ctx(s, e, _x=x):
            return _x[int(s * sr_internal):int(e * sr_internal)]

        kept, sc = PF.filter_intervals(
            truth, read_ctx, sr_internal, dur, threshold)
        finite = [v for v in sc if np.isfinite(v)]
        scores.extend(finite)
        total += len(truth)
        dropped += len(truth) - len(kept)
    if not scores:
        return {"regions": total, "dropped": dropped}
    arr = np.array(scores)
    return {
        "regions": total,
        "dropped": dropped,
        "score_median": round(float(np.median(arr)), 3),
        "score_p90": round(float(np.percentile(arr, 90)), 3),
        "score_max": round(float(arr.max()), 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=None,
                    help="default: postfilter.DEFAULT_THRESHOLD")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--out", default="/tmp/music_filter_gate.json")
    ap.add_argument("--ckpt", default=os.path.join(
        REPO_ROOT, "root/models/spec_unet_2d/model_checkpoint"))
    ap.add_argument("--quick", action="store_true",
                    help="2 files x 60 s, 3 conditions, no detect A/B")
    ap.add_argument("--skip-detect", action="store_true",
                    help="Part 1 (scorer sweep) only")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from softspoken_tpu import Config
    from softspoken_tpu.engine import postfilter as PF
    from softspoken_tpu.train import evaluate as E

    thr = args.threshold if args.threshold is not None else PF.DEFAULT_THRESHOLD
    n_files, seconds = args.files, args.seconds
    conditions = CONDITIONS
    if args.quick:
        n_files, seconds = 2, 60.0
        conditions = CONDITIONS[:2] + [CONDITIONS[9]]  # clean, snr0, hum
        args.skip_detect = True

    sr_internal = Config().dsp.sample_rate
    base = args.workdir or tempfile.mkdtemp(prefix="mf_gate_")
    out = {"threshold": thr, "eval": {"files": n_files, "seconds": seconds},
           "truth_region_sweep": {}, "detect_ab": {}}

    t_all = time.time()
    worst = None
    labels_by_tag = {}
    for gen in ("v1", "v2"):
        for ci, (cname, kw) in enumerate(conditions):
            tag = f"{gen}_{cname}"
            d = os.path.join(base, tag)
            labels = E.make_eval_set(
                d, n_files=n_files, seconds=seconds, seed=7000 + ci,
                generator=gen, **kw)
            labels_by_tag[tag] = labels
            r = score_truth_regions(labels, sr_internal, thr)
            out["truth_region_sweep"][tag] = r
            if "score_max" in r and (worst is None or r["score_max"] > worst):
                worst = r["score_max"]
            print(f"sweep {tag}: {r}", flush=True)
    out["truth_region_sweep_worst_score"] = worst
    out["truth_region_sweep_total_dropped"] = sum(
        r["dropped"] for r in out["truth_region_sweep"].values())

    if not args.skip_detect:
        from softspoken_tpu.engine import Detector

        ab_tags = ["v1_clean", "v2_clean", "v1_hum", "v2_hum",
                   "v1_dropout", "v2_dropout"]
        cfg = Config().with_engine(mel_precision="highest")
        det0 = Detector(cfg, checkpoint_path=args.ckpt)
        if getattr(det0, "epoch", -1) < 0:
            raise SystemExit("checkpoint did not load (epoch<0)")
        det1 = Detector(cfg.with_engine(music_filter=thr),
                        checkpoint_path=args.ckpt)
        for tag in ab_tags:
            if tag not in labels_by_tag:
                continue
            labeled = E.load_labels(labels_by_tag[tag])
            diff = 0
            regions0 = regions1 = 0
            for path, _truth in labeled:
                r0 = det0.detect_file_streaming(path)
                r1 = det1.detect_file_streaming(path)
                regions0 += len(r0.intervals)
                regions1 += len(r1.intervals)
                if list(r0.intervals) != list(r1.intervals):
                    diff += 1
            out["detect_ab"][tag] = {
                "files": len(labeled), "files_with_diff": diff,
                "regions_off": regions0, "regions_on": regions1,
            }
            print(f"A/B {tag}: {out['detect_ab'][tag]}", flush=True)

    out["wall_seconds"] = round(time.time() - t_all, 1)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} in {out['wall_seconds']} s", flush=True)


if __name__ == "__main__":
    main()
