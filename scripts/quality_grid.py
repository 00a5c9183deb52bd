"""Out-of-family quality grid → docs/QUALITY_r04.json (VERDICT r2 #1, r3 #2).

Runs the committed trained checkpoint over labeled eval sets from BOTH
synthetic generators (v1 = training family, v2 = independently-written
out-of-family, train/synth2.py) under a degradation grid (pinned SNRs,
4 kHz mic rolloff, clipping, mu-law round trip, mains hum, dropouts), and
reports frame/event F1 at the parity operating point (threshold 0.1, merge
0.5 s) FIRST, the tuned point (merge 0.3 s) second, plus a threshold
sensitivity curve recomputed host-side from each file's averaged score grid
(one detection pass per file, many operating points).

Usage:  python scripts/quality_grid.py [--out docs/QUALITY_r04.json]
        [--files 8] [--seconds 120] [--quick]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Honor JAX_PLATFORMS (e.g. =cpu for smoke runs): the sitecustomize-
# registered axon plugin ignores the env var, so pin via jax.config
# (same handling as cli.py/bench.py).
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax as _jax

    _jax.config.update("jax_platforms", _plat)


THRESHOLDS = [0.02, 0.05, 0.1, 0.15, 0.2, 0.3, 0.5]
HYST_EXITS = [0.0, 0.02, 0.05, 0.08]
PARITY = {"threshold": 0.1, "break_duration": 0.5}
TUNED = {"threshold": 0.1, "break_duration": 0.3}

CONDITIONS = [
    ("clean", dict()),
    ("snr0", dict(snr_db=(0.0, 0.0))),
    ("snr5", dict(snr_db=(5.0, 5.0))),
    ("snr10", dict(snr_db=(10.0, 10.0))),
    ("snr20", dict(snr_db=(20.0, 20.0))),
    ("rolloff4k", dict(degradations=["rolloff4k"])),
    ("clip", dict(degradations=["clip"])),
    ("mulaw", dict(degradations=["mulaw"])),
    ("bfp4", dict(degradations=["bfp4"])),
    ("hum", dict(degradations=["hum"])),
    ("dropout", dict(degradations=["dropout"])),
    ("rolloff4k+mulaw", dict(degradations=["rolloff4k", "mulaw"])),
    ("snr5+rolloff4k", dict(snr_db=(5.0, 5.0), degradations=["rolloff4k"])),
    # round-4 additions (VERDICT r3 next #2): reverberation at three RT60s
    # via an eval-independent image-source + Schroeder-tail RIR (NOT the
    # log-spaced-tap reverb the model trained on), a slow-fading channel,
    # and a combined mid-SNR reverberant condition
    ("reverb03", dict(degradations=["reverb03"])),
    ("reverb08", dict(degradations=["reverb08"])),
    ("reverb15", dict(degradations=["reverb15"])),
    ("fading", dict(degradations=["fading"])),
    ("snr10+reverb08", dict(snr_db=(10.0, 10.0), degradations=["reverb08"])),
]


def detect_set(det, labeled):
    """One detection pass per file → raw material for metrics_from.

    Each entry keeps the averaged score grid, the file duration (from the
    result itself: same internal-rate clock the predictions were made on,
    no second header probe — review r3), the truth intervals, and the
    pipeline's own merged intervals (codec gate reuses those instead of
    re-running detection per file)."""
    per_file = []
    for path, truth in labeled:
        res = det.detect_file_streaming(path)
        per_file.append({
            "avg": np.asarray(res.avg_values, np.float32),
            "dur": float(res.audio_seconds),
            "truth": [(float(s), float(e)) for s, e in truth],
            "intervals": tuple(res.intervals),
            "path": os.path.abspath(path),
        })
    return per_file


def metrics_from(per_file, pad_seconds):
    """Metrics at many operating points from cached score grids (host-only)."""
    from softspoken_tpu.engine import regions as R
    from softspoken_tpu.train import evaluate as E

    def metrics_at(threshold, break_duration, exit_threshold=None,
                   smooth_bins=0, iou=0.5, taxonomy=None):
        ft, et, gt = {}, {}, {}
        for pf_ in per_file:
            avg, dur, truth = pf_["avg"], pf_["dur"], pf_["truth"]
            regs = R.find_speech_regions(avg, threshold, break_duration,
                                         exit_threshold=exit_threshold,
                                         smooth_bins=smooth_bins)
            regs = R.shift_regions(regs, -pad_seconds)
            # clamp into [0, dur] at BOTH edges FIRST so the min-length
            # filter judges the audible span (review r3 batch 13: the end
            # was never clamped, so trailing-pad regions kept their
            # pad-straddling span — asymmetric with the leading-pad fix;
            # mirrors train/evaluate.py)
            regs = [(max(0.0, s), min(dur, e)) for s, e in regs
                    if e > 0 and s < dur]
            pred = R.filter_min_length(regs, 0.1)
            E._accumulate(ft, E.frame_metrics(pred, truth, dur))
            E._accumulate(et, E.event_metrics(pred, truth, iou))
            E._accumulate(gt, E.event_metrics_granularity(
                pred, truth, break_duration, iou))
            if taxonomy is not None:
                E.merge_taxonomy(taxonomy, E.event_error_taxonomy(
                    pred, truth, iou))
        return E._finalize(ft), E._finalize(et), E._finalize(gt)

    # per-event error taxonomy at the parity point (VERDICT r4 next #3):
    # names WHICH failure mode dominates the event-F1 gap per condition
    tax = {}
    pf, pe, pg = metrics_at(taxonomy=tax, **PARITY)
    tf, te, tg = metrics_at(**TUNED)
    sweep = {}
    for thr in THRESHOLDS:
        f, e, _ = metrics_at(thr, PARITY["break_duration"])
        sweep[str(thr)] = {"frame_f1": round(f["f1"], 4),
                           "event_f1": round(e["f1"], 4)}
    # hysteresis operating points (engine exit_threshold): parity enter
    # level, extended over bins above the exit level — host-side only,
    # same cached grids
    hyst = {}
    for ex in HYST_EXITS:
        f, e, _ = metrics_at(PARITY["threshold"], PARITY["break_duration"],
                             exit_threshold=ex)
        hyst[str(ex)] = {"frame_f1": round(f["f1"], 4),
                         "event_f1": round(e["f1"], 4)}
    # round-4 event-F1 levers (VERDICT r3 #3), all host-side re-scores of
    # the same cached grids: median smoothing widths, smoothing+hysteresis
    # combinations, and an IoU sweep so the 0.5 cutoff can't hide
    # near-miss boundary fragmentation
    smooth = {}
    for w in (3, 5, 7):
        f, e, _ = metrics_at(PARITY["threshold"], PARITY["break_duration"],
                             smooth_bins=w)
        smooth[f"s{w}"] = {"frame_f1": round(f["f1"], 4),
                           "event_f1": round(e["f1"], 4)}
        f, e, _ = metrics_at(PARITY["threshold"], PARITY["break_duration"],
                             exit_threshold=0.05, smooth_bins=w)
        smooth[f"s{w}+hyst0.05"] = {"frame_f1": round(f["f1"], 4),
                                    "event_f1": round(e["f1"], 4)}
    iou_sweep = {}
    for iou in (0.3, 0.5, 0.7):
        _, e, _ = metrics_at(PARITY["threshold"], PARITY["break_duration"],
                             iou=iou)
        iou_sweep[str(iou)] = round(e["f1"], 4)
    return {
        "parity": {"frame_f1": round(pf["f1"], 4),
                   "frame_precision": round(pf["precision"], 4),
                   "frame_recall": round(pf["recall"], 4),
                   "event_f1": round(pe["f1"], 4),
                   "event_precision": round(pe["precision"], 4),
                   "event_recall": round(pe["recall"], 4),
                   # truth re-merged at the operating point's own gap:
                   # separates granularity artifacts (one prediction
                   # legitimately spanning several close truth events at
                   # merge 0.5 s) from real misses — reported alongside,
                   # never instead of, the plain event metric
                   "event_f1_granularity": round(pg["f1"], 4),
                   "event_error_taxonomy": E.finalize_taxonomy(tax)},
        "tuned": {"frame_f1": round(tf["f1"], 4),
                  "event_f1": round(te["f1"], 4),
                  "event_f1_granularity": round(tg["f1"], 4)},
        "threshold_sweep": sweep,
        "hysteresis_sweep": hyst,
        "smooth_sweep": smooth,
        "event_f1_iou_sweep": iou_sweep,
        "n_files": len(per_file),
    }


def postfilter_parity_metrics(per_file, pad_seconds, threshold):
    """Parity-point metrics WITH the music post-filter applied (the full-
    grid on-vs-off A/B the round-3 verdict asked for, #4).

    Reuses each file's cached score grid for the predictions and reads the
    eval WAV itself for the filter's context windows — exactly the
    engine's application point (engine/detector.py::_apply_music_filter
    runs on the merged interval list).  Files whose audio is gone (pure
    rescore from another machine) are skipped and counted.
    """
    from softspoken_tpu.engine import postfilter as PF
    from softspoken_tpu.engine import regions as R
    from softspoken_tpu.io.audio import load_audio_startstop
    from softspoken_tpu import Config
    from softspoken_tpu.train import evaluate as E

    sr = Config().dsp.sample_rate
    ft, et = {}, {}
    scored = skipped = dropped = total = 0
    for pf_ in per_file:
        path = pf_.get("path")
        if not path or not os.path.exists(path):
            skipped += 1
            continue
        avg, dur, truth = pf_["avg"], pf_["dur"], pf_["truth"]
        regs = R.find_speech_regions(avg, PARITY["threshold"],
                                     PARITY["break_duration"])
        regs = R.shift_regions(regs, -pad_seconds)
        regs = [(max(0.0, s), min(dur, e)) for s, e in regs
                if e > 0 and s < dur]
        pred = R.filter_min_length(regs, 0.1)

        def read_ctx(s, e, _p=path):
            audio, _sr = load_audio_startstop(_p, (s, e), target_sr=sr)
            return audio

        kept, _scores = PF.filter_intervals(pred, read_ctx, sr, dur,
                                            threshold)
        dropped += len(pred) - len(kept)
        total += len(pred)
        scored += 1
        E._accumulate(ft, E.frame_metrics(kept, truth, dur))
        E._accumulate(et, E.event_metrics(kept, truth, 0.5))
    if scored == 0:
        return {"skipped_files": skipped, "note": "no audio on disk"}
    f, e = E._finalize(ft), E._finalize(et)
    return {
        "threshold": threshold,
        "frame_f1": round(f["f1"], 4),
        "frame_recall": round(f["recall"], 4),
        "event_f1": round(e["f1"], 4),
        "event_recall": round(e["recall"], 4),
        "regions_dropped": dropped,
        "regions_total": total,
        "files_scored": scored,
        "skipped_files": skipped,
    }


def score_set(det, labeled, pad_seconds):
    """One detection pass per file; metrics at many operating points."""
    per_file = detect_set(det, labeled)
    out = metrics_from(per_file, pad_seconds)
    out["intervals"] = [pf["intervals"] for pf in per_file]
    return out


def save_cache(path, per_file):
    """Persist a condition's score grids so operating points / metric
    definitions can be re-evaluated host-side without redoing the ~2 h
    TPU detection pass (rescore mode)."""
    arrs = {f"avg{i}": pf["avg"] for i, pf in enumerate(per_file)}
    meta = [{"dur": pf["dur"], "truth": pf["truth"],
             "intervals": [list(map(float, iv)) for iv in pf["intervals"]],
             "path": pf.get("path")}
            for pf in per_file]
    arrs["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrs)


def load_cache(path):
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"].tobytes()).decode())
        return [{
            "avg": z[f"avg{i}"],
            "dur": m["dur"],
            "truth": [tuple(t) for t in m["truth"]],
            "intervals": tuple(tuple(iv) for iv in m["intervals"]),
            "path": m.get("path"),
        } for i, m in enumerate(meta)]


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/QUALITY_r04.json")
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=120.0)
    # resolved against the REPO ROOT, not the cwd: a cwd-relative default
    # silently fell back to random fixture weights when run from elsewhere,
    # publishing a garbage grid attributed to the real checkpoint
    # (review r3 finding)
    ap.add_argument("--ckpt", default=os.path.join(
        REPO_ROOT, "root/models/spec_unet_2d/model_checkpoint"))
    ap.add_argument("--quick", action="store_true",
                    help="2 files x 60 s, clean+2 conditions (smoke)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--mel-precision", default="highest",
                    choices=["highest", "high", "default"])
    ap.add_argument("--cache-dir", default=None,
                    help="save per-condition score grids (npz) here so "
                         "--rescore can recompute metrics without a TPU")
    ap.add_argument("--rescore", default=None, metavar="CACHE_DIR",
                    help="skip detection; recompute all metrics host-side "
                         "from a --cache-dir produced by a previous run")
    ap.add_argument("--no-postfilter-ab", action="store_true",
                    help="skip the per-condition music-postfilter A/B")
    ap.add_argument("--postfilter-threshold", type=float, default=None,
                    help="music-filter threshold for the A/B (default: "
                         "engine/postfilter.DEFAULT_THRESHOLD)")
    args = ap.parse_args()

    from softspoken_tpu import Config
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.train import evaluate as E

    n_files, seconds = args.files, args.seconds
    conditions = CONDITIONS
    if args.quick:
        n_files, seconds = 2, 60.0
        conditions = CONDITIONS[:2] + [CONDITIONS[7], CONDITIONS[14]]

    # resolve --out against the repo root so running from elsewhere still
    # updates the committed evidence file (review r3 batch 13)
    if not os.path.isabs(args.out):
        args.out = os.path.join(REPO_ROOT, args.out)
    import re as _re

    if args.quick and _re.fullmatch(
            r"QUALITY_r\d+\.json", os.path.basename(args.out)) and \
            os.path.dirname(os.path.abspath(args.out)) == os.path.join(
                REPO_ROOT, "docs"):
        # the smoke run must never clobber the committed evidence file,
        # regardless of how the default path was spelled
        args.out = "/tmp/quality_grid_quick.json"

    cfg = Config().with_engine(mel_precision=args.mel_precision)
    det = None
    if args.rescore is None:
        det = Detector(cfg, checkpoint_path=args.ckpt)
        if getattr(det, "epoch", -1) < 0:
            raise SystemExit(
                f"checkpoint {args.ckpt} did not load (epoch<0) — refusing "
                "to run the grid on random init")
    pad = cfg.engine.pad_seconds

    out = {
        "round": 4,
        "transfer_risk": (
            "Both eval generators are synthetic; neither proves performance "
            "on real field audio. Round 4 closed the two axes the round-3 "
            "statement named as unbounded: reverberation (eval-independent "
            "image-source RIR conditions) and time-varying channels "
            "(slow-fading). Remaining unbounded axes: real speech "
            "phonotactics, real weather (wind buffeting the mic element), "
            "overlapping speakers. Fine-tune attempts and their "
            "pre-registered gates: docs/FT_SYNTH3_r04.json, "
            "docs/FT_MUSIC_r03.json."),
        "postfilter_ab": (
            "parity_postfilter per condition is the full-grid on-vs-off "
            "A/B of the music post-filter; decision and worst collateral "
            "in docs/MUSIC_FILTER_GATE_r04.json."),
        "checkpoint": args.ckpt,
        "operating_points": {
            "parity": PARITY,
            "tuned": dict(TUNED, note="merge 0.3 s selected on seed-77 v1 "
                                      "tuning set in round 2"),
        },
        "eval": {"n_files": n_files, "seconds": seconds, "iou": 0.5,
                 "min_len": 0.1},
        "generators": {
            "v1": "train/synth.py — SAME family the checkpoint was trained "
                  "on (in-family)",
            "v2": "train/synth2.py — independently-written DSP "
                  "(LF glottal source, cascade moving formants, OU-field "
                  "textures, plan-derived labels); OUT-OF-FAMILY",
        },
        "conditions": {},
    }

    if args.cache_dir:
        os.makedirs(args.cache_dir, exist_ok=True)
        # the cache is only valid for ONE checkpoint: reusing another
        # run's grids would silently score the wrong weights
        marker = os.path.join(args.cache_dir, "cache_ckpt.json")
        # identify the checkpoint by CONTENT, not just path: a retrain
        # written to the same path (e.g. ft_music.py rerun in an existing
        # --workdir) must invalidate the cache, or the old weights' grids
        # would be scored under the new checkpoint's name (review r3
        # batch 19)
        from softspoken_tpu.engine.journal import variables_digest

        ident = {"ckpt": os.path.abspath(args.ckpt),
                 "weights": (variables_digest(det.variables)
                             if det is not None else "rescore"),
                 "files": n_files, "seconds": seconds,
                 "mel_precision": args.mel_precision}
        if os.path.exists(marker):
            with open(marker) as f:
                prev = json.load(f)
            if prev != ident:
                raise SystemExit(
                    f"--cache-dir {args.cache_dir} belongs to a different "
                    f"run ({prev}); refusing to mix caches — use a fresh "
                    "directory")
        else:
            with open(marker, "w") as f:
                json.dump(ident, f)

    base = args.workdir or tempfile.mkdtemp(prefix="quality_grid_")
    t_all = time.time()
    for gen in ("v1", "v2"):
        for ci, (cname, kw) in enumerate(conditions):
            tag = f"{gen}_{cname}"
            if args.rescore is not None:
                cache = os.path.join(args.rescore, f"{tag}.npz")
                if not os.path.exists(cache):
                    print(f"{tag}: no cache at {cache}, skipping", flush=True)
                    continue
                t0 = time.time()
                per_file = load_cache(cache)
                result = metrics_from(per_file, pad)
                result["rescore_seconds"] = round(time.time() - t0, 1)
            else:
                cache = (os.path.join(args.cache_dir, f"{tag}.npz")
                         if args.cache_dir else None)
                if cache and os.path.exists(cache):
                    # restartability: a tunnel stall mid-grid loses hours
                    # if completed conditions re-run; the per-condition
                    # cache already holds everything metrics need
                    print(f"{tag}: reusing cached score grids ({cache})",
                          flush=True)
                    per_file = load_cache(cache)
                    result = metrics_from(per_file, pad)
                    result["from_cache"] = True
                else:
                    d = os.path.join(base, tag)
                    seed = 7000 + ci  # same seed per condition across generators
                    t0 = time.time()
                    labels = E.make_eval_set(
                        d, n_files=n_files, seconds=seconds, seed=seed,
                        generator=gen, **kw)
                    synth_s = time.time() - t0
                    t0 = time.time()
                    per_file = detect_set(det, E.load_labels(labels))
                    if cache:
                        save_cache(cache, per_file)
                    result = metrics_from(per_file, pad)
                    result["synth_seconds"] = round(synth_s, 1)
                    result["detect_seconds"] = round(time.time() - t0, 1)
            if not args.no_postfilter_ab:
                # full-grid music-postfilter A/B (VERDICT r3 #4): same
                # grids, predictions re-filtered with audio contexts
                from softspoken_tpu.engine import postfilter as _PF

                result["parity_postfilter"] = postfilter_parity_metrics(
                    per_file, pad, args.postfilter_threshold
                    if args.postfilter_threshold is not None
                    else _PF.DEFAULT_THRESHOLD)
            out["conditions"][tag] = result
            print(f"{tag}: parity frame F1 {result['parity']['frame_f1']} "
                  f"event F1 {result['parity']['event_f1']} "
                  f"(granularity-matched "
                  f"{result['parity']['event_f1_granularity']})", flush=True)

    if args.rescore is not None:
        out["rescored_from"] = os.path.abspath(args.rescore)

    # headline: worst-case over all v2 (out-of-family) conditions
    v2 = {k: v for k, v in out["conditions"].items() if k.startswith("v2_")}
    if not v2:
        raise SystemExit("no v2 conditions scored — refusing to write a "
                         "summary-less grid")
    worst = min(v2.items(), key=lambda kv: kv[1]["parity"]["frame_f1"])
    out["summary"] = {
        "worst_out_of_family": {
            "condition": worst[0],
            "parity": worst[1]["parity"],
        },
        "v2_clean_parity": out["conditions"].get("v2_clean", {}).get("parity"),
        "v1_clean_parity": out["conditions"].get("v1_clean", {}).get("parity"),
        "wall_seconds": round(time.time() - t_all, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
