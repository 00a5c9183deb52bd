"""Headless CLI — the framework's primary driver.

The reference has no headless surface at all (launch.py:1-11 always opens
the Qt GUI); this CLI exposes the full 3-step workflow plus utilities:

  project new|list|status|add-files|remove-files
  detect        — run the TPU detector over a project (or ad-hoc files)
  review        — grade/list/add/delete detections, render spectrograms,
                  export segment WAVs, re-run exporters
  silence       — apply mute masks and write *_silenced.wav
  convert-ckpt  — torch .pth → native orbax checkpoint
  bench         — throughput benchmark (one JSON line)

Usage: python -m softspoken_tpu <command> …
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from typing import List, Optional

from .config import Config, DEFAULT_CONFIG


def _load_config(args) -> Config:
    cfg = Config.from_file(args.config) if getattr(args, "config", None) else Config()
    if getattr(args, "project_dir", None):
        cfg = cfg.with_paths(project_dir=args.project_dir)
    if getattr(args, "precision", None):
        cfg = cfg.with_engine(precision=args.precision)
    if getattr(args, "device_batch", None):
        cfg = cfg.with_engine(device_batch=args.device_batch)
    if getattr(args, "threshold", None) is not None:
        cfg = cfg.with_engine(threshold=args.threshold)
    if getattr(args, "break_duration", None) is not None:
        cfg = cfg.with_engine(break_duration=args.break_duration)
    if getattr(args, "exit_threshold", None) is not None:
        cfg = cfg.with_engine(exit_threshold=args.exit_threshold)
    if getattr(args, "grid_smooth", None) is not None:
        cfg = cfg.with_engine(grid_smooth=args.grid_smooth)
    if getattr(args, "music_filter", None) is not None:
        from .engine import postfilter

        thr = args.music_filter
        cfg = cfg.with_engine(
            music_filter=postfilter.DEFAULT_THRESHOLD if thr < 0 else thr)
    if getattr(args, "file_concurrency", None):
        cfg = cfg.with_engine(file_concurrency=args.file_concurrency)
    return cfg


def _manager(cfg: Config):
    from .project import ProjectManager

    return ProjectManager(cfg)


def _active_project(pm, name: Optional[str]):
    if name:
        proj = pm.set_active_project(name)
        if proj is None:
            sys.exit(f"error: no project named '{name}'")
        return proj
    if not pm.activate_latest():
        sys.exit("error: no projects exist; create one with `project new <name>`")
    return pm.current_project


# ---------------------------------------------------------------------------
# project
# ---------------------------------------------------------------------------

def cmd_project(args) -> None:
    cfg = _load_config(args)
    pm = _manager(cfg)
    # the optional positional `name` precedes `files`: argparse binds the
    # FIRST audio file as the project name when the user means the default
    # project.  If `name` is an existing path and not an existing project,
    # treat it as a file (review r3 batch 10).
    if args.action in ("add-files", "remove-files") and args.name:
        known = {p["name"] for p in pm.projects_data}
        if args.name not in known and os.path.exists(args.name):
            args.files = [args.name] + list(args.files)
            args.name = None
    if args.action == "new":
        if not args.name:
            raise SystemExit("error: `project new` requires a project name")
        pm.add_project(args.name)
        print(f"created project '{args.name}' under {pm.project_output_dir(args.name)}")
        if args.files:
            # `project new name f1.wav f2.wav` — the trailing files were
            # previously accepted by the parser and silently DROPPED
            # (found by a real workflow smoke); register them like add-files
            pm.set_active_project(args.name)
            merged = pm.update_file_list([os.path.abspath(f) for f in args.files])
            print(f"{len(merged)} file(s) registered")
    elif args.action == "list":
        for p in pm.projects_data:
            print(f"{p['name']}\t(last accessed {p.get('last_accessed', '?')})")
    elif args.action == "status":
        proj = _active_project(pm, args.name)
        print(json.dumps({"project": proj["name"], **pm.step_status()}, indent=2))
    elif args.action == "add-files":
        _active_project(pm, args.name)
        files = [os.path.abspath(f) for f in args.files]
        merged = pm.update_file_list(files)
        print(f"{len(merged)} file(s) registered")
    elif args.action == "remove-files":
        _active_project(pm, args.name)
        remaining = pm.remove_from_file_list([os.path.abspath(f) for f in args.files])
        print(f"{len(remaining)} file(s) remain")
    elif args.action == "merge-detections":
        from .parallel import merge_partition_stores

        proj = _active_project(pm, args.name)
        print(json.dumps(merge_partition_stores(proj["detections_file"])))


# ---------------------------------------------------------------------------
# detect
# ---------------------------------------------------------------------------

def cmd_detect(args) -> None:
    from .ckpt import fixture_variables
    from .engine import Detector
    from .project import DetectionStore
    from .runtime import DetectRunner, RunCallbacks

    cfg = _load_config(args)
    if args.strict_reference:
        cfg = cfg.with_engine(skip_processed_files=False)
    if getattr(args, "chunk_checkpoint", None):
        cfg = cfg.with_engine(chunk_checkpoint_every=args.chunk_checkpoint)

    if args.distributed:
        from .parallel import init_distributed

        init_distributed(args.coordinator, args.num_processes, args.process_id)

    variables = None
    if args.random_init:
        variables = fixture_variables(seed=0)
    det = Detector(cfg, variables=variables, checkpoint_path=args.checkpoint)

    if args.files:
        files = [os.path.abspath(f) for f in args.files]
        store_path = args.out or "detections.csv"
    else:
        pm = _manager(cfg)
        proj = _active_project(pm, args.project)
        files = pm.get_unprocessed_list()
        store_path = proj["detections_file"]
    if args.distributed:
        from .parallel import partition_files

        files = partition_files(files, args.process_id, args.num_processes)
        # per-process store: detections gather through the filesystem, one
        # writer per file (race-free by construction — SURVEY.md §5)
        import jax as _jax

        pid = args.process_id if args.process_id is not None else _jax.process_index()
        if pid or (args.num_processes or _jax.process_count()) > 1:
            base, ext = os.path.splitext(store_path)
            store_path = f"{base}.p{pid}{ext}"
    store = DetectionStore(store_path)

    if args.mesh:
        from .parallel import MeshDetector, make_mesh

        det = MeshDetector(det, make_mesh(("data",)))

    cb = RunCallbacks(
        file_started=lambda f: print(f"→ {f}", flush=True),
        message=lambda m: print(f"   {m}", flush=True),
    )
    runner = DetectRunner(det, store, cfg, streaming=args.streaming or None)
    report = runner.run(files, cb)
    print(
        json.dumps(
            {
                "files_done": report.files_done,
                "files_skipped": report.files_skipped,
                "rows_added": report.rows_added,
                "errors": report.errors,
                **{k: round(v, 3) for k, v in report.throughput.items()},
                "stage_seconds": {k: round(v, 3) for k, v in report.timers.items()},
                "detections_csv": store_path,
            },
            indent=2,
        )
    )


# ---------------------------------------------------------------------------
# review
# ---------------------------------------------------------------------------

def cmd_review(args) -> None:
    from .ui import ReviewSession, export_segment_wav, render_review_png

    cfg = _load_config(args)
    pm = _manager(cfg)
    proj = _active_project(pm, args.project)
    session = ReviewSession(proj, pm.projects_folder, cfg)

    if args.action == "list":
        df = session.df
        for i in range(len(df)):
            r = df.iloc[i]
            # float-formatted strings ('1.0') from Excel/pandas round
            # trips crash int(); coerce leniently like stats() does
            # (review r3 batch 10)
            try:
                erased = float(r.get("erase", 0) or 0) == 1.0
            except (TypeError, ValueError):
                erased = False
            mark = "E" if erased else (
                "K" if str(r.get("review_datetime", "")).strip() else "."
            )
            print(
                f"{i:5d} [{mark}] #{r['ID']} {r['file_name']} "
                f"{float(r['start_time']):9.3f}–{float(r['end_time']):9.3f} "
                f"{r.get('user_comment', '')}"
            )
        print(json.dumps(session.stats()))
    elif args.action in ("keep", "erase"):
        for i in args.rows:
            getattr(session, args.action)(index=i, persist=False)
        session.save()
        print(json.dumps(session.stats()))
    elif args.action == "add":
        if not args.file or args.start is None or args.end is None:
            raise SystemExit(
                "review add: --file, --start and --end are all required"
            )
        pos = session.add(
            os.path.dirname(os.path.abspath(args.file)),
            os.path.basename(args.file),
            args.start,
            args.end,
        )
        print(f"inserted at row {pos}" if pos is not None else "rejected (end ≤ start)")
    elif args.action == "delete":
        session.delete(args.rows)
        print(json.dumps(session.stats()))
    elif args.action == "export":
        session.save()  # persists review.csv + all three exporters
        print(f"review saved + exports re-run under {pm.projects_folder}")
    elif args.action == "grade":
        _grade_loop(session, args)
    elif args.action == "render":
        r = session.df.iloc[args.row]
        full = os.path.join(r["file_path"], r["file_name"])
        others = [
            (float(q["start_time"]), float(q["end_time"]))
            for _, q in session.df[session.df["file_name"] == r["file_name"]].iterrows()
        ]
        png = render_review_png(
            full, float(r["start_time"]), float(r["end_time"]), others,
            zoom_level=args.zoom, config=cfg,
        )
        out = args.out or f"detection_{int(r['ID'])}.png"
        with open(out, "wb") as f:
            f.write(png)
        print(out)
    elif args.action == "segment":
        r = session.df.iloc[args.row]
        full = os.path.join(r["file_path"], r["file_name"])
        out = export_segment_wav(
            full, (float(r["start_time"]), float(r["end_time"])), args.out, cfg
        )
        print(out)


def _grade_loop(session, args) -> None:
    """Interactive terminal grading: the review screen's Keep/Erase flow
    (review_detections.py:677-717) over stdin.  [k]eep [e]rase [s]kip
    [p]lay [r]ender [b]ack [q]uit."""
    import os as _os

    from .ui import export_segment_wav, play_segment, render_review_png

    while session.current() is not None:
        row = session.current()
        total = len(session)
        reviewed = "✓" if str(row.get("review_datetime", "")).strip() else " "
        print(
            f"\n[{session.current_index + 1}/{total}]{reviewed} #{row['ID']} "
            f"{row['file_name']}  {float(row['start_time']):.3f}–"
            f"{float(row['end_time']):.3f}s  erase={row['erase']}"
        )
        try:
            cmd = input("  [k]eep [e]rase [s]kip [p]lay [r]ender [b]ack [q]uit > ").strip().lower()
        except EOFError:
            break
        full = _os.path.join(row["file_path"], row["file_name"])
        idx_before = session.current_index
        if cmd == "k":
            session.keep()
        elif cmd == "e":
            session.erase()
        elif cmd == "s":
            session.next()
        elif cmd == "b":
            session.prev()
        elif cmd == "p":
            seg = (max(0.0, float(row["start_time"])), float(row["end_time"]))
            # session.cfg carries the CLI --config; the defaults here would
            # silently diverge from `review render/segment` output for the
            # same row (review r3 batch 10)
            if not play_segment(full, seg, config=session.cfg):
                out = export_segment_wav(full, seg, config=session.cfg)
                print(f"  (no audio device; segment written to {out})")
        elif cmd == "r":
            png = render_review_png(
                full, float(row["start_time"]), float(row["end_time"]),
                zoom_level=args.zoom, config=session.cfg,
            )
            out = f"detection_{int(row['ID'])}.png"
            with open(out, "wb") as f:
                f.write(png)
            print(f"  rendered {out}")
        elif cmd == "q":
            break
        # done only when the LAST row itself was just graded/skipped
        # (advancing TO the last row must still display it)
        if idx_before >= total - 1 and cmd in ("k", "e", "s"):
            print("  (end of detections)")
            break
    print(json.dumps(session.stats()))


# ---------------------------------------------------------------------------
# silence
# ---------------------------------------------------------------------------

def cmd_silence(args) -> None:
    import pandas as pd

    from .silence import SilenceRunner, write_status_file

    cfg = _load_config(args)
    pm = _manager(cfg)
    proj = _active_project(pm, args.project)
    review_path = proj["review_file"]
    if not os.path.exists(review_path):
        sys.exit(f"error: no review file at {review_path}; run review first")
    df = pd.read_csv(review_path)

    runner = SilenceRunner(args.output_dir, fade_ms=args.fade_ms, subtype=args.subtype)
    report = runner.run(
        df,
        on_file_start=lambda f: print(f"→ {f}", flush=True),
        on_file_done=lambda f: print(f"   wrote {f}", flush=True),
    )
    if not report.stopped:
        write_status_file(proj, pm.project_output_dir(proj["name"]))
        pm.save_current_project()
    print(
        json.dumps(
            {
                "files_done": report.files_done,
                "files_failed": report.files_failed,
                "outputs": report.outputs,
                "errors": report.errors,
            },
            indent=2,
        )
    )


# ---------------------------------------------------------------------------
# convert-ckpt / bench
# ---------------------------------------------------------------------------

def cmd_convert_ckpt(args) -> None:
    from . import ckpt as ckpt_mod

    if args.out.endswith(".pth"):
        if args.src.endswith(".pth"):
            raise SystemExit("convert-ckpt: .pth → .pth makes no sense; "
                             "one side must be an orbax checkpoint")
        variables, epoch = ckpt_mod.load(args.src)
        ckpt_mod.export_pth(args.out, variables, epoch=epoch)
        print(f"exported {args.src} (epoch {epoch}) → {args.out} "
              "(reference-loadable torch format)")
        return
    variables, epoch = ckpt_mod.load_pth(args.src)
    ckpt_mod.save(args.out, variables, epoch)
    print(f"converted {args.src} (epoch {epoch}) → {args.out}")


def cmd_train(args) -> None:
    from .train import fit, fit_synthetic

    mesh = None
    if args.mesh:
        from .parallel import make_mesh

        import jax as _jax

        n = len(_jax.devices())
        seq = 2 if n % 2 == 0 and n > 1 else 1
        mesh = make_mesh(("data", "seq"), shape=(n // seq, seq))
    if args.synthetic:
        metrics = fit_synthetic(
            steps=args.steps,
            batch_size=args.batch_size,
            learning_rate=args.lr,
            ckpt_out=args.out,
            augmentations=args.augment,
            seed=args.seed,
            mesh=mesh,
            n_inner=args.n_inner,
            pool_speech=args.pool_size,
            pool_noise=args.pool_size,
            resume=args.resume,
            train_dtype=args.dtype,
            noise_extra_kinds=tuple(args.noise_extra or ()),
            noise_extra_frac=args.noise_extra_frac,
            noise_extra_policy=args.noise_extra_policy,
            noise_extra_snr_range=(args.noise_extra_snr_min,
                                   args.noise_extra_snr_max),
            noise_extra_silent_prob=args.noise_extra_silent_prob,
            boundary_weight=args.boundary_weight,
            snr_db_range=(args.snr_min, args.snr_max),
            stall_abort_s=args.stall_abort,
        )
    else:
        if not (args.speech_dir and args.noise_dir):
            raise SystemExit("train: need --speech-dir and --noise-dir "
                             "(or use --synthetic)")
        metrics = fit(
            args.speech_dir,
            args.noise_dir,
            steps=args.steps,
            batch_size=args.batch_size,
            learning_rate=args.lr,
            ckpt_out=args.out,
            augmentations=args.augment,
            seed=args.seed,
            mesh=mesh,
            resume=args.resume,
            train_dtype=args.dtype,
            boundary_weight=args.boundary_weight,
        )
    print(json.dumps(metrics))


def cmd_eval(args) -> None:
    from .engine import Detector
    from .train import evaluate as E

    if args.make_synthetic:
        labels = E.make_eval_set(
            args.make_synthetic, n_files=args.eval_files,
            seconds=args.eval_seconds, seed=args.seed,
            generator=args.generator,
            snr_db=(args.snr, args.snr) if args.snr is not None else None,
            degradations=args.degrade.split(",") if args.degrade else None,
        )
        print(f"synthesized eval set → {labels}", file=sys.stderr)
    else:
        labels = args.labels
    if not labels:
        raise SystemExit("eval: need --labels or --make-synthetic DIR")

    cfg = _load_config(args)  # applies --threshold/--break-duration too
    det = Detector(cfg, checkpoint_path=args.ckpt) if args.ckpt else Detector(cfg)
    result = E.evaluate_detector(det, E.load_labels(labels), iou=args.iou)
    print(json.dumps(result))


def cmd_gui(args) -> None:
    if args.smoke:
        os.environ.setdefault("SOFTSPOKEN_QT_SHIM", "1")
    from .ui import qt_app

    raise SystemExit(
        qt_app.main(_load_config(args), smoke_mode=args.smoke,
                    screenshot=args.screenshot)
    )


def cmd_bench(args) -> None:
    # an EXPLICIT --seconds wins over ambient BENCH_SECONDS; with no flag,
    # the env var (bench.py's own contract) still applies
    # (review r3 batch 10: setdefault silently discarded the flag)
    if args.seconds is not None:
        os.environ["BENCH_SECONDS"] = str(args.seconds)
    else:
        os.environ.setdefault("BENCH_SECONDS", "1800")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import bench

    bench.main()


def cmd_doctor(args) -> None:
    """Environment diagnosis: everything that has actually failed in the
    field, checked with bounded timeouts, one JSON report.

    The remote-TPU tunnel hangs indefinitely when degraded (backend init
    and even single transfers have sat >10 min), so every device probe runs
    on a watchdogged thread — `doctor` itself always returns.
    """
    import threading

    cfg = _load_config(args)
    report: dict = {}

    def bounded(name, fn, timeout):
        box = {}

        def work():
            try:
                box["value"] = fn()
            except Exception as e:  # noqa: BLE001 — diagnosis, not control
                box["error"] = f"{type(e).__name__}: {e}"

        th = threading.Thread(target=work, daemon=True)
        t0 = time.perf_counter()
        th.start()
        th.join(timeout)
        if th.is_alive():
            report[name] = {"status": "TIMEOUT", "after_s": round(timeout, 1)}
            return None
        dt = round(time.perf_counter() - t0, 2)
        if "error" in box:
            report[name] = {"status": "ERROR", "error": box["error"], "s": dt}
            return None
        report[name] = {"status": "ok", "s": dt, **(
            box["value"] if isinstance(box["value"], dict) else {"value": box["value"]}
        )}
        return box["value"]

    # host-side checks (no tunnel involved)
    from .io import native

    report["native_dsp"] = {
        "status": "ok" if native.native_available() else "MISSING (numpy fallbacks active)"}
    from .io import flac as _flac

    report["native_flac"] = {
        "status": "ok" if _flac._get_lib() is not None
        else "MISSING (FLAC undecodable)"}
    try:
        from .io import oggvorbis

        report["libvorbis"] = {
            "status": "ok" if oggvorbis.available() else "MISSING (OGG undecodable)"}
    except Exception as e:  # noqa: BLE001
        report["libvorbis"] = {"status": f"ERROR: {e}"}
    try:
        from .io import mp3 as _mp3

        report["libmpg123"] = {
            "status": "ok" if _mp3.available() else "MISSING (MP3 undecodable)"}
    except Exception as e:  # noqa: BLE001
        report["libmpg123"] = {"status": f"ERROR: {e}"}
    try:
        from .io import opus as _opus

        report["libopus"] = {
            "status": "ok" if _opus.available()
            else "MISSING (Ogg/Opus undecodable)"}
    except Exception as e:  # noqa: BLE001
        report["libopus"] = {"status": f"ERROR: {e}"}

    ckpt_path = os.path.join(cfg.paths.model_dir, cfg.paths.model_name)
    if os.path.exists(ckpt_path) or os.path.exists(ckpt_path + ".pth"):
        report["checkpoint"] = {"status": "ok", "path": ckpt_path}
    else:
        report["checkpoint"] = {
            "status": "MISSING (detect degrades to random init)", "path": ckpt_path}

    # device checks, each bounded
    def init_backend():
        import jax

        return {"backend": jax.default_backend(),
                "devices": [str(d) for d in jax.devices()]}

    if bounded("jax_backend", init_backend,
               float(args.device_timeout)) is not None:
        import jax
        import numpy as np_  # local alias: cli keeps numpy import lazy

        def link():
            blob = np_.zeros(4 * 1024 * 1024, np_.int8)
            t0 = time.perf_counter()
            dx = jax.device_put(blob)
            jax.device_get(dx[:: len(blob) // 16])
            up = len(blob) / (time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.device_get(jax.numpy.arange(4) + 1)
            rt = time.perf_counter() - t0
            return {"upload_mbps": round(up / 1e6, 1),
                    "roundtrip_ms": round(rt * 1e3, 1)}

        lk = bounded("device_link", link, float(args.device_timeout))
        # a reachable-but-crawling tunnel is the common failure mode here
        # (healthy: 36-132 MB/s up, ~70 ms RTT; observed degraded to
        # 0.1 MB/s / 750 ms) - don't call that "ok"
        if lk and (lk["upload_mbps"] < 5.0 or lk["roundtrip_ms"] > 300.0):
            report["device_link"]["status"] = (
                "DEGRADED (healthy: >30 MB/s up, <150 ms RTT; expect "
                "stalls and 10-100x slower e2e)")

        def tiny_forward():
            from . import ckpt as ckpt_mod
            from .engine import Detector

            det = Detector(cfg.with_engine(device_batch=4, chunk_seconds=10.0),
                           variables=ckpt_mod.fixture_variables(seed=0))
            import numpy as np2

            res = det.detect_waveform(np2.zeros(22050 * 4, np2.float32))
            return {"windows": res.num_windows}

        bounded("device_forward", tiny_forward, float(args.device_timeout))

    from .io.native import _cache_dir

    report["native_cache_dir"] = {"status": "ok", "path": _cache_dir()}
    bad = [k for k, v in report.items() if v.get("status") != "ok"]
    report["summary"] = ("all ok" if not bad
                         else "attention: " + ", ".join(sorted(bad)))
    print(json.dumps(report, indent=2))
    if any(isinstance(v, dict) and v.get("status") == "TIMEOUT"
           for v in report.values()):
        # a timed-out probe leaves a daemon thread stuck inside the JAX
        # runtime; normal interpreter teardown then aborts from C++
        # ("FATAL: exception not rethrown") AFTER the report prints.
        # The report is out and the process is disposable — skip teardown.
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)


# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="softspoken_tpu", description=__doc__)
    p.add_argument("--config", help="JSON config file overriding defaults")
    p.add_argument("--project-dir", help="projects root (default ./projects)")
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--log-json", action="store_true",
                   help="emit machine-parseable JSON-lines logs on stderr")
    sub = p.add_subparsers(dest="command", required=True)

    pp = sub.add_parser("project", help="manage projects")
    pp.add_argument("action", choices=["new", "list", "status", "add-files",
                                       "remove-files", "merge-detections"])
    pp.add_argument("name", nargs="?", help="project name")
    pp.add_argument("files", nargs="*", help="audio files (add/remove-files)")
    pp.set_defaults(func=cmd_project)

    pd_ = sub.add_parser("detect", help="run voice detection")
    pd_.add_argument("--project", help="project name (default: latest)")
    pd_.add_argument("--files", nargs="*", help="ad-hoc files instead of a project")
    pd_.add_argument("--out", help="detections CSV for ad-hoc mode")
    pd_.add_argument("--checkpoint", help="orbax dir or torch .pth")
    pd_.add_argument("--random-init", action="store_true",
                     help="use the deterministic random-init fixture weights")
    pd_.add_argument("--precision", choices=["fast", "parity"])
    pd_.add_argument("--device-batch", type=int)
    pd_.add_argument("--file-concurrency", type=int, metavar="K",
                     help="detect K files concurrently (results persist in "
                          "submission order; measured +6-13%% aggregate on "
                          "the remote chip at K=2). Default 1 = sequential")
    pd_.add_argument("--threshold", type=float,
                     help="score threshold (default: parity 0.1)")
    pd_.add_argument("--break-duration", type=float,
                     help="gap-merge seconds (parity default 0.5; 0.3 measured "
                          "best for event F1 — docs/QUALITY_r02.json)")
    pd_.add_argument("--exit-threshold", type=float,
                     help="hysteresis exit level (< --threshold): regions "
                          "still need a bin above the main threshold but "
                          "extend over bins above this (default: off)")
    pd_.add_argument("--grid-smooth", type=int,
                     help="odd median-smoothing width (bins) applied to the "
                          "averaged grid before thresholding (default: off; "
                          "gated on docs/QUALITY_r04.json)")
    pd_.add_argument("--music-filter", type=float, nargs="?", const=-1.0,
                     help="drop regions whose surrounding audio scores "
                          "rhythmic/music-like (engine/postfilter.py; "
                          "targets the measured house-music false-positive "
                          "class). Optional value = score threshold "
                          "(default 0.85); off when flag absent")
    pd_.add_argument("--streaming", action="store_true",
                     help="force bounded-memory streaming decode")
    pd_.add_argument("--mesh", action="store_true",
                     help="shard windows over all available devices")
    pd_.add_argument("--distributed", action="store_true",
                     help="multi-host: init jax.distributed and process this "
                          "host's round-robin share of the file list")
    pd_.add_argument("--coordinator", help="(--distributed) coordinator addr host:port")
    pd_.add_argument("--num-processes", type=int, help="(--distributed) process count")
    pd_.add_argument("--process-id", type=int, help="(--distributed) this process's id")
    pd_.add_argument("--strict-reference", action="store_true",
                     help="reprocess files already in the CSV (reference resume behavior)")
    pd_.add_argument("--chunk-checkpoint", type=int, metavar="N", default=None,
                     help="persist fused-pipeline progress every N chunks so a "
                          "killed run resumes mid-file (engine.journal); "
                          "sidecars live in .chunk_progress/ next to the CSV")
    pd_.set_defaults(func=cmd_detect)

    pr = sub.add_parser("review", help="review detections")
    pr.add_argument("action", choices=["list", "grade", "keep", "erase", "add",
                                        "delete", "export", "render", "segment"])
    pr.add_argument("--project")
    pr.add_argument("--rows", type=int, nargs="*", default=[], help="row indexes")
    pr.add_argument("--row", type=int, default=0, help="row index (render/segment)")
    pr.add_argument("--file", help="audio file (add)")
    pr.add_argument("--start", type=float)
    pr.add_argument("--end", type=float)
    pr.add_argument("--zoom", type=float, default=1.0, help="seconds per inch")
    pr.add_argument("--out", help="output path (render/segment)")
    pr.set_defaults(func=cmd_review)

    ps = sub.add_parser("silence", help="zero flagged intervals, write *_silenced.wav")
    ps.add_argument("--project")
    ps.add_argument("--output-dir", required=True)
    ps.add_argument("--fade-ms", type=float, default=0.0,
                    help="crossfade ramp (0 = reference hard zero)")
    ps.add_argument("--subtype", default="PCM_16",
                    help="output sample format (PCM_16 parity default)")
    ps.set_defaults(func=cmd_silence)

    pc = sub.add_parser(
        "convert-ckpt",
        help="torch .pth ↔ orbax (direction inferred from the paths)")
    pc.add_argument("src", help=".pth file or orbax checkpoint dir")
    pc.add_argument("out", help="orbax dir, or a .pth path to EXPORT to "
                                "(reference-loadable, torch-free writer)")
    pc.set_defaults(func=cmd_convert_ckpt)

    pb = sub.add_parser("bench", help="throughput benchmark")
    pb.add_argument("--seconds", type=float, default=None,
                    help="benchmark recording length (default 1800; an "
                         "explicit value overrides BENCH_SECONDS)")
    pb.set_defaults(func=cmd_bench)

    pg = sub.add_parser("gui", help="Qt desktop app (PySide6, or headless shim)")
    pg.add_argument("--smoke", action="store_true",
                    help="construct + click through every screen headlessly")
    pg.add_argument("--screenshot", help="(--smoke) save the review spectrogram PNG")
    pg.set_defaults(func=cmd_gui)

    pt = sub.add_parser("train", help="train SpecUNet_2D (WAV dirs or --synthetic)")
    pt.add_argument("--speech-dir", help="clean-speech WAVs (omit with --synthetic)")
    pt.add_argument("--noise-dir", help="environment WAVs (omit with --synthetic)")
    pt.add_argument("--synthetic", action="store_true",
                    help="train from the synthetic corpus with fully on-device "
                         "batch synthesis (train/synth.py + device_data.py)")
    pt.add_argument("--steps", type=int, default=1000)
    pt.add_argument("--batch-size", type=int, default=16)
    pt.add_argument("--n-inner", type=int, default=10,
                    help="(--synthetic) optimizer steps fused per device call")
    pt.add_argument("--pool-size", type=int, default=768,
                    help="(--synthetic) device-resident clips per pool")
    pt.add_argument("--lr", type=float, default=1e-3)
    pt.add_argument("--out", help="orbax checkpoint output dir")
    pt.add_argument("--seed", type=int, default=0)
    pt.add_argument("--augment", nargs="*", default=["add_reverb", "reduce_volume"])
    pt.add_argument("--mesh", action="store_true", help="dp×sp over all devices")
    pt.add_argument("--noise-extra", nargs="*", default=[],
                    choices=["music", "granular", "drone", "impact_chain",
                             "crackle"],
                    help="(--synthetic) opt-in confuser textures mixed into "
                         "the noise pool (synth.EXTRA_ENVIRONMENT_KINDS): "
                         "'music' targets the measured real-audio "
                         "false-positive class "
                         "(docs/QUALITY_r03_realaudio.json); the other four "
                         "are the third-family textures (train/synth3.py)")
    pt.add_argument("--snr-min", type=float, default=-5.0,
                    help="(--synthetic) training mix SNR floor in dB "
                         "(device_data.make_synth_batch_fn)")
    pt.add_argument("--snr-max", type=float, default=20.0)
    pt.add_argument("--noise-extra-frac", type=float, default=0.2,
                    help="fraction of the noise pool drawn from "
                         "--noise-extra kinds (default 0.2)")
    pt.add_argument("--noise-extra-policy", default="mixed",
                    choices=["mixed", "protected"],
                    help="'mixed' (default): extras behave like any other "
                         "noise clip. 'protected': extras appear as pure "
                         "negatives on silent rows and only at "
                         "--noise-extra-snr-min..max dB under speech, so "
                         "the marginal-SNR speech distribution stays "
                         "texture-free (the collateral signature of the "
                         "four round-4 fine-tunes, "
                         "docs/FT_SNRFLOOR_r04.json round5_reading)")
    pt.add_argument("--noise-extra-snr-min", type=float, default=10.0,
                    help="(protected policy) SNR floor in dB for extras "
                         "under speech")
    pt.add_argument("--noise-extra-snr-max", type=float, default=20.0)
    pt.add_argument("--noise-extra-silent-prob", type=float, default=0.5,
                    help="(protected policy) probability a silent row "
                         "draws its noise from the extras region")
    pt.add_argument("--boundary-weight", type=float, default=0.0,
                    help="extra BCE weight within ~47 ms of speech "
                         "onsets/offsets (mean-normalized; 0 = off). "
                         "Event-F1 lever, gate on the quality grid "
                         "before adoption")
    pt.add_argument("--stall-abort", type=float, default=900.0,
                    help="(--synthetic) abort with exit code 86 when no "
                         "training step completes for this many seconds — "
                         "a silently-dead remote-TPU session otherwise "
                         "hangs forever (checkpoints make retries cheap); "
                         "0 disables")
    pt.add_argument("--resume", metavar="CKPT",
                    help="warm-start params/batch_stats from an orbax checkpoint")
    pt.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="forward/backward compute dtype (params and optimizer "
                         "stay f32). bfloat16 measured 1.65x faster on v5e with "
                         "an equivalent 400-step loss trajectory "
                         "(docs/PROFILE_r03.md); default stays f32, the "
                         "committed checkpoint's lineage")
    pt.set_defaults(func=cmd_train)

    pe = sub.add_parser("eval", help="score detections vs labeled intervals (F1)")
    pe.add_argument("--labels", help="labels.csv (file,start_time,end_time)")
    pe.add_argument("--make-synthetic", metavar="DIR",
                    help="first synthesize a labeled eval set into DIR")
    pe.add_argument("--eval-files", type=int, default=8)
    pe.add_argument("--eval-seconds", type=float, default=120.0)
    pe.add_argument("--generator", choices=["v1", "v2"], default="v1",
                    help="v1 = training-family synth; v2 = independent "
                         "out-of-family generator (train/synth2.py)")
    pe.add_argument("--snr", type=float,
                    help="pin per-event SNR (dB); default 0-20 dB draws")
    pe.add_argument("--degrade",
                    help="comma list of degradations (train/degrade.py): "
                         "rolloff4k,clip,mulaw,hum,dropout")
    pe.add_argument("--ckpt", help="checkpoint (default: config model path)")
    pe.add_argument("--iou", type=float, default=0.5)
    pe.add_argument("--seed", type=int, default=1234)
    pe.add_argument("--exit-threshold", type=float,
                    help="hysteresis exit level (< --threshold); default off")
    pe.add_argument("--grid-smooth", type=int,
                    help="grid median-smoothing width (see detect)")
    pe.add_argument("--music-filter", type=float, nargs="?", const=-1.0,
                    help="music post-filter (see detect --music-filter)")
    pe.add_argument("--threshold", type=float,
                    help="score threshold (default: parity 0.1)")
    pe.add_argument("--break-duration", type=float,
                    help="gap-merge seconds (parity default 0.5; 0.3 measured "
                         "best for event F1 — docs/QUALITY_r02.json)")
    pe.set_defaults(func=cmd_eval)

    pdx = sub.add_parser(
        "doctor",
        help="environment diagnosis (backend, link, codecs, checkpoint) "
             "with bounded timeouts — always returns, even with the "
             "device tunnel hung")
    pdx.add_argument("--device-timeout", type=float, default=60.0,
                     help="seconds to wait on each device probe before "
                          "reporting TIMEOUT (default 60)")
    pdx.set_defaults(func=cmd_doctor)

    return p


def main(argv: Optional[List[str]] = None) -> None:
    # Honor JAX_PLATFORMS even when a sitecustomize-registered plugin
    # (e.g. a remote-attached TPU) initialized the backend registry before
    # this process's env var was consulted — observed: JAX_PLATFORMS=cpu
    # was silently ignored and CLI subprocesses dispatched to the remote
    # TPU anyway (hanging when the tunnel is unreachable).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    # the package's uniform formatter (+ optional JSON-lines ingestion
    # mode) — a bare basicConfig left utils.setup_logging unreachable from
    # the CLI (review r3 batch 10)
    from .utils import setup_logging

    setup_logging(level=logging.DEBUG if args.verbose else logging.INFO,
                  json_lines=args.log_json)
    args.func(args)


if __name__ == "__main__":
    main()
