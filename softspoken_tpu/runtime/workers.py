"""Detection run orchestration (GUI-decoupled).

Plays the role of the reference's Qt worker thread (``worker.py:21-139``) and
the Voice Detector screen's progress plumbing, redesigned as a plain runner
with callbacks:

  * per-file: decode → detect → append rows → **save CSV (checkpoint)** —
    the per-file save is the reference's resume mechanism (worker.py:127-128)
  * progress events: file_started / file_progress / file_done / overall /
    finished (mirrors WorkerSignals, worker.py:4-10)
  * cooperative stop between files (the per-file device run completes;
    chunk-level interruption is not attempted)
  * decode failures are recorded in an error manifest and skipped
    (reference prints-and-skips — voice_activity.py:39-41)
  * idempotent re-runs: files already present in the detections CSV are
    skipped when cfg.engine.skip_processed_files (fixes SURVEY.md §2.3's
    duplicate-rows-on-resume quirk; disable for strict reference behavior)
  * host decode of file i+1 overlaps device compute of file i via a
    one-deep prefetch thread — the TPU never waits on WAV decode.
  * optional file-level concurrency (cfg.engine.file_concurrency > 1):
    detections for K files run on worker threads, results persist strictly
    in submission order (CSV byte-identical to sequential), and the store
    stays single-writer.  In this mode per-file progress/message callbacks
    may fire from worker threads and interleave across files — callbacks
    must be thread-safe (the CLI's printing and the Qt shim's queued
    signals are).
"""

from __future__ import annotations

import logging
import os
import threading
from dataclasses import dataclass, field
from queue import Empty, Queue
from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from ..config import Config, DEFAULT_CONFIG
from ..engine import Detector
from ..io import load_audio
from ..project.store import DetectionStore
from .metrics import StageTimers, ThroughputMeter

log = logging.getLogger(__name__)


@dataclass
class RunCallbacks:
    file_started: Optional[Callable[[str], None]] = None
    file_progress: Optional[Callable[[float], None]] = None   # 0..100
    file_done: Optional[Callable[[str], None]] = None
    overall_progress: Optional[Callable[[float], None]] = None
    message: Optional[Callable[[str], None]] = None
    finished: Optional[Callable[[], None]] = None

    def emit(self, name: str, *args) -> None:
        cb = getattr(self, name)
        if cb is not None:
            cb(*args)


@dataclass
class RunReport:
    files_done: int = 0      # successful completions only
    files_skipped: int = 0
    rows_added: int = 0
    errors: Dict[str, str] = field(default_factory=dict)
    stopped: bool = False
    throughput: Dict[str, float] = field(default_factory=dict)
    timers: Dict[str, float] = field(default_factory=dict)


class DetectRunner:
    """Run detection over a list of files into a DetectionStore."""

    def __init__(
        self,
        detector: Detector,
        store: DetectionStore,
        config: Config = DEFAULT_CONFIG,
        streaming: Optional[bool] = None,
    ):
        self.detector = detector
        self.store = store
        self.cfg = config
        self.streaming = streaming  # None → auto by file size
        self._stop = threading.Event()
        self.meter = ThroughputMeter()
        self.timers = StageTimers()

    def stop(self) -> None:
        self._stop.set()

    # ------------------------------------------------------------------
    def _decode(self, path: str):
        with self.timers.time("decode"):
            audio, _ = load_audio(path, target_sr=self.cfg.dsp.sample_rate)
        return audio

    def _use_streaming(self, path: str) -> bool:
        if self.streaming is not None:
            return self.streaming
        # on TPU the fused streaming pipeline wins at every file size (raw
        # PCM up, grids down); on hosts, stream only when the file is too
        # big to decode comfortably in memory
        import jax

        pipeline = self.cfg.engine.pipeline
        if pipeline == "fused" or (
            pipeline == "auto" and jax.default_backend() == "tpu"
        ):
            return True
        try:
            return os.path.getsize(path) > (1 << 30)
        except OSError:
            return False

    def run(
        self, files: Iterable[str], callbacks: Optional[RunCallbacks] = None
    ) -> RunReport:
        cb = callbacks or RunCallbacks()
        report = RunReport()
        # dedupe while preserving order: a path listed twice would double-
        # append rows (bypassing skip_processed_files, whose snapshot
        # predates the run) and stall overall_progress short of 100%
        # because errors are keyed by path (review r3 batch 8)
        files = list(dict.fromkeys(files))
        total = len(files)
        # per-chip throughput must know the mesh width when the detector is
        # mesh-bound (parallel/mesh.py sets _fused_mesh); otherwise the
        # "per_chip" number silently equals the aggregate (review r3 batch 8)
        mesh = getattr(self.detector, "_fused_mesh", None)
        self.meter.n_chips = int(mesh.size) if mesh is not None else 1
        self.meter.reset()

        skip_done = self.cfg.engine.skip_processed_files
        already = self.store.processed_files() if skip_done else set()

        # one-deep decode prefetch: host IO overlaps device compute
        q: Queue = Queue(maxsize=1)

        def producer():
            # the sentinel lives in a finally: if ANYTHING in the loop
            # raises outside the guarded decode (path probing, backend
            # checks), the consumer must still unblock instead of hanging
            # forever in q.get() (review r3 finding)
            try:
                for path in files:
                    if self._stop.is_set():
                        break
                    if path in already:
                        q.put((path, "skip"))
                        continue
                    try:
                        streaming = self._use_streaming(path)
                    except Exception:  # noqa: BLE001
                        streaming = False
                    if streaming:
                        q.put((path, "stream"))
                        continue
                    try:
                        audio = self._decode(path)
                    except Exception as e:  # noqa: BLE001
                        q.put((path, ("error", str(e))))
                        continue
                    if audio is None:
                        q.put((path, ("error", "decode failed")))
                    else:
                        q.put((path, audio))
            finally:
                q.put((None, None))

        t = threading.Thread(target=producer, daemon=True)
        t.start()

        # chunk-granular resume: journal sidecars live next to the
        # detections CSV; a killed run restarts mid-file (SURVEY §5)
        journal_dir = (
            os.path.join(
                os.path.dirname(os.path.abspath(self.store.path)),
                ".chunk_progress",
            )
            if self.cfg.engine.chunk_checkpoint_every > 0
            else None
        )

        try:
            self._consume(q, t, cb, report, total, journal_dir)
        finally:
            # symmetric to the producer's finally-sentinel: if the CONSUMER
            # side dies (store save on a full disk, a user callback raising),
            # the producer must not stay blocked in q.put with a decoded
            # file pinned for process lifetime, and 'finished' must still
            # fire so a GUI waiting on it cannot hang (review r3 batch 8)
            self._stop.set()
            while t.is_alive():
                try:
                    q.get(timeout=0.1)
                except Empty:
                    pass
            report.throughput = self.meter.summary()
            report.timers = self.timers.summary()
            cb.emit("finished")
        return report

    def _consume(self, q, t, cb, report, total, journal_dir) -> None:
        # opt-in file-level concurrency (engine.file_concurrency > 1):
        # detections for up to K files run on worker threads while THIS
        # thread persists results strictly in submission order — the CSV
        # keeps the sequential run's exact row order and the store stays
        # single-writer.  Why it helps on the remote chip: each chunk's
        # upload serializes with its own dependent compute on the tunnel
        # (docs/PROFILE_r03.md session-4), but another file's independent
        # uploads/computes interleave into those gaps — measured +6–13%
        # aggregate on two concurrent 1800 s files.  Per-file progress
        # callbacks interleave across files in this mode.
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        k = max(1, int(getattr(self.cfg.engine, "file_concurrency", 1)))
        pending: "deque" = deque()   # (path, future) in submission order

        def detect_task(path, payload):
            progress = lambda frac: cb.emit("file_progress", frac * 100.0)  # noqa: E731

            def run_detection():
                with self.timers.time("detect"):
                    if isinstance(payload, str) and payload == "stream":
                        return self.detector.detect_file_streaming(
                            path, progress, journal_dir)
                    return self.detector.detect_waveform(payload, progress)

            try:
                return run_detection()
            except IOError:
                raise
            except Exception as e:  # noqa: BLE001 — transient device or
                # tunnel faults get exactly one retry (preemption story)
                cb.emit("message", f"retrying {path} after: {e}")
                return run_detection()

        def settle(path, fut):
            """Persist one finished detection (consumer thread only)."""
            try:
                result = fut.result()
            except Exception as e:  # noqa: BLE001
                report.errors[path] = str(e)
                cb.emit("message", f"detection failed for {path}: {e}")
                self._advance_overall(cb, report, total)
                return
            with self.timers.time("persist"):
                report.rows_added += self.store.append_intervals(path, result.intervals)
                self.store.save()  # per-file checkpoint (worker.py:128)
                self.store.mark_processed(path)  # zero-detection files too
            self.meter.add_audio(result.audio_seconds)
            report.files_done += 1
            cb.emit("file_done", path)
            cb.emit(
                "message",
                f"{path}: {len(result.intervals)} region(s); "
                f"{self.meter.audio_sec_per_wall_sec:.1f} audio-sec/sec",
            )
            self._advance_overall(cb, report, total)

        with ThreadPoolExecutor(max_workers=k) as pool:
            while True:
                path, payload = q.get()
                if path is None:
                    # a stop that landed before (or between) items still ends
                    # the run via the producer's early sentinel — report it
                    if self._stop.is_set():
                        report.stopped = True
                    break
                if self._stop.is_set():
                    report.stopped = True
                    # the run() finally drains the queue until the producer
                    # exits, unblocking a q.put holding a decoded file. Note:
                    # an in-flight _decode cannot be interrupted, so stop()
                    # may take up to one large-file decode to return; drained
                    # prefetched items were never processed and don't count.
                    break
                if isinstance(payload, str) and payload == "skip":
                    report.files_skipped += 1
                    cb.emit("message", f"skipping already-processed {path}")
                    self._advance_overall(cb, report, total)
                    continue
                if isinstance(payload, tuple) and payload[0] == "error":
                    report.errors[path] = payload[1]
                    cb.emit("message", f"decode failed for {path}: {payload[1]}")
                    self._advance_overall(cb, report, total)
                    continue

                cb.emit("file_started", path)
                pending.append((path, pool.submit(detect_task, path, payload)))
                while len(pending) >= k:
                    settle(*pending.popleft())
            while pending:
                settle(*pending.popleft())

    def _advance_overall(self, cb: RunCallbacks, report: RunReport, total: int) -> None:
        # progress advances for every file leaving the queue (done, skipped,
        # or errored); files_done itself counts only successful completions
        advanced = report.files_done + report.files_skipped + len(report.errors)
        cb.emit("overall_progress", advanced / max(1, total) * 100.0)
