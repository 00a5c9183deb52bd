import os

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.io import wavio
from softspoken_tpu.project import DetectionStore
from softspoken_tpu.runtime import DetectRunner, RunCallbacks

CFG = Config().with_engine(precision="parity", device_batch=4, chunk_seconds=12.0)


@pytest.fixture(scope="module")
def detector():
    return Detector(CFG, variables=ckpt.fixture_variables(seed=0))


@pytest.fixture
def wavs(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    for i, secs in enumerate([4, 6]):
        p = str(tmp_path / f"rec{i}.wav")
        wavio.write(p, rng.uniform(-0.5, 0.5, 22050 * secs).astype(np.float32), 22050)
        paths.append(p)
    return paths


def test_detect_runner_end_to_end(tmp_path, detector, wavs):
    store = DetectionStore(str(tmp_path / "det.csv"))
    events = {"started": [], "done": [], "overall": [], "msgs": []}
    cb = RunCallbacks(
        file_started=events["started"].append,
        file_done=events["done"].append,
        overall_progress=events["overall"].append,
        message=events["msgs"].append,
    )
    runner = DetectRunner(detector, store, CFG)
    report = runner.run(wavs, cb)

    assert report.files_done == 2
    assert not report.errors
    assert events["started"] == wavs and events["done"] == wavs
    assert events["overall"][-1] == 100.0
    assert os.path.exists(store.path)
    df = pd.read_csv(store.path)
    assert set(df["file_name"]) <= {"rec0.wav", "rec1.wav"}
    assert report.rows_added == len(df)
    assert report.throughput["audio_seconds"] == pytest.approx(10.0)


def test_detect_runner_resume_skips(tmp_path, detector, wavs):
    store_path = str(tmp_path / "det.csv")
    store = DetectionStore(store_path)
    DetectRunner(detector, store, CFG).run([wavs[0]])
    n_rows = len(store.df)

    # second run over both files: file 0 must be skipped, no duplicates
    store2 = DetectionStore(store_path)
    report = DetectRunner(detector, store2, CFG).run(wavs)
    assert report.files_skipped == 1
    df = pd.read_csv(store_path)
    assert (df["file_name"] == "rec0.wav").sum() == (
        pd.read_csv(store_path).iloc[:n_rows]["file_name"] == "rec0.wav"
    ).sum()


def test_detect_runner_error_manifest(tmp_path, detector):
    bad = str(tmp_path / "corrupt.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFF0000WAVEnope")
    store = DetectionStore(str(tmp_path / "det.csv"))
    report = DetectRunner(detector, store, CFG).run([bad])
    assert bad in report.errors
    assert report.files_done == 0  # errored files are not completions


def test_detect_runner_strict_reference_mode(tmp_path, detector, wavs):
    """skip_processed_files=False reprocesses and appends duplicate rows —
    the reference's exact resume behavior (SURVEY.md §2.3)."""
    cfg = CFG.with_engine(skip_processed_files=False)
    store_path = str(tmp_path / "det.csv")
    DetectRunner(detector, DetectionStore(store_path), cfg).run([wavs[0]])
    n1 = len(pd.read_csv(store_path))
    DetectRunner(detector, DetectionStore(store_path), cfg).run([wavs[0]])
    n2 = len(pd.read_csv(store_path))
    assert n2 == 2 * n1


def test_stop_drains_producer_without_deadlock(tmp_path):
    """Regression (code review r2 pass 2): after a mid-run stop the decode
    prefetch thread must exit (it could block forever in q.put, pinning a
    decoded file in memory)."""
    import threading

    import numpy as np

    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.project.store import DetectionStore
    from softspoken_tpu.runtime.workers import DetectRunner, RunCallbacks
    from softspoken_tpu.io import wavio

    files = []
    for i in range(4):
        p = str(tmp_path / f"f{i}.wav")
        wavio.write(p, np.zeros(22050, np.float32), 22050, subtype="PCM_16")
        files.append(p)
    cfg = Config().with_engine(precision="parity", device_batch=4,
                               chunk_seconds=12.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    runner = DetectRunner(det, DetectionStore(str(tmp_path / "d.csv")), cfg,
                          streaming=False)

    def on_started(path):
        runner.stop()

    report = runner.run(files, RunCallbacks(file_started=on_started))
    assert report.stopped
    # no lingering producer thread blocked on the queue
    for t in threading.enumerate():
        assert not (t.daemon and t.is_alive() and "Thread-" in t.name
                    and getattr(t, "_target", None) is not None
                    and "producer" in repr(getattr(t, "_target", ""))), t


def test_producer_crash_cannot_hang_consumer(tmp_path, detector, wavs):
    """If the prefetch producer dies unexpectedly, the end-of-stream
    sentinel still arrives (finally) and run() returns instead of blocking
    forever in q.get() (review r3 finding).  A raising _use_streaming also
    degrades to the decode path rather than killing the thread."""
    store = DetectionStore(str(tmp_path / "det.csv"))
    runner = DetectRunner(detector, store, CFG)

    def boom(path):
        raise RuntimeError("backend probe exploded")

    runner._use_streaming = boom
    report = runner.run(wavs)          # completes via the decode fallback
    assert report.files_done == len(wavs)

    # and a producer body that raises outright still unblocks the consumer
    runner2 = DetectRunner(detector, DetectionStore(str(tmp_path / "d2.csv")),
                           CFG)
    runner2._decode = None             # TypeError inside the producer loop
    report2 = runner2.run([wavs[0]])   # must return, not hang
    assert report2.files_done == 0


def test_duplicate_paths_processed_once(tmp_path, detector, wavs):
    """A path listed twice must be processed once: the second pass would
    double-append rows and stall overall progress (review r3 batch 8)."""
    store = DetectionStore(str(tmp_path / "det.csv"))
    overall = []
    cb = RunCallbacks(overall_progress=overall.append)
    runner = DetectRunner(detector, store, CFG)
    report = runner.run([wavs[0], wavs[0], wavs[1]], cb)
    assert report.files_done == 2
    assert overall[-1] == 100.0
    n_rows_first = len(store.df)
    # re-run with duplicates again: skip-processed keeps it idempotent
    report2 = DetectRunner(detector, store, CFG).run([wavs[0], wavs[0]], cb)
    assert report2.files_skipped == 1 and len(store.df) == n_rows_first


def test_consumer_crash_unblocks_producer_and_finishes(tmp_path, detector, wavs):
    """If the CONSUMER side dies (e.g. store save on a full disk), the
    producer must not stay blocked in q.put and 'finished' must still fire
    (review r3 batch 8)."""
    import threading

    store = DetectionStore(str(tmp_path / "det.csv"))
    store.save = lambda: (_ for _ in ()).throw(OSError("disk full"))
    finished = []
    cb = RunCallbacks(finished=lambda: finished.append(True))
    runner = DetectRunner(detector, store, CFG)
    with pytest.raises(OSError):
        runner.run(wavs, cb)
    assert finished == [True]
    # the daemon producer exited rather than leaking blocked in q.put
    for t in threading.enumerate():
        assert not (t.daemon and t.is_alive() and "producer" in repr(t).lower())


def test_file_concurrency_matches_sequential(tmp_path, detector):
    """file_concurrency=2 must produce a byte-identical detections CSV to the
    sequential run: detections run on worker threads, persistence stays
    in submission order on the consumer thread."""
    rng = np.random.default_rng(3)
    paths = []
    for i, secs in enumerate([4, 5, 6, 4]):
        p = str(tmp_path / f"c{i}.wav")
        wavio.write(p, rng.uniform(-0.5, 0.5, 22050 * secs).astype(np.float32), 22050)
        paths.append(p)

    store_a = DetectionStore(str(tmp_path / "seq.csv"))
    rep_a = DetectRunner(detector, store_a, CFG, streaming=True).run(paths)
    assert not rep_a.errors and rep_a.files_done == 4

    cfg2 = CFG.with_engine(file_concurrency=2)
    det2 = Detector(cfg2, variables=ckpt.fixture_variables(seed=0))
    store_b = DetectionStore(str(tmp_path / "conc.csv"))
    rep_b = DetectRunner(det2, store_b, cfg2, streaming=True).run(paths)
    assert not rep_b.errors and rep_b.files_done == 4

    seq_bytes = open(store_a.path, "rb").read()
    conc_bytes = open(store_b.path, "rb").read()
    assert seq_bytes == conc_bytes


def test_file_concurrency_error_isolated(tmp_path, detector):
    """A corrupt file in a concurrent batch errors alone; the others persist."""
    rng = np.random.default_rng(4)
    good = []
    for i in range(2):
        p = str(tmp_path / f"g{i}.wav")
        wavio.write(p, rng.uniform(-0.5, 0.5, 22050 * 4).astype(np.float32), 22050)
        good.append(p)
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage")

    cfg2 = CFG.with_engine(file_concurrency=2)
    det2 = Detector(cfg2, variables=ckpt.fixture_variables(seed=0))
    store = DetectionStore(str(tmp_path / "det.csv"))
    rep = DetectRunner(det2, store, cfg2, streaming=True).run(
        [good[0], bad, good[1]])
    assert rep.files_done == 2
    assert bad in rep.errors


def test_file_concurrency_stop_settles_inflight(tmp_path, detector):
    """stop() during a concurrent run persists files already in flight and
    reports stopped; nothing deadlocks."""
    rng = np.random.default_rng(5)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"s{i}.wav")
        wavio.write(p, rng.uniform(-0.5, 0.5, 22050 * 4).astype(np.float32), 22050)
        paths.append(p)

    cfg2 = CFG.with_engine(file_concurrency=2)
    det2 = Detector(cfg2, variables=ckpt.fixture_variables(seed=0))
    store = DetectionStore(str(tmp_path / "det.csv"))
    runner = DetectRunner(det2, store, cfg2, streaming=True)

    n_done = []
    def on_done(path):
        n_done.append(path)
        runner.stop()  # stop as soon as the first file settles

    rep = runner.run(paths, RunCallbacks(file_done=on_done))
    assert rep.stopped
    # every file reported done was actually persisted
    df = pd.read_csv(store.path) if os.path.getsize(store.path) else None
    assert rep.files_done == len(n_done) >= 1


def test_file_concurrency_with_journal(tmp_path, detector):
    """Chunk journals are per-file sidecars; concurrent files must not
    collide, and completed runs clear their journals."""
    rng = np.random.default_rng(6)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"j{i}.wav")
        wavio.write(p, rng.uniform(-0.5, 0.5, 22050 * 30).astype(np.float32), 22050)
        paths.append(p)

    cfg2 = CFG.with_engine(file_concurrency=2, chunk_checkpoint_every=1)
    det2 = Detector(cfg2, variables=ckpt.fixture_variables(seed=0))
    store = DetectionStore(str(tmp_path / "det.csv"))
    rep = DetectRunner(det2, store, cfg2, streaming=True).run(paths)
    assert not rep.errors and rep.files_done == 3
    jdir = os.path.join(os.path.dirname(store.path), ".chunk_progress")
    # journals existed during the run but completed files clear them
    leftover = [f for f in os.listdir(jdir)] if os.path.isdir(jdir) else []
    assert leftover == []
