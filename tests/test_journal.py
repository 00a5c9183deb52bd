"""Chunk-granular resume (VERDICT r2 next #5, SURVEY.md §5 failure/recovery).

A detection killed after N chunks must resume from the journal sidecar,
provably skipping the completed chunks, and produce BITWISE-identical
avg_values/intervals to an uninterrupted run (the resumed computation is the
same chunk programs with the same carry, so exact equality is the contract —
tolerances would mask stitching bugs the way fixture-uniform logits did in
round 1).
"""

import os

import numpy as np
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.engine.fused import get_fused_engine
from softspoken_tpu.io import wavio


def _make_wav(path: str, seconds: float = 30.0, sr: int = 22050) -> None:
    rng = np.random.default_rng(9)
    n = int(seconds * sr)
    audio = (0.02 * rng.standard_normal(n)).astype(np.float32)
    t = np.arange(n) / sr
    for a in (4.0, 11.0, 19.0, 26.0):
        m = (t >= a) & (t < a + 1.5)
        audio[m] += 0.4 * np.sin(2 * np.pi * 700 * t[m]).astype(np.float32)
    wavio.write(path, audio, sr, subtype="PCM_16")


def _cfg():
    return Config().with_engine(
        precision="parity", device_batch=8, chunk_seconds=6.0,
        chunk_checkpoint_every=1,
    )


class _KillAfter:
    """Wrap the engine's compiled fn; raise on the (n+1)-th call."""

    def __init__(self, fn, n: int):
        self.fn, self.n, self.calls = fn, n, 0

    def __call__(self, *args):
        if self.calls >= self.n:
            raise RuntimeError("simulated preemption")
        self.calls += 1
        return self.fn(*args)


@pytest.mark.slow
def test_kill_and_resume_skips_completed_chunks(tmp_path):
    wav = str(tmp_path / "long.wav")
    _make_wav(wav)
    jd = str(tmp_path / "progress")

    cfg = _cfg()
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))

    # uninterrupted baseline (no journal)
    baseline = det.detect_file_fused(wav)
    engine = get_fused_engine(det, 22050, "i16")
    n_chunks = -(-baseline.num_windows // engine.chunk_w)
    assert n_chunks >= 4, "test needs a multi-chunk file"

    # killed run: simulated preemption after 2 completed chunks
    killer = _KillAfter(engine._fn, 2)
    engine._fn = killer
    try:
        with pytest.raises(RuntimeError, match="simulated preemption"):
            det.detect_file_fused(wav, journal_dir=jd)
    finally:
        engine._fn = killer.fn
    sidecars = os.listdir(jd)
    assert len(sidecars) == 1 and sidecars[0].endswith(".chunks.npz")

    # resumed run: must execute ONLY the remaining chunks
    counter = _KillAfter(engine._fn, 10**9)
    engine._fn = counter
    try:
        resumed = det.detect_file_fused(wav, journal_dir=jd)
    finally:
        engine._fn = counter.fn
    assert counter.calls == n_chunks - 2, (
        f"resume ran {counter.calls} chunks, expected {n_chunks - 2}")

    np.testing.assert_array_equal(resumed.avg_values, baseline.avg_values)
    assert resumed.intervals == baseline.intervals
    assert resumed.num_windows == baseline.num_windows
    # journal cleared on success
    assert os.listdir(jd) == []


def test_stale_journal_is_discarded(tmp_path):
    wav = str(tmp_path / "long.wav")
    _make_wav(wav, seconds=20.0)
    jd = str(tmp_path / "progress")

    cfg = _cfg()
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    engine = get_fused_engine(det, 22050, "i16")

    killer = _KillAfter(engine._fn, 1)
    engine._fn = killer
    try:
        with pytest.raises(RuntimeError):
            det.detect_file_fused(wav, journal_dir=jd)
    finally:
        engine._fn = killer.fn
    assert len(os.listdir(jd)) == 1

    # the source file changes → the journal no longer applies
    with open(wav, "r+b") as f:
        f.seek(0, 2)
    os.utime(wav, ns=(os.stat(wav).st_atime_ns, os.stat(wav).st_mtime_ns + 7))

    counter = _KillAfter(engine._fn, 10**9)
    engine._fn = counter
    try:
        res = det.detect_file_fused(wav, journal_dir=jd)
    finally:
        engine._fn = counter.fn
    n_chunks = -(-res.num_windows // engine.chunk_w)
    assert counter.calls == n_chunks  # full re-run, nothing skipped
    assert os.listdir(jd) == []


def test_different_weights_invalidate_journal(tmp_path):
    wav = str(tmp_path / "w.wav")
    _make_wav(wav, seconds=20.0)
    jd = str(tmp_path / "progress")

    cfg = _cfg()
    det0 = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    e0 = get_fused_engine(det0, 22050, "i16")
    killer = _KillAfter(e0._fn, 1)
    e0._fn = killer
    try:
        with pytest.raises(RuntimeError):
            det0.detect_file_fused(wav, journal_dir=jd)
    finally:
        e0._fn = killer.fn

    det1 = Detector(cfg, variables=ckpt.fixture_variables(seed=3))
    e1 = get_fused_engine(det1, 22050, "i16")
    counter = _KillAfter(e1._fn, 10**9)
    e1._fn = counter
    try:
        res = det1.detect_file_fused(wav, journal_dir=jd)
    finally:
        e1._fn = counter.fn
    n_chunks = -(-res.num_windows // e1.chunk_w)
    assert counter.calls == n_chunks  # different weights → full re-run


def test_numerics_change_invalidates_journal(tmp_path):
    """The header pins every numerics-affecting knob: resuming a run under a
    different mel precision/kernel/upsample/codec would stitch grids from two
    different computations (review r3 finding)."""
    from softspoken_tpu.engine.fused import _make_journal

    wav = str(tmp_path / "w.wav")
    _make_wav(wav, seconds=6.0)
    jd = str(tmp_path / "progress")

    base = _cfg()
    det0 = Detector(base, variables=ckpt.fixture_variables(seed=0))
    h0 = _make_journal(det0, wav, jd).header

    for change in (dict(mel_precision="default"),
                   dict(mel_kernel="xla" if base.engine.mel_kernel != "xla"
                        else "fused"),
                   dict(decoder_upsample="phase"),
                   dict(upload_codec="mulaw8"),
                   dict(device_batch=16),
                   dict(chunk_seconds=12.0),
                   # a pad change shifts every window's audio by the pad
                   # delta while often leaving n_windows identical — it must
                   # invalidate the sidecar (review r3 finding)
                   dict(pad_seconds=2.9)):
        det = Detector(base.with_engine(**change),
                       variables=ckpt.fixture_variables(seed=0))
        h = _make_journal(det, wav, jd).header
        assert h != h0, f"header must change under {change}"


def test_orphan_tmp_files_are_swept(tmp_path):
    """Crash-stranded '<path>.tmp<pid>' files are removed on the next save
    or clear (review r3 batch 8)."""
    import numpy as np

    from softspoken_tpu.engine.journal import ChunkJournal

    p = str(tmp_path / "j.chunks.npz")
    (tmp_path / "j.chunks.npz.tmp99999").write_bytes(b"stranded")
    j = ChunkJournal(p, {"k": 1})
    j.save([np.ones(4, np.float32)], np.zeros(2, np.float32),
           np.zeros(2, np.float32))
    left = [f for f in os.listdir(tmp_path) if ".tmp" in f]
    assert left == []
    (tmp_path / "j.chunks.npz.tmp12345").write_bytes(b"stranded")
    j.clear()
    left = [f for f in os.listdir(tmp_path) if ".tmp" in f]
    assert left == [] and not os.path.exists(p)


def test_sweep_handles_glob_metachar_names_and_live_pids(tmp_path):
    """'take [1].wav'-style stems produce journal paths containing glob
    metacharacters — the sweep must still find orphan tmps — and a tmp
    owned by a LIVE pid (a concurrent save on the same file) must be left
    alone, not unlinked mid-replace (review r3 batch 17)."""
    import numpy as np

    from softspoken_tpu.engine.journal import ChunkJournal

    p = str(tmp_path / "take [1].abcd.chunks.npz")
    (tmp_path / "take [1].abcd.chunks.npz.tmp99999").write_bytes(b"dead")
    live = f"take [1].abcd.chunks.npz.tmp{os.getppid()}"
    (tmp_path / live).write_bytes(b"live")
    j = ChunkJournal(p, {"k": 1})
    j.save([np.ones(4, np.float32)], np.zeros(2, np.float32),
           np.zeros(2, np.float32))
    left = sorted(f for f in os.listdir(tmp_path) if ".tmp" in f)
    assert left == [live], left  # dead orphan swept, live writer preserved


def test_variables_digest_depends_on_dtype():
    """bf16-vs-f32 trees with equal values run different numerics; their
    journals must not be interchangeable (review r3 batch 17)."""
    import ml_dtypes
    import numpy as np

    from softspoken_tpu.engine.journal import variables_digest

    f32 = {"w": np.linspace(-1, 1, 32, dtype=np.float32)}
    bf16 = {"w": f32["w"].astype(ml_dtypes.bfloat16)}
    f64 = {"w": f32["w"].astype(np.float64) + 1e-12}
    assert variables_digest(f32) != variables_digest(bf16)
    assert variables_digest(f32) != variables_digest(f64)
    assert variables_digest(f32) == variables_digest(
        {"w": f32["w"].copy()})
