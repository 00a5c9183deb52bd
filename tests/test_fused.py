import numpy as np
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.engine.fused import detect_file_fused
from softspoken_tpu.io import wavio

CFG = Config().with_engine(
    precision="parity", device_batch=4, chunk_seconds=12.0, pipeline="host"
)


@pytest.fixture(scope="module")
def detector():
    return Detector(CFG, variables=ckpt.fixture_variables(seed=0))


def _wav(tmp_path, sr, seconds, subtype="PCM_16", channels=1, seed=0):
    rng = np.random.default_rng(seed)
    shape = (int(sr * seconds),) if channels == 1 else (int(sr * seconds), channels)
    x = rng.uniform(-0.5, 0.5, shape).astype(np.float32)
    p = str(tmp_path / f"f_{sr}_{subtype}_{channels}.wav")
    wavio.write(p, x, sr, subtype=subtype)
    return p


@pytest.mark.slow
def test_fused_matches_host_native_rate(tmp_path, detector):
    """At the internal rate there is no resampler, so fused == host exactly
    (same windows, same mel, same net)."""
    p = _wav(tmp_path, 22050, 30.0, subtype="PCM_16")
    host = detector.detect_file_streaming(p)
    fused = detect_file_fused(detector, p)
    assert fused.num_windows == host.num_windows
    assert len(fused.avg_values) == len(host.avg_values)
    # 2e-3: fused and host are different XLA programs; f32 conv reduction
    # orders differ and the BN'd U-Net amplifies that to ~1e-3 (float64
    # agreement is exact — see test_model.py comment)
    np.testing.assert_allclose(fused.avg_values, host.avg_values, atol=2e-3)
    assert fused.intervals == host.intervals


@pytest.mark.slow
def test_fused_matches_host_resampled(tmp_path, detector):
    """With resampling the pad-join numerics differ inside a filter length
    of ±3 s (documented); intervals and interior grid bins must agree."""
    p = _wav(tmp_path, 32000, 35.0, subtype="PCM_16", seed=3)
    host = detector.detect_file_streaming(p)
    fused = detect_file_fused(detector, p)
    assert fused.num_windows == host.num_windows
    assert len(fused.avg_values) == len(host.avg_values)
    # compare away from the pad joins: ±3 s ≈ bins 256 each side
    interior = slice(300, len(host.avg_values) - 300)
    np.testing.assert_allclose(
        fused.avg_values[interior], host.avg_values[interior], atol=1e-3
    )
    # intervals agree to a bin or two at the pad joins
    assert len(fused.intervals) == len(host.intervals)
    for (fs, fe), (hs, he) in zip(fused.intervals, host.intervals):
        assert abs(fs - hs) < 0.05 and abs(fe - he) < 0.05


@pytest.mark.parametrize("sr", [44100, 48000, 16000])
@pytest.mark.slow
def test_fused_other_rates(tmp_path, detector, sr):
    """Ratios with small `down` (44.1k: up=1,down=2) need the multi-copy
    block assembly; upsampling (16k) exercises up>down."""
    p = _wav(tmp_path, sr, 15.0, subtype="PCM_16", seed=sr)
    host = detector.detect_file_streaming(p)
    fused = detect_file_fused(detector, p)
    assert fused.num_windows == host.num_windows
    interior = slice(300, len(host.avg_values) - 300)
    np.testing.assert_allclose(
        fused.avg_values[interior], host.avg_values[interior], atol=2e-3
    )


def test_fused_subwindow_file(tmp_path, detector):
    p = _wav(tmp_path, 22050, 0.5, subtype="PCM_16", seed=1)
    host = detector.detect_file_streaming(p)
    fused = detect_file_fused(detector, p)
    assert fused.num_windows == host.num_windows == 6
    np.testing.assert_allclose(fused.avg_values, host.avg_values, atol=2e-3)


@pytest.mark.slow
def test_fused_stereo_float_fallback(tmp_path, detector):
    p = _wav(tmp_path, 32000, 20.0, subtype="FLOAT", channels=2, seed=5)
    host = detector.detect_file_streaming(p)
    fused = detect_file_fused(detector, p)
    assert fused.num_windows == host.num_windows
    assert len(fused.intervals) == len(host.intervals)


@pytest.mark.slow
def test_fused_multi_chunk_carry(tmp_path, detector):
    """Chunk carries: a file spanning several chunks must match a config
    with one giant chunk (chunking independence through the carry)."""
    p = _wav(tmp_path, 22050, 40.0, seed=7)
    small = detect_file_fused(detector, p)

    big_det = Detector(
        Config().with_engine(precision="parity", device_batch=4,
                             chunk_seconds=60.0, pipeline="host"),
        variables=ckpt.fixture_variables(seed=0),
    )
    big = detect_file_fused(big_det, p)
    assert small.num_windows == big.num_windows
    # different chunk shapes = different compiled programs → f32 reduction
    # order differs (see tolerance note above)
    np.testing.assert_allclose(small.avg_values, big.avg_values, atol=2e-3)
    assert small.intervals == big.intervals


def test_engine_cache_is_per_detector_and_weak(tmp_path):
    """VERDICT r1: _ENGINES must never hand a new Detector a stale engine
    bound to a GC'd one, and must not grow unboundedly."""
    import gc
    import weakref

    from softspoken_tpu.engine import fused as F

    p = _wav(tmp_path, 22050, 2.0, subtype="PCM_16", seed=9)

    d1 = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    r1 = detect_file_fused(d1, p)
    e1 = list(F._ENGINES[d1].values())[0]
    ref = weakref.ref(d1)
    del d1
    gc.collect()
    assert ref() is None, "detector must be collectable despite the cache"

    d2 = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    r2 = detect_file_fused(d2, p)
    e2 = list(F._ENGINES[d2].values())[0]
    assert e2 is not e1, "new detector must get a fresh engine"
    assert e2.det is d2
    np.testing.assert_allclose(r1.avg_values, r2.avg_values, atol=2e-3)


def test_min_count_masks_low_coverage_bins(tmp_path):
    """min_count wiring (NNDetector.py:153): bins covered by fewer than
    min_count windows are excluded from regions in both pipelines."""
    p = _wav(tmp_path, 22050, 6.0, subtype="PCM_16", seed=11)
    base = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    strict = Detector(CFG.with_engine(min_count=5),
                      variables=ckpt.fixture_variables(seed=0))

    h_base = base.detect_file_streaming(p)
    h_strict = strict.detect_file_streaming(p)
    f_strict = detect_file_fused(strict, p)

    # masked bins are -inf; the grids must agree between pipelines on which
    # bins survive, and every surviving interval of the strict run is inside
    # some interval of the base run
    assert np.isneginf(h_strict.avg_values).any()
    np.testing.assert_array_equal(
        np.isneginf(h_strict.avg_values), np.isneginf(f_strict.avg_values)
    )
    assert f_strict.intervals == h_strict.intervals
    for s, e in h_strict.intervals:
        assert any(bs - 1e-9 <= s and e <= be + 1e-9
                   for bs, be in h_base.intervals)


def test_device_only_rate_positive(tmp_path):
    """The bench's device-only measurement runs the chunk program with
    resident inputs and returns a sane rate."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import get_fused_engine

    cfg = Config().with_engine(device_batch=8, chunk_seconds=12.0)
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    eng = get_fused_engine(det, 22050, "i16")
    rate = eng.device_only_rate(repeats=2)
    assert rate > 0


@pytest.mark.slow
def test_fused_chunking_invariant_nondefault_step(tmp_path):
    """Regression (code review r2): prepare() computed the chunk
    finalization boundary with the default 0.6 s step, corrupting the grid
    for any other step_seconds on multi-chunk files."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(11)
    audio = (0.3 * rng.standard_normal(20 * 22050)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    wavio.write(p, audio, 22050, subtype="PCM_16")

    def run(chunk_seconds):
        det = Detector(
            Config().with_engine(precision="parity", device_batch=4,
                                 chunk_seconds=chunk_seconds,
                                 step_seconds=0.3),
            variables=ckpt.fixture_variables(seed=0),
        )
        return det.detect_file_fused(p)

    multi = run(6.0)     # several chunks
    single = run(120.0)  # one chunk
    np.testing.assert_allclose(multi.avg_values, single.avg_values, atol=1e-5)
    assert multi.intervals == single.intervals


@pytest.mark.slow
def test_fused_exact_multiple_chunks_returns_full_grid(tmp_path):
    """Regression (code review r2 pass 2): when n_windows is an exact
    multiple of chunk_w, the final chunk was treated as non-final and the
    last ~(256 − stride) grid bins stayed in the device carry, truncating
    avg_values by ~2.4 s."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.io import wavio

    # chunk_w = 20 at (chunk_seconds=12, step 0.6); 21.0 s of audio makes
    # n_windows exactly 40 = 2 chunks
    rng = np.random.default_rng(8)
    audio = (0.3 * rng.standard_normal(int(21.0 * 22050))).astype(np.float32)
    p = str(tmp_path / "exact.wav")
    wavio.write(p, audio, 22050, subtype="PCM_16")

    def run(cs):
        det = Detector(
            Config().with_engine(precision="parity", device_batch=4,
                                 chunk_seconds=cs),
            variables=ckpt.fixture_variables(seed=0),
        )
        return det.detect_file_fused(p)

    multi = run(12.0)
    single = run(120.0)
    assert multi.num_windows % 20 == 0, "fixture must hit the exact-multiple case"
    assert len(multi.avg_values) == len(single.avg_values)
    np.testing.assert_allclose(multi.avg_values, single.avg_values, atol=1e-5)
    assert multi.intervals == single.intervals


@pytest.mark.slow
@pytest.mark.parametrize("seconds,residue", [(21.3, 1), (20.1, 19)])
def test_fused_boundary_window_residues(tmp_path, seconds, residue):
    """Chunking invariance at the sharpest boundary residues: a final chunk
    holding exactly ONE window (n % chunk_w == 1) or missing exactly one
    (n % chunk_w == chunk_w-1).  Complements the exact-multiple regression
    above — every carry/clamp bug so far lived at one of these edges.

    chunk_w = 20 at (chunk_seconds=12, step 0.6): n = ceil((round(dur*22050)
    + 66150)/13230) gives 41 windows at 21.3 s and 39 at 20.1 s.
    """
    rng = np.random.default_rng(int(seconds * 10))
    audio = (0.3 * rng.standard_normal(int(seconds * 22050))).astype(np.float32)
    p = str(tmp_path / f"res{residue}.wav")
    wavio.write(p, audio, 22050, subtype="PCM_16")

    def run(cs):
        det = Detector(
            Config().with_engine(precision="parity", device_batch=4,
                                 chunk_seconds=cs),
            variables=ckpt.fixture_variables(seed=0),
        )
        return det.detect_file_fused(p)

    multi = run(12.0)
    single = run(120.0)
    assert multi.num_windows % 20 == residue, "fixture must hit the residue"
    assert len(multi.avg_values) == len(single.avg_values)
    np.testing.assert_allclose(multi.avg_values, single.avg_values, atol=1e-5)
    assert multi.intervals == single.intervals


def test_fused_respects_pad_seconds_override(tmp_path):
    """The fused pipeline's virtual pad must come from cfg.engine.pad_seconds
    — it was hardcoded to 3 s while the final shift used the config value,
    offsetting every interval under an override (review r3 finding)."""
    cfg = Config().with_engine(
        precision="parity", device_batch=4, chunk_seconds=12.0,
        pad_seconds=1.0,
    )
    det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    p = _wav(tmp_path, 22050, 20.0, subtype="PCM_16", seed=4)
    host = det.detect_waveform(wavio.read(p)[0])
    fused = detect_file_fused(det, p)
    assert fused.num_windows == host.num_windows
    np.testing.assert_allclose(fused.avg_values, host.avg_values, atol=2e-3)
    assert fused.intervals == host.intervals


def test_grid_covers_final_chunk_carry_slice():
    """glen must bound fin+CARRY for the FINAL chunk too (fin finalizes
    through last-window-bin+256); a clamped carry slice start silently
    reads the wrong bins (review r3 batch 11)."""
    from softspoken_tpu.engine import regions as R
    from softspoken_tpu.engine.fused import CARRY, FusedStreamingEngine

    det = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    eng = FusedStreamingEngine(det, 32000, "i16")
    step = CFG.engine.step_seconds
    final_fin = int(round((eng.chunk_w - 1) * step / R.TIME_RESOLUTION)) + 256
    assert final_fin + CARRY <= eng.glen


def test_fused_grid_smooth_config(tmp_path):
    """grid_smooth applies identically on the fused path: intervals equal
    the host-side smoothed regionization of the fused avg grid, and the
    stored grid itself is untouched."""
    from softspoken_tpu.engine import regions as R

    p = _wav(tmp_path, 22050, 8.0, seed=5)
    base_det = Detector(CFG, variables=ckpt.fixture_variables(seed=0))
    base = detect_file_fused(base_det, p)
    det5 = Detector(CFG.with_engine(grid_smooth=5),
                    variables=ckpt.fixture_variables(seed=0))
    res5 = detect_file_fused(det5, p)
    np.testing.assert_allclose(res5.avg_values, base.avg_values, atol=1e-6)
    want = R.shift_regions(
        R.find_speech_regions(base.avg_values, 0.1, 0.5, smooth_bins=5),
        -3.0)
    assert res5.intervals == want
