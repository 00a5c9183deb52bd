import numpy as np
import pytest

import np_ref
from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import (
    Detector,
    average_grid_host,
    find_speech_regions,
    num_windows_for_duration,
    num_windows_for_padded_length,
    plan_detection_job,
    shift_regions,
    window_starts,
)

# small chunk/batch so CPU tests are fast and exercise chunking/ragged tails
TEST_CFG = Config().with_engine(
    precision="parity", device_batch=4, chunk_seconds=12.0
)


@pytest.fixture(scope="module")
def detector():
    return Detector(TEST_CFG, variables=ckpt.fixture_variables(seed=0))


def test_planner_formulas():
    cfg = Config()
    # 60 s file: L = 60*22050 + 2*66150 = 1455300; ceil((L-66150)/13230) = 105
    assert num_windows_for_duration(60.0, cfg) == 105
    assert num_windows_for_padded_length(1455300, cfg) == 105
    s = window_starts(3, cfg)
    np.testing.assert_array_equal(s, [0, 13230, 26460])


def test_plan_detection_job(tmp_path):
    from softspoken_tpu.io import wavio

    p = str(tmp_path / "x.wav")
    wavio.write(p, np.zeros(22050 * 10, np.float32), 22050)
    plan = plan_detection_job([p], Config())
    assert len(plan[p]) == num_windows_for_duration(10.0, Config())


def test_average_grid_matches_reference_loop():
    rng = np.random.default_rng(0)
    logits = rng.normal(0, 0.5, size=(23, 256)).astype(np.float32)
    audio_len_padded_s = ((22 * 13230) + 66150) / 22050

    ref = np_ref.average_overlapping_reference(logits, audio_len_padded_s)
    s, c = average_grid_host(logits)
    avg = s / np.maximum(c, 1)

    assert len(ref) == len(avg)
    ref_vals = np.array([v for v, _ in ref])
    np.testing.assert_allclose(avg, ref_vals, rtol=1e-6, atol=1e-9)
    # time strings
    from softspoken_tpu.engine import bin_time

    for idx, (_, tstr) in enumerate(ref[:100]):
        assert bin_time(idx) == float(tstr)


def test_find_regions_matches_reference_loop():
    rng = np.random.default_rng(1)
    for seed in range(5):
        rng = np.random.default_rng(seed)
        # values hovering around the threshold to stress run logic
        vals = rng.normal(0.1, 0.15, size=800)
        avg_list = [(v, f"{i * (3 / 256):.4f}") for i, v in enumerate(vals)]
        want = np_ref.find_regions_reference(avg_list)
        got = find_speech_regions(vals)
        assert got == want


def test_hysteresis_regions():
    dt = 3 / 256
    t = lambda i: float(f"{i * dt:.4f}")
    # one seed run with low-level shoulders, one low-only run (no seed)
    vals = np.zeros(100)
    vals[10:13] = 0.06          # leading shoulder (> exit, < enter)
    vals[13:16] = 0.2           # seed
    vals[16:20] = 0.06          # trailing shoulder
    vals[40:45] = 0.06          # seedless low run: must NOT appear
    got = find_speech_regions(vals, 0.1, 0.5, exit_threshold=0.05)
    assert got == [(t(10), t(19))]
    # no exit threshold -> parity behavior (seed run only)
    assert find_speech_regions(vals, 0.1, 0.5) == [(t(13), t(15))]
    # exit >= enter is a no-op by definition
    assert find_speech_regions(vals, 0.1, 0.5, exit_threshold=0.1) == [
        (t(13), t(15))]
    # hysteresis-extended regions still gap-merge: two seeded low runs
    # whose extended gap is <= break_duration collapse to one region
    vals2 = np.zeros(200)
    vals2[10:15] = 0.2
    vals2[15:30] = 0.06
    vals2[40:45] = 0.2          # gap 30..40 = 10 bins ~ 0.117 s < 0.5 s
    got2 = find_speech_regions(vals2, 0.1, 0.5, exit_threshold=0.05)
    assert got2 == [(t(10), t(44))]
    # edge runs touching the array boundaries
    vals3 = np.zeros(50)
    vals3[:3] = 0.06
    vals3[3] = 0.2
    vals3[47] = 0.2
    vals3[48:] = 0.06
    got3 = find_speech_regions(vals3, 0.1, 0.5, exit_threshold=0.05)
    assert got3 == [(t(0), t(3)), (t(47), t(49))]
    # all-below-enter -> empty even when bins exceed exit
    assert find_speech_regions(np.full(20, 0.06), 0.1, 0.5,
                               exit_threshold=0.05) == []


@pytest.mark.slow
def test_shift_and_detect_synthetic_speech(detector):
    """End-to-end slice: a waveform whose random-net logits exceed threshold
    somewhere must produce intervals identical to the reference pipeline
    composed from the same per-window logits."""
    cfg = TEST_CFG
    rng = np.random.default_rng(7)
    audio = (0.5 * rng.normal(size=22050 * 30)).astype(np.float32)

    res = detector.detect_waveform(audio)
    assert res.num_windows == num_windows_for_duration(30.0, cfg)

    # rebuild via the literal reference path from the same logits
    pad = cfg.pad_samples
    padded = np.zeros(len(audio) + 2 * pad, np.float32)
    padded[pad : pad + len(audio)] = audio
    logits = detector.mask_logits_for_padded(padded)
    ref_avg = np_ref.average_overlapping_reference(
        logits, len(padded) / cfg.dsp.sample_rate
    )
    ref_regions = np_ref.find_regions_reference(ref_avg)
    ref_regions = [(s - 3.0, e - 3.0) for (s, e) in ref_regions]

    assert [(round(a, 4), round(b, 4)) for a, b in res.intervals] == [
        (round(a, 4), round(b, 4)) for a, b in ref_regions
    ]


@pytest.mark.slow
def test_chunked_equals_unchunked(detector):
    """Chunk boundaries must not change logits (overlap-save invariant)."""
    cfg = TEST_CFG
    rng = np.random.default_rng(3)
    audio = (0.3 * rng.normal(size=int(22050 * 35.5))).astype(np.float32)

    res_a = detector.detect_waveform(audio)

    big = Detector(
        Config().with_engine(precision="parity", device_batch=4, chunk_seconds=3600.0),
        variables=ckpt.fixture_variables(seed=0),
    )
    res_b = big.detect_waveform(audio)
    np.testing.assert_allclose(res_a.avg_values, res_b.avg_values, atol=1e-5)
    assert res_a.intervals == res_b.intervals


@pytest.mark.slow
def test_streaming_file_equals_in_memory(detector, tmp_path):
    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(5)
    audio32k = (0.4 * rng.normal(size=32000 * 40)).astype(np.float32)
    p = str(tmp_path / "long.wav")
    wavio.write(p, audio32k, 32000, subtype="FLOAT")

    res_mem = detector.detect_file(p)
    res_stream = detector.detect_file_streaming(p)
    assert res_mem.num_windows == res_stream.num_windows
    np.testing.assert_allclose(res_stream.avg_values, res_mem.avg_values, atol=1e-5)
    assert res_stream.intervals == res_mem.intervals


def test_process_batch_reference_shapes(detector):
    rng = np.random.default_rng(9)
    padded = (0.2 * rng.normal(size=66150 * 3)).astype(np.float32)
    spec, mask = detector.process_batch(padded, [0, 13230])
    assert spec.shape == (2, 2, 128, 256)
    assert mask.shape == (2, 1, 256)


def test_process_batch_empty_and_int32_guard(detector):
    spec, mask = detector.process_batch(np.zeros(66150, np.float32), [])
    assert spec.shape == (0, 2, 128, 256) and mask.shape == (0, 1, 256)
    with pytest.raises(ValueError, match="int32"):
        detector.process_batch(np.zeros(66150, np.float32), [2**31])


# ---------------------------------------------------------------------------
# grid median smoothing (round-4 event-F1 lever; engine/regions.smooth_grid)
# ---------------------------------------------------------------------------


def test_smooth_grid_properties():
    from softspoken_tpu.engine import regions as R

    av = np.array([0.0, 0.0, 0.5, 0.0, 0.5, 0.5, 0.5, 0.0, 0.0])
    # width<=1 and empty input are identity
    np.testing.assert_array_equal(R.smooth_grid(av, 0), av)
    np.testing.assert_array_equal(R.smooth_grid(av, 1), av)
    assert len(R.smooth_grid(np.array([]), 5)) == 0
    # a single-bin spike (threshold flicker) is removed by width 3
    sm = R.smooth_grid(av, 3)
    assert sm[2] == 0.0          # isolated spike gone
    assert sm[5] == 0.5          # the solid run survives
    # a constant grid is a fixed point at any width
    const = np.full(32, 0.3)
    for w in (3, 5, 7):
        np.testing.assert_array_equal(R.smooth_grid(const, w), const)
    # even widths round up to the next odd (centered window stays centered)
    np.testing.assert_array_equal(R.smooth_grid(av, 4), R.smooth_grid(av, 5))


def test_smooth_bins_bridges_single_bin_dip():
    from softspoken_tpu.engine import regions as R

    # a long run with one single-bin dip below threshold: parity splits it
    # into two regions merged only by break_duration; smoothing width 3
    # closes the dip so the run is ONE region even with break_duration=0
    av = np.r_[np.zeros(10), np.full(20, 0.4), [0.05], np.full(20, 0.4),
               np.zeros(10)]
    plain = R.find_speech_regions(av, 0.1, 0.0)
    smoothed = R.find_speech_regions(av, 0.1, 0.0, smooth_bins=3)
    assert len(plain) == 2
    assert len(smoothed) == 1


def test_detector_grid_smooth_config(detector):
    """grid_smooth plumbs through _finalize without changing avg_values."""
    from softspoken_tpu.engine import regions as R

    rng = np.random.default_rng(2)
    audio = (0.1 * rng.normal(size=22050 * 8)).astype(np.float32)
    base = detector.detect_waveform(audio)
    det2 = Detector(TEST_CFG.with_engine(grid_smooth=5),
                    variables=ckpt.fixture_variables(seed=0))
    res2 = det2.detect_waveform(audio)
    # the stored grid is untouched; only regionization sees the median
    np.testing.assert_allclose(res2.avg_values, base.avg_values, atol=1e-6)
    want = R.shift_regions(
        R.find_speech_regions(base.avg_values, 0.1, 0.5, smooth_bins=5),
        -3.0)
    assert res2.intervals == want
