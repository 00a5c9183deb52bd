"""Wire decimation (io/decimate.py) + fused-engine integration."""

import numpy as np
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.engine.fused import _maybe_wire_decimate, detect_file_fused
from softspoken_tpu.io import decimate as D
from softspoken_tpu.io import wavio


def test_decim_factor():
    assert D.decim_factor(32000) == 2
    assert D.decim_factor(44100) == 2
    assert D.decim_factor(48000) == 3
    assert D.decim_factor(96000) == 6
    assert D.decim_factor(192000) == 12
    # nothing to gain (or rate not divisible) -> 1
    for sr in (22050, 16000, 24000, 8000, 11025):
        assert D.decim_factor(sr) == 1
    # a larger protected band disables decimation
    assert D.decim_factor(32000, f_max=10000.0) == 1


def test_taps_design():
    """Unit DC gain, odd length, passband flat, stopband attenuated."""
    for sr, M in ((32000, 2), (44100, 2), (48000, 3)):
        h = D.decim_taps(sr, M)
        assert len(h) % 2 == 1
        assert abs(float(h.sum()) - 1.0) < 1e-4
        w = np.fft.rfftfreq(1 << 16, 1.0 / sr)
        H = np.abs(np.fft.rfft(h.astype(np.float64), 1 << 16))
        # passband (up to 7.6 kHz at the defaults): within 0.1 dB
        pb = H[w <= 7600.0]
        assert np.all(np.abs(20 * np.log10(pb)) < 0.1)
        # stopband: everything that can alias onto [0, 8 kHz] is <= -55 dB
        fold_edge = max(sr / M - 8000.0, 8400.0)
        sb = H[w >= fold_edge]
        assert 20 * np.log10(sb.max()) < -55.0


def _nat(n, seed=0, lo=-20000, hi=20000):
    return np.random.default_rng(seed).integers(
        lo, hi, n).astype(np.int16)


def _naive(nat, h, M, n_out):
    """Literal contract: y[j] = rint(sum_k h[k]*nat0[j*M - half + k])."""
    T, half = len(h), len(h) // 2
    natp = np.concatenate(
        [np.zeros(half), nat.astype(np.float64), np.zeros(T, np.float64)])
    out = np.array([h @ natp[j * M: j * M + T] for j in range(n_out)])
    return np.clip(np.rint(out), -32768, 32767).astype(np.int16)


@pytest.mark.parametrize("sr,M", [(32000, 2), (48000, 3)])
def test_matches_naive_oracle(sr, M):
    nat = _nat(sr)  # 1 s
    d = D.WireDecimator(lambda s, n: nat[s:s + n], len(nat), sr, M)
    y = d.read(0, d.frames)
    ref = _naive(nat, d.h64, M, d.frames)
    # C kernel accumulates f32 in a fixed order; f64 oracle differs by
    # at most 1 LSB at rint ties
    assert np.abs(y.astype(np.int32) - ref.astype(np.int32)).max() <= 1


def test_numpy_fallback_matches_native():
    nat = _nat(32000, seed=3)
    d = D.WireDecimator(lambda s, n: nat[s:s + n], len(nat), 32000, 2)
    xbuf = np.zeros((d.frames - 1) * d.M + d.T, np.int16)
    a0 = -d.half
    xbuf[-a0:-a0 + len(nat)] = nat[: len(xbuf) + a0]
    from softspoken_tpu.io import native

    got_native = native.fir_decim_i16(xbuf, d.h, d.M, d.frames)
    got_np = d._decimate_numpy(xbuf, d.frames)
    if got_native is None:
        pytest.skip("native kernel unavailable (no compiler)")
    assert np.abs(got_native.astype(np.int32)
                  - got_np.astype(np.int32)).max() <= 1


def test_read_is_pure_and_windowing_invariant():
    """Any tiling of reads must reproduce the whole-stream read exactly —
    the fused engine's overlapping chunk reads rely on this."""
    nat = _nat(32000 * 3, seed=7)
    d = D.WireDecimator(lambda s, n: nat[s:s + n], len(nat), 32000, 2)
    whole = d.read(0, d.frames)
    rng = np.random.default_rng(1)
    pos, parts = 0, []
    while pos < d.frames:
        step = int(rng.integers(1, 9000))
        parts.append(d.read(pos, min(step, d.frames - pos)))
        pos += step
    np.testing.assert_array_equal(np.concatenate(parts), whole)
    # overlapping re-reads agree too
    np.testing.assert_array_equal(d.read(100, 500), whole[100:600])


def test_eof_and_edge_handling():
    nat = _nat(10000, seed=2)
    d = D.WireDecimator(lambda s, n: nat[s:s + n], len(nat), 32000, 2)
    assert d.frames == 5000
    # reads beyond EOF are clamped (short), like the underlying readers
    assert len(d.read(4990, 100)) == 10
    assert len(d.read(5000, 10)) == 0
    # the first/last outputs see zeros outside the file, matching _naive
    ref = _naive(nat, d.h64, 2, d.frames)
    got = np.concatenate([d.read(0, 3), d.read(4997, 3)])
    refq = np.concatenate([ref[:3], ref[4997:]])
    assert np.abs(got.astype(np.int32) - refq.astype(np.int32)).max() <= 1


def test_tones_pass_and_stop():
    sr, M = 32000, 2
    t = np.arange(sr * 2) / sr
    for f, keep in ((1000.0, True), (5000.0, True), (15000.0, False)):
        x = (10000 * np.sin(2 * np.pi * f * t)).astype(np.int16)
        d = D.WireDecimator(lambda s, n, x=x: x[s:s + n], len(x), sr, M)
        y = d.read(0, d.frames).astype(np.float64)
        rms = np.sqrt(np.mean(y[1000:-1000] ** 2)) / (10000 / np.sqrt(2))
        assert (rms > 0.99) if keep else (rms < 0.01)


def test_maybe_wire_decimate_policy():
    det = Detector(Config(), variables=ckpt.fixture_variables(seed=0))
    rd = lambda s, n: np.zeros(n, np.int16)  # noqa: E731
    # exact wires never decimate
    assert _maybe_wire_decimate(det, rd, 32000, 32000, "i16")[2] == 32000
    assert _maybe_wire_decimate(det, rd, 32000, 32000, "f32")[2] == 32000
    # lossy wire decimates 32 kHz to 16 kHz
    _, nfr, sr = _maybe_wire_decimate(det, rd, 32000 * 10, 32000, "mulaw8")
    assert (nfr, sr) == (16000 * 10, 16000)
    # no integer factor -> unchanged
    assert _maybe_wire_decimate(det, rd, 22050, 22050, "mulaw8")[2] == 22050
    # knob off -> unchanged even on the lossy wire
    det_off = Detector(Config().with_engine(wire_decimate="off"),
                       variables=ckpt.fixture_variables(seed=0))
    assert _maybe_wire_decimate(det_off, rd, 32000, 32000, "mulaw8")[2] == 32000


def _wav32k(tmp_path, seconds=20.0, seed=5):
    """32 kHz PCM16 with band-limited (<6 kHz) structure: decimation to
    16 kHz is transparent for such content up to filter ripple."""
    sr = 32000
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    # noise bed shaped below 6 kHz via a crude running mean
    x = 0.05 * rng.standard_normal(n)
    x = np.convolve(x, np.ones(5) / 5.0, mode="same").astype(np.float32)
    m = (t >= 6.0) & (t < 9.0)
    x[m] += (0.4 * np.sin(2 * np.pi * 300.0 * t[m])
             + 0.2 * np.sin(2 * np.pi * 1700.0 * t[m])).astype(np.float32)
    p = str(tmp_path / "d32.wav")
    wavio.write(p, x, sr, subtype="PCM_16")
    return p


@pytest.mark.slow
def test_fused_decimated_wire_close_to_full_rate(tmp_path):
    """mulaw8 + wire decimation vs mulaw8 at full rate on band-limited
    content: same intervals, scores within filter/compander noise."""
    p = _wav32k(tmp_path)
    mk = lambda **kw: Detector(  # noqa: E731
        Config().with_engine(device_batch=4, chunk_seconds=12.0,
                             upload_codec="mulaw8", **kw),
        variables=ckpt.fixture_variables(seed=0))
    full = detect_file_fused(mk(wire_decimate="off"), p)
    dec = detect_file_fused(mk(), p)
    # 16 kHz wire: ~half the windows' native samples, same internal grid
    assert dec.num_windows == full.num_windows
    np.testing.assert_allclose(dec.avg_values, full.avg_values, atol=0.02)
    assert dec.intervals == full.intervals


@pytest.mark.slow
def test_fused_decimated_wire_chunking_invariance(tmp_path):
    """Chunk size must not affect the decimated-wire result (the decimator
    is pure; the engine's carry machinery is unchanged)."""
    p = _wav32k(tmp_path, seconds=30.0, seed=11)
    mk = lambda cs: Detector(  # noqa: E731
        Config().with_engine(device_batch=4, chunk_seconds=cs,
                             upload_codec="mulaw8"),
        variables=ckpt.fixture_variables(seed=0))
    a = detect_file_fused(mk(9.0), p)
    b = detect_file_fused(mk(24.0), p)
    np.testing.assert_array_equal(a.avg_values, b.avg_values)
    assert a.intervals == b.intervals
