"""mu-law transport compander (ops/mulaw.py) + fused-engine integration."""

import numpy as np
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.engine.fused import detect_file_fused
from softspoken_tpu.io import wavio
from softspoken_tpu.ops import mulaw


def test_roundtrip_error_bound():
    """Every int16 code round-trips within the documented full-scale bound."""
    x = np.arange(-32768, 32768, dtype=np.int16)
    q = mulaw.encode_i16(x)
    back = mulaw.decode_host(q)
    err = np.abs(back - x.astype(np.float64) / 32768.0)
    assert err.max() <= mulaw.MAX_ABS_ERROR


def test_zero_is_exact_and_monotone():
    x = np.array([0, 1, -1, 100, -100, 32767, -32768], np.int16)
    q = mulaw.encode_i16(x)
    assert q[0] == 0 and mulaw.decode_host(q[:1])[0] == 0.0
    assert q[5] == 127 and q[6] == -127  # symmetric: codes span [-127, 127]
    # companding preserves order
    xs = np.arange(-32768, 32768, 7, dtype=np.int16)
    assert np.all(np.diff(mulaw.encode_i16(xs).astype(np.int16)) >= 0)


def test_device_decode_matches_host():
    import jax

    q = np.arange(-128, 128, dtype=np.int8)
    dev = np.asarray(jax.jit(mulaw.decode_device)(q))
    np.testing.assert_allclose(dev, mulaw.decode_host(q), atol=1e-6)


def _wav(tmp_path, seconds=20.0, sr=22050, seed=5):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    x = (0.05 * rng.standard_normal(n)).astype(np.float32)
    t = np.arange(n) / sr
    m = (t >= 6.0) & (t < 9.0)
    x[m] += 0.4 * np.sin(2 * np.pi * 300.0 * t[m]).astype(np.float32)
    p = str(tmp_path / "mu.wav")
    wavio.write(p, x, sr, subtype="PCM_16")
    return p


@pytest.mark.slow
def test_fused_mulaw8_close_to_pcm16(tmp_path):
    """Forcing upload_codec=mulaw8 must stay within compander noise of the
    exact PCM16 path on the same windows (auto keeps pcm16 on CPU)."""
    p = _wav(tmp_path)
    exact = Config().with_engine(device_batch=4, chunk_seconds=12.0,
                                 upload_codec="pcm16")
    lossy = Config().with_engine(device_batch=4, chunk_seconds=12.0,
                                 upload_codec="mulaw8")
    d_exact = Detector(exact, variables=ckpt.fixture_variables(seed=0))
    d_lossy = Detector(lossy, variables=ckpt.fixture_variables(seed=0))
    r_exact = detect_file_fused(d_exact, p)
    r_lossy = detect_file_fused(d_lossy, p)
    assert r_lossy.num_windows == r_exact.num_windows
    # fixture logits are smooth; compander noise perturbs them far below
    # the 0.1 threshold scale
    np.testing.assert_allclose(
        r_lossy.avg_values, r_exact.avg_values, atol=0.02)
    assert r_lossy.intervals == r_exact.intervals


def test_top16_from_raw_units():
    """Byte-exact top-16 extraction for each integer-PCM subtype."""
    vals = np.array([0, 1, 255, 256, -1, -256, 8388607, -8388608,
                     123456, -654321], np.int32)
    u = vals.astype(np.uint32) & 0xFFFFFF
    raw24 = np.zeros(len(vals) * 3, np.uint8)
    raw24[0::3] = (u & 255).astype(np.uint8)
    raw24[1::3] = ((u >> 8) & 255).astype(np.uint8)
    raw24[2::3] = ((u >> 16) & 255).astype(np.uint8)
    np.testing.assert_array_equal(
        wavio.top16_from_raw(raw24, "PCM_24"), (vals >> 8).astype(np.int16))

    v32 = np.array([0, 1, -1, 2**31 - 1, -(2**31), 305419896, -19088744],
                   np.int32)
    np.testing.assert_array_equal(
        wavio.top16_from_raw(v32.view(np.uint8), "PCM_32"),
        (v32 >> 16).astype(np.int16))

    v8 = np.arange(256, dtype=np.uint8)
    np.testing.assert_array_equal(
        wavio.top16_from_raw(v8, "PCM_U8"),
        ((v8.astype(np.int32) - 128) * 256).astype(np.int16))


def _float_content(seconds=20.0, sr=22050, seed=5):
    rng = np.random.default_rng(seed)
    n = int(sr * seconds)
    x = (0.05 * rng.standard_normal(n)).astype(np.float32)
    t = np.arange(n) / sr
    m = (t >= 6.0) & (t < 9.0)
    x[m] += 0.4 * np.sin(2 * np.pi * 300.0 * t[m]).astype(np.float32)
    return x, sr


@pytest.mark.slow
def test_fused_pcm24_top16_wire(tmp_path):
    """Mono 24-bit WAV under the mu-law wire stages the top 16 bits (1 wire
    byte/sample instead of the 4 the f32 generic path ships); scores stay
    within compander noise of the exact f32 route, and a 24-bit FLAC of
    the SAME samples produces the identical int16 stream → identical grid.
    """
    from tests.flac_ref import write_flac

    x, sr = _float_content()
    p24 = str(tmp_path / "deep.wav")
    wavio.write(p24, x, sr, subtype="PCM_24")
    ints24 = np.clip(np.rint(x.astype(np.float64) * 8388608.0),
                     -8388608, 8388607).astype(np.int64)
    pf = str(tmp_path / "deep.flac")
    write_flac(pf, ints24, sr, bits=24)

    mk = lambda codec: Detector(
        Config().with_engine(device_batch=4, chunk_seconds=12.0,
                             upload_codec=codec),
        variables=ckpt.fixture_variables(seed=0))
    exact = detect_file_fused(mk("pcm16"), p24)     # generic f32 wire
    lossy = detect_file_fused(mk("mulaw8"), p24)    # top16 + mu-law wire
    assert lossy.num_windows == exact.num_windows
    np.testing.assert_allclose(lossy.avg_values, exact.avg_values, atol=0.02)
    assert lossy.intervals == exact.intervals

    flac_lossy = detect_file_fused(mk("mulaw8"), pf)  # truncate_to_i16 wire
    np.testing.assert_array_equal(flac_lossy.avg_values, lossy.avg_values)
    assert flac_lossy.intervals == lossy.intervals


@pytest.mark.slow
def test_fused_stereo_mulaw_wire(tmp_path):
    """Stereo PCM16 under the mu-law wire: the host downmix ships as int16→
    mu-law (1 wire byte/sample) instead of f32 (4), within compander noise
    of the exact f32 route."""
    x, sr = _float_content(seed=9)
    stereo = np.stack([x, np.roll(x, 3)], axis=1)
    p = str(tmp_path / "stereo.wav")
    wavio.write(p, stereo, sr, subtype="PCM_16")

    mk = lambda codec: Detector(
        Config().with_engine(device_batch=4, chunk_seconds=12.0,
                             upload_codec=codec),
        variables=ckpt.fixture_variables(seed=0))
    exact = detect_file_fused(mk("pcm16"), p)       # f32 generic wire
    lossy = detect_file_fused(mk("mulaw8"), p)      # downmix→i16→mu-law
    assert lossy.num_windows == exact.num_windows
    np.testing.assert_allclose(lossy.avg_values, exact.avg_values, atol=0.02)
    assert lossy.intervals == exact.intervals


def test_auto_codec_is_exact_off_tpu(tmp_path):
    """upload_codec=auto must resolve to pcm16 on CPU (tests run on CPU)."""
    from softspoken_tpu.engine.fused import _i16_kind

    det = Detector(Config(), variables=ckpt.fixture_variables(seed=0))
    assert _i16_kind(det) == "i16"
    det_parity = Detector(Config().with_engine(precision="parity"),
                          variables=ckpt.fixture_variables(seed=0))
    assert _i16_kind(det_parity) == "i16"
