"""4-bit IMA-ADPCM transport codec (ops/adpcm.py): numpy/native/device
agreement, wire-format invariants, and reconstruction quality bounds."""

import numpy as np
import pytest

from softspoken_tpu.ops import adpcm


def _speechlike(seconds=2.0, sr=16000, seed=0, amp=20000):
    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    x = (0.3 * np.sin(2 * np.pi * 180 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
         + 0.2 * np.sin(2 * np.pi * 900 * t)
         + 0.05 * rng.normal(size=len(t)))
    return np.clip(x * amp, -32768, 32767).astype(np.int16)


def test_wire_size():
    assert adpcm.wire_bytes(adpcm.SPB) == adpcm.BLOCK_BYTES
    assert adpcm.wire_bytes(adpcm.SPB + 1) == 2 * adpcm.BLOCK_BYTES
    # the whole point: about half the mu-law wire
    assert adpcm.BYTES_PER_SAMPLE < 0.52


def test_roundtrip_snr_beats_bfp4_class():
    x = _speechlike()
    y = adpcm.decode_np(adpcm.encode_i16(x), len(x)).astype(np.float64)
    err = y - x.astype(np.float64)
    snr = 10 * np.log10(np.sum(x.astype(np.float64) ** 2) / np.sum(err ** 2))
    # IMA ADPCM on speech-band content sits ~25-30 dB; BFP4 (the rejected
    # 4-bit wire) measured ~16-20 dB on the same class of signal
    assert snr > 22.0, snr


def test_quiet_segments_have_tiny_error():
    # detection boundaries live in low-level audio; the adaptive step must
    # track down so quantization noise stays far below the signal
    sr = 16000
    t = np.arange(sr) / sr
    x = np.clip(0.01 * np.sin(2 * np.pi * 300 * t) * 32768, -32768,
                32767).astype(np.int16)
    y = adpcm.decode_np(adpcm.encode_i16(x), len(x)).astype(np.float64)
    rms_sig = np.sqrt(np.mean(x.astype(np.float64) ** 2))
    rms_err = np.sqrt(np.mean((y - x) ** 2))
    assert rms_err < rms_sig / 20


def test_numpy_native_byte_equality(monkeypatch):
    from softspoken_tpu.io import native as N

    if not N.native_available():
        pytest.skip("no native lib in this environment")
    for n_extra in (0, 1, adpcm.SPB - 1, adpcm.SPB // 2 + 7):
        x = _speechlike(seconds=0.7, seed=n_extra)[: 3 * adpcm.SPB + n_extra]
        w_c = adpcm.encode_i16(x)
        monkeypatch.setattr(N, "ima_encode_i16", lambda *a, **k: None)
        w_np = adpcm.encode_i16(x)
        monkeypatch.undo()
        assert np.array_equal(w_c, w_np), f"native/numpy diverge (+{n_extra})"


def test_device_decode_matches_numpy():
    import jax.numpy as jnp

    x = _speechlike(seconds=0.5)
    w = adpcm.encode_i16(x)
    y_np = adpcm.decode_np(w, len(x))
    y_dev = np.asarray(adpcm.decode_device(jnp.asarray(w), len(x)))
    assert np.allclose(y_dev * 32768.0, y_np, atol=1e-3)


def test_zero_input_encodes_to_silence():
    x = np.zeros(2 * adpcm.SPB, np.int16)
    y = adpcm.decode_np(adpcm.encode_i16(x), len(x))
    # step floor is 7, so "silence" decodes to at most a couple of LSBs
    assert np.abs(y.astype(np.int64)).max() <= 4


def test_encode_rejects_wrong_dtype():
    with pytest.raises(TypeError):
        adpcm.encode_i16(np.zeros(16, np.float32))


def test_tail_padding_is_deterministic():
    x = _speechlike(seconds=0.3)[: adpcm.SPB + 13]
    w1 = adpcm.encode_i16(x)
    w2 = adpcm.encode_i16(x)
    assert np.array_equal(w1, w2)
    y = adpcm.decode_np(w1, len(x))
    assert len(y) == len(x)


@pytest.mark.slow
def test_fused_adpcm4_close_to_pcm16(tmp_path):
    """Forcing upload_codec=adpcm4 must stay within codec noise of the exact
    PCM16 fused path on the same windows (same harness as the mu-law wire
    test, tests/test_mulaw.py::test_fused_mulaw8_close_to_pcm16)."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.engine.fused import detect_file_fused
    from softspoken_tpu.io import wavio

    sr, seconds = 22050, 20.0
    rng = np.random.default_rng(5)
    n = int(sr * seconds)
    x = (0.05 * rng.standard_normal(n)).astype(np.float32)
    t = np.arange(n) / sr
    m = (t >= 6.0) & (t < 9.0)
    x[m] += 0.4 * np.sin(2 * np.pi * 300.0 * t[m]).astype(np.float32)
    p = str(tmp_path / "a4.wav")
    wavio.write(p, x, sr, subtype="PCM_16")

    exact = Config().with_engine(device_batch=4, chunk_seconds=12.0,
                                 upload_codec="pcm16")
    lossy = Config().with_engine(device_batch=4, chunk_seconds=12.0,
                                 upload_codec="adpcm4")
    d_exact = Detector(exact, variables=ckpt.fixture_variables(seed=0))
    d_lossy = Detector(lossy, variables=ckpt.fixture_variables(seed=0))
    r_exact = detect_file_fused(d_exact, p)
    r_lossy = detect_file_fused(d_lossy, p)
    assert r_lossy.num_windows == r_exact.num_windows
    np.testing.assert_allclose(
        r_lossy.avg_values, r_exact.avg_values, atol=0.02)
    assert r_lossy.intervals == r_exact.intervals
