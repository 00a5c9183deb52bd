import numpy as np
import pytest

from softspoken_tpu.io import load_audio, resample, resampled_length, stream_chunks, wavio
from softspoken_tpu.io.resample import jax_resample


def test_length_convention():
    # librosa convention: ceil(n * target / orig)
    assert resampled_length(1920000, 32000, 22050) == 1323000
    assert resampled_length(44100, 44100, 22050) == 22050
    assert resampled_length(1000, 22050, 22050) == 1000


@pytest.mark.parametrize("orig_sr", [32000, 44100, 48000, 16000])
def test_sine_preservation(orig_sr):
    # a mid-band tone must survive with unit gain and correct frequency
    f0 = 1000.0
    t = np.arange(int(orig_sr * 2.0)) / orig_sr
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, orig_sr, 22050)
    assert len(y) == resampled_length(len(x), orig_sr, 22050)
    interior = y[2000:-2000]
    # unit gain
    assert np.max(np.abs(interior)) == pytest.approx(1.0, abs=2e-3)
    # frequency via zero crossings
    zc = np.sum(np.diff(np.signbit(interior)))
    dur = len(interior) / 22050
    assert zc / (2 * dur) == pytest.approx(f0, rel=2e-3)


def test_jax_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, 32000).astype(np.float32)
    y_host = resample(x, 32000, 22050)
    y_dev = np.asarray(jax_resample(x, 32000, 22050))
    assert y_dev.shape == y_host.shape
    np.testing.assert_allclose(y_dev, y_host, atol=2e-5)


def test_stream_chunks_matches_full_load(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.2, (120000, 2)).astype(np.float32)
    p = str(tmp_path / "s.wav")
    wavio.write(p, x, 32000, subtype="FLOAT")

    full, sr = load_audio(p)
    assert sr == 22050

    parts = []
    for chunk in stream_chunks(p, chunk_samples=17001):
        assert chunk.start_sample == sum(len(q) for q in parts)
        parts.append(chunk.data)
    got = np.concatenate(parts)
    assert len(got) == len(full)
    np.testing.assert_allclose(got, full, atol=1e-6)


def test_stream_chunks_native_rate(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.2, 50000).astype(np.float32)
    p = str(tmp_path / "n.wav")
    wavio.write(p, x, 22050, subtype="FLOAT")
    got = np.concatenate([c.data for c in stream_chunks(p, chunk_samples=9999)])
    full, _ = load_audio(p)
    np.testing.assert_array_equal(got, full)
