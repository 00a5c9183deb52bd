import numpy as np
import pytest

from softspoken_tpu.io import load_audio, stream_chunks, wavio


def test_device_backend_matches_host(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.uniform(-0.6, 0.6, 32000 * 12).astype(np.float32)
    p = str(tmp_path / "r.wav")
    wavio.write(p, x, 32000, subtype="PCM_16")

    host = np.concatenate([c.data for c in stream_chunks(p, 50000, backend="host")])
    dev = np.concatenate([c.data for c in stream_chunks(p, 50000, backend="device")])
    assert host.shape == dev.shape
    np.testing.assert_allclose(dev, host, atol=3e-5)

    full, _ = load_audio(p)
    np.testing.assert_allclose(dev, full, atol=3e-5)


def test_device_backend_native_rate_passthrough(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.uniform(-0.5, 0.5, 22050 * 5).astype(np.float32)
    p = str(tmp_path / "n.wav")
    wavio.write(p, x, 22050, subtype="FLOAT")
    dev = np.concatenate([c.data for c in stream_chunks(p, 30000, backend="device")])
    full, _ = load_audio(p)
    np.testing.assert_array_equal(dev, full)
