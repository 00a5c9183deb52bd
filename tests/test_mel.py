import jax
import jax.numpy as jnp
import numpy as np
import pytest

import np_ref
from softspoken_tpu.ops import mel as melops


def _window_signal(seed=0):
    rng = np.random.default_rng(seed)
    n = melops.WINDOW_SAMPLES
    t = np.arange(n) / melops.SR
    x = (
        0.3 * np.sin(2 * np.pi * 440.0 * t)
        + 0.2 * np.sin(2 * np.pi * 1730.5 * t + 0.7)
        + 0.05 * rng.normal(size=n)
    )
    return x.astype(np.float32)


def test_mel_filterbank_properties():
    fb = melops.mel_filterbank()
    assert fb.shape == (1025, 128)
    assert fb.min() >= 0
    # triangles: each mel channel has one contiguous nonzero support
    support = fb > 0
    starts = np.argmax(support, axis=0)
    assert np.all(np.diff(starts) >= 0)
    # above f_max (8000 Hz → bin 8000/ (22050/2) *1024 ≈ 743) everything is 0
    assert fb[800:, :].sum() == 0


def test_log_mel_matches_reference():
    x = _window_signal()
    got = melops.log_mel_single(x)  # (128, 256)
    want = np_ref.log_mel_reference(x)  # (128, 256)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_log_mel_batch_and_offsets():
    # gather path: windows extracted from a padded chunk match single-window path
    x0, x1 = _window_signal(1), _window_signal(2)
    chunk = np.concatenate([x0, x1]).astype(np.float32)
    starts = jnp.asarray([0, len(x0)], jnp.int32)
    out = np.asarray(
        melops.log_mel_windows(jnp.asarray(chunk), starts,
                               precision=jax.lax.Precision.HIGHEST)
    )
    np.testing.assert_allclose(out[0], melops.log_mel_single(x0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1], melops.log_mel_single(x1), rtol=1e-5, atol=1e-6)


def test_frame0_reflect_semantics():
    # frame 0 must see the window's own reflected head, not neighboring audio
    x = _window_signal(3)
    chunk = np.concatenate([np.full(1000, 7.0, np.float32), x])
    out = np.asarray(
        melops.log_mel_windows(jnp.asarray(chunk), jnp.asarray([1000], jnp.int32),
                               precision=jax.lax.Precision.HIGHEST)
    )[0]
    want = np_ref.log_mel_reference(x)
    np.testing.assert_allclose(out[:, 0], want[:, 0], rtol=2e-4, atol=2e-5)


def test_silence_is_finite():
    x = np.zeros(melops.WINDOW_SAMPLES, np.float32)
    out = melops.log_mel_single(x)
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out, np.zeros_like(out))
