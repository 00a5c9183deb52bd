import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softspoken_tpu.ops import mel as melops
from softspoken_tpu.ops.pallas_mel import log_mel_windows_pallas


def test_pallas_mel_matches_xla_path():
    rng = np.random.default_rng(0)
    wave = rng.uniform(-0.5, 0.5, melops.WINDOW_SAMPLES * 2).astype(np.float32)
    starts = jnp.asarray([0, 13230], jnp.int32)

    want = np.asarray(
        melops.log_mel_windows(jnp.asarray(wave), starts,
                               precision=jax.lax.Precision.HIGHEST)
    )
    got = np.asarray(
        log_mel_windows_pallas(jnp.asarray(wave), starts, interpret=True)
    )
    assert got.shape == want.shape == (2, 128, 256)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_truncation_is_exact():
    # the filterbank really is zero above the truncated bin
    fb = melops.mel_filterbank()
    assert np.all(fb[1024:, :] == 0.0)
    assert fb[700:744, :].sum() > 0  # and nonzero just below f_max
