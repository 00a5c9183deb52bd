import numpy as np
import pytest
import scipy.signal

from softspoken_tpu.io import native
from softspoken_tpu.io.resample import design_taps

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="no C++ toolchain available"
)


def test_native_resample_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 0.3, 32000 * 2).astype(np.float32)
    for orig, target in [(32000, 22050), (48000, 22050), (22050, 16000)]:
        import math

        g = math.gcd(orig, target)
        up, down = target // g, orig // g
        taps = design_taps(up, down)
        want = scipy.signal.resample_poly(
            x.astype(np.float64), up, down, window=taps
        ).astype(np.float32)
        got = native.resample_f32(x, up, down, taps)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_native_downmix():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 0.5, (100000, 3)).astype(np.float32)
    got = native.downmix_f32(x)
    np.testing.assert_allclose(got, x.mean(axis=1), atol=1e-6)


def test_native_pcm16_to_mono():
    rng = np.random.default_rng(2)
    raw = rng.integers(-32768, 32767, size=100000 * 2, dtype=np.int16)
    got = native.pcm16_to_mono_f32(raw, channels=2)
    want = (raw.reshape(-1, 2).astype(np.float64) / 32768.0).mean(axis=1)
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-6)


def test_native_resample_short_taps_no_oob():
    """up > n_taps must not read past the taps array: phases beyond the
    last tap contribute zero, matching scipy (review r3 batch 10)."""
    import numpy as np

    from softspoken_tpu.io.native import resample_f32

    rng = np.random.default_rng(0)
    x = rng.standard_normal(50).astype(np.float32)
    taps = np.asarray([0.25, 0.5, 0.25], np.float64)  # n_taps=3 << up
    y = resample_f32(x, 16, 5, taps)
    if y is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    from scipy.signal import resample_poly

    ref = resample_poly(x.astype(np.float64), 16, 5, window=taps)
    n = min(len(y), len(ref))
    assert np.allclose(y[:n], ref[:n], atol=1e-5)
