"""4-bit block-floating-point transport codec (ops/bfp4.py)."""

import numpy as np

from softspoken_tpu.ops import bfp4


def test_roundtrip_error_bound():
    """Per-sample error is bounded by half a step of the sample's own
    block: |err| <= scale / (2*QMAX) (+ rounding slack), in full scale."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(50000) * 9000).clip(-32768, 32767).astype(np.int16)
    packed, scales = bfp4.encode_i16(x)
    assert packed.nbytes + scales.nbytes <= len(x) * 0.52
    back = bfp4.decode_host(packed, scales, len(x))
    err = np.abs(back - x.astype(np.float64) / 32768.0)
    bound = np.repeat(scales.astype(np.float64), bfp4.BLOCK)[: len(x)]
    # 1e-6 slack: exact half-step ties round away AND the decode output is
    # float32, whose own rounding sits just above the analytic bound
    bound = bound / (2 * bfp4.QMAX * 32768.0) + 1e-6
    assert np.all(err <= bound)


def test_zeros_are_exact_and_odd_lengths_roundtrip():
    z = np.zeros(1000, np.int16)
    p, s = bfp4.encode_i16(z)
    assert np.all(bfp4.decode_host(p, s, 1000) == 0.0)
    x = (np.arange(-499, 500) * 13).astype(np.int16)  # odd length
    p, s = bfp4.encode_i16(x)
    assert len(bfp4.decode_host(p, s, len(x))) == len(x)


def test_device_decode_matches_host():
    import jax

    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) * 12000).clip(-32768, 32767).astype(np.int16)
    packed, scales = bfp4.encode_i16(x)
    dev = np.asarray(jax.jit(
        lambda p, s: bfp4.decode_device(p, s, len(x))
    )(packed.view(np.int8), scales))
    np.testing.assert_allclose(dev, bfp4.decode_host(packed, scales, len(x)),
                               atol=1e-7)


def test_degradation_registered():
    from softspoken_tpu.train import degrade

    rng = np.random.default_rng(1)
    x = (0.1 * rng.standard_normal(22050)).astype(np.float32)
    y = degrade.apply(x, 22050, ["bfp4"], rng)
    assert y.dtype == np.float32 and len(y) == len(x)
    # quantization noise present but bounded
    assert 0 < np.abs(y - x).max() < 0.05
