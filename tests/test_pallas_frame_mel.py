"""Fused framing+DFT+mel Pallas kernel (ops.pallas_frame_mel).

Runs in Pallas interpret mode on the CPU test mesh; the TPU path is the
same kernel compiled by Mosaic (validated on hardware: trained-checkpoint
intervals equal vs the XLA chain, docs/PROFILE_r03.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from softspoken_tpu.ops import mel as melops
from softspoken_tpu.ops.pallas_frame_mel import log_mel_windows_fused


@pytest.fixture(scope="module")
def buf_and_starts():
    rng = np.random.default_rng(7)
    buf = rng.standard_normal(66150 + 4 * 13230 + 300).astype(np.float32)
    # offsets exercise o = start % 128 ∈ {0, mid, odd}
    starts = np.array([0, 174, 13230, 2 * 13230, 3 * 13230], np.int32)
    return jnp.asarray(buf), jnp.asarray(starts)


def test_fused_highest_matches_xla(buf_and_starts):
    buf, starts = buf_and_starts
    ref = melops.log_mel_windows(buf, starts,
                                 precision=jax.lax.Precision.HIGHEST)
    got = log_mel_windows_fused(buf, starts, mode="highest", interpret=True)
    assert got.shape == ref.shape == (5, 128, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_high_matches_xla(buf_and_starts):
    buf, starts = buf_and_starts
    ref = melops.log_mel_windows(buf, starts,
                                 precision=jax.lax.Precision.HIGHEST)
    got = log_mel_windows_fused(buf, starts, mode="high", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-4, rtol=5e-4)


def test_detector_fused_kernel_end_to_end(tmp_path):
    """mel_kernel='fused' produces the same intervals as 'xla' through the
    full fused streaming engine (CPU: kernel runs in interpret mode)."""
    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector
    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(3)
    audio = (0.25 * rng.standard_normal(8 * 22050)).astype(np.float32)
    p = str(tmp_path / "x.wav")
    wavio.write(p, audio, 22050, subtype="PCM_16")

    results = {}
    for mk in ("xla", "fused"):
        cfg = Config().with_engine(precision="parity", device_batch=4,
                                   chunk_seconds=6.0, mel_kernel=mk)
        det = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
        results[mk] = det.detect_file_fused(p)
    a, b = results["xla"], results["fused"]
    assert a.num_windows == b.num_windows
    assert a.intervals == b.intervals
    np.testing.assert_allclose(a.avg_values, b.avg_values, atol=1e-4)


def test_permute_split_3part_exact():
    """The hi/mid/lo bf16 split used for the lane-alignment permutation
    matmuls reconstructs all 24 f32 mantissa bits: parts=3 must be BITWISE
    equal to the f32 gather it replaces (ops/pallas_frame_mel._permute_split)."""
    import jax
    import jax.numpy as jnp
    from softspoken_tpu.ops.pallas_frame_mel import _permute_split, LANES

    rng = np.random.default_rng(0)
    # audio-like plus extreme exponent spread
    x = np.concatenate([
        rng.uniform(-1, 1, size=(300, LANES)).astype(np.float32),
        (rng.standard_normal((217, LANES)) * 10.0 ** rng.uniform(
            -20, 20, size=(217, LANES))).astype(np.float32),
    ])
    o = 37
    l_idx = np.arange(LANES)[:, None]
    m_idx = np.arange(LANES)[None, :]
    p_lo = jnp.asarray((l_idx == m_idx + o).astype(np.float32))
    p_hi = jnp.asarray((l_idx + LANES == m_idx + o).astype(np.float32))

    got = np.asarray(jax.jit(
        lambda a: _permute_split(a, p_lo, p_hi, parts=3))(jnp.asarray(x)))
    flat = x.reshape(-1)
    want = flat[o : o + (x.shape[0] - 1) * LANES].reshape(-1, LANES)
    np.testing.assert_array_equal(got, want)


def test_fused_default_matches_xla(buf_and_starts):
    """mode='default' (1-pass bf16 DFT) stays within bf16 rounding of the
    f32 reference; quality impact on the trained checkpoint is gated
    separately on hardware (docs/QUALITY_r03.json mel_default_gate)."""
    buf, starts = buf_and_starts
    ref = melops.log_mel_windows(buf, starts,
                                 precision=jax.lax.Precision.HIGHEST)
    got = log_mel_windows_fused(buf, starts, mode="default", interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_fused_bf16_output_bit_identical(buf_and_starts):
    """out_dtype=bfloat16 must equal casting the f32 kernel output — the
    cast is the last op either way (one rounding)."""
    buf, starts = buf_and_starts
    for mode in ("highest", "high", "default"):
        f32 = log_mel_windows_fused(buf, starts, mode=mode, interpret=True)
        b16 = log_mel_windows_fused(buf, starts, mode=mode, interpret=True,
                                    out_dtype=jnp.bfloat16)
        assert b16.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(f32.astype(jnp.bfloat16)), np.asarray(b16))


def test_fused_rejects_unknown_mode(buf_and_starts):
    """A typo'd mode must fail fast with a named ValueError, not trace a
    kernel and die later on a bare KeyError (review r3)."""
    buf, starts = buf_and_starts
    with pytest.raises(ValueError, match="highest"):
        log_mel_windows_fused(buf, starts, mode="hi", interpret=True)


def test_mel_kernel_auto_parity_carveout(monkeypatch):
    """'auto' must resolve to the XLA chain in parity mode even on TPU —
    the fused kernel's 4-block DFT accumulation differs ~1e-5 from the
    reference-numerics chain (review r3 finding; same policy shape as
    mel_precision/upload_codec 'auto')."""
    import jax

    from softspoken_tpu import Config, ckpt
    from softspoken_tpu.engine import Detector

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    variables = ckpt.fixture_variables(seed=0)
    parity = Detector(Config().with_engine(precision="parity"),
                      variables=variables)
    assert parity._mel_kernel == "xla"
    fast = Detector(Config().with_engine(precision="fast"),
                    variables=variables)
    assert fast._mel_kernel == "fused"
