import jax
import numpy as np
import pytest

import np_ref
import torch_ref
from softspoken_tpu import ckpt
from softspoken_tpu.models import SpecUNet2D, fold_batch_norm, init_variables, param_count


def _mel_batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.0, 1.5, size=(b, 128, 256)).astype(np.float32)


def test_param_count_matches_reference():
    # ~1,713,555 params (SURVEY.md §2.1, computed from pytorch_neural_nets.py)
    sd = ckpt.fixture_state_dict(0)
    torch_params = sum(
        v.size
        for k, v in sd.items()
        if not k.endswith(("running_mean", "running_var", "num_batches_tracked"))
    )
    _, variables = init_variables(jax.random.PRNGKey(0))
    assert param_count(variables) == torch_params == 1713555


def test_forward_matches_torch():
    # Tolerances are f32-roundoff-driven: the random-stats BNs amplify conv
    # accumulation-order differences through 12 blocks.  In float64 the two
    # implementations agree to 0.0 (verified; XLA and torch produce
    # bit-identical f64 outputs for this graph), so 2e-3 abs here is purely
    # f32 reduction ordering, not a semantic gap.
    sd = ckpt.fixture_state_dict(seed=7)
    variables = ckpt.convert_torch_state_dict(sd)
    mel = _mel_batch()

    spec_t, mask_t = torch_ref.forward(sd, mel)  # NCHW: (B,2,128,256), (B,1,256)

    model = SpecUNet2D()
    spec_j, mask_j = model.apply(variables, mel[..., None].transpose(0, 1, 2, 3))
    # our layout: spec (B,128,256,2) NHWC; mask (B,256)
    spec_j = np.asarray(spec_j).transpose(0, 3, 1, 2)
    mask_j = np.asarray(mask_j)[:, None, :]

    np.testing.assert_allclose(spec_j, spec_t, rtol=2e-2, atol=2e-3)
    np.testing.assert_allclose(mask_j, mask_t, rtol=2e-2, atol=2e-3)


def test_folded_matches_unfolded():
    variables = ckpt.fixture_variables(seed=3)
    folded = fold_batch_norm(variables)
    mel = _mel_batch(seed=3)[..., None]

    out_u = SpecUNet2D().apply(variables, mel)
    out_f = SpecUNet2D(folded=True).apply(folded, mel)
    # abs-only tolerance: ReLU outputs cross zero, where rtol is meaningless;
    # 3e-3 is f32 accumulation noise (float64 agreement is exact — see
    # test_forward_matches_torch comment).
    np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(out_u[0]), atol=3e-3)
    np.testing.assert_allclose(np.asarray(out_f[1]), np.asarray(out_u[1]), atol=3e-3)


def test_full_window_forward_matches_torch():
    """waveform → mel (ops) → unet (flax) vs mel (np ref) → unet (torch)."""
    from softspoken_tpu.ops import mel as melops

    rng = np.random.default_rng(11)
    n = melops.WINDOW_SAMPLES
    t = np.arange(n) / melops.SR
    wav = (0.4 * np.sin(2 * np.pi * 523.0 * t) + 0.1 * rng.normal(size=n)).astype(
        np.float32
    )

    sd = ckpt.fixture_state_dict(seed=5)
    mel_ref = np_ref.log_mel_reference(wav)[None].astype(np.float32)
    _, mask_t = torch_ref.forward(sd, mel_ref)

    variables = ckpt.convert_torch_state_dict(sd)
    mel_j = melops.log_mel_single(wav)[None, ..., None]
    _, mask_j = SpecUNet2D().apply(variables, mel_j)

    np.testing.assert_allclose(np.asarray(mask_j)[:, None, :], mask_t, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_train_mode_runs():
    model, variables = init_variables(jax.random.PRNGKey(0))
    mel = _mel_batch(b=2, seed=1)[..., None]
    out, mutated = model.apply(
        variables,
        mel,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert out[1].shape == (2, 256)
    assert "batch_stats" in mutated


def test_phase_resblock_matches_concat():
    """ResBlock(low=...) phase decomposition vs explicit concat+upsample,
    small shapes, float64 — algebraic equivalence at accumulation roundoff."""
    import jax.numpy as jnp
    from softspoken_tpu.models.unet import ResBlock, _up

    jax.config.update("jax_enable_x64", True)
    try:
        rng = np.random.default_rng(0)
        skip = rng.standard_normal((1, 16, 20, 6))
        low = rng.standard_normal((1, 8, 10, 4))
        rb = ResBlock(5, folded=True)
        cat_in = jnp.concatenate([jnp.asarray(skip), _up(jnp.asarray(low))], -1)
        v = rb.init(jax.random.PRNGKey(0), cat_in)
        assert (jax.tree_util.tree_structure(v)
                == jax.tree_util.tree_structure(
                    rb.init(jax.random.PRNGKey(0), jnp.asarray(skip),
                            low=jnp.asarray(low))))
        y_cat = rb.apply(v, cat_in)
        y_ph = rb.apply(v, jnp.asarray(skip), low=jnp.asarray(low))
        np.testing.assert_allclose(np.asarray(y_ph), np.asarray(y_cat),
                                   rtol=1e-9, atol=1e-9)
    finally:
        jax.config.update("jax_enable_x64", False)


@pytest.mark.slow
def test_phase_decoder_matches_concat_f64():
    """The phase-decomposed decoder (models.unet._phase_merge_kernel) is
    ALGEBRAICALLY the same convolution as concat([skip, up2(x)]) → conv; in
    float64 the two paths must agree to accumulation roundoff and share one
    param tree (checkpoint-interchangeable)."""
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)
    try:
        variables = ckpt.fixture_variables(seed=3)
        variables = fold_batch_norm(variables)
        mel = _mel_batch(b=2, seed=7)[..., None].astype(np.float64)

        m_cat = SpecUNet2D(folded=True, compute_dtype=jnp.float64,
                           decoder_upsample="concat")
        m_ph = SpecUNet2D(folded=True, compute_dtype=jnp.float64,
                          decoder_upsample="phase")
        # identical param trees: phase params ARE the concat params
        s_cat = jax.tree_util.tree_structure(m_cat.init(jax.random.PRNGKey(0), mel))
        s_ph = jax.tree_util.tree_structure(m_ph.init(jax.random.PRNGKey(0), mel))
        assert s_cat == s_ph

        spec_c, mask_c = m_cat.apply(variables, mel)
        spec_p, mask_p = m_ph.apply(variables, mel)
        # params are float32, so agreement bottoms out at f32 noise even
        # under x64 compute
        np.testing.assert_allclose(np.asarray(mask_p), np.asarray(mask_c),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(spec_p), np.asarray(spec_c),
                                   rtol=1e-5, atol=1e-7)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_packed_conv3x3_matches_direct():
    """packed_conv3x3 (column-packed lanes rewrite) computes the SAME 9C-tap
    dot products as the direct SAME conv — f32 agreement to accumulation
    roundoff, and bit-exact zero contribution from the structural zeros."""
    import jax.numpy as jnp

    from softspoken_tpu.models.unet import _conv2d, packed_conv3x3

    rng = np.random.default_rng(11)
    for (h, w, c, co, tw) in (
        (128, 256, 32, 32, 4),   # level-1 conv2 shape
        (128, 256, 1, 32, 4),    # input conv
        (64, 128, 64, 64, 2),    # level-2 conv2 shape
        (128, 256, 64, 32, 4),   # decoder conv9_1 conv1 (concat input)
    ):
        x = jnp.asarray(rng.standard_normal((2, h, w, c)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, c, co)), jnp.float32)
        b = jnp.asarray(rng.standard_normal(co), jnp.float32)
        direct = np.asarray(_conv2d(x, k, b))
        packed = np.asarray(packed_conv3x3(x, k, b, tw))
        np.testing.assert_allclose(packed, direct, rtol=3e-6, atol=2e-4)


def test_packed_model_matches_direct():
    """conv_impl='packed' shares the param tree with 'direct' and agrees to
    f32 accumulation roundoff through the full folded model."""
    import jax.numpy as jnp

    variables = fold_batch_norm(ckpt.fixture_variables(seed=3))
    mel = _mel_batch(b=2, seed=9)[..., None]

    m_d = SpecUNet2D(folded=True)
    m_p = SpecUNet2D(folded=True, conv_impl="packed")
    s_d = jax.tree_util.tree_structure(m_d.init(jax.random.PRNGKey(0), mel))
    s_p = jax.tree_util.tree_structure(m_p.init(jax.random.PRNGKey(0), mel))
    assert s_d == s_p

    spec_d, mask_d = jax.jit(m_d.apply)(variables, mel)
    spec_p, mask_p = jax.jit(m_p.apply)(variables, mel)
    np.testing.assert_allclose(np.asarray(mask_p), np.asarray(mask_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(spec_p), np.asarray(spec_d),
                               rtol=1e-4, atol=1e-4)
