"""SpecUNet_2D — the speech detector, re-built in Flax (NHWC, TPU-native).

Architecture parity with ``root/code/backend/pytorch_neural_nets.py:79-197``:
a ~1.71 M-parameter 2-D U-Net over (128 mel × 256 frame) log-mel windows with
two heads:

  * spec head  — speech/environment separation masks, (B, 2, 128, 256) in the
    reference's NCHW; here (B, 128, 256, 2) NHWC            (:126-130, 183-185)
  * mask head  — per-frame speech logits, (B, 256), **no sigmoid**  (:133-140,
    187-195)

Differences by design (TPU-first, not a translation):
  * NHWC layout (TPU conv-friendly); converters transpose torch weights.
  * The mel frontend lives in ``ops.mel`` as a pure fused function instead of
    inside the module; ``engine`` composes them under one jit.
  * For inference the BatchNorms can be folded into the convolutions
    (``models.fold.fold_batch_norm``), eliminating 36 normalization passes per
    forward — use ``SpecUNet2D(folded=True)`` with folded params.
  * Optional bfloat16 compute path (params cast per-call, f32 accumulation).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum = 0.9)
BN_EPS = 1e-5
BN_MOMENTUM = 0.9
DROPOUT_P = 0.1
FILTERS = 32
N_MELS = 128


def _phase_merge_kernel(wu):
    """(3,3,Cu,Co) conv kernel → (3,3,Cu,4Co) phase kernel over the LOW-res
    input, equivalent to conv3x3 over the ×2-nearest-upsampled input.

    Derivation: with U = up2(u) (U[2i+a, 2j+b] = u[i,j]) a SAME 3×3 conv's
    output row p = 2i+a reads U rows (p−1, p, p+1) which collapse to u rows
      a=0: (i−1 ← w0,  i ← w1+w2)          a=1: (i ← w0+w1,  i+1 ← w2)
    and identically for columns, so each output phase (a,b) is a 3×3 conv
    over u with a zero-structured, tap-merged kernel.  All four phases stack
    on the output-channel axis (order a·2+b) for one full-lane MXU conv at
    half spatial resolution — the 2×2-duplicated high-res activations never
    materialize in HBM.  Verified exact vs the upsample+conv oracle in
    tests/test_model.py; tap merging (w1+w2) matches f64 exactly and is one
    rounding of the accumulation order in bf16/f32.
    """
    w0, w1, w2 = wu[0], wu[1], wu[2]        # row taps, each (3, Cu, Co)
    z = jnp.zeros_like(w0)
    row_taps = {0: (w0, w1 + w2, z), 1: (z, w0 + w1, w2)}

    def merge_cols(rr, b):
        c0, c1, c2 = rr[0], rr[1], rr[2]    # col taps, each (Cu, Co)
        zz = jnp.zeros_like(c0)
        cols = (c0, c1 + c2, zz) if b == 0 else (zz, c0 + c1, c2)
        return jnp.stack(cols, 0)           # (3, Cu, Co)

    phases = []
    for a in range(2):
        for b in range(2):
            phases.append(jnp.stack([merge_cols(r, b) for r in row_taps[a]], 0))
    return jnp.concatenate(phases, axis=-1)  # (3, 3, Cu, 4·Co)


def _interleave2x2(y, co):
    """(B, h, w, 4·co) phase-stacked maps → (B, 2h, 2w, co)."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, co)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, 2 * h, 2 * w, co)


def _conv2d(x, kernel, bias=None):
    """SAME NHWC conv in x.dtype (mirrors nn.Conv's dtype promotion)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def packed_conv3x3(x, kernel, bias=None, tw: int = 4):
    """SAME 3×3 NHWC conv computed with ``tw`` adjacent output COLUMNS
    stacked on the channel (lane) axis — the column-packed rewrite for
    narrow-channel convs on the MXU.

    The U-Net's hottest convs emit only 32 output channels, so the MXU's
    128 output lanes run 25% occupied and the op sits exactly at that cap
    (fusion.426 in docs/PROFILE_r03.md: 48 TF/s = 24.5% MFU).  Packing
    T adjacent output columns into the lane dim makes one strided conv
      kernel (3, T+2, C, T·Co), window strides (1, T), padding (1,1)×(1,1)
    whose output position (h, w) holds columns w·T..w·T+T−1.  Each packed
    output column t reads input columns w·T−1+t .. w·T+1+t, i.e. kernel
    width slots s = t..t+2 map to the original 3 taps and the other
    (T−1)·3·C taps are structural zeros: (T+2)/3 × the MACs for T × the
    lanes — net ~2× for Co=32 (T=4), ~1.5× for Co=64 (T=2).  The zeros
    contribute exact 0.0 to the f32 accumulator, so this computes the same
    9·C-tap dot products as the direct conv (accumulation order shifts,
    same class as any XLA conv retile; parity mode keeps "direct").

    Requires W % tw == 0 (every U-Net level here: 256/128/64/32).
    """
    kh, kw, c, co = kernel.shape
    if kh != 3 or kw != 3:
        raise ValueError("packed_conv3x3 requires a 3x3 kernel")
    b, h, w, _ = x.shape
    if w % tw != 0:
        raise ValueError(f"width {w} not divisible by pack factor {tw}")
    kp = jnp.zeros((3, tw + 2, c, tw, co), kernel.dtype)
    for t in range(tw):
        kp = kp.at[:, t : t + 3, :, t, :].set(kernel)
    kp = kp.reshape(3, tw + 2, c, tw * co)
    y = jax.lax.conv_general_dilated(
        x, kp.astype(x.dtype), (1, tw), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, h, w, co)        # (w_tile, t) axes merge contiguously
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


class _ConvParams(nn.Module):
    """Parameters of an ``nn.Conv`` (same names/shapes/init) WITHOUT the conv
    op, for call sites that compute the convolution themselves (the phase-
    decomposed decoder below).  Checkpoints are interchangeable."""

    shape: Tuple[int, ...]                  # (kh, kw, cin, cout) HWIO
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(), self.shape,
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.shape[-1],),
                        jnp.float32) if self.use_bias else None)
        return k, b


class ResBlock(nn.Module):
    """Residual 2-D conv block (pytorch_neural_nets.py:7-41).

    1×1 conv+BN shortcut; 3×3 conv-BN-ReLU, 3×3 conv-BN; add, ReLU, Dropout2d.
    When ``folded`` is True the BNs are gone and convs carry biases
    (inference-only, after fold_batch_norm).

    Decoder call sites may pass ``low`` (the pre-upsample low-res features):
    the block input is then semantically ``concat([x, up2(low)], -1)`` but is
    computed via the phase decomposition (``_phase_merge_kernel``) — the
    upsampled half runs as a full-lane conv at half resolution and the
    concatenated high-res tensor never materializes.  Param tree is identical
    to the concat path.
    """

    features: int
    folded: bool = False
    dropout_p: float = DROPOUT_P
    # "direct" = plain nn.Conv; "packed" = column-packed 3×3 convs
    # (packed_conv3x3) when features ∈ {32, 64} — full MXU lanes for the
    # narrow-channel levels.  Param tree is identical either way.
    conv_impl: str = "direct"

    def _pack_tw(self, x) -> int:
        """Pack factor for this block's 3×3 convs (1 = use direct conv)."""
        if self.conv_impl != "packed" or self.features not in (32, 64):
            return 1
        tw = 128 // self.features
        return tw if x.shape[2] % tw == 0 else 1

    @nn.compact
    def __call__(self, x, *, low=None, train: bool = False):
        use_bias = self.folded
        conv = lambda k, name: nn.Conv(  # noqa: E731
            self.features, k, padding="SAME", use_bias=use_bias, name=name,
            dtype=x.dtype, param_dtype=jnp.float32,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            name=name, dtype=x.dtype, param_dtype=jnp.float32,
        )
        tw = self._pack_tw(x)

        def conv3(xin, name):
            """3×3 conv: packed when this block's level qualifies."""
            if tw == 1:
                return conv((3, 3), name)(xin)
            k, b = _ConvParams(
                (3, 3, xin.shape[-1], self.features), use_bias, name=name)()
            return packed_conv3x3(xin, k, b, tw)

        if low is None:
            identity = conv((1, 1), "res_conv")(x)
            out = conv3(x, "conv1")
        else:
            cs, cu, co = x.shape[-1], low.shape[-1], self.features
            k1, b1 = _ConvParams((3, 3, cs + cu, co), use_bias, name="conv1")()
            kr, br = _ConvParams((1, 1, cs + cu, co), use_bias, name="res_conv")()
            # 3×3 over concat([x, up2(low)]) = 3×3 over x + phase conv over low
            out = (packed_conv3x3(x, k1[:, :, :cs], b1, tw) if tw > 1
                   else _conv2d(x, k1[:, :, :cs], b1))
            # merge taps in the widest of (param f32, compute dtype) so the
            # merge itself never rounds below the compute precision
            md = jnp.promote_types(jnp.float32, low.dtype)
            ph = _conv2d(low, _phase_merge_kernel(k1[:, :, cs:].astype(md)))
            out = out + _interleave2x2(ph, co)
            # 1×1 over concat = 1×1 over x + up2(1×1 over low)
            identity = _conv2d(x, kr[:, :, :cs], br) + _up(
                _conv2d(low, kr[:, :, cs:]))
        if not self.folded:
            identity = bn("res_bn")(identity)
            out = bn("bn1")(out)
        out = nn.relu(out)
        out = conv3(out, "conv2")
        if not self.folded:
            out = bn("bn2")(out)
        out = nn.relu(out + identity)
        if train and self.dropout_p > 0:
            # Dropout2d parity (pytorch_neural_nets.py:30): whole feature
            # maps drop together — broadcast over H,W in NHWC.  Element-wise
            # dropout here would be weaker spatial regularization than the
            # reference architecture specifies (review r3 finding).
            out = nn.Dropout(self.dropout_p, deterministic=False,
                             broadcast_dims=(1, 2))(out)
        return out


class ResBlock1D(nn.Module):
    """Residual 1-D conv block (pytorch_neural_nets.py:43-77); input (B, T, C)."""

    features: int
    folded: bool = False
    dropout_p: float = DROPOUT_P

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_bias = self.folded
        conv = lambda k, name: nn.Conv(  # noqa: E731
            self.features, (k,), padding="SAME", use_bias=use_bias, name=name,
            dtype=x.dtype, param_dtype=jnp.float32,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            name=name, dtype=x.dtype, param_dtype=jnp.float32,
        )

        identity = conv(1, "res_conv")(x)
        out = conv(3, "conv1")(x)
        if not self.folded:
            identity = bn("res_bn")(identity)
            out = bn("bn1")(out)
        out = nn.relu(out)
        out = conv(3, "conv2")(out)
        if not self.folded:
            out = bn("bn2")(out)
        out = nn.relu(out + identity)
        if train and self.dropout_p > 0:
            # Dropout1d parity (pytorch_neural_nets.py:66): drop whole
            # channels, broadcast over the time axis in (B, T, C)
            out = nn.Dropout(self.dropout_p, deterministic=False,
                             broadcast_dims=(1,))(out)
        return out


class _FlattenHead(nn.Module):
    """The reference's ``Conv2d(32→4, kernel=(128,1))`` mel-collapse
    (pytorch_neural_nets.py:133-135) computed as a single MXU contraction.

    A (128,1) VALID conv has exactly one vertical position, so it IS the
    contraction ``y[b,t,o] = Σ_{h,c} x[b,h,t,c]·K[h,0,c,o] + bias[o]`` — but
    XLA's conv lowering ran it as a tall-skinny convolution at 2.6× the cost
    of the equivalent ``dot_general`` (6.3 ms vs 2.4 ms per 256-window batch
    on v5e, docs/PROFILE_r03.md).  Param names/shapes match ``nn.Conv`` so
    checkpoints and the torch converter are unaffected.
    """

    features: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, 128, T, 32)
        h, c = x.shape[1], x.shape[3]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (h, 1, c, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # bf16 inputs accumulate in f32 (the conv's MXU behavior); wider
        # dtypes (f32/f64 parity paths) keep their own accumulator
        acc = jnp.float32 if jnp.dtype(self.dtype) == jnp.dtype(jnp.bfloat16) else None
        y = jax.lax.dot_general(
            x, kernel[:, 0].astype(self.dtype),
            (((1, 3), (0, 1)), ((), ())),
            preferred_element_type=acc,
        )  # (B, T, features)
        return (y + bias).astype(self.dtype)


def _pool(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _up(x):
    """Nearest-neighbor ×2 upsample (torch nn.Upsample(mode='nearest'))."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class SpecUNet2D(nn.Module):
    """The detector U-Net; input (B, 128, 256, 1) NHWC log-mel.

    Returns ``(spec_output, mask_output)``:
      spec_output: (B, 128, 256, 2) — ReLU'd separation masks
      mask_output: (B, 256)         — raw per-frame speech logits
    """

    folded: bool = False
    compute_dtype: Any = jnp.float32
    # "concat": materialize concat([skip, up2(x)]) exactly as the reference
    # does; "phase": the algebraically-equivalent phase decomposition (see
    # ResBlock) — the upsampled half runs at half resolution with full MXU
    # lanes.  bf16 tap merging shifts accumulation rounding only; parity
    # (f32/f64) callers keep "concat".
    decoder_upsample: str = "concat"
    # "direct" | "packed": 3×3 conv implementation for the 32/64-channel
    # levels (see packed_conv3x3) — same math, full MXU lanes.
    conv_impl: str = "direct"

    @nn.compact
    def __call__(self, mel, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f = FILTERS
        x = mel.astype(self.compute_dtype)
        phase = self.decoder_upsample == "phase"
        rb = lambda feats, name: ResBlock(  # noqa: E731
            feats, folded=self.folded, conv_impl=self.conv_impl, name=name)

        # Encoder (pytorch_neural_nets.py:102-109, 156-163)
        conv1 = rb(f, "conv1_1")(x, train=train)
        conv2 = rb(2 * f, "conv2_1")(_pool(conv1), train=train)
        conv3 = rb(3 * f, "conv3_1")(_pool(conv2), train=train)
        conv4 = rb(4 * f, "conv4_1")(_pool(conv3), train=train)
        pool4 = _pool(conv4)

        # Bottleneck (:112-113, 166-168)
        bott = rb(4 * f, "conv_bottleneck")(pool4, train=train)
        enc_out = rb(4 * f, "encoder_out")(bott, train=train)

        # Decoder with skip concats (:114-123, 170-181); concat order matches
        # torch.cat([skip, up], dim=1) → channels-last axis here.  In "phase"
        # mode the concat+upsample is computed implicitly inside ResBlock.
        if phase:
            conv6 = rb(3 * f, "conv6")(conv4, low=enc_out, train=train)
            conv7 = rb(2 * f, "conv7")(conv3, low=conv6, train=train)
            conv8 = rb(f, "conv8")(conv2, low=conv7, train=train)
            conv9 = rb(f, "conv9_1")(conv1, low=conv8, train=train)
        else:
            conv6 = rb(3 * f, "conv6")(jnp.concatenate([conv4, _up(enc_out)], -1), train=train)
            conv7 = rb(2 * f, "conv7")(jnp.concatenate([conv3, _up(conv6)], -1), train=train)
            conv8 = rb(f, "conv8")(jnp.concatenate([conv2, _up(conv7)], -1), train=train)
            conv9 = rb(f, "conv9_1")(jnp.concatenate([conv1, _up(conv8)], -1), train=train)

        # spec head (:126-130, 183-185)
        s = rb(f, "spec_res")(conv9, train=train)
        s = nn.Conv(2, (1, 1), use_bias=True, name="spec_conv",
                    dtype=x.dtype, param_dtype=jnp.float32)(s)
        spec_output = nn.relu(s)

        # mask head (:133-140, 187-195): Conv2d(32→4, kernel=(128,1)) collapses
        # the mel axis — computed as one MXU contraction (see _FlattenHead) —
        # then a 1-D residual block over time.
        flat = _FlattenHead(4, dtype=x.dtype, name="conv_flatten")(conv9)
        flat = nn.relu(flat)                     # (B, 256, 4) — time-major 1-D
        m = ResBlock1D(4, folded=self.folded, name="mask_res")(flat, train=train)
        m = nn.Conv(1, (1,), use_bias=True, name="mask_conv",
                    dtype=x.dtype, param_dtype=jnp.float32)(m)
        mask_output = jnp.squeeze(m, axis=-1).astype(jnp.float32)  # (B, 256) raw logits

        return spec_output.astype(jnp.float32), mask_output


def init_variables(rng: jax.Array, folded: bool = False):
    """Random-init fallback (reference: NNDetector.py:51-53 degrades to an
    untrained model when the checkpoint is missing)."""
    model = SpecUNet2D(folded=folded)
    mel = jnp.zeros((1, N_MELS, 256, 1), jnp.float32)
    return model, model.init(rng, mel)


def param_count(variables) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
