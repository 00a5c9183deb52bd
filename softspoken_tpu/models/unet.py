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


class ResBlock(nn.Module):
    """Residual 2-D conv block (pytorch_neural_nets.py:7-41).

    1×1 conv+BN shortcut; 3×3 conv-BN-ReLU, 3×3 conv-BN; add, ReLU, Dropout2d.
    When ``folded`` is True the BNs are gone and convs carry biases
    (inference-only, after fold_batch_norm).
    """

    features: int
    folded: bool = False
    dropout_p: float = DROPOUT_P

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        use_bias = self.folded
        conv = lambda k, name: nn.Conv(  # noqa: E731
            self.features, k, padding="SAME", use_bias=use_bias, name=name,
            dtype=x.dtype, param_dtype=jnp.float32,
        )
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=BN_MOMENTUM, epsilon=BN_EPS,
            name=name, dtype=x.dtype, param_dtype=jnp.float32,
        )

        identity = conv((1, 1), "res_conv")(x)
        out = conv((3, 3), "conv1")(x)
        if not self.folded:
            identity = bn("res_bn")(identity)
            out = bn("bn1")(out)
        out = nn.relu(out)
        out = conv((3, 3), "conv2")(out)
        if not self.folded:
            out = bn("bn2")(out)
        out = nn.relu(out + identity)
        if train and self.dropout_p > 0:
            out = nn.Dropout(self.dropout_p, deterministic=False)(out)
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
            out = nn.Dropout(self.dropout_p, deterministic=False)(out)
        return out


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

    @nn.compact
    def __call__(self, mel, *, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        f = FILTERS
        x = mel.astype(self.compute_dtype)
        rb = lambda feats, name: ResBlock(feats, folded=self.folded, name=name)  # noqa: E731

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
        # torch.cat([skip, up], dim=1) → channels-last axis here.
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
        # the mel axis, then a 1-D residual block over time.
        flat = nn.Conv(4, (N_MELS, 1), padding="VALID", use_bias=True,
                       name="conv_flatten", dtype=x.dtype, param_dtype=jnp.float32)(conv9)
        flat = nn.relu(flat)                     # (B, 1, 256, 4)
        flat = jnp.squeeze(flat, axis=1)         # (B, 256, 4) — time-major 1-D
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
