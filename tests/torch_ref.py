"""Torch *functional* interpreter of the reference architecture.

Executes the SpecUNet_2D forward pass directly from a torch-style state dict
using ``torch.nn.functional`` ops (a different expression of the network than
both the reference's nn.Module graph and our Flax module), for golden-parity
tests of the converter, layouts, and BN folding.  Input is the log-mel image
(mel frontend parity is tested separately against tests/np_ref.py).
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

EPS = 1e-5


def _t(sd, key):
    return torch.as_tensor(np.asarray(sd[key]), dtype=torch.float32)


def _bn(sd, prefix, x):
    return F.batch_norm(
        x,
        _t(sd, prefix + ".running_mean"),
        _t(sd, prefix + ".running_var"),
        _t(sd, prefix + ".weight"),
        _t(sd, prefix + ".bias"),
        training=False,
        eps=EPS,
    )


def _resblock(sd, p, x, oned=False):
    conv = F.conv1d if oned else F.conv2d
    identity = _bn(sd, f"{p}.residual.1", conv(x, _t(sd, f"{p}.residual.0.weight")))
    out = F.relu(_bn(sd, f"{p}.conv1.1", conv(x, _t(sd, f"{p}.conv1.0.weight"), padding=1)))
    out = _bn(sd, f"{p}.conv2.1", conv(out, _t(sd, f"{p}.conv2.0.weight"), padding=1))
    return F.relu(out + identity)


def forward(sd, mel: np.ndarray):
    """mel: (B, 128, 256) → (spec_output (B,2,128,256), mask_output (B,1,256))."""
    x = torch.as_tensor(np.asarray(mel), dtype=torch.float32).unsqueeze(1)

    conv1 = _resblock(sd, "conv1_1", x)
    conv2 = _resblock(sd, "conv2_1", F.max_pool2d(conv1, 2))
    conv3 = _resblock(sd, "conv3_1", F.max_pool2d(conv2, 2))
    conv4 = _resblock(sd, "conv4_1", F.max_pool2d(conv3, 2))
    pool4 = F.max_pool2d(conv4, 2)

    bott = _resblock(sd, "conv_bottleneck", pool4)
    enc = _resblock(sd, "encoder_out", bott)

    up = lambda t: F.interpolate(t, scale_factor=2, mode="nearest")  # noqa: E731
    conv6 = _resblock(sd, "conv6", torch.cat([conv4, up(enc)], 1))
    conv7 = _resblock(sd, "conv7", torch.cat([conv3, up(conv6)], 1))
    conv8 = _resblock(sd, "conv8", torch.cat([conv2, up(conv7)], 1))
    conv9 = _resblock(sd, "conv9_1", torch.cat([conv1, up(conv8)], 1))

    s = _resblock(sd, "spec_output_conv.0", conv9)
    s = F.conv2d(s, _t(sd, "spec_output_conv.1.weight"), _t(sd, "spec_output_conv.1.bias"))
    spec_output = F.relu(s)

    flat = F.relu(F.conv2d(conv9, _t(sd, "conv_flatten.weight"), _t(sd, "conv_flatten.bias")))
    flat = flat.squeeze(2)
    m = _resblock(sd, "mask_output_conv.0", flat, oned=True)
    mask_output = F.conv1d(m, _t(sd, "mask_output_conv.1.weight"), _t(sd, "mask_output_conv.1.bias"))

    return spec_output.numpy(), mask_output.numpy()
