"""BatchNorm folding for inference.

Every conv in the reference network is bias-free and immediately followed by
a BatchNorm (pytorch_neural_nets.py:13-27, 49-63).  At inference BN is an
affine map with frozen statistics, so it folds into the conv:

    BN(conv(x)) = conv(x) · g + b,   g = γ/√(σ²+ε),  b = β − μ·g
    ⇒ kernel' = kernel · g[out],  bias' = b

This removes 36 normalization passes per forward.  Folded params target
``SpecUNet2D(folded=True)`` (convs with bias, no BN submodules).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from .unet import BN_EPS

_RES_BLOCKS = [
    "conv1_1", "conv2_1", "conv3_1", "conv4_1",
    "conv_bottleneck", "encoder_out",
    "conv6", "conv7", "conv8", "conv9_1",
    "spec_res", "mask_res",
]
_PLAIN_CONVS = ["spec_conv", "conv_flatten", "mask_conv"]
_PAIRS = [("res_conv", "res_bn"), ("conv1", "bn1"), ("conv2", "bn2")]


def _fold_one(conv: Dict, bn_p: Dict, bn_s: Dict) -> Dict:
    gamma = np.asarray(bn_p["scale"], np.float64)
    beta = np.asarray(bn_p["bias"], np.float64)
    mean = np.asarray(bn_s["mean"], np.float64)
    var = np.asarray(bn_s["var"], np.float64)
    g = gamma / np.sqrt(var + BN_EPS)
    kernel = np.asarray(conv["kernel"], np.float64) * g  # broadcast over last (out) dim
    bias = beta - mean * g
    # host numpy out — consumer device_puts the whole folded tree in one shot
    return {
        "kernel": kernel.astype(np.float32),
        "bias": bias.astype(np.float32),
    }


def fold_batch_norm(variables) -> Dict:
    """{'params', 'batch_stats'} (unfolded) → {'params'} for folded=True."""
    params, stats = variables["params"], variables["batch_stats"]
    out: Dict = {}
    for blk in _RES_BLOCKS:
        out[blk] = {
            conv: _fold_one(params[blk][conv], params[blk][bn], stats[blk][bn])
            for conv, bn in _PAIRS
        }
    for name in _PLAIN_CONVS:
        out[name] = {
            "kernel": np.asarray(params[name]["kernel"], np.float32),
            "bias": np.asarray(params[name]["bias"], np.float32),
        }
    return {"params": out}
