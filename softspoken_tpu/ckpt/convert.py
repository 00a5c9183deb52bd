"""Checkpoint conversion and persistence.

The reference loads ``{'model_state_dict', 'epoch'}`` from a torch ``.pth``
(``NNDetector.py:42-53``); the actual blob is missing from the public snapshot
(``.MISSING_LARGE_BLOBS:1``), so this module provides:

  * ``convert_torch_state_dict`` — torch key/layout → Flax variables
  * ``load_pth``                 — .pth → variables (requires torch, CPU ok)
  * ``save / load``              — orbax-backed native checkpoint format
  * ``fixture_state_dict``       — deterministic random torch-STYLE state
    dict built with numpy only; the frozen golden checkpoint for parity tests
    and the documented random-init fallback (NNDetector.py:51-53).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torch module path → (flax block, flax sub) for ResBlock internals
_SEQ = {"residual": "res_conv", "conv1": "conv1", "conv2": "conv2"}
_BN_OF = {"res_conv": "res_bn", "conv1": "bn1", "conv2": "bn2"}
_BLOCKS = {
    "conv1_1": "conv1_1", "conv2_1": "conv2_1", "conv3_1": "conv3_1",
    "conv4_1": "conv4_1", "conv_bottleneck": "conv_bottleneck",
    "encoder_out": "encoder_out", "conv6": "conv6", "conv7": "conv7",
    "conv8": "conv8", "conv9_1": "conv9_1",
    "spec_output_conv.0": "spec_res", "mask_output_conv.0": "mask_res",
}
_HEAD_CONVS = {
    "spec_output_conv.1": "spec_conv",
    "conv_flatten": "conv_flatten",
    "mask_output_conv.1": "mask_conv",
}

# Channel sizes of every ResBlock: (in, out) — from pytorch_neural_nets.py
RES_BLOCK_SHAPES = {
    "conv1_1": (1, 32), "conv2_1": (32, 64), "conv3_1": (64, 96),
    "conv4_1": (96, 128), "conv_bottleneck": (128, 128),
    "encoder_out": (128, 128), "conv6": (256, 96), "conv7": (192, 64),
    "conv8": (128, 32), "conv9_1": (64, 32),
    "spec_output_conv.0": (32, 32), "mask_output_conv.0": (4, 4),
}
_1D_BLOCKS = {"mask_output_conv.0"}


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW / OIK → flax HWIO / KIO."""
    if w.ndim == 4:
        return np.transpose(w, (2, 3, 1, 0))
    if w.ndim == 3:
        return np.transpose(w, (2, 1, 0))
    raise ValueError(f"unexpected conv weight rank {w.ndim}")


def convert_torch_state_dict(sd: Dict[str, Any]) -> Dict:
    """torch ``model.state_dict()`` → Flax ``{'params', 'batch_stats'}``.

    Ignores torchaudio buffers (``mel_spectrogram.*`` — the frontend lives in
    ``ops.mel``) and BN ``num_batches_tracked`` counters.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        # host numpy, NOT device arrays: leaves are pushed to the device in
        # one batched jax.device_put by the consumer (150 individual tiny
        # transfers are pathological on remote-attached TPUs)
        node[path[-1]] = np.asarray(leaf, np.float32)

    for key, val in sd.items():
        if key.startswith("mel_spectrogram") or key.endswith("num_batches_tracked"):
            continue
        v = _np(val)
        parts = key.split(".")

        # head convs: "<prefix>.weight|bias" where prefix ∈ _HEAD_CONVS
        prefix2 = ".".join(parts[:-1])
        if prefix2 in _HEAD_CONVS:
            name = _HEAD_CONVS[prefix2]
            if parts[-1] == "weight":
                put(params, (name, "kernel"), _conv_kernel(v))
            else:
                put(params, (name, "bias"), v)
            continue

        # ResBlock internals: "<block>.<seq>.<idx>.<leaf>"
        blk_key = next((b for b in _BLOCKS if key.startswith(b + ".")), None)
        if blk_key is None:
            raise KeyError(f"unrecognized torch checkpoint key: {key}")
        blk = _BLOCKS[blk_key]
        rest = key[len(blk_key) + 1 :].split(".")
        seq, idx, leaf = rest[0], int(rest[1]), rest[2]
        conv_name = _SEQ[seq]
        is_bn = (seq == "residual" and idx == 1) or (seq in ("conv1", "conv2") and idx == 1)
        if not is_bn:
            if leaf != "weight":  # not assert: a silent mis-map under -O
                raise ValueError(f"unexpected state_dict leaf {key!r}")
            put(params, (blk, conv_name, "kernel"), _conv_kernel(v))
        else:
            bn_name = _BN_OF[conv_name]
            if leaf == "weight":
                put(params, (blk, bn_name, "scale"), v)
            elif leaf == "bias":
                put(params, (blk, bn_name, "bias"), v)
            elif leaf == "running_mean":
                put(stats, (blk, bn_name, "mean"), v)
            elif leaf == "running_var":
                put(stats, (blk, bn_name, "var"), v)
            else:
                raise KeyError(f"unrecognized BN leaf: {key}")

    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Deterministic torch-style fixture (numpy only) — the frozen golden ckpt.
# ---------------------------------------------------------------------------

def _kaiming_uniform(rng, shape, fan_in):
    # torch Conv default: kaiming_uniform(a=sqrt(5)) ⇒ bound = 1/sqrt(fan_in)
    bound = 1.0 / np.sqrt(fan_in)
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)


def fixture_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """A reproducible random state dict with exactly torch's key set/layout."""
    rng = np.random.default_rng(seed)
    sd: Dict[str, np.ndarray] = {}

    def add_conv(name, cin, cout, k):
        shape = (cout, cin) + k
        fan_in = cin * int(np.prod(k))
        sd[name + ".weight"] = _kaiming_uniform(rng, shape, fan_in)

    def add_bn(name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(0, 0.1, c).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(0, 0.2, c).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.asarray(100, np.int64)

    for blk, (cin, cout) in RES_BLOCK_SHAPES.items():
        k1, k3 = ((1,), (3,)) if blk in _1D_BLOCKS else ((1, 1), (3, 3))
        add_conv(f"{blk}.residual.0", cin, cout, k1)
        add_bn(f"{blk}.residual.1", cout)
        add_conv(f"{blk}.conv1.0", cin, cout, k3)
        add_bn(f"{blk}.conv1.1", cout)
        add_conv(f"{blk}.conv2.0", cout, cout, k3)
        add_bn(f"{blk}.conv2.1", cout)

    def add_biased_conv(name, cin, cout, k):
        add_conv(name, cin, cout, k)
        fan_in = cin * int(np.prod(k))
        sd[name + ".bias"] = _kaiming_uniform(rng, (cout,), fan_in)

    add_biased_conv("spec_output_conv.1", 32, 2, (1, 1))
    add_biased_conv("conv_flatten", 32, 4, (128, 1))
    add_biased_conv("mask_output_conv.1", 4, 1, (1,))
    return sd


def fixture_variables(seed: int = 0) -> Dict:
    return convert_torch_state_dict(fixture_state_dict(seed))


# ---------------------------------------------------------------------------
# Inverse conversion: Flax variables → torch state dict (+ .pth export)
# ---------------------------------------------------------------------------

def _conv_kernel_inv(w: np.ndarray) -> np.ndarray:
    """flax HWIO / KIO → torch OIHW / OIK (inverse of _conv_kernel)."""
    if w.ndim == 4:
        return np.transpose(w, (3, 2, 0, 1))
    if w.ndim == 3:
        return np.transpose(w, (2, 1, 0))
    raise ValueError(f"unexpected conv kernel rank {w.ndim}")


def mel_buffers() -> Dict[str, np.ndarray]:
    """The torchaudio MelSpectrogram buffers the reference model carries
    in its state dict (``pytorch_neural_nets.py:92-99``): the periodic Hann
    window and the HTK mel filterbank — both already validated against
    torch.stft / mpmath in tests/test_mel.py."""
    from ..ops import mel as melops

    return {
        "mel_spectrogram.spectrogram.window":
            melops.hann_periodic(melops.WIN_LENGTH).astype(np.float32),
        "mel_spectrogram.mel_scale.fb":
            np.asarray(melops.mel_filterbank(), np.float32),
    }


def flax_to_torch_state_dict(variables: Dict,
                             include_mel_buffers: bool = True) -> Dict[str, np.ndarray]:
    """Flax ``{'params','batch_stats'}`` → torch ``state_dict`` layout.

    Exact inverse of :func:`convert_torch_state_dict` over the reference
    architecture's full key set, so weights trained here load into the
    reference application's torch model (``NNDetector.py:42-53``).
    ``num_batches_tracked`` counters are emitted as 0 (inference-irrelevant;
    torch only reads them to resume BN momentum schedules).
    """
    variables = jax.device_get(variables)
    params, stats = variables["params"], variables["batch_stats"]
    sd: Dict[str, np.ndarray] = {}

    def f32(x):
        return np.asarray(x, np.float32)

    for blk_key in RES_BLOCK_SHAPES:
        blk = _BLOCKS[blk_key]
        for seq, conv_name in _SEQ.items():
            bn = _BN_OF[conv_name]
            sd[f"{blk_key}.{seq}.0.weight"] = _conv_kernel_inv(
                f32(params[blk][conv_name]["kernel"]))
            sd[f"{blk_key}.{seq}.1.weight"] = f32(params[blk][bn]["scale"])
            sd[f"{blk_key}.{seq}.1.bias"] = f32(params[blk][bn]["bias"])
            sd[f"{blk_key}.{seq}.1.running_mean"] = f32(
                stats[blk][bn]["mean"])
            sd[f"{blk_key}.{seq}.1.running_var"] = f32(stats[blk][bn]["var"])
            sd[f"{blk_key}.{seq}.1.num_batches_tracked"] = np.asarray(
                0, np.int64)
    for prefix, name in _HEAD_CONVS.items():
        sd[f"{prefix}.weight"] = _conv_kernel_inv(f32(params[name]["kernel"]))
        sd[f"{prefix}.bias"] = f32(params[name]["bias"])
    if include_mel_buffers:
        sd.update(mel_buffers())
    return sd


def export_pth(path: str, variables: Dict, epoch: int = -1,
               include_mel_buffers: bool = True) -> None:
    """Write Flax variables as a reference-loadable ``.pth`` (torch-free)."""
    from . import pth_writer

    pth_writer.write_checkpoint(
        path, flax_to_torch_state_dict(variables, include_mel_buffers),
        epoch=epoch)


# ---------------------------------------------------------------------------
# .pth loading (torch gated) and orbax persistence
# ---------------------------------------------------------------------------

def load_pth(path: str) -> Tuple[Dict, int]:
    """Load the reference checkpoint format: {'model_state_dict', 'epoch'}.

    Torch-free by default: BOTH serializations — the zip format (torch >=
    1.6) and the legacy flat stream (pre-1.6 /
    ``_use_new_zipfile_serialization=False``) — are read by
    :mod:`.pth_reader` with stdlib + numpy only, so ``convert-ckpt`` works
    in images without torch.  Files outside both formats (or carrying
    globals beyond the tensor safelist) fall back to real torch when it is
    installed.
    """
    import pickle

    from . import pth_reader

    try:
        sd, epoch = pth_reader.load_checkpoint(path)
    except (pth_reader.UnsupportedPthError, pickle.UnpicklingError) as own:
        # UnpicklingError covers malformed pickle streams the restricted
        # reader can't parse; torch.load may still know the format
        try:
            import torch  # legacy-format / unusual-globals fallback

            ckpt = torch.load(path, map_location="cpu", weights_only=True)
        except ImportError:
            raise IOError(
                f"{path}: not a readable checkpoint ({own}) and torch is "
                "not installed for the fallback reader") from own
        except Exception as e:  # noqa: BLE001 — torch raises bare
            # RuntimeError for malformed archives; name BOTH failures so
            # the user sees why the torch-free reader passed it along
            raise IOError(
                f"{path}: torch-free reader rejected it ({own}); torch "
                f"fallback also failed ({e})") from e
        sd, epoch = ckpt["model_state_dict"], int(ckpt.get("epoch", -1))
    return convert_torch_state_dict(sd), epoch


def save(path: str, variables: Dict, epoch: int = -1) -> None:
    """Atomic checkpoint save: write to a fresh sibling dir, then swap.

    Orbax's in-place ``force=True`` overwrite of an existing ocdbt
    checkpoint failed intermittently mid-training ("params are missing
    .zarray" during the commit merge); writing to a never-existing path and
    renaming sidesteps the overwrite path entirely and keeps the previous
    checkpoint intact until the new one is fully committed.
    """
    import shutil
    import time

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    fresh = f"{path}.new-{os.getpid()}-{time.monotonic_ns()}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(fresh, {"variables": variables, "epoch": epoch})
    # the backup name is FIXED (no pid) so load_any can find a stranded
    # backup if the process dies between the two renames below — that crash
    # window used to leave no checkpoint at `path` and nothing ever looked
    # for the .old dir (review r3 finding)
    old = f"{path}.old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(fresh, path)
    shutil.rmtree(old, ignore_errors=True)
    # sweep .new-* stranded by OTHER (crashed) runs — each kill mid-swap
    # leaks a full-size checkpoint dir otherwise (review r3 batch 10)
    import glob

    for stale in glob.glob(f"{path}.new-*"):
        shutil.rmtree(stale, ignore_errors=True)


def load(path: str) -> Tuple[Dict, int]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    return restored["variables"], int(np.asarray(restored["epoch"]))


def load_any(path: str) -> Tuple[Optional[Dict], int]:
    """Resolve a checkpoint path: orbax dir, .pth file, or missing.

    Mirrors the reference's degrade-to-untrained behavior on a missing
    checkpoint (NNDetector.py:51-53) by returning (None, -1).
    """
    if os.path.isdir(path):
        return load(path)
    if os.path.isfile(path) and path.endswith(".pth"):
        return load_pth(path)
    # crash-recovery, NEWEST work first: a kill between save()'s two
    # renames strands the fully-committed new checkpoint in '<path>.new-*'
    # — recovering only .old would silently warm-start from STALE weights
    # and leak the .new dir forever (review r3 batch 10)
    import glob
    import logging
    import shutil

    log_ = logging.getLogger(__name__)
    abspath = os.path.abspath(path)
    news = sorted(glob.glob(f"{abspath}.new-*"),
                  key=lambda p: p.rsplit("-", 1)[-1])
    for fresh in reversed(news):  # newest monotonic_ns first
        try:
            os.rename(fresh, path)
            out = load(path)
        except Exception as e:  # noqa: BLE001 — incomplete orbax write
            log_.warning("discarding unreadable stranded save %s (%s)",
                         fresh, e)
            shutil.rmtree(path if os.path.isdir(path) else fresh,
                          ignore_errors=True)
            continue
        log_.warning("recovered stranded checkpoint save %s (a save() was "
                     "interrupted mid-swap)", fresh)
        for stale in news:
            shutil.rmtree(stale, ignore_errors=True)
        shutil.rmtree(f"{abspath}.old", ignore_errors=True)
        return out
    old = f"{abspath}.old"
    if os.path.isdir(old):
        log_.warning(
            "recovering stranded checkpoint backup %s (a save() was "
            "interrupted mid-swap)", old)
        os.rename(old, path)
        return load(path)
    return None, -1
