"""4-bit block-floating-point transport codec (EXPERIMENTAL, opt-in).

Half the wire bytes of the shipped 8-bit mu-law compander (ops/mulaw.py):
samples are grouped into blocks of ``BLOCK`` samples, each block is scaled
by its peak magnitude and quantized to 15 uniform levels (4-bit signed,
two codes packed per byte), with one int16 scale per block — ~0.508 bytes
per sample.  On the measured link-bound e2e path that doubles the
theoretical ceiling vs mu-law.

Quantization noise sits ~23 dB below each block's PEAK (step = scale/7,
error <= scale/14), i.e. roughly 15 dB below typical speech RMS — much
coarser than mu-law-8's ~38 dB.  The 256-sample blocks (8 ms at 32 kHz)
track the envelope, so quiet passages keep fine steps; loud-noise beds
mask the in-band error.  Whether a trained detector's scores survive this
was an EMPIRICAL question, and the answer was NO: measured on the trained
checkpoint (epoch 48750, CPU scoring, 4 files x 60 s per cell, parity
operating point), frame F1 survives (v1 0.953 vs clean 0.967; v2 0.896 vs
0.903) but out-of-family EVENT F1 collapses — v2 0.660 vs clean 0.822,
where the shipped mu-law wire scores 0.903.  The block-peak-relative noise
fragments/merges event boundaries even though per-frame scores stay close.

So the codec ships only as a measured negative result: a degradation
condition (train/degrade.py "bfp4", in scripts/quality_grid.py's grid) and
this reference implementation.  It is deliberately NOT wired into the
fused engine; the mu-law-8 wire (ops/mulaw.py) remains the fast-mode
transport.  If a future checkpoint is trained WITH bfp4 augmentation the
gate can be re-run — the infrastructure is all here.

Decode is branch-free elementwise math XLA would fuse into the device
frontend; unpack is two int8 shifts.  Encode is vectorized numpy.
"""

from __future__ import annotations

import numpy as np

BLOCK = 256          # samples per scale block
QMAX = 7             # 4-bit signed codes in [-7, 7] (15 levels, mid-tread)


def encode_i16(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int16 samples -> (packed uint8 codes (ceil(n/2),), int16 scales).

    ``n`` is padded up to a whole block with zeros; zero blocks get scale 1
    so decode stays exact-zero.  Packing: sample 2k -> low nibble of byte
    k, sample 2k+1 -> high nibble.
    """
    if x.dtype != np.int16:
        raise TypeError(f"encode requires int16 PCM, got {x.dtype}")
    n = len(x)
    nb = -(-max(n, 1) // BLOCK)
    xp = np.zeros(nb * BLOCK, np.int16)
    xp[:n] = x
    blocks = xp.reshape(nb, BLOCK).astype(np.int32)
    scales = np.abs(blocks).max(axis=1).astype(np.int32)
    # clamp to the int16 wire range: a full-scale −32768 sample would
    # otherwise wrap the scale to −32768 and negate its whole block; with
    # the clamp that one code clips at −QMAX (error ≈ 1/32768 full scale)
    scales = np.clip(scales, 1, 32767)
    # round-half-away quantize to [-QMAX, QMAX]
    q = np.rint(blocks * (float(QMAX)) / scales[:, None]).astype(np.int32)
    q = np.clip(q, -QMAX, QMAX).reshape(-1)
    u = (q & 0xF).astype(np.uint8)
    packed = (u[0::2] | (u[1::2] << 4)).astype(np.uint8)
    return packed, scales.astype(np.int16)


def decode_host(packed: np.ndarray, scales: np.ndarray,
                n: int) -> np.ndarray:
    """Reference decode for tests: -> float32 in [-1, 1] (length n)."""
    b = packed.astype(np.int16)
    lo = ((b & 0xF) ^ 8) - 8          # sign-extend low nibble
    hi = ((b >> 4) ^ 8) - 8
    q = np.empty(2 * len(b), np.int16)
    q[0::2] = lo
    q[1::2] = hi
    nb = len(scales)
    vals = q[: nb * BLOCK].reshape(nb, BLOCK).astype(np.float64)
    vals = vals * (scales.astype(np.float64)[:, None] / (QMAX * 32768.0))
    return vals.reshape(-1)[:n].astype(np.float32)


def roundtrip_i16(x: np.ndarray) -> np.ndarray:
    """int16 -> codec round trip -> float32 (for the degradation grid)."""
    packed, scales = encode_i16(x)
    return decode_host(packed, scales, len(x))


def decode_device(packed, scales, n: int):
    """(ceil(n/2),) int8 codes + (nb,) int16 scales -> (n,) float32 on
    device.  Pure shifts/mul — XLA fuses it into the consumer."""
    import jax.numpy as jnp

    b = packed.astype(jnp.int32)
    lo = ((b & 0xF) ^ 8) - 8
    # mask AFTER the shift: the wire dtype is signed int8, so >>4 of a
    # negative byte sign-fills the high bits (the host path starts from
    # uint8 and never sees this)
    hi = (((b >> 4) & 0xF) ^ 8) - 8
    q = jnp.stack([lo, hi], axis=1).reshape(-1)        # interleave
    nb = scales.shape[0]
    vals = q[: nb * BLOCK].reshape(nb, BLOCK).astype(jnp.float32)
    vals = vals * (scales.astype(jnp.float32)[:, None] * (1.0 / (QMAX * 32768.0)))
    return vals.reshape(-1)[:n]
