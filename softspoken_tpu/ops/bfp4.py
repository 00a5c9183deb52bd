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
is an EMPIRICAL question: the codec ships only as

  * a degradation condition (train/degrade.py "bfp4") so the quality grid
    measures it on both eval generators, and
  * an opt-in wire (config upload_codec="bfp4"); "auto" NEVER selects it.

Like mu-law, decode is branch-free elementwise math that XLA fuses into
the device frontend; unpack is two int8 shifts.  Encode runs on the host
as vectorized numpy over the staging buffer.
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
    assert x.dtype == np.int16
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
