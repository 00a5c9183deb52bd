"""8-bit mu-law transport compander for the fused upload path.

The remote-attached TPU's host->device link is the end-to-end bottleneck
(bench.py names the ceiling; 32 kHz int16 mono is 64 KB per audio-second).
Companding the PCM to 8 bits before upload halves the wire bytes -- and a
mu-law round trip is one of the degradations the trained checkpoint is
explicitly evaluated against (scripts/quality_grid.py "mulaw": frame F1
0.9624 in-family / 0.9217 out-of-family, ABOVE the clean condition in both
generators -- docs/QUALITY_r03.json), so the transport is gated by the same
evidence as the signal-path precision choices.

Encode runs on the 1-core host as a single 64 Ki-entry table gather per
chunk (~int16 bit pattern -> int8 code); decode runs on device as a pure
elementwise expm1 that XLA fuses into the resampler/mel frontend, replacing
the int16 ``x / 32768`` scale.  No gathers on the TPU.

This is a TRANSPORT codec, not reference behavior: the reference uploads
nothing (CPU inference, voice_activity.py:32-69).  Parity mode always ships
exact PCM16 (config.py upload_codec).
"""

from __future__ import annotations

import numpy as np

MU = 255.0
_LOG1P_MU = float(np.log1p(MU))

# worst-case round-trip error of round-to-nearest 8-bit mu-law on [-1, 1]:
# half a code step at |x|->1, dx = (1/254) * (1 + MU) * log1p(MU) / MU
# = 0.0219 full-scale (~2.2% relative for near-clipping samples; far finer
# near zero, where field audio lives).  Measured max over all 65536 int16
# codes: 0.02167.
MAX_ABS_ERROR = 0.022

_ENC_LUT: np.ndarray | None = None


def encode_lut() -> np.ndarray:
    """(65536,) int8 mu-law code per int16 *bit pattern* (uint16 index)."""
    global _ENC_LUT
    if _ENC_LUT is None:
        signed = np.arange(65536, dtype=np.uint16).view(np.int16)
        x = signed.astype(np.float64) / 32768.0
        y = np.sign(x) * np.log1p(MU * np.abs(x)) / _LOG1P_MU
        _ENC_LUT = np.round(y * 127.0).astype(np.int8)
    return _ENC_LUT


def encode_i16(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """int16 PCM -> int8 mu-law codes (one gather pass; 0 encodes to 0).

    Uses the native loop (csrc/ssdsp.cpp ss_mulaw_encode_i16, ~3-5x the
    numpy fancy-index) when the compiled library is available; both paths
    share the same LUT so outputs are identical.  ``out`` (a contiguous
    int8 view of length len(x)) lets the fused pipeline encode straight
    into its staging buffer with no intermediate allocation.
    """
    # not `assert`: a wrong dtype (e.g. uint16 from a sloppy caller) would
    # silently compand garbage under `python -O` (ADVICE r2 class)
    if x.dtype != np.int16:
        raise TypeError(f"encode_i16 requires int16 PCM, got {x.dtype}")
    lut = encode_lut()
    from ..io.native import mulaw_encode_i16

    q = mulaw_encode_i16(x, lut, out=out)
    if q is not None:
        return q
    if out is not None:
        np.take(lut, x.view(np.uint16), out=out)
        return out
    return lut[x.view(np.uint16)]


def decode_device(q):
    """int8 codes -> float32 in [-1, 1], written with jax.numpy.

    Pure elementwise (sign/abs/expm1/mul): XLA fuses it into whatever
    consumes the PCM, so the decode is free on the VPU relative to the
    matmuls downstream.  Exact inverse of the unrounded compander at each
    of the 255 code levels.
    """
    import jax.numpy as jnp

    y = q.astype(jnp.float32) * (1.0 / 127.0)
    return jnp.sign(y) * (jnp.expm1(jnp.abs(y) * _LOG1P_MU) * (1.0 / MU))


def decode_host(q: np.ndarray) -> np.ndarray:
    """Reference decode for tests (numpy, float64 -> float32)."""
    y = q.astype(np.float64) / 127.0
    return (np.sign(y) * np.expm1(np.abs(y) * _LOG1P_MU) / MU).astype(np.float32)
