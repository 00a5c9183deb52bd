"""4-bit IMA-ADPCM transport codec for the fused upload path.

Why a second lossy wire: the fused engine is LINK-bound end-to-end — at the
session's 38-58 MB/s tunnel band the 8-bit mu-law wire (16 kB per
audio-second after decimation) caps the pipeline at ~2,400-3,600x realtime
(BENCH_r04.json link model), so halving wire bytes is the single remaining
~2x e2e lever.  The first 4-bit attempt (ops/bfp4.py, block-float) was
REJECTED by its quality gate: block-peak-relative quantization noise
fragments event boundaries (docs/BFP4_GATE.json, v2 event F1 0.660 vs
mu-law's 0.903).  IMA ADPCM spends the same 4 bits on a PREDICTIVE
residual with an adaptive step, which tracks speech far better than
peak-relative rounding at the same rate; its integer semantics already
live in this repo's WAV layer (io/wavio.py:402-424 tables, decoder
:515-551, bit-exact vs SDL on real third-party files).

Wire format (ours — transport only, NOT the RIFF block layout):
  blocks of SPB samples; per block HDR_BYTES=4 header
    [0:2] int16 LE  first sample (stored verbatim = predictor seed)
    [2]   uint8    initial step index 0..88, chosen PER BLOCK from the
                   block's own mean |delta| (searchsorted into the step
                   table).  A sequential encoder would thread the index
                   across blocks; choosing it per block is what makes
                   encode/decode embarrassingly parallel ACROSS blocks
                   (numpy row-vector ops / one vmapped lax.scan) and it
                   re-anchors adaptation every 16 ms instead of dragging
                   a stale index into transients.
    [3]   uint8    reserved (0)
  then SPB//2 data bytes: SPB-1 nibbles low-first (last nibble pad 0),
  each decoding exactly like the WAV IMA tables above.

Bytes per sample: (4 + SPB//2)/SPB = 0.5156 at SPB=256, vs mu-law's 1.0
— a 1.94x wire reduction.  Device decode is one lax.scan of SPB-1 steps
vmapped across blocks; the per-step state is two (nb,) int32 vectors, so
the scan is latency- not FLOP-bound and runs in parallel with nothing
else the chunk program needs (the MXU work dwarfs it).

This is a TRANSPORT codec, not reference behavior: the reference uploads
nothing (CPU inference, voice_activity.py:32-69).  Parity mode always
ships exact PCM16 (config.py upload_codec); adoption of this wire is
gated exactly like BFP4 was (scripts/codec_gate.py).
"""

from __future__ import annotations

import numpy as np

SPB = 256                 # samples per block (16 ms at the 16 kHz wire)
HDR_BYTES = 4
BLOCK_BYTES = HDR_BYTES + SPB // 2
BYTES_PER_SAMPLE = BLOCK_BYTES / SPB

# identical tables to io/wavio.py (_IMA_INDEX/_IMA_STEPS); re-declared here
# so ops/ does not import the WAV parser into the engine's hot path
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                        -1, -1, -1, -1, 2, 4, 6, 8], np.int64)
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int64)


def n_blocks(n_samples: int) -> int:
    return -(-int(n_samples) // SPB)


def wire_bytes(n_samples: int) -> int:
    """Encoded size for ``n_samples`` int16 samples (zero-padded tail)."""
    return n_blocks(n_samples) * BLOCK_BYTES


def encode_i16(x: np.ndarray, out: np.ndarray | None = None) -> np.ndarray:
    """int16 PCM → ADPCM wire bytes (uint8, length ``wire_bytes(len(x))``).

    Vectorized ACROSS blocks (the same decomposition as the WAV decoder,
    io/wavio.py:515): the SPB-1 per-sample loop runs numpy ops on (nb,)
    state vectors.  Uses the native loop (csrc/ssdsp.cpp ss_ima_encode_i16)
    when available — the numpy path costs ~2.4 s and the native one ~16 ms
    per 4.8M-sample chunk on the 1-core host (this sits on the fused
    pipeline's fill thread, which e2e profiling shows is the critical
    path); both produce identical bytes (tests/test_adpcm.py).
    """
    if x.dtype != np.int16:
        raise TypeError(f"encode_i16 requires int16 PCM, got {x.dtype}")
    n = len(x)
    nb = n_blocks(n)
    want = nb * BLOCK_BYTES
    if out is None:
        out = np.zeros(want, np.uint8)
    elif out.dtype != np.uint8 or len(out) != want or not out.flags.c_contiguous:
        raise ValueError(f"out must be contiguous uint8[{want}]")

    from ..io.native import ima_encode_i16 as _native

    q = _native(x, out, SPB)
    if q is not None:
        return q

    if nb == 0:
        return out
    xb = np.zeros((nb, SPB), np.int64)
    xb.reshape(-1)[:n] = x
    hdr_pred = xb[:, 0]
    # per-block initial index: first step >= the block's mean |delta|
    # (adaptation converges within a few samples either way; this just
    # avoids starting a loud block at step 7)
    mean_d = np.abs(np.diff(xb, axis=1)).mean(axis=1)
    idx = np.clip(np.searchsorted(STEP_TABLE, mean_d), 0, 88).astype(np.int64)
    hdr_idx = idx.copy()

    pred = hdr_pred.copy()
    nibbles = np.zeros((nb, SPB - 1), np.uint8)
    for k in range(SPB - 1):
        step = STEP_TABLE[idx]
        delta = xb[:, k + 1] - pred
        sign = delta < 0
        mag = np.abs(delta)
        nib = np.where(sign, 8, 0).astype(np.int64)
        temp = step.copy()
        ge = mag >= temp
        nib |= np.where(ge, 4, 0)
        mag = mag - np.where(ge, temp, 0)
        temp >>= 1
        ge = mag >= temp
        nib |= np.where(ge, 2, 0)
        mag = mag - np.where(ge, temp, 0)
        temp >>= 1
        nib |= np.where(mag >= temp, 1, 0)
        # reconstruct EXACTLY like the decoder so predictor states agree
        diff = (step >> 3) + np.where(nib & 1, step >> 2, 0) \
            + np.where(nib & 2, step >> 1, 0) + np.where(nib & 4, step, 0)
        pred = np.clip(np.where(nib & 8, pred - diff, pred + diff),
                       -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[nib], 0, 88)
        nibbles[:, k] = nib

    blocks = out.reshape(nb, BLOCK_BYTES)
    blocks[:, 0:2] = hdr_pred.astype(np.int16)[:, None].view(np.uint8)
    blocks[:, 2] = hdr_idx.astype(np.uint8)
    blocks[:, 3] = 0
    padded = np.zeros((nb, SPB), np.uint8)  # SPB-1 nibbles + 1 pad
    padded[:, : SPB - 1] = nibbles
    data = (padded[:, 0::2] | (padded[:, 1::2] << 4)).astype(np.uint8)
    blocks[:, HDR_BYTES:] = data
    return out


def decode_np(wire: np.ndarray, n_samples: int) -> np.ndarray:
    """Reference numpy decode → int16[n_samples] (tests + host fallback)."""
    nb = len(wire) // BLOCK_BYTES
    blocks = np.asarray(wire, np.uint8).reshape(nb, BLOCK_BYTES)
    pred = blocks[:, 0:2].copy().view("<i2").reshape(nb).astype(np.int64)
    idx = blocks[:, 2].astype(np.int64)
    data = blocks[:, HDR_BYTES:]
    nib = np.empty((nb, SPB), np.uint8)
    nib[:, 0::2] = data & 0x0F
    nib[:, 1::2] = data >> 4
    out = np.empty((nb, SPB), np.int16)
    out[:, 0] = pred
    for k in range(SPB - 1):
        n = nib[:, k].astype(np.int64)
        step = STEP_TABLE[idx]
        diff = (step >> 3) + np.where(n & 1, step >> 2, 0) \
            + np.where(n & 2, step >> 1, 0) + np.where(n & 4, step, 0)
        pred = np.clip(np.where(n & 8, pred - diff, pred + diff),
                       -32768, 32767)
        idx = np.clip(idx + INDEX_TABLE[n], 0, 88)
        out[:, k + 1] = pred
    return out.reshape(-1)[:n_samples]


def decode_device(wire, n_samples: int):
    """ADPCM wire bytes → float32[n_samples] in [-1, 1] on device.

    One lax.scan of SPB-1 steps over (nb,) int32 state, vmapped implicitly
    by operating on whole vectors; all-integer inside (bit-exact vs
    ``decode_np``), one divide at the end.  XLA fuses the final scale into
    the consumer (resampler/mel) exactly like the mu-law decode
    (ops/mulaw.py::decode_device).  ``unroll=8`` trades a little program
    size for 8x fewer sequential dispatch points in the 255-step scan —
    the scan is latency-bound, not compute-bound.
    """
    import jax
    import jax.numpy as jnp

    nb = wire.shape[0] // BLOCK_BYTES
    blocks = wire.reshape(nb, BLOCK_BYTES)
    b0 = blocks[:, 0].astype(jnp.int32)
    b1 = blocks[:, 1].astype(jnp.int32)
    pred0 = ((b0 | (b1 << 8)) + 32768) % 65536 - 32768  # int16 LE, signed
    idx0 = jnp.clip(blocks[:, 2].astype(jnp.int32), 0, 88)
    data = blocks[:, HDR_BYTES:].astype(jnp.int32)  # (nb, SPB//2)
    lo = data & 0x0F
    hi = data >> 4
    nib = jnp.stack([lo, hi], axis=-1).reshape(nb, SPB)  # low nibble first
    nib_t = nib.T  # (SPB, nb): scan consumes rows; row SPB-1 is pad

    steps = jnp.asarray(STEP_TABLE, jnp.int32)
    index_tab = jnp.asarray(INDEX_TABLE, jnp.int32)

    def body(carry, n):
        pred, idx = carry
        step = jnp.take(steps, idx)
        diff = (step >> 3) + jnp.where(n & 1, step >> 2, 0) \
            + jnp.where(n & 2, step >> 1, 0) + jnp.where(n & 4, step, 0)
        pred = jnp.clip(jnp.where(n & 8, pred - diff, pred + diff),
                        -32768, 32767)
        idx = jnp.clip(idx + jnp.take(index_tab, n), 0, 88)
        return (pred, idx), pred

    (_, _), rest = jax.lax.scan(body, (pred0, idx0), nib_t[: SPB - 1],
                                unroll=8)
    samples = jnp.concatenate([pred0[None, :], rest], axis=0)  # (SPB, nb)
    flat = samples.T.reshape(nb * SPB)[:n_samples]
    return flat.astype(jnp.float32) * (1.0 / 32768.0)
