"""Pallas TPU kernel: fused DFT → power → mel → compression.

The XLA path (ops.mel.log_mel_from_frames) is two matmuls with a
(rows, 2050) float32 intermediate that round-trips HBM between them
(~25 MB per 256-window batch).  This kernel keeps the whole frame→mel
chain in VMEM per tile:

    proj  = frames_tile(256,512) @ W(512,2048)        MXU
    power = re² + im²                                  VPU
    mel   = power(256,1024) @ fb(1024,128)             MXU
    out   = sqrt(log10(mel+1))                         VPU

Numerics note: torchaudio's spectrogram has 1025 bins, but the mel
filterbank is zero above ~8.6 kHz (f_max=8000 ⇒ last nonzero DFT bin 743),
so bins 1024 (Nyquist) contributes nothing — the DFT here computes exactly
1024 bins, which both drops dead work and lane-aligns every matmul for the
MXU.  Output is bit-comparable to the XLA path up to f32 reduction order.

W and fb enter as kernel operands (VMEM-resident across the row grid), so
one compiled kernel serves any batch size that is a multiple of the tile.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from . import mel as melops

ROWS_PER_TILE = 256
N_FREQS_PAD = 1024  # truncated: bin 1024 (Nyquist) has zero mel weight
WIN = melops.WIN_LENGTH


@lru_cache(maxsize=2)
def _tables():
    w_full = melops.dft_matrices()          # (512, 2050) = [cos | sin] @ 1025
    fb_full = melops.mel_filterbank()       # (1025, 128)
    assert np.all(fb_full[N_FREQS_PAD:, :] == 0.0), "truncation must be exact"
    w = np.concatenate(
        [w_full[:, :N_FREQS_PAD], w_full[:, 1025 : 1025 + N_FREQS_PAD]], axis=1
    )                                        # (512, 2048)
    fb = fb_full[:N_FREQS_PAD, :]            # (1024, 128)
    return w.astype(np.float32), fb.astype(np.float32)


def _kernel(frames_ref, w_ref, fb_ref, out_ref):
    proj = jnp.dot(frames_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    re = proj[:, :N_FREQS_PAD]
    im = proj[:, N_FREQS_PAD:]
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sqrt(jnp.log10(mel + 1.0))


def log_mel_from_frames_pallas(frames: jnp.ndarray, interpret: bool = None):
    """(B, F, 512) frames → (B, n_mels, F) compressed log-mel (Pallas)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:  # Mosaic only exists on TPU; interpret elsewhere
        interpret = jax.default_backend() != "tpu"

    B, F, _ = frames.shape
    rows = B * F
    if rows % ROWS_PER_TILE != 0:
        raise ValueError("batch·frames must tile by 256 rows")
    w, fb = _tables()

    flat = frames.reshape(rows, WIN).astype(jnp.float32)
    out = pl.pallas_call(
        _kernel,
        grid=(rows // ROWS_PER_TILE,),
        in_specs=[
            pl.BlockSpec((ROWS_PER_TILE, WIN), lambda i: (i, 0)),
            pl.BlockSpec((WIN, 2 * N_FREQS_PAD), lambda i: (0, 0)),
            pl.BlockSpec((N_FREQS_PAD, melops.N_MELS), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_TILE, melops.N_MELS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, melops.N_MELS), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(w), jnp.asarray(fb))
    return jnp.transpose(out.reshape(B, F, melops.N_MELS), (0, 2, 1))


def log_mel_windows_pallas(waveform, starts, interpret: bool = None):
    """Fused gather + Pallas mel; drop-in for ops.mel.log_mel_windows."""
    f = melops.gather_frames(waveform.astype(jnp.float32), starts)
    return log_mel_from_frames_pallas(f, interpret=interpret)
