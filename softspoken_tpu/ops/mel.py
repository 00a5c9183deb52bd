"""Fused log-mel spectrogram frontend (TPU-native).

Reproduces the numerics of the reference's in-model torchaudio frontend
(``pytorch_neural_nets.py:92-99, 142-153``):

    MelSpectrogram(sample_rate=22050, n_fft=2048, win_length=512,
                   hop_length=256, n_mels=128, f_max=8000)
    → sqrt(log10(power + 1))          (:80-81, 147)
    → trim 259 frames → 256           (:150)

with torchaudio's documented defaults: power=2.0, HTK mel scale, norm=None,
periodic Hann window zero-padded 512→2048, center=True, pad_mode="reflect".

TPU-first design — instead of a literal STFT:

  * The Hann window is only 512 wide inside the 2048-point FFT, so each DFT
    is exactly a (512 → 1025-bin) projection.  We fold the window into two
    dense DFT matrices and evaluate the whole spectrogram as ONE matmul on
    the MXU: frames(B·256, 512) @ W(512, 2050), then square-and-add.
  * Framing is a single gather from the padded waveform, using a
    precomputed (256, 512) index table.  Frame 0 is the only frame that
    touches torch's per-window reflect padding (frames 1..255 are interior),
    so its reflected indices are baked into the table.
  * The mel filterbank is a second small matmul (1025 → 128).

Everything is static-shaped and jit-friendly; windows are gathered on device
straight from the (chunk-resident) waveform so overlapping windows never
re-cross the host↔device boundary.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Reference frontend constants (pytorch_neural_nets.py:92-99)
SR = 22050
N_FFT = 2048
WIN_LENGTH = 512
HOP_LENGTH = 256
N_MELS = 128
F_MIN = 0.0
F_MAX = 8000.0
FRAMES = 256                      # trimmed from 259 (pytorch_neural_nets.py:150)
WINDOW_SAMPLES = SR * 3           # 66150
N_FREQS = N_FFT // 2 + 1          # 1025
_PAD = (N_FFT - WIN_LENGTH) // 2  # 768: window's offset inside the FFT frame


def hann_periodic(n: int) -> np.ndarray:
    """torch.hann_window(n) — periodic Hann."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float64)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=4)
def mel_filterbank(
    n_freqs: int = N_FREQS,
    f_min: float = F_MIN,
    f_max: float = F_MAX,
    n_mels: int = N_MELS,
    sample_rate: int = SR,
) -> np.ndarray:
    """torchaudio.functional.melscale_fbanks(htk, norm=None) → (n_freqs, n_mels)."""
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min, m_max = hz_to_mel_htk(f_min), hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)                                  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]             # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def dft_matrices() -> np.ndarray:
    """Window-folded real DFT, stacked: (WIN_LENGTH, 2*N_FREQS) float32.

    W[j, k]         = hann[j] * cos(2π k (j+768) / 2048)
    W[j, k+N_FREQS] = hann[j] * sin(2π k (j+768) / 2048)

    so  power[k] = (f@W)[k]² + (f@W)[k+N_FREQS]²  for a 512-sample frame f.
    """
    j = np.arange(WIN_LENGTH, dtype=np.float64)[:, None]
    k = np.arange(N_FREQS, dtype=np.float64)[None, :]
    phase = 2.0 * np.pi * k * (j + _PAD) / N_FFT
    w = hann_periodic(WIN_LENGTH)[:, None]
    return np.concatenate([w * np.cos(phase), w * np.sin(phase)], axis=1).astype(
        np.float32
    )


@lru_cache(maxsize=4)
def frame_index_table(frames: int = FRAMES) -> np.ndarray:
    """(frames, WIN_LENGTH) int32 sample offsets relative to a window start.

    torch.stft(center=True, pad_mode="reflect") pads each 66150-sample window
    by 1024 on each side by reflecting the window's own edges.  The nonzero
    (512-wide) part of frame k covers window samples [(k-1)·256, (k+1)·256);
    only frame 0 reaches into the left reflect pad, where padded index -j maps
    to window sample j.  Frames ≥256 (which touch the right pad) are trimmed
    by the model (pytorch_neural_nets.py:150) and never computed.
    """
    idx = np.empty((frames, WIN_LENGTH), dtype=np.int32)
    base = np.arange(WIN_LENGTH, dtype=np.int32)
    for k in range(1, frames):
        idx[k] = (k - 1) * HOP_LENGTH + base
    # frame 0: padded positions -256..255 → |position| under reflection
    pos = np.arange(-HOP_LENGTH, HOP_LENGTH + (WIN_LENGTH - 2 * HOP_LENGTH), dtype=np.int32)
    idx[0] = np.abs(pos)
    return idx


def gather_frames(waveform: jnp.ndarray, starts: jnp.ndarray):
    """Extract STFT frames for many windows — no gather on the hot path.

    waveform: (N,) float — zero-padded chunk, every window fully in-bounds
    starts:   (B,) int32 — window start sample offsets into ``waveform``
    returns:  (B, 256, WIN_LENGTH) float32 — the layout is specialized for
    the model's fixed 256-frame window (a configurable frame count would
    only ever assert; review r3 batch 7 removed the dead parameter)

    Each window is one contiguous dynamic_slice (a DMA, not a gather).
    Frames 1..F-1 at 50% overlap are two interleaved views of a
    (F+1, HOP)-reshape — w[(k-1)·256 : (k+1)·256] — so framing is a
    reshape+concat, which XLA fuses; a table-driven gather of the same data
    was ~2-3× slower on TPU.  Frame 0 (the only frame touching torch's
    per-window reflect pad) is an explicit flip+concat.
    """
    def one(start):
        w = jax.lax.dynamic_slice(waveform, (start,), (WINDOW_SAMPLES,))
        return frames_from_window(w)

    return jax.vmap(one)(starts.astype(jnp.int32))


def frames_from_window(w: jnp.ndarray) -> jnp.ndarray:
    """One 66150-sample window → (256, 512) STFT frames.

    The single home of the frame layout (50%-overlap interleaved views +
    frame-0 reflect), shared by gather_frames and log_mel_clips so the
    reflect indexing cannot drift between the chunk and the training
    frontends (review r3 batch 7; pallas_frame_mel.py re-derives the same
    layout in-kernel and parity-tests against this).
    """
    b = w[: (FRAMES + 1) * HOP_LENGTH].reshape(FRAMES + 1, HOP_LENGTH)
    mid = jnp.concatenate([b[: FRAMES - 1], b[1:FRAMES]], axis=1)  # (255, 512)
    f0 = jnp.concatenate([w[1 : HOP_LENGTH + 1][::-1], w[:HOP_LENGTH]])[None, :]
    return jnp.concatenate([f0, mid], axis=0)


def log_mel_from_frames(frames: jnp.ndarray, precision=None) -> jnp.ndarray:
    """(B, F, 512) frames → (B, n_mels, F) compressed log-mel."""
    w = jnp.asarray(dft_matrices())                           # (512, 2050)
    fb = jnp.asarray(mel_filterbank())                        # (1025, 128)
    proj = jnp.matmul(frames, w, precision=precision)         # (B, F, 2050)
    re, im = proj[..., :N_FREQS], proj[..., N_FREQS:]
    power = re * re + im * im                                 # (B, F, 1025)
    mel = jnp.matmul(power, fb, precision=precision)          # (B, F, n_mels)
    mel = jnp.sqrt(jnp.log10(mel + 1.0))                      # :80-81
    return jnp.transpose(mel, (0, 2, 1))                      # (B, n_mels, F)


def log_mel_windows(
    waveform: jnp.ndarray,
    starts: jnp.ndarray,
    precision=None,
) -> jnp.ndarray:
    """Fused gather + DFT + mel + compression for a batch of windows.

    Returns (B, n_mels, 256) float32 — matches the reference model's
    internal ``mel_spec`` right before the U-Net (pytorch_neural_nets.py:150).
    """
    f = gather_frames(waveform.astype(jnp.float32), starts)
    return log_mel_from_frames(f, precision=precision)


def log_mel_single(waveform: np.ndarray, precision=jax.lax.Precision.HIGHEST):
    """Convenience: one 66150-sample window → (n_mels, 256). Host-callable."""
    wf = jnp.asarray(waveform, jnp.float32)
    out = log_mel_windows(wf, jnp.zeros((1,), jnp.int32), precision=precision)
    return np.asarray(out[0])

def log_mel_clips(clips: jnp.ndarray, precision=None) -> jnp.ndarray:
    """(B, 66150) independent 3 s clips → (B, n_mels, 256) compressed log-mel.

    Same frame layout as gather_frames but each clip IS its window, so no
    dynamic_slice is needed — pure reshape/concat views that XLA fuses.
    Used by the on-device training batch synthesizer (train/device_data.py).

    Precision note (train/serve consistency): callers on the training path
    pass precision=None (TPU default = one-pass bf16 matmuls) DELIBERATELY —
    it matches the fast-mode inference frontend (config mel_precision
    "auto"), so features/targets seen in training are the features seen in
    production serving.  Parity-mode inference (HIGHEST) differs from both
    by construction; the 24-condition hardware grid bounds the F1 effect at
    ±0.002 (docs/PROFILE_r03.md).  Pass an explicit precision to pin.
    """
    f = jax.vmap(frames_from_window)(clips.astype(jnp.float32))
    return log_mel_from_frames(f, precision=precision)
