"""Independent numpy references for parity testing.

These re-derive torchaudio/reference semantics with a *different algorithm*
than the production code (literal per-frame FFT vs. the fused matmul DFT in
``ops.mel``; a python loop vs. the vectorized scatter in ``engine``), so a
shared bug cannot hide on both sides.
"""

from __future__ import annotations

import numpy as np

SR = 22050
N_FFT = 2048
WIN = 512
HOP = 256
N_MELS = 128


def hann_periodic(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def mel_fb() -> np.ndarray:
    """torchaudio melscale_fbanks(htk, norm=None): (1025, 128)."""
    n_freqs = N_FFT // 2 + 1
    all_freqs = np.linspace(0, SR / 2, n_freqs)
    def h2m(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    def m2h(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m_pts = np.linspace(h2m(0.0), h2m(8000.0), N_MELS + 2)
    f_pts = m2h(m_pts)
    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up))


def log_mel_reference(x: np.ndarray, frames: int = 256) -> np.ndarray:
    """Literal torch.stft-semantics mel: (n_mels, frames).

    center=True reflect pad, periodic Hann zero-padded 512→2048, power=2,
    sqrt(log10(power+1)), trim to `frames`.
    """
    x = np.asarray(x, np.float64)
    pad = N_FFT // 2
    if len(x) <= pad:
        # torch.stft(center=True, pad_mode='reflect') REJECTS inputs
        # shorter than the pad; numpy would silently re-reflect cyclically
        # and this oracle would bless behavior no torch build produces
        # (review r3 batch 15)
        raise ValueError(
            f"input of {len(x)} samples is shorter than the reflect pad "
            f"({pad}); torch.stft raises here")
    xp = np.pad(x, pad, mode="reflect")
    w = np.zeros(N_FFT)
    off = (N_FFT - WIN) // 2
    w[off : off + WIN] = hann_periodic(WIN)
    n_frames_total = 1 + (len(xp) - N_FFT) // HOP
    spec = np.empty((N_FFT // 2 + 1, n_frames_total))
    for t in range(n_frames_total):
        fr = xp[t * HOP : t * HOP + N_FFT] * w
        spec[:, t] = np.abs(np.fft.rfft(fr)) ** 2
    mel = mel_fb().T @ spec                 # (128, n_frames)
    mel = np.sqrt(np.log10(mel + 1.0))
    return mel[:, :frames]


def average_overlapping_reference(mask_preds: np.ndarray, audio_len_padded_s: float,
                                  step_size: float = 0.6):
    """Literal port of the reference scatter loop (NNDetector.py:153-190).

    mask_preds: (num_windows, 256) raw logits.
    Returns list of (avg_value, time_str) like the reference.
    """
    output_length = int(round(audio_len_padded_s * 256 / 3))
    sum_d = np.zeros(output_length)
    cnt_d = np.zeros(output_length)
    tr = 3 / 256
    for i, wd in enumerate(mask_preds):
        start = int(round(i * step_size / tr))
        sum_d[start : start + 256] += wd.reshape(-1)
        cnt_d[start : start + 256] += 1
    out = []
    for idx, (s, c) in enumerate(zip(sum_d, cnt_d)):
        if c >= 1:
            out.append((s / c, f"{idx / (256 / 3):.4f}"))
    return out


def find_regions_reference(avg_list, threshold=0.1, break_duration=0.5):
    """Literal port of NNDetector.find_speech_regions:103-143 semantics:
    iterate (value, time_str) pairs, open/extend runs, then gap-merge."""
    regions = []
    start_time = end_time = None
    for det, t in avg_list:
        if det > threshold:
            if start_time is None:
                start_time = t
            end_time = t
        elif start_time is not None:
            regions.append((start_time, end_time))
            start_time = None
    if start_time is not None:
        regions.append((start_time, end_time))
    if not regions:
        return []
    merged = []
    cur = regions[0]
    for nxt in regions[1:]:
        if float(nxt[0]) - float(cur[1]) <= break_duration:
            cur = (cur[0], nxt[1])
        else:
            merged.append(cur)
            cur = nxt
    merged.append(cur)
    return [(float(s), float(e)) for s, e in merged]
