"""Acoustic degradations for robustness evaluation (VERDICT r2 next #1).

Applied to a finished (mixed) recording to probe how the trained detector
degrades under real-world capture conditions that neither synthetic
generator models directly:

  * ``rolloff4k``  — cheap-microphone high-frequency rolloff (2nd-order
    Butterworth lowpass at 4 kHz)
  * ``clip``       — input-stage hard clipping (gain into a ±1 limiter so a
    target fraction of samples saturate)
  * ``mulaw``      — 8-bit μ-law codec round trip (G.711-style)
  * ``hum``        — 50 Hz mains hum + harmonics at −25 dBFS
  * ``dropout``    — brief recorder dropouts (zeroed 20–80 ms gaps)

Each function takes and returns float32 at the given sample rate; they are
deterministic given the rng.  Degradations compose: ``apply(audio, sr,
["rolloff4k", "mulaw"], rng)``.
"""

from __future__ import annotations

from typing import Iterable, List

import numpy as np
from scipy import signal

DEGRADATIONS = ("rolloff4k", "clip", "mulaw", "hum", "dropout", "bfp4")


def rolloff4k(audio: np.ndarray, sr: int, rng: np.random.Generator) -> np.ndarray:
    # clamp the cutoff below Nyquist: at sr <= 8000 (telephone-band eval)
    # a 4 kHz Butterworth raises ValueError; a 0.45·sr rolloff is the
    # closest realizable mic-rolloff analogue there (review r3 batch 11)
    cutoff = min(4000.0, 0.45 * sr)
    sos = signal.butter(2, cutoff, btype="low", fs=sr, output="sos")
    return signal.sosfilt(sos, audio).astype(np.float32)


def clip(audio: np.ndarray, sr: int, rng: np.random.Generator,
         clip_fraction: float = 0.02) -> np.ndarray:
    """Gain so ~clip_fraction of samples exceed full scale, then hard clip."""
    mag = np.abs(audio)
    if not mag.any():
        return audio.astype(np.float32)
    thresh = np.quantile(mag, 1.0 - clip_fraction)
    if thresh <= 0:
        return audio.astype(np.float32)
    return np.clip(audio / thresh, -1.0, 1.0).astype(np.float32)


def mulaw(audio: np.ndarray, sr: int, rng: np.random.Generator) -> np.ndarray:
    """8-bit μ-law companding round trip — the SHIPPED transport codec.

    Uses ops.mulaw's exact encode/decode (255-level mid-tread, code 0 ==
    digital silence) through the same int16 quantization a PCM16 file on
    disk would have, so the quality grid's "mulaw" condition exercises the
    codec the fused engine actually puts on the wire (review r3: an earlier
    independent 256-level mid-rise implementation here mapped silence to a
    +8.6e-5 DC pedestal the real codec never produces).
    """
    from ..ops import mulaw as wire

    i16 = np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
    return wire.decode_host(wire.encode_i16(i16))


def hum(audio: np.ndarray, sr: int, rng: np.random.Generator) -> np.ndarray:
    t = np.arange(len(audio)) / sr
    level = 10 ** (-25 / 20.0)
    h = np.zeros(len(audio))
    for k, g in ((1, 1.0), (2, 0.4), (3, 0.25)):
        h += g * np.sin(2 * np.pi * 50.0 * k * t + rng.uniform(0, 2 * np.pi))
    return (audio + level * h / 1.65).astype(np.float32)


def dropout(audio: np.ndarray, sr: int, rng: np.random.Generator,
            per_minute: float = 4.0) -> np.ndarray:
    out = audio.copy()
    n_gaps = max(1, int(len(audio) / sr / 60.0 * per_minute))
    for _ in range(n_gaps):
        g = int(rng.uniform(0.02, 0.08) * sr)
        at = int(rng.integers(0, max(1, len(audio) - g)))
        out[at: at + g] = 0.0
    return out.astype(np.float32)


def bfp4(audio: np.ndarray, sr: int, rng: np.random.Generator) -> np.ndarray:
    """4-bit block-floating-point round trip (ops/bfp4.py) — the
    experimental half-of-mu-law wire, measured here before it is ever
    allowed on the link (upload_codec="bfp4" is opt-in; "auto" never
    selects it)."""
    from ..ops import bfp4 as wire

    i16 = np.clip(np.rint(audio * 32768.0), -32768, 32767).astype(np.int16)
    return wire.roundtrip_i16(i16)


_FNS = {
    "rolloff4k": rolloff4k, "clip": clip, "mulaw": mulaw,
    "hum": hum, "dropout": dropout, "bfp4": bfp4,
}


def apply(audio: np.ndarray, sr: int, kinds: Iterable[str],
          rng: np.random.Generator) -> np.ndarray:
    out = np.asarray(audio, np.float32)
    for kind in kinds:
        out = _FNS[kind](out, sr, rng)
    peak = float(np.abs(out).max())
    if peak > 0.99:
        out = out * (0.99 / peak)
    return out
