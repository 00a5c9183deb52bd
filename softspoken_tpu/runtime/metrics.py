"""Throughput & timing instrumentation.

The reference's north-star number is the live "Processing Speed
(audio sec / real sec)" computed by the Voice Detector screen
(``silencer_ui.py:152-158, 276-299``).  Here the same metric is a
first-class counter, decoupled from any GUI, plus simple stage timers.
"""

from __future__ import annotations

import json
import time
from collections import defaultdict
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Dict


@dataclass
class ThroughputMeter:
    """audio-seconds processed per wall-second (and per chip)."""

    n_chips: int = 1
    audio_seconds: float = 0.0
    _t0: float = field(default_factory=time.perf_counter)

    def reset(self) -> None:
        self.audio_seconds = 0.0
        self._t0 = time.perf_counter()

    def add_audio(self, seconds: float) -> None:
        self.audio_seconds += seconds

    @property
    def wall_seconds(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def audio_sec_per_wall_sec(self) -> float:
        w = self.wall_seconds
        return self.audio_seconds / w if w > 0 else 0.0

    @property
    def per_chip(self) -> float:
        return self.audio_sec_per_wall_sec / max(1, self.n_chips)

    def summary(self) -> Dict[str, float]:
        wall = self.wall_seconds  # one clock snapshot for a consistent record
        rate = self.audio_seconds / wall if wall > 0 else 0.0
        return {
            "audio_seconds": self.audio_seconds,
            "wall_seconds": wall,
            "audio_sec_per_wall_sec": rate,
            "audio_sec_per_wall_sec_per_chip": rate / max(1, self.n_chips),
        }


class StageTimers:
    """Accumulating named wall-clock timers (decode/resample/device/post…).

    Thread-safe accumulation: DetectRunner's file-concurrency mode times
    "detect" from several worker threads at once (the summed wall then
    counts overlapped time per-stream, like CPU-seconds)."""

    def __init__(self):
        import threading

        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in sorted(self.totals.items())})


# ---------------------------------------------------------------------------
# FLOPs accounting / MFU
# ---------------------------------------------------------------------------

# TPU v5e peak: 197 TFLOP/s bf16 (394 TOPS int8); override for other chips.
TPU_V5E_PEAK_FLOPS = 197e12


def analytic_flops_per_window(include_spec_head: bool = False) -> float:
    """Analytic forward FLOPs for ONE 3 s window (mel frontend + U-Net).

    Derived from the layer spec (SURVEY.md §2.1, pytorch_neural_nets.py:
    79-197): multiply-accumulate = 2 FLOPs; BN/ReLU/pool elementwise terms
    are <1% and ignored. Detection DCE's the spec head (only the mask head
    is fetched), so it is excluded by default.
    """

    def resblock2d(h, w, cin, cout):
        proj = 2 * h * w * cin * cout           # 1×1 shortcut
        c1 = 2 * h * w * 9 * cin * cout         # 3×3
        c2 = 2 * h * w * 9 * cout * cout        # 3×3
        return proj + c1 + c2

    f = 0.0
    # mel frontend (ops/mel.py): frames(256×512) @ DFT(512×2050) + power +
    # (256×1025) @ mel(1025×128)
    f += 2 * 256 * 512 * 2050
    f += 3 * 256 * 1025
    f += 2 * 256 * 1025 * 128

    # encoder
    f += resblock2d(128, 256, 1, 32)
    f += resblock2d(64, 128, 32, 64)
    f += resblock2d(32, 64, 64, 96)
    f += resblock2d(16, 32, 96, 128)
    # bottleneck ×2
    f += 2 * resblock2d(8, 16, 128, 128)
    # decoder (upsample + skip concat)
    f += resblock2d(16, 32, 256, 96)
    f += resblock2d(32, 64, 192, 64)
    f += resblock2d(64, 128, 128, 32)
    f += resblock2d(128, 256, 64, 32)
    # mask head: Conv2d(32→4, kernel 128×1) + ResBlock1D(4,4) + Conv1d(4→1)
    f += 2 * 256 * (128 * 32) * 4
    f += 2 * 256 * (4 * 4 + 3 * 4 * 4 + 3 * 4 * 4)
    f += 2 * 256 * 4
    if include_spec_head:
        f += resblock2d(128, 256, 32, 32)
        f += 2 * 128 * 256 * 32 * 2
    return float(f)


def flops_per_audio_second(step_seconds: float = 0.6,
                           include_spec_head: bool = False) -> float:
    """FLOPs the pipeline must execute per second of audio (one window per
    ``step_seconds`` of recording)."""
    return analytic_flops_per_window(include_spec_head) / step_seconds


def mfu(audio_sec_per_wall_sec: float,
        peak_flops: float = TPU_V5E_PEAK_FLOPS,
        step_seconds: float = 0.6) -> float:
    """Model FLOPs Utilization: achieved forward FLOPs/s over chip peak."""
    return audio_sec_per_wall_sec * flops_per_audio_second(step_seconds) / peak_flops
