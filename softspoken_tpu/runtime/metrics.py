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
    """Accumulating named wall-clock timers (decode/resample/device/post…)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in sorted(self.totals.items())})
