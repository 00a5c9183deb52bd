"""Music post-filter (engine/postfilter.py): feature behavior, fail-open
rules, and Detector integration.

The filter is opt-in (engine.music_filter=None by default) and can only
drop regions; these tests pin that contract plus the discriminator's
basic physics (a beat-periodic signal scores high, speech-like aperiodic
modulation scores low).  Measured real-audio evidence lives in
docs/QUALITY_r03_realaudio.json, not here.
"""

import numpy as np
import pytest

from softspoken_tpu import Config, ckpt
from softspoken_tpu.engine import Detector
from softspoken_tpu.engine import postfilter as PF

SR = 22050


def _beat_signal(seconds=6.0, bpm=126.0, sr=SR, seed=0):
    """Four-on-the-floor kick + offbeat hat: strongly beat-periodic."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    x = np.zeros(n, np.float32)
    period = 60.0 / bpm
    t_kick = np.arange(0.0, seconds, period)
    for tk in t_kick:
        i = int(tk * sr)
        dur = int(0.09 * sr)
        seg = np.arange(min(dur, n - i))
        x[i:i + len(seg)] += (np.sin(2 * np.pi * 55.0 * seg / sr)
                              * np.exp(-seg / (0.03 * sr))).astype(np.float32)
    for tk in t_kick + period / 2:
        i = int(tk * sr)
        dur = int(0.03 * sr)
        if i + dur >= n:
            continue
        x[i:i + dur] += (0.3 * rng.standard_normal(dur)).astype(np.float32)
    return x


def _speechlike(seconds=6.0, sr=SR, seed=1):
    """Aperiodic syllabic AM over voiced harmonics: speech-shaped."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    carrier = sum(np.sin(k * phase) / k for k in range(1, 6))
    # random syllable gates, 3-8 Hz-ish but jittered (aperiodic)
    gate = np.zeros(n, np.float32)
    pos = 0.0
    while pos < seconds:
        on = rng.uniform(0.08, 0.25)
        off = rng.uniform(0.05, 0.3)
        i0, i1 = int(pos * sr), min(int((pos + on) * sr), n)
        gate[i0:i1] = 1.0
        pos += on + off
    return (carrier * gate).astype(np.float32)


def test_beat_scores_high_speech_scores_low():
    m = PF.music_score(_beat_signal(), SR)
    s = PF.music_score(_speechlike(), SR)
    assert m > PF.DEFAULT_THRESHOLD, m
    assert s < PF.DEFAULT_THRESHOLD * 0.75, s
    # and mixing speech over the beat drags the score DOWN toward speech:
    # the measured safety property (speech+music regions are kept)
    mix = _beat_signal() + 1.5 * _speechlike()
    assert PF.music_score(mix, SR) < m


def test_fail_open_short_and_degenerate():
    # too short to score -> -inf (kept)
    assert PF.music_score(np.zeros(int(1.0 * SR), np.float32), SR) == -np.inf
    # silence/constant -> -inf (flux has zero variance)
    assert PF.music_score(np.zeros(int(5.0 * SR), np.float32), SR) == -np.inf


def test_context_bounds():
    # short region extends symmetrically to 4 s
    s, e = PF.context_bounds(10.0, 10.5, 60.0)
    assert (e - s) == pytest.approx(4.0) and s == pytest.approx(8.25)
    # clamped at file start: window slides right, keeps length
    s, e = PF.context_bounds(0.2, 0.7, 60.0)
    assert s == 0.0 and e == pytest.approx(4.0)
    # clamped at file end
    s, e = PF.context_bounds(59.0, 59.5, 60.0)
    assert e == 60.0 and s == pytest.approx(56.0)
    # short file: whole file
    s, e = PF.context_bounds(1.0, 2.0, 3.0)
    assert (s, e) == (0.0, 3.0)
    # long region unchanged
    s, e = PF.context_bounds(5.0, 15.0, 60.0)
    assert (s, e) == (5.0, 15.0)


def test_filter_intervals_fail_open_on_reader_error():
    ivs = [(1.0, 2.0), (5.0, 6.0)]

    def bad_reader(s, e):
        raise IOError("decode failed")

    kept, scores = PF.filter_intervals(ivs, bad_reader, SR, 60.0, 0.6)
    assert kept == ivs and all(v == -np.inf for v in scores)

    kept, _ = PF.filter_intervals(ivs, lambda s, e: None, SR, 60.0, 0.6)
    assert kept == ivs


def test_filter_intervals_drops_music_keeps_speech():
    beat = _beat_signal(seconds=20.0)
    speech = _speechlike(seconds=20.0)
    audio = np.concatenate([beat, speech])
    dur = len(audio) / SR

    def rd(s, e):
        return audio[int(s * SR):int(e * SR)]

    ivs = [(5.0, 6.0), (25.0, 26.0)]  # one inside beat, one inside speech
    kept, scores = PF.filter_intervals(ivs, rd, SR, dur, PF.DEFAULT_THRESHOLD)
    assert kept == [(25.0, 26.0)]
    assert scores[0] >= PF.DEFAULT_THRESHOLD > scores[1]


def test_detector_music_filter_optin(tmp_path):
    """detect_waveform applies the filter only when configured, and the
    grid/score outputs are unchanged either way."""
    cfg = Config().with_engine(
        precision="parity", device_batch=4, chunk_seconds=12.0)
    base = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    audio = _beat_signal(seconds=12.0)
    r0 = base.detect_waveform(audio)
    # fixture weights fire on most input -> expect at least one region
    assert r0.intervals, "fixture detector found nothing; test premise broken"

    filt = Detector(cfg.with_engine(music_filter=PF.DEFAULT_THRESHOLD),
                    variables=ckpt.fixture_variables(seed=0))
    r1 = filt.detect_waveform(audio)
    assert list(r1.avg_values) == list(r0.avg_values)  # grid untouched
    assert len(r1.intervals) < len(r0.intervals) or r1.intervals == []

    # speech-like content is kept even with the filter on
    sp = _speechlike(seconds=12.0)
    k0 = base.detect_waveform(sp)
    k1 = filt.detect_waveform(sp)
    assert k1.intervals == k0.intervals


def test_detector_music_filter_streaming_path(tmp_path):
    """detect_file_streaming (host pipeline) applies the filter too."""
    from softspoken_tpu.io import wavio

    cfg = Config().with_engine(
        precision="parity", device_batch=4, chunk_seconds=12.0)
    path = str(tmp_path / "beat.wav")
    wavio.write(path, _beat_signal(seconds=12.0), SR, subtype="PCM_16")
    base = Detector(cfg, variables=ckpt.fixture_variables(seed=0))
    filt = Detector(cfg.with_engine(music_filter=PF.DEFAULT_THRESHOLD),
                    variables=ckpt.fixture_variables(seed=0))
    r0 = base.detect_file_streaming(path)
    r1 = filt.detect_file_streaming(path)
    assert r0.intervals
    assert len(r1.intervals) < len(r0.intervals) or r1.intervals == []
