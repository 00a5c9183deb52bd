"""scripts/quality_grid.py host-side machinery: score-grid cache round-trip
and rescore-equals-live-metrics.  The actual grid (24 conditions on the
trained checkpoint) runs on TPU via the script; here we pin that the cached
path reproduces the live path bit-for-bit with a stub detector."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import quality_grid as QG  # noqa: E402


class _Res:
    def __init__(self, avg, dur, intervals):
        self.avg_values = avg
        self.audio_seconds = dur
        self.intervals = intervals


class _StubDet:
    """Deterministic score grids keyed by path."""

    def __init__(self, grids):
        self.grids = grids

    def detect_file_streaming(self, path):
        avg, dur, ivs = self.grids[path]
        return _Res(avg, dur, ivs)


def _labeled():
    rng = np.random.default_rng(9)
    grids, labeled = {}, []
    for i in range(3):
        # grid bins are engine frames; synthetic scores with a few bursts
        avg = rng.uniform(0.0, 0.08, size=400).astype(np.float32)
        for s in (40 + 30 * i, 200, 330):
            avg[s:s + 25] = rng.uniform(0.5, 0.9, size=25)
        truth = [(1.0 + 0.5 * i, 3.0 + 0.5 * i), (8.0, 9.5)]
        path = f"f{i}.wav"
        grids[path] = (avg, 30.0, ((1.0, 3.0),))
        labeled.append((path, truth))
    return _StubDet(grids), labeled


def test_cache_roundtrip(tmp_path):
    det, labeled = _labeled()
    per_file = QG.detect_set(det, labeled)
    p = str(tmp_path / "v1_clean.npz")
    QG.save_cache(p, per_file)
    back = QG.load_cache(p)
    assert len(back) == len(per_file)
    for a, b in zip(per_file, back):
        np.testing.assert_array_equal(a["avg"], b["avg"])
        assert a["dur"] == b["dur"]
        assert a["truth"] == b["truth"]
        assert a["intervals"] == b["intervals"]


def test_rescore_matches_live(tmp_path):
    det, labeled = _labeled()
    per_file = QG.detect_set(det, labeled)
    live = QG.metrics_from(per_file, pad_seconds=3.0)
    p = str(tmp_path / "c.npz")
    QG.save_cache(p, per_file)
    rescored = QG.metrics_from(QG.load_cache(p), pad_seconds=3.0)
    assert live == rescored


def test_metrics_include_granularity_key():
    det, labeled = _labeled()
    out = QG.score_set(det, labeled, pad_seconds=3.0)
    assert "event_f1_granularity" in out["parity"]
    assert "event_f1_granularity" in out["tuned"]
    assert 0.0 <= out["parity"]["event_f1_granularity"] <= 1.0
    # engine intervals still surface for the codec gate
    assert out["intervals"][0] == ((1.0, 3.0),)


def test_cache_preserves_paths_and_new_sweeps(tmp_path):
    """Round-4 additions: the cache carries the eval WAV path (postfilter
    A/B needs the audio), and metrics include the smoothing + IoU sweeps."""
    det, labeled = _labeled()
    per_file = QG.detect_set(det, labeled)
    assert all(pf["path"].endswith(".wav") for pf in per_file)
    p = str(tmp_path / "c.npz")
    QG.save_cache(p, per_file)
    back = QG.load_cache(p)
    assert [pf["path"] for pf in back] == [pf["path"] for pf in per_file]
    out = QG.metrics_from(per_file, pad_seconds=3.0)
    assert set(out["smooth_sweep"]) == {
        "s3", "s5", "s7", "s3+hyst0.05", "s5+hyst0.05", "s7+hyst0.05"}
    assert set(out["event_f1_iou_sweep"]) == {"0.3", "0.5", "0.7"}
    # IoU is monotone: looser overlap can only match more events
    sw = out["event_f1_iou_sweep"]
    assert sw["0.3"] >= sw["0.5"] >= sw["0.7"]


def test_postfilter_parity_metrics_skips_missing_audio(tmp_path):
    """Pure-rescore mode (audio gone): the A/B degrades to a skip count,
    never crashes or invents numbers."""
    det, labeled = _labeled()
    per_file = QG.detect_set(det, labeled)
    # pin the fake paths under tmp_path: detect_set abspaths the stub
    # names against the CWD, and a real f0.wav there would be scored
    for i, pf in enumerate(per_file):
        pf["path"] = str(tmp_path / f"gone_{i}.wav")
    out = QG.postfilter_parity_metrics(per_file, 3.0, 0.85)
    assert out["skipped_files"] == len(per_file)
    assert "frame_f1" not in out


def test_postfilter_parity_metrics_with_real_audio(tmp_path):
    """With the eval WAVs on disk the A/B scores real contexts; speech-free
    tone files produce finite metrics and non-negative drop counts."""
    from softspoken_tpu.io import wavio

    det, labeled = _labeled()
    per_file = QG.detect_set(det, labeled)
    sr = 22050
    t = np.arange(30 * sr) / sr
    for i, pf in enumerate(per_file):
        path = str(tmp_path / f"f{i}.wav")
        wavio.write(path, (0.1 * np.sin(2 * np.pi * 500 * t)).astype(
            np.float32), sr, subtype="PCM_16")
        pf["path"] = path
    out = QG.postfilter_parity_metrics(per_file, 3.0, 0.85)
    assert out["files_scored"] == len(per_file)
    assert out["skipped_files"] == 0
    assert 0.0 <= out["frame_f1"] <= 1.0
    assert 0 <= out["regions_dropped"] <= out["regions_total"]
