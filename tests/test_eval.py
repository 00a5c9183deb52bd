"""Detection-quality harness (train/evaluate.py): metric math + labels IO +
the harness loop with a stubbed detector (the real detector is exercised on
TPU via `softspoken_tpu eval`; running the U-Net per window here on the
1-core CPU host would dominate the suite)."""

import os

import numpy as np

from softspoken_tpu.train import evaluate as E


def test_frame_metrics_exact_overlap():
    m = E.frame_metrics([(1.0, 2.0)], [(1.0, 2.0)], duration=4.0)
    assert m["f1"] == 1.0 and m["fp"] == 0 and m["fn"] == 0


def test_frame_metrics_disjoint():
    m = E.frame_metrics([(0.0, 1.0)], [(2.0, 3.0)], duration=4.0)
    assert m["f1"] == 0.0 and m["tp"] == 0


def test_frame_metrics_partial():
    m = E.frame_metrics([(0.0, 2.0)], [(1.0, 2.0)], duration=2.0)
    assert m["recall"] == 1.0
    assert 0.4 < m["precision"] < 0.6


def test_event_metrics_greedy_matching():
    pred = [(0.0, 1.0), (0.05, 1.05), (5.0, 6.0)]
    truth = [(0.0, 1.0), (8.0, 9.0)]
    m = E.event_metrics(pred, truth, iou=0.5)
    # best-overlap prediction matches; duplicate + stray are FPs
    assert m["tp"] == 1 and m["fp"] == 2 and m["fn"] == 1


def test_event_metrics_iou_threshold():
    m = E.event_metrics([(0.0, 0.4)], [(0.0, 1.0)], iou=0.5)
    assert m["tp"] == 0
    m = E.event_metrics([(0.0, 0.6)], [(0.0, 1.0)], iou=0.5)
    assert m["tp"] == 1


def test_labels_roundtrip(tmp_path):
    p = str(tmp_path / "labels.csv")
    labeled = [("a.wav", [(0.5, 1.25), (3.0, 4.5)]), ("b.wav", [(1.0, 2.0)])]
    E.save_labels(p, labeled)
    got = E.load_labels(p)
    assert [os.path.basename(f) for f, _ in got] == ["a.wav", "b.wav"]
    assert got[0][1] == [(0.5, 1.25), (3.0, 4.5)]
    # relative names resolve against the CSV's directory
    assert got[0][0] == str(tmp_path / "a.wav")


def test_make_eval_set_and_harness(tmp_path):
    labels = E.make_eval_set(str(tmp_path), n_files=2, seconds=10.0, seed=3)
    labeled = E.load_labels(labels)
    assert len(labeled) == 2
    for path, ivs in labeled:
        assert os.path.exists(path)
        assert len(ivs) >= 1

    class OracleDetector:
        """Returns the truth (plus one spurious event) — harness plumbing check."""

        def detect_file(self, path):
            truth = dict(labeled)[path]

            class R:
                intervals = list(truth) + [(8.0, 8.05)]  # killed by min-len

            return R()

    out = E.evaluate_detector(OracleDetector(), labeled)
    assert out["event"]["f1"] == 1.0
    assert out["frame"]["f1"] > 0.99
    assert len(out["files"]) == 2
