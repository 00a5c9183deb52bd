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


def test_event_metrics_granularity_rematch():
    """One prediction legitimately spanning two close truth events is a
    granularity artifact at a coarse merge gap, not a detection miss: the
    plain metric penalizes both sides, the granularity-matched one (truth
    re-merged at the operating point's break_duration) scores it 1.0."""
    truth = [(0.0, 1.0), (1.4, 2.4)]  # 0.4 s apart < parity merge 0.5 s
    pred = [(0.0, 2.4)]  # what a break_duration=0.5 detector emits
    plain = E.event_metrics(pred, truth, iou=0.5)
    assert plain["tp"] == 0 and plain["fn"] == 2 and plain["fp"] == 1
    g = E.event_metrics_granularity(pred, truth, break_duration=0.5, iou=0.5)
    assert g["f1"] == 1.0 and g["tp"] == 1 and g["fp"] == 0 and g["fn"] == 0
    # gaps wider than break_duration stay separate events — still penalized
    far = [(0.0, 1.0), (2.0, 3.0)]
    g2 = E.event_metrics_granularity([(0.0, 3.0)], far, break_duration=0.5)
    assert g2["tp"] == 0 and g2["fn"] == 2


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
                audio_seconds = 10.0  # harness reads duration off the result

            return R()

    out = E.evaluate_detector(OracleDetector(), labeled)
    assert out["event"]["f1"] == 1.0
    assert out["frame"]["f1"] > 0.99
    assert len(out["files"]) == 2


def test_evaluate_clamps_before_min_length(tmp_path):
    """A pad-straddling prediction whose audible span is shorter than
    min_len must be dropped: clamp first, then filter (review r3: the old
    order let (-0.5, 0.04) survive as a 0.04 s false positive)."""
    labels = E.make_eval_set(str(tmp_path), n_files=1, seconds=10.0, seed=5)
    labeled = E.load_labels(labels)

    class D:
        def detect_file(self, path):
            truth = dict(labeled)[path]

            class R:
                intervals = list(truth) + [(-0.5, 0.04)]
                audio_seconds = 10.0

            return R()

    out = E.evaluate_detector(D(), labeled)
    assert out["event"]["f1"] == 1.0  # the straddler did not count as a fp


def test_synth_field_recording_snr_vs_bed_only():
    """Overlapping events must not inflate each other's SNR reference: the
    gain is computed against the environment bed, not the accumulating mix
    (review r3 finding).  With many long events forced into a short window,
    the labeled-SNR energy budget must still hold approximately."""
    import numpy as np

    from softspoken_tpu.train.synth import SR, synth_field_recording

    rng = np.random.default_rng(11)
    audio, ivs = synth_field_recording(
        rng, seconds=12.0, speech_events=(6, 6), snr_db=(0.0, 0.0))
    assert ivs  # events exist (overlap-heavy by construction)
    # at SNR 0 vs the bed, total speech power ≈ bed power over speech spans;
    # under the old mix-referenced gain, stacked events compounded well past
    # this. Allow generous slack for synthesis variance.
    act = np.zeros(len(audio), bool)
    for s, e in ivs:
        act[int(s * 32000):int(e * 32000)] = True
    # the mixed recording over speech spans should not be wildly hotter
    # than the bed-only level (r ≈ sqrt(2) at snr 0, stacking quirk gave
    # r drifting upward with overlap count)
    r = np.sqrt(np.mean(audio[act] ** 2) / (np.mean(audio[~act] ** 2) + 1e-12))
    assert r < 3.0


def test_evaluate_clamps_right_edge_too(tmp_path):
    """A right-pad-only prediction (s >= dur) must drop the same way a
    left-pad-only one does, and a pad-straddler at the end is judged by
    its audible span (review r3 batch 6)."""
    labels = E.make_eval_set(str(tmp_path), n_files=1, seconds=10.0, seed=5)
    labeled = E.load_labels(labels)

    class D:
        def detect_file(self, path):
            truth = dict(labeled)[path]

            class R:
                # one pad-only event and one end-straddler with 0.04 s
                # audible span — both must be dropped, not scored as FPs
                intervals = list(truth) + [(10.5, 11.0), (9.96, 10.8)]
                audio_seconds = 10.0

            return R()

    out = E.evaluate_detector(D(), labeled)
    assert out["event"]["f1"] == 1.0


def test_load_labels_audacity_txt(tmp_path):
    """The exporter's own output format round-trips back in as labels —
    single .txt and a directory of .txt tracks (review r3 batch 6)."""
    import pandas as pd

    from softspoken_tpu.export.audacity import AudacityTxtTransform
    from softspoken_tpu.io import wavio

    sr = 32000
    for stem in ("rec_a", "rec_b"):
        wavio.write(str(tmp_path / f"{stem}.wav"),
                    np.zeros(sr, np.float32), sr, subtype="PCM_16")
    df = pd.DataFrame([
        dict(file_name="rec_a.wav", start_time=0.5, end_time=1.25, comment="Human"),
        dict(file_name="rec_a.wav", start_time=3.0, end_time=4.5, comment="Human"),
        dict(file_name="rec_b.wav", start_time=1.0, end_time=2.0, comment="Human"),
    ])
    AudacityTxtTransform()(df, base_dir=str(tmp_path), project_name="p")
    out_dir = tmp_path / "Audacity Outputs" / "p"

    # label tracks resolve audio by stem NEXT TO the .txt file
    for stem in ("rec_a", "rec_b"):
        wavio.write(str(out_dir / f"{stem}.wav"),
                    np.zeros(sr, np.float32), sr, subtype="PCM_16")

    got = E.load_labels(str(out_dir / "rec_a.txt"))
    assert os.path.basename(got[0][0]) == "rec_a.wav"
    assert got[0][1] == [(0.5, 1.25), (3.0, 4.5)]
    all_got = E.load_labels(str(out_dir))
    assert [os.path.basename(f) for f, _ in all_got] == ["rec_a.wav", "rec_b.wav"]
    assert all_got[1][1] == [(1.0, 2.0)]


def test_load_labels_txt_missing_audio(tmp_path):
    (tmp_path / "orphan.txt").write_text("0.5\t1.0\tHuman\n")
    try:
        E.load_labels(str(tmp_path / "orphan.txt"))
        assert False, "expected FileNotFoundError"
    except FileNotFoundError:
        pass


# ---- event-error taxonomy (round-5: name the dominant event-F1 failure) ----


def test_taxonomy_miss():
    out = E.event_error_taxonomy([], [(1.0, 2.0), (5.0, 6.0)])
    assert out["miss"] == 2 and out["merged"] == out["split"] == 0
    assert out["boundary"] == 0 and out["matched"] == 0


def test_taxonomy_merged():
    # one prediction spanning two truth events: neither matches at IoU 0.5,
    # both classify as merged (not miss, not boundary)
    out = E.event_error_taxonomy([(1.0, 6.0)], [(1.0, 2.0), (5.0, 6.0)])
    assert out["merged"] == 2 and out["miss"] == 0
    # the spanning prediction is pred-side "fragment", not a false alarm
    assert out["fragment"] == 1 and out["false_alarm"] == 0


def test_taxonomy_split():
    # two fragments over one truth event; each covers too little for IoU 0.5
    out = E.event_error_taxonomy(
        [(1.0, 1.4), (1.6, 2.0)], [(1.0, 2.0)])
    assert out["split"] == 1 and out["boundary"] == 0
    assert out["fragment"] == 2


def test_taxonomy_boundary_trim():
    # one 1:1 overlap that fails the IoU bar: boundary, with the trim
    # magnitude visible in the offset error of... no match, so classify only
    out = E.event_error_taxonomy([(1.0, 1.3)], [(1.0, 2.0)])
    assert out["boundary"] == 1
    assert out["fragment"] == 1 and out["false_alarm"] == 0


def test_taxonomy_false_alarm_and_match_errors():
    out = E.event_error_taxonomy(
        [(1.05, 2.1), (8.0, 9.0)], [(1.0, 2.0)])
    assert out["matched"] == 1 and out["false_alarm"] == 1
    assert abs(out["onset_abs_err_sum"] - 0.05) < 1e-9
    assert abs(out["offset_abs_err_sum"] - 0.1) < 1e-9


def test_taxonomy_counts_reconcile_with_event_metrics():
    pred = [(0.0, 1.0), (2.0, 2.2), (2.4, 3.0), (10.0, 11.0), (20.0, 24.0)]
    truth = [(0.0, 1.0), (2.0, 3.0), (5.0, 6.0), (20.0, 21.0), (23.0, 24.0)]
    em = E.event_metrics(pred, truth)
    tx = E.event_error_taxonomy(pred, truth)
    fn_classes = tx["miss"] + tx["merged"] + tx["split"] + tx["boundary"]
    fp_classes = tx["false_alarm"] + tx["fragment"]
    assert fn_classes == em["fn"]
    assert fp_classes == em["fp"]
    assert tx["matched"] == em["tp"]


def test_taxonomy_finalize_fractions():
    tot = {}
    E.merge_taxonomy(tot, E.event_error_taxonomy([], [(0.0, 1.0)]))
    E.merge_taxonomy(tot, E.event_error_taxonomy([(1.0, 1.3)], [(1.0, 2.0)]))
    fin = E.finalize_taxonomy(tot)
    assert fin["miss"] == 1 and fin["boundary"] == 1
    assert fin["miss_frac_of_fn"] == 0.5 and fin["boundary_frac_of_fn"] == 0.5
    assert fin["onset_mae_s"] == 0.0  # no matched pairs
