import os

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu import Config
from softspoken_tpu.io import wavio
from softspoken_tpu.project import ProjectManager
from softspoken_tpu.ui import ReviewSession, display_spec, plan_view_window, render_review_png


@pytest.fixture
def project(tmp_path):
    cfg = Config().with_paths(project_dir=str(tmp_path / "projects"))
    pm = ProjectManager(cfg)
    pm.add_project("rev")
    proj = pm.set_active_project("rev")
    wavdir = tmp_path / "audio"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    for name in ["a.wav", "b.wav"]:
        wavio.write(str(wavdir / name), rng.uniform(-0.5, 0.5, 22050 * 8).astype(np.float32), 22050)
    det = pd.DataFrame(
        {
            "ID": [1, 2, 3],
            "file_path": [str(wavdir)] * 3,
            "file_name": ["b.wav", "a.wav", "a.wav"],
            "start_time": [1.0, 2.0, 0.5],
            "end_time": [1.5, 2.05, 1.2],   # row 1 is 0.05s → filtered out
            "erase": [0, 0, 0],
            "user_comment": ["", "", ""],
            "review_datetime": ["", "", ""],
        }
    )
    det.to_csv(proj["detections_file"], index=False)
    return cfg, pm, proj, str(wavdir)


def _fixed_now():
    return "2026-08-16 12:00:00"


def test_load_filters_and_sorts(project):
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    # min-length filter dropped the 0.05 s row; sorted by (file_name, start)
    assert len(s) == 2
    assert s.df.iloc[0]["file_name"] == "a.wav"
    assert s.df.iloc[1]["file_name"] == "b.wav"


def test_keep_erase_autoadvance_and_persist(project):
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    s.keep()
    assert s.current_index == 1
    s.erase()
    df = pd.read_csv(proj["review_file"], keep_default_na=False)
    assert df["erase"].tolist() == [0, 1]
    assert df["review_datetime"].tolist() == [_fixed_now()] * 2
    assert s.stats() == {"total": 2, "reviewed": 2, "erased": 1, "kept": 1}
    # exporters ran on persist
    assert os.path.exists(
        os.path.join(pm.projects_folder, "Kaleidoscope Outputs", "rev", "rev.csv")
    )


def test_review_resumes_from_review_csv(project):
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    s.erase(index=0)
    s2 = ReviewSession(proj, pm.projects_folder, cfg)
    assert int(s2.df.iloc[0]["erase"]) == 1
    assert s2.reviewed_mask().tolist() == [True, False]


def test_add_keeps_sort_order_and_assigns_id(project):
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    pos = s.add(wavdir, "a.wav", 0.9, 1.8)
    assert pos == 1  # between a.wav@0.5 and b.wav@1.0
    ids = s.df["ID"].tolist()
    assert len(set(ids)) == 3  # new unique ID assigned on save
    assert s.add(wavdir, "a.wav", 2.0, 1.0) is None  # end <= start rejected


def test_delete_rows(project):
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    s.delete([0])
    assert len(s) == 1
    assert pd.read_csv(proj["review_file"]).shape[0] == 1


def test_plan_view_window_centers_and_clamps(project):
    cfg, pm, proj, wavdir = project
    p = os.path.join(wavdir, "a.wav")
    start, end, total = plan_view_window(p, 4.0, 4.5, widget_width_px=96 * 6, dpi=96, zoom_level=1.0)
    assert total == 6
    assert start <= 4.0 and end >= 4.5
    # detection near EOF clamps against duration (8 s file)
    start2, end2, _ = plan_view_window(p, 7.5, 7.9, widget_width_px=96 * 6, dpi=96)
    assert end2 <= 8.0 + 1e-9


def test_display_spec_shape():
    x = np.random.default_rng(0).normal(0, 0.2, 22050 * 3).astype(np.float32)
    d = display_spec(x)
    assert d.shape == (256, 256)
    full = display_spec(x, trim_edges=False)
    assert full.shape[0] == 257


def test_render_review_png(project):
    cfg, pm, proj, wavdir = project
    png = render_review_png(
        os.path.join(wavdir, "a.wav"), 2.0, 2.8,
        other_detections=[(0.5, 1.2)], widget_width_px=480, widget_height_px=320,
        config=cfg,
    )
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(png) > 5000


def test_edits_on_empty_session_are_noops(project):
    """pandas .at enlarges on out-of-range labels; an unguarded edit on an
    empty session fabricated a phantom NaN row that save() persisted
    (review r3)."""
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    s.delete(list(range(len(s.df))), persist=False)
    assert len(s.df) == 0
    s.set_comment("note")
    s.set_times(1.0, 2.0)
    s.keep()
    s.erase()
    assert len(s.df) == 0
    s.save(persist=False)
    assert len(s.df) == 0


def test_amplitude_to_db_is_librosa_semantics():
    """20*log10 with amin=1e-5 — the reference passes spec**2 into
    librosa.amplitude_to_db (review_detections.py:880), so power 0.01
    maps to -40 dB, not power_to_db's -20 (review r3)."""
    from softspoken_tpu.ui.spectrogram import amplitude_to_db

    power = np.array([1.0, 1e-2, 1e-4])
    db = amplitude_to_db(power)
    np.testing.assert_allclose(db, [0.0, -40.0, -80.0], atol=1e-6)
    # top_db clamp relative to the max
    db2 = amplitude_to_db(np.array([1.0, 1e-8]))
    np.testing.assert_allclose(db2, [0.0, -80.0], atol=1e-6)


def test_stats_kept_counts_reviewed_nonerased(project):
    """An erase=1 row WITHOUT a review timestamp (hand-edited CSV) must not
    eat a reviewed-and-kept row's count (review r3: kept was computed as
    reviewed - erased, which could even go negative)."""
    cfg, pm, proj, wavdir = project
    s = ReviewSession(proj, pm.projects_folder, cfg, now_fn=_fixed_now)
    s.keep()                       # row 0: reviewed, kept
    s.df.loc[1, "erase"] = 1       # row 1: erased but never reviewed
    st = s.stats()
    assert st == {"total": 2, "reviewed": 1, "erased": 1, "kept": 1}


def test_empty_session_stats(project):
    """stats()/reviewed_mask() on an empty review CSV must return zeros,
    not crash on a float64 empty mask (review r3 batch 9)."""
    cfg, pm, proj, wavdir = project
    pd.DataFrame(columns=["ID", "file_path", "file_name", "start_time",
                          "end_time", "erase", "user_comment",
                          "review_datetime"]).to_csv(
        proj["detections_file"], index=False)
    sess = ReviewSession(proj, cfg.paths.project_dir, cfg)
    assert sess.stats() == {"total": 0, "reviewed": 0, "erased": 0, "kept": 0}


def test_add_keeps_sorted_position(project):
    """The vectorized insert lookup must match the old linear scan
    semantics: first row strictly after (file_name, start_time)."""
    cfg, pm, proj, wavdir = project
    sess = ReviewSession(proj, cfg.paths.project_dir, cfg)
    # fixture rows load sorted + min-length-filtered: a.wav 0.5, b.wav 1.0
    at = sess.add(wavdir, "a.wav", 1.0, 1.8, persist=False)
    assert at == 1
    assert list(zip(sess.df["file_name"], sess.df["start_time"])) == [
        ("a.wav", 0.5), ("a.wav", 1.0), ("b.wav", 1.0)]
    at2 = sess.add(wavdir, "c.wav", 0.1, 0.2, persist=False)
    assert at2 == len(sess.df) - 1
    at3 = sess.add(wavdir, "a.wav", 0.0, 0.3, persist=False)
    assert at3 == 0
