"""GUI smoke + interaction tests for ui/qt_app.py under the headless Qt shim.

VERDICT r1's top GUI gap: the Qt shell had never been imported, so any
signal-signature typo would only surface at first launch. These tests
construct every screen, wire all signals, and click through the full
workflow — project creation, file add/remove, detection run, review grading
(zoom/play/comment/add/delete/highlight), silencing — with the synchronous
shim standing in for Qt (softspoken_tpu/ui/qt_shim). With real PySide6
installed the same module runs against it instead.
"""

import os

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu import Config
from softspoken_tpu.io import wavio
from softspoken_tpu.ui.qt_shim import install

install()

from softspoken_tpu.ui import qt_app  # noqa: E402  (needs shim on path first)
from PySide6.QtWidgets import (  # noqa: E402
    QApplication, QFileDialog, QInputDialog, QMessageBox,
)

assert qt_app.HAVE_QT


@pytest.fixture
def app_env(tmp_path, monkeypatch):
    """A SoftspokenApp over an isolated project dir with one small WAV."""
    monkeypatch.chdir(tmp_path)
    # tiny device program: the default 600 s chunk / 128-window batch would
    # compile-and-pad a giant scan for a 2 s test file on the CPU host
    cfg = (
        Config()
        .with_paths(project_dir=str(tmp_path / "projects"))
        .with_engine(precision="parity", device_batch=4, chunk_seconds=12.0)
    )
    # one 2 s recording with a loud band-limited burst
    sr = 22050
    t = np.arange(2 * sr) / sr
    audio = (0.01 * np.random.default_rng(0).standard_normal(len(t))).astype(np.float32)
    audio[(t > 0.5) & (t < 1.0)] += 0.5 * np.sin(2 * np.pi * 700 * t[(t > 0.5) & (t < 1.0)]).astype(np.float32)
    wav = str(tmp_path / "rec.wav")
    wavio.write(wav, audio, sr, subtype="PCM_16")

    QApplication.instance() or QApplication([])
    win = qt_app.SoftspokenApp(cfg)
    win.show()
    return win, wav, tmp_path


def _make_project(win, wav, monkeypatch, name="proj"):
    monkeypatch.setattr(QInputDialog, "getText",
                        staticmethod(lambda *a, **k: (name, True)))
    win.home._layout.items  # touch: home screen built
    win.new_project()
    assert win.pm.current_project["name"] == name
    monkeypatch.setattr(QFileDialog, "getOpenFileNames",
                        staticmethod(lambda *a, **k: ([wav], "")))
    win.workspace.add_files()
    return win.pm.current_project


def test_all_screens_construct_and_navigate(app_env):
    win, _, _ = app_env
    assert win.stack.currentWidget() is win.home
    # menus wired
    menus = win.menuBar().shim_menus()
    assert [m._title for m in menus] == ["&File", "&Help"]
    assert len(menus[0].actions()) == 4  # New/Open/Close Project + Quit


def test_project_flow_and_file_list(app_env, monkeypatch):
    win, wav, _ = app_env
    _make_project(win, wav, monkeypatch)
    assert win.stack.currentWidget() is win.workspace
    assert win.workspace.files.count() == 1
    assert "Not Started" in win.workspace.status.text() or "not" in win.workspace.status.text().lower()

    # remove with confirm dialog (default answer Yes)
    win.workspace.files.shim_selectRows([0])
    win.workspace.remove_selected()
    assert win.workspace.files.count() == 0
    # declined confirm leaves the list alone
    monkeypatch.setattr(QFileDialog, "getOpenFileNames",
                        staticmethod(lambda *a, **k: ([wav], "")))
    win.workspace.add_files()
    monkeypatch.setattr(QMessageBox, "_question_answer",
                        QMessageBox.StandardButton.No)
    win.workspace.files.shim_selectRows([0])
    win.workspace.remove_selected()
    assert win.workspace.files.count() == 1


def test_detector_screen_runs_detection(app_env, monkeypatch):
    win, wav, _ = app_env
    _make_project(win, wav, monkeypatch)
    win.show_detector()
    assert win.stack.currentWidget() is win.detector
    win.detector.start_btn.click()     # synchronous under the shim
    assert win.detector.start_btn.isEnabled()  # re-enabled on finish
    assert win.detector.overall_bar.value() == 100
    assert "done" in win.detector.log.text()
    assert os.path.exists(win.pm.current_project["detections_file"])
    df = pd.read_csv(win.pm.current_project["detections_file"])
    assert len(df) >= 1


def _detect_then_review(win, wav, monkeypatch):
    _make_project(win, wav, monkeypatch)
    win.show_detector()
    win.detector.start_btn.click()
    win.show_review()
    return win.review


@pytest.mark.slow
def test_review_grade_highlight_and_zoom(app_env, monkeypatch):
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    assert win.stack.currentWidget() is win.review
    n = review.table.rowCount()
    assert n >= 1
    # spectrogram rendered into the pixmap label
    assert review.image.pixmap() is not None
    assert review.image.pixmap().data[:8] == b"\x89PNG\r\n\x1a\n"

    # grade: keep row 0 → timestamp + pale-green highlight after refresh
    review.table.selectRow(0)
    review.keep()
    assert review.session.df.iloc[0]["erase"] == 0
    assert str(review.session.df.iloc[0]["review_datetime"]) != ""
    bg = review.table.item(0, 0).background().color()
    assert (bg.r, bg.g, bg.b) == review.REVIEWED_COLOR

    # zoom halves/doubles seconds-per-inch, clamped, re-renders
    z0 = review.zoom_level
    review.zoom_in()
    assert review.zoom_level == z0 / 2
    review.zoom_out()
    review.zoom_out()
    assert review.zoom_level == z0 * 2
    assert "s/in" in review.zoom_label.text()
    for _ in range(20):
        review.zoom_out()
    assert review.zoom_level == review.ZOOM_MAX


def test_review_playback_exports_segment(app_env, monkeypatch):
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    review.table.selectRow(0)
    review.play_segment()   # no sounddevice in CI → temp-WAV export path
    assert review.last_play_path and os.path.exists(review.last_play_path)
    seg_info = wavio.info(review.last_play_path)
    assert seg_info.samplerate == 22050
    first = review.last_play_path

    review.play_window()    # visible-window playback (plan_view_window range)
    assert review.last_play_path != first
    win_info = wavio.info(review.last_play_path)
    assert win_info.frames >= seg_info.frames  # window ⊇ detection


def test_review_comment_editing_persists(app_env, monkeypatch):
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    c = review._col_index("user_comment")
    review.table.item(0, c).setText("wind turbine, not speech")
    # persisted through the session to the review CSV
    df = pd.read_csv(win.pm.current_project["review_file"])
    assert df.iloc[0]["user_comment"] == "wind turbine, not speech"


def test_review_add_and_delete_rows(app_env, monkeypatch):
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    n0 = len(review.session.df)

    DialogCls = qt_app.AddDetectionDialog
    dlg = DialogCls(review, default_file="rec.wav")
    dlg.start_edit.setText("0.100")
    dlg.end_edit.setText("0.250")
    dlg._validate_accept()
    assert dlg.result() == dlg.Accepted
    monkeypatch.setattr(qt_app, "AddDetectionDialog",
                        lambda *a, **k: dlg)
    review.add_detection()
    df = review.session.df
    assert len(df) == n0 + 1
    assert ((df["start_time"] == 0.1) & (df["end_time"] == 0.25)).any()
    # insertion preserved (file_name, start_time) order
    key = list(zip(df["file_name"], df["start_time"].astype(float)))
    assert key == sorted(key)

    review.table.selectRow(0)
    review.delete_row()
    assert len(review.session.df) == n0

    # dialog validation: end ≤ start is rejected with a warning
    bad = DialogCls(review, default_file="rec.wav")
    bad.start_edit.setText("2.0")
    bad.end_edit.setText("1.0")
    bad._validate_accept()
    assert bad.result() == bad.Rejected
    assert QMessageBox._log[-1][0] == "warning"


def test_review_resize_debounce_rerenders(app_env, monkeypatch):
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    review.image.setText("stale")           # clear pixmap
    assert review.image.pixmap() is None
    review.resizeEvent(None)                 # debounce timer fires (shim: now)
    assert review.image.pixmap() is not None


def test_silence_screen_end_to_end(app_env, monkeypatch, tmp_path):
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    review.table.selectRow(0)
    review.erase()                           # flag row 0 for erasure

    win.show_silence()
    assert "flagged for erasure" in win.silence.info.text()
    outdir = str(tmp_path / "silenced")
    monkeypatch.setattr(QFileDialog, "getExistingDirectory",
                        staticmethod(lambda *a, **k: outdir))
    win.silence.start()
    assert "done: 1 silenced" in win.silence.info.text()
    out = os.path.join(outdir, "rec_silenced.wav")
    assert os.path.exists(out)
    # the erased interval is actually zeroed
    df = pd.read_csv(win.pm.current_project["review_file"])
    row = df[df["erase"] == 1].iloc[0]
    data, sr = wavio.read(out)
    s, e = int(round(row["start_time"] * sr)), int(round(row["end_time"] * sr))
    s = max(0, s)
    assert np.abs(data[s:e]).max() == 0.0


def test_gui_smoke_mode(app_env, monkeypatch, tmp_path):
    win, wav, _ = app_env
    _make_project(win, wav, monkeypatch)
    shot = str(tmp_path / "review.png")
    # run detection so the review screen has something to render
    win.show_detector()
    win.detector.start_btn.click()
    rc = qt_app.smoke(win.cfg, screenshot=shot)
    assert rc == 0
    assert os.path.exists(shot) and open(shot, "rb").read(8) == b"\x89PNG\r\n\x1a\n"


def test_play_segment_clamps_negative_start(app_env, monkeypatch):
    """Regression (code review r2): pad-shifted detections can have negative
    start times; play must clamp like export_segment_wav instead of silently
    doing nothing."""
    win, wav, _ = app_env
    _make_project(win, wav, monkeypatch)
    import pandas as pd

    proj = win.pm.current_project
    df = pd.DataFrame([{
        "ID": 1, "file_path": os.path.dirname(wav),
        "file_name": os.path.basename(wav), "start_time": -1.2,
        "end_time": 0.8, "erase": 0, "user_comment": "",
        "review_datetime": "",
    }])
    df.to_csv(proj["detections_file"], index=False)
    win.show_review()
    seen = {}

    def fake_play(self, start, stop):
        seen["range"] = (start, stop)

    monkeypatch.setattr(type(win.review), "_play", fake_play)
    win.review.play_segment()
    assert seen["range"][0] == 0.0
    assert seen["range"][1] == pytest.approx(0.8)


def test_silence_screen_double_click_guard_and_messages(app_env, monkeypatch,
                                                        tmp_path):
    """start disables its button before dispatch (two concurrent runners
    used to write the same output WAVs) and worker messages reach the info
    label (the failure reason was emitted but connected nowhere) —
    review r3 findings."""
    win, wav, _ = app_env
    _make_project(win, wav, monkeypatch)
    win.show_silence()
    outdir = str(tmp_path / "sil2")
    monkeypatch.setattr(QFileDialog, "getExistingDirectory",
                        staticmethod(lambda *a, **k: outdir))
    # no review CSV yet: the worker fails and the REASON must be displayed
    assert not os.path.exists(win.pm.current_project["review_file"])
    win.silence.start()
    assert "silencing failed" in win.silence.info.text()
    assert win.silence.start_btn.isEnabled()  # re-enabled after finish


def test_detect_worker_stop_before_runner_is_honored(app_env, monkeypatch):
    """A Stop click that lands while the Detector is still constructing
    must not be lost (review r3: stop() was a no-op until run() assigned
    the runner)."""
    from softspoken_tpu.ui.qt_app import _DetectWorker

    win, wav, _ = app_env
    _make_project(win, wav, monkeypatch)
    w = _DetectWorker(win.cfg, win.pm.current_project, [wav])
    results = []
    w.signals.finished.connect(results.append)
    w.stop()      # BEFORE run() builds the runner
    w.run()
    (report,) = results
    assert report is not None and report.stopped


def test_review_navigation_and_bars_toggle(app_env, monkeypatch):
    """README-contract controls: Previous/Next (+ per-file jumps), the
    Show Vertical Bars toggle, playback-range boxes, Stop, Close Project."""
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    n = review.table.rowCount()
    assert n >= 1

    # selection fills the playback boxes with the row times
    review.table.selectRow(0)
    row0 = review.session.df.iloc[0]
    assert float(review.play_start.text()) == pytest.approx(
        float(row0["start_time"]), abs=1e-4)
    assert float(review.play_stop.text()) == pytest.approx(
        float(row0["end_time"]), abs=1e-4)

    # edited boxes override the row times for playback (temp-WAV path in CI)
    review.play_start.setText("0.0")
    review.play_stop.setText("0.25")
    review.play_segment()
    assert review.last_play_path and os.path.exists(review.last_play_path)
    seg = wavio.info(review.last_play_path)
    assert abs(seg.frames / seg.samplerate - 0.25) < 0.02
    review.stop_playback()  # no backend in CI → harmless no-op

    # nav: next/prev clamp at the ends
    review.nav_next()
    assert review.table.currentRow() == min(1, n - 1)
    review.nav_prev()
    review.nav_prev()
    assert review.table.currentRow() == 0
    # single-file project: file jumps are no-ops, not crashes
    review.nav_next_file()
    review.nav_prev_file()

    # vertical-bars checkbox re-renders (PNG stays valid either way)
    review.show_bars.setChecked(False)
    assert review.image.pixmap().data[:8] == b"\x89PNG\r\n\x1a\n"
    review.show_bars.setChecked(True)

    # Close Project returns to the start-up screen (Ctrl+W contract)
    win.close_project()
    assert win.stack.currentWidget() is win.home


def test_review_file_jumps_two_files(app_env, monkeypatch):
    """Previous File / Next File move to the adjacent file's detections."""
    win, wav, _ = app_env
    review = _detect_then_review(win, wav, monkeypatch)
    # synthesize a second file's rows directly in the session df
    df = review.session.df
    extra = df.iloc[[0]].copy()
    extra["file_name"] = "zzz_other.wav"
    extra["ID"] = df["ID"].max() + 1
    review.session.df = pd.concat([df, extra], ignore_index=True)
    review._rebuild_table()

    review.table.selectRow(0)
    review.nav_next_file()
    r = review.table.currentRow()
    assert review.session.df.iloc[r]["file_name"] == "zzz_other.wav"
    review.nav_prev_file()
    r2 = review.table.currentRow()
    assert review.session.df.iloc[r2]["file_name"] != "zzz_other.wav"
