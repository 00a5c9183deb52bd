"""Qt desktop shell (optional — requires PySide6).

The reference is a PySide6 desktop app (``silencer_ui.py``,
``review_detections.py``); this module provides the same four-screen flow —
Home → project workspace → Voice Detector / Review / Silence — as a thin
shell over the headless framework: every operation delegates to the tested
backend (``project``, ``runtime.DetectRunner``, ``ui.ReviewSession``,
``silence.SilenceRunner``, ``ui.render_review_png``), so the GUI contains
no business logic of its own.

Launch with ``python -m softspoken_tpu.ui.qt_app`` (or ``cli gui`` once
PySide6 is installed).  Import is gated: the rest of the framework never
depends on Qt.
"""

from __future__ import annotations

import os
import sys
from typing import Optional

try:
    from PySide6.QtCore import QObject, QRunnable, Qt, QThreadPool, Signal, Slot
    from PySide6.QtGui import QAction, QKeySequence, QPixmap
    from PySide6.QtWidgets import (
        QApplication,
        QFileDialog,
        QHBoxLayout,
        QInputDialog,
        QLabel,
        QListWidget,
        QMainWindow,
        QMessageBox,
        QProgressBar,
        QPushButton,
        QStackedWidget,
        QTableWidget,
        QTableWidgetItem,
        QVBoxLayout,
        QWidget,
    )

    HAVE_QT = True
except Exception:  # noqa: BLE001 — headless environments
    HAVE_QT = False

from ..config import Config, DEFAULT_CONFIG

if HAVE_QT:

    class _WorkerSignals(QObject):
        message = Signal(str)
        file_progress = Signal(float)
        overall_progress = Signal(float)
        finished = Signal(object)

    class _DetectWorker(QRunnable):
        """Background detection run (plays worker.py:21-139's role, but all
        logic lives in runtime.DetectRunner)."""

        def __init__(self, cfg: Config, project: dict, files):
            super().__init__()
            self.signals = _WorkerSignals()
            self.cfg, self.project, self.files = cfg, project, files
            self._runner = None

        def stop(self):
            if self._runner is not None:
                self._runner.stop()

        @Slot()
        def run(self):
            from ..ckpt import fixture_variables
            from ..engine import Detector
            from ..project import DetectionStore
            from ..runtime import DetectRunner, RunCallbacks

            det = Detector(self.cfg)
            store = DetectionStore(self.project["detections_file"])
            self._runner = DetectRunner(det, store, self.cfg)
            report = self._runner.run(
                self.files,
                RunCallbacks(
                    message=self.signals.message.emit,
                    file_progress=self.signals.file_progress.emit,
                    overall_progress=self.signals.overall_progress.emit,
                ),
            )
            self.signals.finished.emit(report)

    class _SilenceWorker(QRunnable):
        def __init__(self, review_csv: str, output_dir: str):
            super().__init__()
            self.signals = _WorkerSignals()
            self.review_csv, self.output_dir = review_csv, output_dir
            self._runner = None

        def stop(self):
            if self._runner is not None:
                self._runner.stop()

        @Slot()
        def run(self):
            import pandas as pd

            from ..silence import SilenceRunner

            self._runner = SilenceRunner(self.output_dir)
            report = self._runner.run(
                pd.read_csv(self.review_csv),
                on_file_start=lambda f: self.signals.message.emit(f"silencing {f}"),
                on_progress=lambda p: self.signals.overall_progress.emit(float(p)),
            )
            self.signals.finished.emit(report)

    class HomeScreen(QWidget):
        def __init__(self, app):
            super().__init__()
            self.app = app
            lay = QVBoxLayout(self)
            lay.addWidget(QLabel("<h2>Softspoken TPU</h2>"))
            for text, cb in [
                ("New Project", app.new_project),
                ("Open Project", app.open_project),
                ("Open Last Project", app.open_last_project),
            ]:
                b = QPushButton(text)
                b.clicked.connect(cb)
                lay.addWidget(b)
            lay.addStretch(1)

    class WorkspaceScreen(QWidget):
        """File list + 3-step workflow (mirrors AppScreen semantics)."""

        def __init__(self, app):
            super().__init__()
            self.app = app
            lay = QVBoxLayout(self)
            self.title = QLabel()
            lay.addWidget(self.title)
            self.files = QListWidget()
            lay.addWidget(self.files)
            row = QHBoxLayout()
            add = QPushButton("Add Files…")
            add.clicked.connect(self.add_files)
            rem = QPushButton("Remove Selected")
            rem.clicked.connect(self.remove_selected)
            row.addWidget(add)
            row.addWidget(rem)
            lay.addLayout(row)
            self.status = QLabel()
            lay.addWidget(self.status)
            steps = QHBoxLayout()
            for text, cb in [
                ("1 · Run Voice Detector", app.show_detector),
                ("2 · Review Detections", app.show_review),
                ("3 · Silence Voices", app.show_silence),
            ]:
                b = QPushButton(text)
                b.clicked.connect(cb)
                steps.addWidget(b)
            lay.addLayout(steps)

        def refresh(self):
            pm = self.app.pm
            self.title.setText(f"<h3>Project: {pm.current_project['name']}</h3>")
            self.files.clear()
            self.files.addItems(pm.get_unprocessed_list())
            st = pm.step_status()
            self.status.setText(
                f"Detect: {st['detect']}   Review: {st['review']}   Silence: {st['silence']}"
            )

        def add_files(self):
            paths, _ = QFileDialog.getOpenFileNames(self, "Add audio files", "", "WAV (*.wav)")
            if paths:
                self.app.pm.update_file_list([os.path.abspath(p) for p in paths])
                self.refresh()

        def remove_selected(self):
            selected = [i.text() for i in self.files.selectedItems()]
            if not selected:
                return
            if (
                QMessageBox.question(self, "Remove", f"Remove {len(selected)} file(s)?")
                == QMessageBox.StandardButton.Yes
            ):
                self.app.pm.remove_from_file_list(selected)
                self.refresh()

    class DetectorScreen(QWidget):
        """Progress + the audio-sec/wall-sec throughput label
        (silencer_ui.py:152-158's north-star metric)."""

        def __init__(self, app):
            super().__init__()
            self.app = app
            self.worker: Optional[_DetectWorker] = None
            lay = QVBoxLayout(self)
            lay.addWidget(QLabel("<h3>Voice Detector</h3>"))
            self.file_bar = QProgressBar()
            self.overall_bar = QProgressBar()
            lay.addWidget(QLabel("File progress"))
            lay.addWidget(self.file_bar)
            lay.addWidget(QLabel("Overall progress"))
            lay.addWidget(self.overall_bar)
            self.speed = QLabel("Processing Speed: – audio sec / real sec")
            lay.addWidget(self.speed)
            self.log = QLabel("")
            self.log.setWordWrap(True)
            lay.addWidget(self.log)
            row = QHBoxLayout()
            self.start_btn = QPushButton("Begin Processing")
            self.start_btn.clicked.connect(self.start)
            self.stop_btn = QPushButton("Stop")
            self.stop_btn.clicked.connect(self.stop)
            back = QPushButton("Back")
            back.clicked.connect(self.app.show_workspace)
            for b in (self.start_btn, self.stop_btn, back):
                row.addWidget(b)
            lay.addLayout(row)
            lay.addStretch(1)

        def start(self):
            files = self.app.pm.get_unprocessed_list()
            self.worker = _DetectWorker(self.app.cfg, self.app.pm.current_project, files)
            self.worker.signals.message.connect(self._on_message)
            self.worker.signals.file_progress.connect(lambda p: self.file_bar.setValue(int(p)))
            self.worker.signals.overall_progress.connect(
                lambda p: self.overall_bar.setValue(int(p))
            )
            self.worker.signals.finished.connect(self._on_finished)
            QThreadPool.globalInstance().start(self.worker)
            self.start_btn.setEnabled(False)

        def stop(self):
            if self.worker:
                self.worker.stop()

        def _on_message(self, msg: str):
            self.log.setText(msg)
            if "audio-sec/sec" in msg:
                self.speed.setText(f"Processing Speed: {msg.split(';')[-1].strip()}")

        def _on_finished(self, report):
            self.start_btn.setEnabled(True)
            self.log.setText(
                f"done: {report.files_done} file(s), {report.rows_added} detection(s)"
            )
            self.app.workspace.refresh()

    class ReviewScreen(QWidget):
        """Spectrogram + table + Keep/Erase over ui.ReviewSession."""

        def __init__(self, app):
            super().__init__()
            self.app = app
            self.session = None
            lay = QVBoxLayout(self)
            self.image = QLabel()
            self.image.setMinimumHeight(260)
            self.image.setAlignment(Qt.AlignmentFlag.AlignCenter)
            lay.addWidget(self.image)
            self.table = QTableWidget()
            self.table.itemSelectionChanged.connect(self._on_select)
            lay.addWidget(self.table)
            row = QHBoxLayout()
            for text, cb, key in [
                ("Keep (Shift+K)", self.keep, "Shift+K"),
                ("Erase (Shift+E)", self.erase, "Shift+E"),
                ("Delete Row", self.delete_row, None),
                ("Back", self.app.show_workspace, None),
            ]:
                b = QPushButton(text)
                b.clicked.connect(cb)
                if key:
                    b.setShortcut(QKeySequence(key))
                row.addWidget(b)
            lay.addLayout(row)

        def refresh(self):
            from .review import ReviewSession

            self.session = ReviewSession(
                self.app.pm.current_project, self.app.pm.projects_folder, self.app.cfg
            )
            df = self.session.df
            self.table.clear()
            self.table.setRowCount(len(df))
            self.table.setColumnCount(len(df.columns))
            self.table.setHorizontalHeaderLabels([str(c) for c in df.columns])
            for r in range(len(df)):
                for c, col in enumerate(df.columns):
                    self.table.setItem(r, c, QTableWidgetItem(str(df.iloc[r][col])))
            if len(df):
                self.table.selectRow(0)

        def _on_select(self):
            r = self.table.currentRow()
            if self.session is None or r < 0 or r >= len(self.session.df):
                return
            self.session.seek(r)
            self._render(r)

        def _render(self, r: int):
            from .spectrogram import render_review_png

            row = self.session.df.iloc[r]
            full = os.path.join(row["file_path"], row["file_name"])
            try:
                png = render_review_png(
                    full,
                    float(row["start_time"]),
                    float(row["end_time"]),
                    [
                        (float(q["start_time"]), float(q["end_time"]))
                        for _, q in self.session.df[
                            self.session.df["file_name"] == row["file_name"]
                        ].iterrows()
                    ],
                    widget_width_px=max(400, self.width()),
                    config=self.app.cfg,
                )
                pix = QPixmap()
                pix.loadFromData(png)
                self.image.setPixmap(
                    pix.scaled(self.image.size(), Qt.AspectRatioMode.KeepAspectRatio)
                )
            except Exception as e:  # noqa: BLE001
                self.image.setText(f"(no spectrogram: {e})")

        def keep(self):
            if self.session:
                self.session.keep()
                self.refresh()

        def erase(self):
            if self.session:
                self.session.erase()
                self.refresh()

        def delete_row(self):
            r = self.table.currentRow()
            if self.session and r >= 0:
                self.session.delete([r])
                self.refresh()

    class SilenceScreen(QWidget):
        def __init__(self, app):
            super().__init__()
            self.app = app
            self.worker = None
            lay = QVBoxLayout(self)
            lay.addWidget(QLabel("<h3>Silence Voices</h3>"))
            self.info = QLabel()
            lay.addWidget(self.info)
            self.bar = QProgressBar()
            lay.addWidget(self.bar)
            row = QHBoxLayout()
            start = QPushButton("Choose Output Folder && Start")
            start.clicked.connect(self.start)
            stop = QPushButton("Stop")
            stop.clicked.connect(lambda: self.worker and self.worker.stop())
            back = QPushButton("Back")
            back.clicked.connect(self.app.show_workspace)
            for b in (start, stop, back):
                row.addWidget(b)
            lay.addLayout(row)
            lay.addStretch(1)

        def refresh(self):
            import pandas as pd

            path = self.app.pm.current_project["review_file"]
            if os.path.exists(path):
                df = pd.read_csv(path)
                n = int((pd.to_numeric(df["erase"], errors="coerce") == 1).sum())
                self.info.setText(f"{n} detection(s) flagged for erasure")
            else:
                self.info.setText("no review file yet — run Review first")

        def start(self):
            outdir = QFileDialog.getExistingDirectory(self, "Output folder")
            if not outdir:
                return
            self.worker = _SilenceWorker(
                self.app.pm.current_project["review_file"], outdir
            )
            self.worker.signals.overall_progress.connect(lambda p: self.bar.setValue(int(p)))
            self.worker.signals.finished.connect(self._on_finished)
            QThreadPool.globalInstance().start(self.worker)

        def _on_finished(self, report):
            from ..silence import write_status_file

            pm = self.app.pm
            if not report.stopped:
                write_status_file(
                    pm.current_project, pm.project_output_dir(pm.current_project["name"])
                )
                pm.save_current_project()
            self.info.setText(f"done: {len(report.outputs)} silenced file(s)")
            self.app.workspace.refresh()

    class SoftspokenApp(QMainWindow):
        def __init__(self, cfg: Config = DEFAULT_CONFIG):
            super().__init__()
            from ..project import ProjectManager

            self.cfg = cfg
            self.pm = ProjectManager(cfg)
            self.setWindowTitle("Softspoken TPU")
            self.resize(1100, 720)

            self.stack = QStackedWidget()
            self.home = HomeScreen(self)
            self.workspace = WorkspaceScreen(self)
            self.detector = DetectorScreen(self)
            self.review = ReviewScreen(self)
            self.silence = SilenceScreen(self)
            for w in (self.home, self.workspace, self.detector, self.review, self.silence):
                self.stack.addWidget(w)
            self.setCentralWidget(self.stack)

            menu = self.menuBar().addMenu("&File")
            for text, key, cb in [
                ("New Project", "Ctrl+N", self.new_project),
                ("Open Project", "Ctrl+O", self.open_project),
                ("Quit", "Ctrl+Q", self.close),
            ]:
                act = QAction(text, self)
                act.setShortcut(QKeySequence(key))
                act.triggered.connect(cb)
                menu.addAction(act)
            helpm = self.menuBar().addMenu("&Help")
            guide = QAction("User Guide", self)
            guide.setShortcut(QKeySequence("Ctrl+U"))
            guide.triggered.connect(self.open_guide)
            helpm.addAction(guide)

        # ---- navigation ------------------------------------------------
        def show_workspace(self):
            self.workspace.refresh()
            self.stack.setCurrentWidget(self.workspace)

        def show_detector(self):
            self.stack.setCurrentWidget(self.detector)

        def show_review(self):
            self.review.refresh()
            self.stack.setCurrentWidget(self.review)

        def show_silence(self):
            self.silence.refresh()
            self.stack.setCurrentWidget(self.silence)

        # ---- project flows ----------------------------------------------
        def new_project(self):
            name, ok = QInputDialog.getText(self, "New Project", "Project name:")
            if ok and name:
                try:
                    self.pm.add_project(name)
                except ValueError as e:
                    QMessageBox.warning(self, "New Project", str(e))
                    return
                self.pm.set_active_project(name)
                self.show_workspace()

        def open_project(self):
            names = self.pm.list_projects_by_name()
            if not names:
                QMessageBox.information(self, "Open Project", "No projects yet.")
                return
            name, ok = QInputDialog.getItem(self, "Open Project", "Project:", names, 0, False)
            if ok and name:
                self.pm.set_active_project(name)
                self.show_workspace()

        def open_last_project(self):
            if self.pm.activate_latest():
                self.show_workspace()
            else:
                QMessageBox.information(self, "Open Last", "No projects yet.")

        def open_guide(self):
            import webbrowser

            webbrowser.open(self.cfg.paths.user_guide_url)


def main(cfg: Config = DEFAULT_CONFIG) -> int:
    if not HAVE_QT:
        sys.exit("PySide6 is not installed; use the headless CLI: python -m softspoken_tpu")
    app = QApplication(sys.argv)
    win = SoftspokenApp(cfg)
    win.show()
    return app.exec()


if __name__ == "__main__":
    raise SystemExit(main())
