"""Headless review session — the review screen's data semantics without Qt.

Reproduces the behavior of ``ReviewDetectionsScreen`` (review_detections.py)
as a plain controller any frontend (CLI, TUI, web, Qt) can drive:

  * load: review CSV if present, else the detections CSV filtered to
    length > minimum_detection_len (:220-235, 764-770)
  * ordering: sorted by (file_name, start_time) like the table (:976)
  * keep/erase: set ``erase`` 0/1 + stamp ``review_datetime`` "now", then
    auto-advance (:677-717)
  * add: insert keeping the (file_name, start_time) sort order; ID assigned
    on save from the autoincrement backfill (:538-675)
  * delete: drop rows (:175-211)
  * save: normalize dtypes, backfill IDs, write review CSV, and re-run all
    three exporters on every persist (:93-169)
"""

from __future__ import annotations

import datetime
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..config import Config, DEFAULT_CONFIG
from ..export import run_standard_exports
from ..project.store import COLUMNS, backfill_ids

_TIME_FMT = "%Y-%m-%d %H:%M:%S"


class ReviewSession:
    def __init__(
        self,
        project: dict,
        projects_folder: str,
        config: Config = DEFAULT_CONFIG,
        now_fn=None,
    ):
        self.project = project
        self.projects_folder = projects_folder
        self.cfg = config
        self._now = now_fn or (lambda: datetime.datetime.now().strftime(_TIME_FMT))
        self.current_index = 0
        self.df = self._load()

    # ------------------------------------------------------------------
    def _load(self) -> pd.DataFrame:
        review_path = self.project.get("review_file")
        det_path = self.project.get("detections_file")
        if review_path and os.path.exists(review_path):
            df = pd.read_csv(review_path, keep_default_na=False)
        elif det_path and os.path.exists(det_path):
            df = pd.read_csv(det_path, keep_default_na=False)
            start = pd.to_numeric(df["start_time"], errors="coerce")
            end = pd.to_numeric(df["end_time"], errors="coerce")
            df = df[(end - start) > self.cfg.engine.minimum_detection_len]
        else:
            df = pd.DataFrame(columns=COLUMNS)
        df = backfill_ids(df.reset_index(drop=True))
        # table order: (file_name, start_time) — review_detections.py:976
        if len(df):
            df["start_time"] = pd.to_numeric(df["start_time"], errors="coerce")
            df["end_time"] = pd.to_numeric(df["end_time"], errors="coerce")
            df = df.sort_values(["file_name", "start_time"]).reset_index(drop=True)
        return df

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.df)

    def current(self) -> Optional[pd.Series]:
        if 0 <= self.current_index < len(self.df):
            return self.df.iloc[self.current_index]
        return None

    def seek(self, index: int) -> None:
        self.current_index = int(np.clip(index, 0, max(0, len(self.df) - 1)))

    def next(self) -> None:
        self.seek(self.current_index + 1)

    def prev(self) -> None:
        self.seek(self.current_index - 1)

    # ------------------------------------------------------------------
    def keep(self, index: Optional[int] = None, persist: bool = True) -> None:
        """Keep → erase=0 + review timestamp (review_detections.py:677-681;
        note the reference README says the opposite — the code is right)."""
        self._label(0, index, persist)

    def erase(self, index: Optional[int] = None, persist: bool = True) -> None:
        self._label(1, index, persist)

    def _checked_index(self, index: Optional[int]) -> Optional[int]:
        """Bounds-checked row index, or None when there is nothing to edit.

        pandas ``.at`` ENLARGES on an out-of-range label — an unguarded
        edit on an empty session fabricates a phantom NaN row that save()
        then backfills an ID and persists (review r3 finding)."""
        if len(self.df) == 0:
            return None
        i = self.current_index if index is None else index
        if not 0 <= i < len(self.df):
            return None
        return i

    def _label(self, flag: int, index: Optional[int], persist: bool) -> None:
        i = self._checked_index(index)
        if i is None:
            return
        self.df.at[i, "erase"] = flag
        self.df.at[i, "review_datetime"] = self._now()
        if persist:
            self.save()
        if index is None:
            self.next()  # auto-advance (:715-717)

    def set_comment(self, text: str, index: Optional[int] = None, persist: bool = False):
        i = self._checked_index(index)
        if i is None:
            return
        self.df.at[i, "user_comment"] = text
        if persist:
            self.save()

    def set_times(
        self, start: float, end: float, index: Optional[int] = None, persist: bool = False
    ):
        i = self._checked_index(index)
        if i is None:
            return
        self.df.at[i, "start_time"] = float(start)
        self.df.at[i, "end_time"] = float(end)
        if persist:
            self.save()

    # ------------------------------------------------------------------
    def add(
        self,
        file_path: str,
        file_name: str,
        start_time: float,
        end_time: float,
        persist: bool = True,
    ) -> Optional[int]:
        """Insert a detection keeping (file_name, start_time) order; the ID
        is assigned by the save-time backfill (review_detections.py:538-675).
        Returns the inserted row position, or None if end ≤ start."""
        if end_time <= start_time:
            return None
        # vectorized first-row-after lookup: the per-row .iloc scan paid two
        # Series materializations per row — a visible stall on 10k+-row
        # review CSVs for every single add (review r3 batch 9)
        if len(self.df):
            names = self.df["file_name"].to_numpy()
            starts = pd.to_numeric(self.df["start_time"], errors="coerce").to_numpy()
            after = (names > file_name) | ((names == file_name) & (starts > start_time))
            hits = np.flatnonzero(after)
            insert_at = int(hits[0]) if len(hits) else len(self.df)
        else:
            insert_at = 0
        row = {
            "ID": np.nan,
            "file_path": file_path,
            "file_name": file_name,
            "start_time": float(f"{start_time:.3f}"),
            "end_time": float(f"{end_time:.3f}"),
            "erase": 0,
            "user_comment": "",
            "review_datetime": "",
        }
        top = self.df.iloc[:insert_at]
        bottom = self.df.iloc[insert_at:]
        self.df = pd.concat(
            [top, pd.DataFrame([row]), bottom], ignore_index=True
        )
        self.current_index = insert_at
        if persist:
            self.save()
        return insert_at

    def delete(self, indexes: Sequence[int], persist: bool = True) -> None:
        self.df = self.df.drop(self.df.index[list(indexes)]).reset_index(drop=True)
        self.current_index = min(self.current_index, max(0, len(self.df) - 1))
        if persist:
            self.save()

    # ------------------------------------------------------------------
    def reviewed_mask(self) -> np.ndarray:
        """Rows already graded (used for highlighting — :1002-1011)."""
        rd = self.df.get("review_datetime")
        if rd is None:
            return np.zeros(len(self.df), bool)
        # dtype pinned: an empty list infers float64 and `rmask & ~emask`
        # in stats() then crashes with a bitwise_and TypeError on an empty
        # session (review r3 batch 9)
        return np.asarray([bool(str(v).strip()) for v in rd], dtype=bool)

    def stats(self) -> dict:
        n = len(self.df)
        rmask = self.reviewed_mask()
        emask = np.asarray(
            pd.to_numeric(self.df.get("erase", 0), errors="coerce") == 1)
        # kept counts rows BOTH reviewed and not erased — `reviewed-erased`
        # went wrong (even negative) when erase=1 rows lacked a review
        # timestamp, e.g. hand-edited CSVs (review r3 finding)
        return {"total": n, "reviewed": int(rmask.sum()),
                "erased": int(emask.sum()),
                "kept": int((rmask & ~emask).sum())}

    # ------------------------------------------------------------------
    def save(self, persist: bool = True) -> pd.DataFrame:
        """Normalize + write review CSV + re-run the three exporters
        (the reference does this on every grade/edit/close — :93-169)."""
        df = backfill_ids(self.df.copy())
        df["start_time"] = pd.to_numeric(df["start_time"], errors="coerce")
        df["end_time"] = pd.to_numeric(df["end_time"], errors="coerce")
        df["erase"] = pd.to_numeric(df["erase"], errors="coerce").fillna(0).astype(int)
        self.df = df
        if persist:
            df.to_csv(self.project["review_file"], index=False)
            run_standard_exports(df, self.projects_folder, self.project["name"])
        return df
