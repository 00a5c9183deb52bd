"""Detections/review DataFrame stores.

Schema parity with ``silencer_ui.py:775-817`` (DetectionProject): the
canonical detections table

    ID:int64, file_path:str, file_name:str, start_time, end_time,
    erase:int, user_comment:str, review_datetime:datetime64[ns]

with ID backfill for legacy CSVs and per-file checkpointed saves
(worker.py:127-128: the CSV is rewritten after every completed file so a
stopped run resumes at file granularity).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
import pandas as pd

COLUMNS = [
    "ID",
    "file_path",
    "file_name",
    "start_time",
    "end_time",
    "erase",
    "user_comment",
    "review_datetime",
]

COLUMN_TYPES: Dict[str, object] = {
    "ID": "int64",
    "file_path": str,
    "file_name": str,
    "start_time": str,
    "end_time": str,
    "erase": int,
    "user_comment": str,
    "review_datetime": "datetime64[ns]",
}


def empty_detections_frame() -> pd.DataFrame:
    return pd.DataFrame(columns=COLUMNS).astype(COLUMN_TYPES)


def backfill_ids(df: pd.DataFrame) -> pd.DataFrame:
    """Insert/repair the ID column (silencer_ui.py:797-807)."""
    if "ID" not in df.columns:
        df.insert(0, "ID", range(1, len(df) + 1))
        return df
    df["ID"] = pd.to_numeric(df["ID"], errors="coerce")
    missing = df["ID"].isna()
    if missing.any():
        present = df["ID"].dropna()
        start = int(present.max()) if len(present) else 0
        df.loc[missing, "ID"] = range(start + 1, start + 1 + int(missing.sum()))
    df["ID"] = df["ID"].astype("int64")
    return df


class DetectionStore:
    """Typed detections table bound to the active project's CSV."""

    def __init__(self, csv_path: str):
        self.path = csv_path
        if os.path.exists(csv_path):
            df = pd.read_csv(csv_path)
            df = backfill_ids(df)
            if "review_datetime" in df.columns:
                df["review_datetime"] = pd.to_datetime(
                    df["review_datetime"], errors="coerce"
                )
            df = df.reindex(columns=COLUMNS)
            # legacy CSVs can lack schema columns (e.g. no 'erase'):
            # reindex fills them with NaN, which astype(int) rejects —
            # backfill the schema defaults first (review r3 finding)
            if df["erase"].isna().any():
                df["erase"] = pd.to_numeric(
                    df["erase"], errors="coerce").fillna(0)
            for col in ("file_path", "file_name", "start_time", "end_time",
                        "user_comment"):
                if df[col].isna().any():
                    df[col] = df[col].fillna("")
            self.df = df.astype(COLUMN_TYPES)
        else:
            self.df = empty_detections_frame()

    # reference constructor took the whole project settings dict
    # (silencer_ui.py:776-793); this classmethod keeps that call shape.
    @classmethod
    def for_project(cls, project: Dict) -> "DetectionStore":
        return cls(project["detections_file"])

    def next_id(self) -> int:
        """Autoincrement from the current max (worker.py:107-111)."""
        if self.df.empty or "ID" not in self.df.columns:
            return 1
        mx = pd.to_numeric(self.df["ID"], errors="coerce").max()
        return 1 if pd.isna(mx) else int(mx) + 1

    def processed_files(self) -> set:
        """Full paths already processed — enables idempotent re-runs (fixes
        the reference's duplicate-rows-on-resume quirk, SURVEY.md §2.3).

        Union of files with detection rows AND the ``.processed`` sidecar —
        rows alone would re-run every zero-detection file on resume (review
        r3 finding: in a quiet corpus that is most of the compute)."""
        out = set()
        if not self.df.empty:
            out.update(
                os.path.join(p, n)
                for p, n in zip(self.df["file_path"], self.df["file_name"])
            )
        try:
            with open(self._processed_sidecar, encoding="utf-8") as f:
                out.update(line.rstrip("\n") for line in f if line.strip())
        except OSError:
            pass
        return out

    @property
    def _processed_sidecar(self) -> str:
        return self.path + ".processed"

    def mark_processed(self, file_full_path: str) -> None:
        """Record completion independent of row count (zero detections is
        still 'done'); append-only so a crash can't lose earlier entries."""
        with open(self._processed_sidecar, "a", encoding="utf-8") as f:
            f.write(file_full_path + "\n")

    def append_intervals(
        self, file_full_path: str, intervals: Iterable[Tuple[float, float]]
    ) -> int:
        """Append one file's detections with the reference's row schema
        (worker.py:113-125). Returns number of rows added."""
        d, b = os.path.dirname(file_full_path), os.path.basename(file_full_path)
        nid = self.next_id()
        rows = [
            {
                "ID": nid + i,
                "file_path": d,
                "file_name": b,
                "start_time": start,
                "end_time": end,
                "erase": 0,
                "user_comment": "",
                "review_datetime": "",
            }
            for i, (start, end) in enumerate(intervals)
        ]
        if rows:
            add = pd.DataFrame(rows)
            self.df = pd.concat([self.df, add], ignore_index=True) if len(self.df) else add
        return len(rows)

    def save(self) -> None:
        """Checkpointed write (called after every file — worker.py:128)."""
        self.df.to_csv(self.path, index=False)


# Backwards-shaped alias matching the reference class name
DetectionProject = DetectionStore
