"""Wildlife Acoustics Kaleidoscope CSV export.

Output contract (review_exporter.py:218-338 and the reference README):
one CSV ``<base_dir>/Kaleidoscope Outputs/<project>/<project>.csv`` with
columns INDIR, FOLDER, IN FILE*, OFFSET, DURATION, TOP1MATCH*, MANUAL ID
plus traceability columns end_time/erase/review_datetime.

INDIR is the longest common path prefix of all file_path values; FOLDER is
each path relative to it ("" when equal).  Deliberate divergence from the
reference (SURVEY.md §7 "hard parts"): the reference only strips a trailing
'\\' from INDIR (Windows-only behavior); we strip the platform separator so
POSIX output is sane.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union

import pandas as pd

from .base import Transform


class KaleidoscopeCsvTransform(Transform):
    name = "kaleidoscope"
    extension = ".csv"

    def __call__(
        self,
        df: pd.DataFrame,
        *,
        base_dir: Union[str, Path],
        project_name: str,
        precision: int = 6,
        human_label: str = "Human",
        **kwargs,
    ) -> None:
        missing = {"file_path", "file_name", "start_time", "end_time"} - set(df.columns)
        if missing:
            raise ValueError(f"kaleidoscope export: missing column(s): {missing}")

        out_root = Path(base_dir) / "Kaleidoscope Outputs" / project_name
        out_root.mkdir(parents=True, exist_ok=True)

        df = df.copy()
        df["start_time"] = pd.to_numeric(df["start_time"], errors="coerce")
        df["end_time"] = pd.to_numeric(df["end_time"], errors="coerce")

        paths = df["file_path"].astype(str).tolist()
        # commonpath raises on a relative/absolute mix (e.g. a hand-added
        # row with an empty file_path) — that must degrade the INDIR split,
        # not wedge every subsequent review save
        try:
            indir = os.path.commonpath([p for p in paths if p]) if any(paths) else ""
        except ValueError:
            indir = ""
        if indir:
            folders = [
                os.path.relpath(p, indir) if os.path.isabs(p) == os.path.isabs(indir) and p else p
                for p in paths
            ]
        else:
            folders = list(paths)
        folders = ["" if f == "." else f for f in folders]
        # trim only a REAL trailing separator: the degraded-empty INDIR
        # ('' from the ValueError fallback above) must stay empty, not
        # become the filesystem root (review r3 finding)
        if indir:
            indir = indir.rstrip(os.sep) or os.sep

        blank = pd.Series([""] * len(df), index=df.index)
        out = pd.DataFrame(
            {
                "INDIR": indir,
                "FOLDER": folders,
                "IN FILE*": df["file_name"],
                "OFFSET": df["start_time"].round(precision),
                "DURATION": (df["end_time"] - df["start_time"]).round(precision),
                "TOP1MATCH*": human_label,
                "MANUAL ID": df.get("user_comment", blank),
                "end_time": df["end_time"].round(precision),
                "erase": df.get("erase", blank),
                "review_datetime": df.get("review_datetime", blank),
            }
        )
        out.to_csv(out_root / f"{project_name}.csv", index=False)
        return None
