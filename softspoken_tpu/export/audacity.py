"""Audacity label-track export.

Output contract (review_exporter.py:129-215 and the reference README):
one ``<base_dir>/Audacity Outputs/<project>/<wav stem>.txt`` per WAV, rows
``start<TAB>end<TAB>Human`` at 6 decimals, no header, trailing newline,
rows sorted by (file_name, start_time).
"""

from __future__ import annotations

from pathlib import Path
from typing import Union

import pandas as pd

from .base import Transform


class AudacityTxtTransform(Transform):
    name = "audacity"
    extension = ".txt"

    def __call__(
        self,
        df: pd.DataFrame,
        *,
        base_dir: Union[str, Path],
        project_name: str,
        comment: str = "Human",
        precision: int = 6,
        **kwargs,
    ) -> None:
        missing = {"file_name", "start_time", "end_time"} - set(df.columns)
        if missing:
            raise ValueError(f"audacity export: missing column(s): {missing}")

        out_root = Path(base_dir) / "Audacity Outputs" / project_name
        out_root.mkdir(parents=True, exist_ok=True)

        df = df.copy()
        df["start_time"] = pd.to_numeric(df["start_time"], errors="coerce")
        df["end_time"] = pd.to_numeric(df["end_time"], errors="coerce")
        if df["start_time"].isna().any() or df["end_time"].isna().any():
            # surface the corrupt source row: a silent coercion wrote
            # literal 'nan\tnan' label rows Audacity rejects (review r3)
            bad = df[df["start_time"].isna() | df["end_time"].isna()]
            raise ValueError(
                "audacity export: non-numeric start/end time(s) in rows for "
                f"{sorted(set(bad['file_name']))[:3]}")
        df = df.sort_values(["file_name", "start_time"])

        # label files are keyed by recording stem; recordings that differ
        # only in extension (x.wav + x.flac) must not collide on x.txt
        # (review r3: the later group silently overwrote the earlier one)
        names = df["file_name"].unique()
        stems: dict = {}
        for n in names:
            stems.setdefault(Path(n).stem, []).append(n)
        label_name = {
            n: (f"{Path(n).stem}.txt" if len(group) == 1
                else f"{n.replace('/', '_')}.txt")
            for group in stems.values() for n in group
        }

        written = set()
        for wav_name, group in df.groupby("file_name", sort=False):
            lines = [
                f"{s:.{precision}f}\t{e:.{precision}f}\t{comment}"
                for s, e in zip(group["start_time"], group["end_time"])
            ]
            out = out_root / label_name[wav_name]
            out.write_text("\n".join(lines) + "\n")
            written.add(out.name)
        # the output dir is exporter-owned: a recording whose detections
        # were all deleted in review must not leave a stale label file
        # claiming regions the user removed (review r3 finding)
        for old in out_root.glob("*.txt"):
            if old.name not in written:
                old.unlink()
        return None
