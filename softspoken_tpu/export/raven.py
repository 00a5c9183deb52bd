"""Raven Lite/Pro selection-table export.

Output contract (review_exporter.py:341-481 and the reference README), two
files under ``<base_dir>/Raven Outputs/<project>/``:

  * ``<project>_listfile.txt`` — unique absolute WAV paths, first-appearance
    order, one per line with trailing newline
  * ``<project>.txt`` — tab-delimited selection table with **cumulative**
    Begin/End times across the listfile (offsets from per-file durations,
    probed from WAV headers; fallback = that file's max detection end time),
    columns Selection, View='Spectrogram 1', Channel=1, Begin/End Time (s),
    Low/High Freq (Hz), Annotation, Begin Path + erase/user_comment/
    review_datetime (+confidence if present)
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Dict, Union

import numpy as np
import pandas as pd

from .base import Transform

log = logging.getLogger(__name__)


_DURATION_CACHE: Dict[tuple, float] = {}


def _wav_duration(path: Union[str, Path]) -> float:
    # format-dispatching probe: projects can now hold FLAC/AIFF/OGG
    # recordings.  Cached on (path, mtime, size): the review screen re-runs
    # every exporter on each grade/edit, and re-probing hundreds of file
    # headers per keystroke is O(files) blocking IO (review r3 finding)
    from ..io.audio import get_audio_data

    path = str(path)
    try:
        st = os.stat(path)
        key = (path, st.st_mtime_ns, st.st_size)
    except OSError:
        key = None
    if key is not None and key in _DURATION_CACHE:
        return _DURATION_CACHE[key]
    dur, _sr = get_audio_data(path)
    if key is not None:
        _DURATION_CACHE[key] = dur
    return dur


class RavenTxtTransform(Transform):
    name = "raven"
    extension = ".txt"

    def __call__(
        self,
        df: pd.DataFrame,
        *,
        base_dir: Union[str, Path],
        project_name: str,
        precision: int = 6,
        annotation_label: str = "Human",
        low_freq: int = 0,
        high_freq: int = 8000,
        **kwargs,
    ) -> None:
        missing = {"file_path", "file_name", "start_time", "end_time"} - set(df.columns)
        if missing:
            raise ValueError(f"raven export: missing column(s): {missing}")

        out_root = Path(base_dir) / "Raven Outputs" / project_name
        out_root.mkdir(parents=True, exist_ok=True)

        df = df.copy()
        df["abs_path"] = [
            str(Path(p) / n) for p, n in zip(df["file_path"], df["file_name"])
        ]

        unique_paths = pd.unique(df["abs_path"])
        (out_root / f"{project_name}_listfile.txt").write_text(
            "\n".join(unique_paths) + "\n"
        )

        offsets: Dict[str, float] = {}
        running = 0.0
        for p in unique_paths:
            try:
                dur = _wav_duration(p)
            except Exception:  # header unreadable → largest detection end
                dur = pd.to_numeric(
                    df.loc[df["abs_path"] == p, "end_time"], errors="coerce"
                ).max()
            offsets[p] = running
            dur = float(dur)
            if not np.isfinite(dur):
                # all end_times non-numeric too: contribute nothing rather
                # than poisoning every later file's cumulative offset with
                # NaN (review r3 finding)
                log.warning("raven export: no duration derivable for %s", p)
                dur = 0.0
            running += dur

        off = df["abs_path"].map(offsets)
        begin = (off + pd.to_numeric(df["start_time"], errors="coerce")).round(precision)
        end = (off + pd.to_numeric(df["end_time"], errors="coerce")).round(precision)

        blank = pd.Series([""] * len(df), index=df.index)
        results = pd.DataFrame(
            {
                "Selection": range(1, len(df) + 1),
                "View": "Spectrogram 1",
                "Channel": 1,
                "Begin Time (s)": begin,
                "End Time (s)": end,
                "Low Freq (Hz)": low_freq,
                "High Freq (Hz)": high_freq,
                "Annotation": annotation_label,
                "Begin Path": df["abs_path"],
                "erase": df.get("erase", blank),
                "user_comment": df.get("user_comment", blank),
                "review_datetime": df.get("review_datetime", blank),
            }
        )
        if "confidence" in df.columns:
            results["confidence"] = df["confidence"]

        results.to_csv(
            out_root / f"{project_name}.txt", sep="\t", index=False, lineterminator="\n"
        )
        return None
