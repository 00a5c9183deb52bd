import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu.export import (
    ReviewExportManager,
    Transform,
    run_standard_exports,
    standard_manager,
)
from softspoken_tpu.io import wavio


@pytest.fixture
def review_df(tmp_path):
    wavdir = tmp_path / "audio"
    wavdir.mkdir()
    for name, secs in [("rec1.wav", 10), ("rec2.wav", 5)]:
        wavio.write(str(wavdir / name), np.zeros(22050 * secs, np.float32), 22050)
    return pd.DataFrame(
        {
            "ID": [1, 2, 3],
            "file_path": [str(wavdir)] * 3,
            "file_name": ["rec1.wav", "rec1.wav", "rec2.wav"],
            "start_time": [1.25, 7.0, 0.5],
            "end_time": [2.75, 8.0, 1.0],
            "erase": [0, 1, 0],
            "user_comment": ["", "noisy", ""],
            "review_datetime": ["", "2026-01-02 03:04:05", ""],
        }
    )


def test_audacity_format(tmp_path, review_df):
    run_standard_exports(review_df, tmp_path, "proj")
    out = tmp_path / "Audacity Outputs" / "proj"
    assert sorted(p.name for p in out.iterdir()) == ["rec1.txt", "rec2.txt"]
    assert (out / "rec1.txt").read_text() == (
        "1.250000\t2.750000\tHuman\n7.000000\t8.000000\tHuman\n"
    )
    assert (out / "rec2.txt").read_text() == "0.500000\t1.000000\tHuman\n"


def test_kaleidoscope_format(tmp_path, review_df):
    run_standard_exports(review_df, tmp_path, "proj")
    csv_path = tmp_path / "Kaleidoscope Outputs" / "proj" / "proj.csv"
    out = pd.read_csv(csv_path, keep_default_na=False)
    assert list(out.columns) == [
        "INDIR", "FOLDER", "IN FILE*", "OFFSET", "DURATION",
        "TOP1MATCH*", "MANUAL ID", "end_time", "erase", "review_datetime",
    ]
    assert (out["TOP1MATCH*"] == "Human").all()
    # common dir, relative folder empty when equal
    assert (out["FOLDER"] == "").all()
    assert out["OFFSET"].tolist() == [1.25, 7.0, 0.5]
    assert out["DURATION"].tolist() == [1.5, 1.0, 0.5]
    assert out["MANUAL ID"].tolist() == ["", "noisy", ""]


def test_kaleidoscope_folder_relpaths(tmp_path):
    df = pd.DataFrame(
        {
            "file_path": ["/data/siteA", "/data/siteB/sub"],
            "file_name": ["a.wav", "b.wav"],
            "start_time": [0.0, 1.0],
            "end_time": [1.0, 2.0],
        }
    )
    from softspoken_tpu.export import KaleidoscopeCsvTransform

    KaleidoscopeCsvTransform()(df, base_dir=tmp_path, project_name="p")
    out = pd.read_csv(tmp_path / "Kaleidoscope Outputs" / "p" / "p.csv")
    assert out["INDIR"].tolist() == ["/data", "/data"]
    assert out["FOLDER"].tolist() == ["siteA", os.path.join("siteB", "sub")]


def test_raven_format(tmp_path, review_df):
    run_standard_exports(review_df, tmp_path, "proj")
    root = tmp_path / "Raven Outputs" / "proj"
    wavdir = review_df["file_path"][0]

    listing = (root / "proj_listfile.txt").read_text().splitlines()
    assert listing == [
        str(Path(wavdir) / "rec1.wav"),
        str(Path(wavdir) / "rec2.wav"),
    ]

    table = pd.read_csv(root / "proj.txt", sep="\t", keep_default_na=False)
    assert table["Selection"].tolist() == [1, 2, 3]
    assert (table["View"] == "Spectrogram 1").all()
    assert (table["Channel"] == 1).all()
    # cumulative offsets: rec1 is 10 s long, so rec2 rows shift by 10
    assert table["Begin Time (s)"].tolist() == [1.25, 7.0, 10.5]
    assert table["End Time (s)"].tolist() == [2.75, 8.0, 11.0]
    assert (table["Low Freq (Hz)"] == 0).all()
    assert (table["High Freq (Hz)"] == 8000).all()
    assert (table["Annotation"] == "Human").all()


def test_raven_duration_fallback(tmp_path):
    # unreadable wav → duration falls back to max detection end time
    df = pd.DataFrame(
        {
            "file_path": [str(tmp_path), str(tmp_path)],
            "file_name": ["ghost.wav", "ghost2.wav"],
            "start_time": [1.0, 2.0],
            "end_time": [4.0, 3.0],
        }
    )
    from softspoken_tpu.export import RavenTxtTransform

    RavenTxtTransform()(df, base_dir=tmp_path, project_name="p")
    table = pd.read_csv(tmp_path / "Raven Outputs" / "p" / "p.txt", sep="\t")
    # ghost.wav duration := 4.0 → ghost2 row offset 4.0
    assert table["Begin Time (s)"].tolist() == [1.0, 6.0]


def test_audacity_nonnumeric_time_raises(tmp_path, review_df):
    from softspoken_tpu.export.audacity import AudacityTxtTransform

    bad = review_df.copy()
    bad["start_time"] = bad["start_time"].astype(object)
    bad.loc[1, "start_time"] = "oops"
    with pytest.raises(ValueError, match="non-numeric"):
        AudacityTxtTransform()(bad, base_dir=tmp_path, project_name="p")


def test_audacity_stem_collision_keeps_both(tmp_path):
    # rec.wav and rec.flac must not both land on rec.txt
    from softspoken_tpu.export.audacity import AudacityTxtTransform

    df = pd.DataFrame(
        {
            "file_name": ["rec.wav", "rec.flac", "solo.wav"],
            "start_time": [1.0, 2.0, 3.0],
            "end_time": [1.5, 2.5, 3.5],
            "user_comment": ["", "", ""],
        }
    )
    AudacityTxtTransform()(df, base_dir=tmp_path, project_name="p")
    out = tmp_path / "Audacity Outputs" / "p"
    names = sorted(f.name for f in out.glob("*.txt"))
    assert names == ["rec.flac.txt", "rec.wav.txt", "solo.txt"]
    assert (out / "rec.wav.txt").read_text().startswith("1.0")
    assert (out / "rec.flac.txt").read_text().startswith("2.0")


def test_kaleidoscope_degraded_indir_stays_empty(tmp_path):
    # a relative/absolute file_path mix degrades INDIR to "" — it must not
    # be rewritten as the filesystem root by the separator trim
    from softspoken_tpu.export import KaleidoscopeCsvTransform

    df = pd.DataFrame(
        {
            "file_path": ["rel/site", "/abs/site"],
            "file_name": ["a.wav", "b.wav"],
            "start_time": [0.0, 1.0],
            "end_time": [1.0, 2.0],
        }
    )
    KaleidoscopeCsvTransform()(df, base_dir=tmp_path, project_name="p")
    out = pd.read_csv(tmp_path / "Kaleidoscope Outputs" / "p" / "p.csv",
                      keep_default_na=False)
    assert (out["INDIR"] == "").all()


def test_raven_underivable_duration_does_not_poison_offsets(tmp_path):
    # first file unreadable AND its end_times non-numeric: its duration is
    # unknowable; later files' cumulative offsets must stay finite
    from softspoken_tpu.export import RavenTxtTransform

    df = pd.DataFrame(
        {
            "file_path": [str(tmp_path)] * 2,
            "file_name": ["ghost.wav", "later.wav"],
            "start_time": [1.0, 2.0],
            "end_time": ["corrupt", 3.0],
        }
    )
    RavenTxtTransform()(df, base_dir=tmp_path, project_name="p")
    table = pd.read_csv(tmp_path / "Raven Outputs" / "p" / "p.txt", sep="\t")
    assert table["Begin Time (s)"].tolist()[1] == 2.0
    assert np.isfinite(table["End Time (s)"]).tolist() == [False, True]


def test_manager_none_return_reports_none(tmp_path):
    # self-IO transforms return None; the manager must not fabricate a
    # dst-derived path that was never created
    class SelfIO(Transform):
        name = "selfio"
        extension = ".csv"

        def __call__(self, df, **kw):
            return None

    mgr = ReviewExportManager(pd.DataFrame({"x": [1]}))
    mgr.register_transform(SelfIO())
    assert mgr.export("selfio", tmp_path / "never.csv") is None
    assert not (tmp_path / "never.csv").exists()


def test_manager_dispatch(tmp_path):
    class Upper(Transform):
        name = "upper"
        extension = ".txt"

        def __call__(self, df, **kw):
            return ",".join(df["x"].astype(str)).upper()

    mgr = ReviewExportManager(pd.DataFrame({"x": ["a", "b"]}))
    mgr.register_transform(Upper())
    with pytest.raises(KeyError):
        mgr.register_transform(Upper())  # duplicate name
    path = mgr.export("upper", tmp_path / "out.txt")
    assert path.read_text() == "A,B"
    with pytest.raises(KeyError):
        mgr.export("nope", tmp_path)


def test_standard_manager_names(review_df):
    assert set(standard_manager(review_df).names()) == {
        "audacity", "kaleidoscope", "raven",
    }


def test_audacity_removes_stale_label_files(tmp_path, review_df):
    from softspoken_tpu.export.audacity import AudacityTxtTransform

    t = AudacityTxtTransform()
    t(review_df, base_dir=tmp_path, project_name="p")
    out = tmp_path / "Audacity Outputs" / "p"
    first = sorted(f.name for f in out.glob("*.txt"))
    assert len(first) >= 2

    # delete every row of the first recording and re-export: its label
    # file must disappear, not linger with stale regions (review r3)
    keep_name = sorted(review_df["file_name"].unique())[1:]
    t(review_df[review_df["file_name"].isin(keep_name)],
      base_dir=tmp_path, project_name="p")
    second = sorted(f.name for f in out.glob("*.txt"))
    assert len(second) == len(first) - 1
