import json
import os

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu import Config
from softspoken_tpu.project import (
    DetectionStore,
    ProjectManager,
    backfill_ids,
    empty_detections_frame,
)


def _mgr(tmp_path):
    cfg = Config().with_paths(project_dir=str(tmp_path / "projects"))
    return ProjectManager(cfg)


def test_registry_roundtrip(tmp_path):
    m = _mgr(tmp_path)
    m.add_project("demo")
    assert m.list_projects_by_name() == ["demo"]
    proj = m.set_active_project("demo")
    assert proj["name"] == "demo"
    d = m.project_output_dir("demo")
    assert proj["detections_file"] == os.path.join(d, "demo_detections.csv")
    assert proj["review_file"] == os.path.join(d, "demo_review.csv")
    assert proj["file_list_file"] == os.path.join(d, "demo_files.txt")
    assert proj["silence_status_file"] == ""
    # persisted?
    with open(m.projects_file) as f:
        data = json.load(f)
    assert data[0]["name"] == "demo"


def test_duplicate_project_rejected(tmp_path):
    m = _mgr(tmp_path)
    m.add_project("p")
    with pytest.raises(ValueError):
        m.add_project("p")


def test_file_list_sorted_deduped(tmp_path):
    m = _mgr(tmp_path)
    m.add_project("p")
    m.set_active_project("p")
    got = m.update_file_list(["/b.wav", "/a.wav"])
    assert got == ["/a.wav", "/b.wav"]
    got = m.update_file_list(["/a.wav", "/c.wav"])
    assert got == ["/a.wav", "/b.wav", "/c.wav"]
    assert m.get_unprocessed_list() == got
    got = m.remove_from_file_list(["/b.wav"])
    assert got == ["/a.wav", "/c.wav"]


def test_activate_latest(tmp_path):
    m = _mgr(tmp_path)
    m.add_project("older")
    m.projects_data[0]["last_accessed"] = "2020-01-01 00:00:00"
    m.add_project("newer")
    m.projects_data[1]["last_accessed"] = "2024-01-01 00:00:00"
    m._write_registry()
    assert m.activate_latest()
    assert m.current_project["name"] == "newer"


def test_legacy_path_migration(tmp_path):
    # project with files at legacy locations gets moved to expected layout
    pdir = tmp_path / "projects"
    pdir.mkdir()
    legacy = pdir / "old_detections.csv"
    legacy.write_text("ID,file_path\n")
    registry = [
        {
            "name": "mig",
            "file_list_file": str(pdir / "mig_files.txt"),
            "detections_file": str(legacy),
            "review_file": str(pdir / "mig_review.csv"),
            "last_accessed": "2023-01-01 00:00:00",
        }
    ]
    (pdir / "projects.json").write_text(json.dumps(registry))
    m = _mgr(tmp_path)
    proj = m.set_active_project("mig")
    assert proj["detections_file"].endswith(
        os.path.join("Softspoken Outputs", "mig", "mig_detections.csv")
    )
    assert os.path.exists(proj["detections_file"])
    assert not legacy.exists()


def test_step_status(tmp_path):
    m = _mgr(tmp_path)
    m.add_project("s")
    m.set_active_project("s")
    st = m.step_status()
    assert st == {"detect": "Not Started", "review": "Not Started", "silence": "Not Started"}
    with open(m.current_project["detections_file"], "w") as f:
        f.write("ID\n1\n")
    assert m.step_status()["detect"] == "Complete"


def test_detection_store_schema(tmp_path):
    p = str(tmp_path / "d.csv")
    store = DetectionStore(p)
    assert list(store.df.columns) == [
        "ID", "file_path", "file_name", "start_time", "end_time",
        "erase", "user_comment", "review_datetime",
    ]
    n = store.append_intervals("/data/a.wav", [(1.0, 2.5), (4.0, 4.2)])
    assert n == 2
    assert store.next_id() == 3
    store.save()
    # reload: IDs preserved, types coerced
    store2 = DetectionStore(p)
    assert store2.df["ID"].tolist() == [1, 2]
    assert store2.df["erase"].tolist() == [0, 0]
    assert store2.processed_files() == {"/data/a.wav"}
    # autoincrement continues from max
    store2.append_intervals("/data/b.wav", [(0.0, 1.0)])
    assert store2.df["ID"].tolist() == [1, 2, 3]


def test_id_backfill():
    df = pd.DataFrame(
        {
            "file_path": ["/x", "/x", "/x"],
            "file_name": ["a", "b", "c"],
            "ID": [5, None, None],
        }
    )
    out = backfill_ids(df)
    assert out["ID"].tolist() == [5, 6, 7]

    df2 = pd.DataFrame({"file_path": ["/x"], "file_name": ["a"]})
    out2 = backfill_ids(df2)
    assert out2.columns[0] == "ID"
    assert out2["ID"].tolist() == [1]


def test_legacy_csv_missing_columns_loads(tmp_path):
    """A pre-schema CSV (no erase/user_comment/review_datetime) must load
    with defaults, not crash astype with IntCastingNaNError (review r3)."""
    import pandas as pd

    from softspoken_tpu.project.store import DetectionStore

    csv = str(tmp_path / "legacy.csv")
    pd.DataFrame({
        "file_path": ["/rec", "/rec"],
        "file_name": ["a.wav", "a.wav"],
        "start_time": [1.25, 7.5],
        "end_time": [2.5, 9.0],
    }).to_csv(csv, index=False)

    store = DetectionStore(csv)
    assert list(store.df["erase"]) == [0, 0]
    assert list(store.df["ID"]) == [1, 2]
    assert list(store.df["user_comment"]) == ["", ""]


def test_processed_files_includes_zero_detection_files(tmp_path):
    """mark_processed records completion independent of row count, so a
    quiet corpus isn't re-run end-to-end on resume (review r3)."""
    from softspoken_tpu.project.store import DetectionStore

    csv = str(tmp_path / "det.csv")
    store = DetectionStore(csv)
    store.append_intervals("/rec/voiced.wav", [(1.0, 2.0)])
    store.save()
    store.mark_processed("/rec/voiced.wav")
    store.mark_processed("/rec/silent.wav")  # zero detections, still done

    again = DetectionStore(csv)
    done = again.processed_files()
    assert "/rec/voiced.wav" in done
    assert "/rec/silent.wav" in done


def test_invalid_project_names_rejected(tmp_path):
    """Names become directories/file-stems under the outputs folder —
    separators and traversal must be rejected (review r3 finding)."""
    pm = _mgr(tmp_path)
    for bad in ("../../tmp/x", "a/b", "a\\b", "..", ".", ""):
        with pytest.raises(ValueError):
            pm.add_project(bad)
    pm.add_project("fine-name_1")  # normal names still work


def test_file_list_ops_require_active_project(tmp_path):
    pm = _mgr(tmp_path)
    with pytest.raises(RuntimeError):
        pm.update_file_list(["/a.wav"])
    with pytest.raises(RuntimeError):
        pm.remove_from_file_list(["/a.wav"])


def test_registry_write_is_atomic(tmp_path, monkeypatch):
    """A crash mid-write must not corrupt projects.json: the dump goes to a
    temp file first (review r3: an in-place dump left a truncated registry
    that failed every later launch)."""
    pm = _mgr(tmp_path)
    pm.add_project("alpha")

    real_dump = json.dump
    def exploding_dump(obj, f, **kw):
        f.write('[{"name": "trunc')   # partial bytes, then crash
        raise RuntimeError("disk full")
    monkeypatch.setattr(json, "dump", exploding_dump)
    with pytest.raises(RuntimeError):
        pm.add_project("beta")
    monkeypatch.setattr(json, "dump", real_dump)

    # registry on disk is still the last GOOD state and still parses
    pm2 = _mgr(tmp_path)
    assert pm2.list_projects_by_name() == ["alpha"]


def test_nameless_registry_entry_tolerated(tmp_path):
    """A projects.json entry without a name loads (the migrator skips it);
    listing must not KeyError on it (review r3 batch 12)."""
    import json
    import os

    from softspoken_tpu import Config
    from softspoken_tpu.project import ProjectManager

    cfg = Config().with_paths(project_dir=str(tmp_path))
    pm = ProjectManager(cfg)
    pm.add_project("real")
    with open(pm.projects_file) as f:
        data = json.load(f)
    data.append({"detections_file": "/nowhere.csv"})  # nameless
    with open(pm.projects_file, "w") as f:
        json.dump(data, f)
    pm2 = ProjectManager(cfg)
    assert pm2.list_projects_by_name() == ["real"]
    pm2.add_project("second")  # must not crash on the nameless entry


def test_file_list_write_is_atomic(tmp_path, monkeypatch):
    """update_file_list goes through tmp+os.replace — a crash mid-write
    must not leave a truncated list (review r3 batch 12)."""
    import os

    from softspoken_tpu import Config
    from softspoken_tpu.project import ProjectManager

    cfg = Config().with_paths(project_dir=str(tmp_path))
    pm = ProjectManager(cfg)
    pm.add_project("p")
    pm.set_active_project("p")
    pm.update_file_list(["/a/x.wav", "/a/y.wav"])

    real_replace = os.replace
    calls = []
    monkeypatch.setattr(os, "replace",
                        lambda a, b: (calls.append((a, b)), real_replace(a, b))[1])
    pm.update_file_list(["/a/z.wav"])
    assert calls, "file list write must go through os.replace"
    assert pm.get_unprocessed_list() == ["/a/x.wav", "/a/y.wav", "/a/z.wav"]
