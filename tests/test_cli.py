import json
import os

import numpy as np
import pandas as pd
import pytest

from softspoken_tpu.cli import main
from softspoken_tpu.io import wavio


@pytest.fixture
def workspace(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    wavdir = tmp_path / "audio"
    wavdir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = str(wavdir / f"rec{i}.wav")
        wavio.write(p, rng.uniform(-0.4, 0.4, 22050 * 4).astype(np.float32), 22050)
        paths.append(p)
    return tmp_path, paths


def _pdir(ws):
    return str(ws / "projects")


def test_cli_full_workflow(workspace, capsys):
    ws, paths = workspace
    pdir = _pdir(ws)

    main(["--project-dir", pdir, "project", "new", "cliproj"])
    main(["--project-dir", pdir, "project", "add-files", "cliproj", *paths])
    main(["--project-dir", pdir, "project", "list"])
    out = capsys.readouterr().out
    assert "cliproj" in out

    main(
        [
            "--project-dir", pdir,
            "detect", "--project", "cliproj", "--random-init",
            "--precision", "parity", "--device-batch", "4",
        ]
    )
    out = capsys.readouterr().out
    tail = out[out.index("{") :]
    rep = json.loads(tail)
    assert rep["files_done"] == 2 and not rep["errors"]

    main(["--project-dir", pdir, "project", "status", "cliproj"])
    st = json.loads(capsys.readouterr().out)
    assert st["detect"] == "Complete"

    # grade everything as erase, then export + silence
    main(["--project-dir", pdir, "review", "list", "--project", "cliproj"])
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["total"]
    if n:
        main(["--project-dir", pdir, "review", "erase", "--project", "cliproj",
              "--rows", *[str(i) for i in range(n)]])
        capsys.readouterr()
    else:  # random weights may produce only full-file regions filtered out
        main(["--project-dir", pdir, "review", "export", "--project", "cliproj"])
        capsys.readouterr()

    outdir = str(ws / "silenced")
    main(["--project-dir", pdir, "silence", "--project", "cliproj",
          "--output-dir", outdir])
    capsys.readouterr()
    main(["--project-dir", pdir, "project", "status", "cliproj"])
    st = json.loads(capsys.readouterr().out)
    assert st["silence"] == "Complete"


def test_cli_adhoc_detect(workspace, capsys):
    ws, paths = workspace
    out_csv = str(ws / "adhoc.csv")
    main(
        [
            "detect", "--files", paths[0], "--out", out_csv,
            "--random-init", "--precision", "parity", "--device-batch", "4",
        ]
    )
    assert os.path.exists(out_csv)
    capsys.readouterr()
    df = pd.read_csv(out_csv)
    assert set(df.columns) >= {"ID", "file_name", "start_time", "end_time"}


def test_cli_review_render_and_segment(workspace, capsys):
    ws, paths = workspace
    pdir = _pdir(ws)
    main(["--project-dir", pdir, "project", "new", "p2"])
    main(["--project-dir", pdir, "project", "add-files", "p2", paths[0]])
    main(["--project-dir", pdir, "detect", "--project", "p2", "--random-init",
          "--precision", "parity", "--device-batch", "4"])
    capsys.readouterr()
    main(["--project-dir", pdir, "review", "list", "--project", "p2"])
    n = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["total"]
    if n == 0:
        pytest.skip("random-net produced no reviewable detections")
    png = str(ws / "det.png")
    main(["--project-dir", pdir, "review", "render", "--project", "p2",
          "--row", "0", "--out", png])
    capsys.readouterr()
    assert os.path.getsize(png) > 1000
    seg = str(ws / "seg.wav")
    main(["--project-dir", pdir, "review", "segment", "--project", "p2",
          "--row", "0", "--out", seg])
    assert os.path.getsize(seg) > 44


def test_cli_detect_chunk_checkpoint_resumable(tmp_path, monkeypatch):
    """--chunk-checkpoint N wires engine.chunk_checkpoint_every and the
    runner drops journal sidecars next to the CSV (cleared on success)."""
    import numpy as np

    from softspoken_tpu.io import wavio

    rng = np.random.default_rng(2)
    wav = str(tmp_path / "a.wav")
    wavio.write(wav, (0.1 * rng.standard_normal(20 * 22050)).astype(np.float32),
                22050, subtype="PCM_16")
    out = str(tmp_path / "dets.csv")
    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"engine": {"precision": "parity", "device_batch": 8,
                              "chunk_seconds": 6.0, "pipeline": "fused"}}, f)
    main(["--config", cfg, "detect", "--files", wav, "--out", out,
              "--random-init", "--streaming", "--chunk-checkpoint", "1"])
    assert os.path.exists(out)
    prog = os.path.join(os.path.dirname(out), ".chunk_progress")
    # a successful run leaves no sidecars behind
    assert not os.path.isdir(prog) or os.listdir(prog) == []


def test_cli_project_new_registers_files(workspace, capsys):
    """`project new NAME f1 f2` registers the trailing files instead of
    silently dropping them (found by a real workflow smoke)."""
    ws, paths = workspace
    pdir = _pdir(ws)
    main(["--project-dir", pdir, "project", "new", "withfiles", *paths])
    out = capsys.readouterr().out
    assert "2 file(s) registered" in out
    main(["--project-dir", pdir, "detect", "--project", "withfiles",
          "--random-init", "--precision", "parity", "--device-batch", "4"])
    out = capsys.readouterr().out
    rep = json.loads(out[out.index("{"):])
    assert rep["files_done"] == 2 and not rep["errors"]


def test_cli_doctor(workspace, capsys):
    """doctor returns a JSON report with bounded device probes."""
    ws, _ = workspace
    main(["doctor", "--device-timeout", "30"])
    out = capsys.readouterr().out
    rep = json.loads(out[out.index("{"):])
    assert rep["jax_backend"]["status"] == "ok"          # CPU backend in tests
    assert rep["native_dsp"]["status"] == "ok"
    assert "summary" in rep
    assert rep["device_forward"]["status"] in ("ok", "TIMEOUT")
