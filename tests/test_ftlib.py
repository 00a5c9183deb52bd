"""scripts/ftlib.py: fingerprinted experiment stages (round-4 review fix —
existence-only skips silently reused stale candidates)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import ftlib  # noqa: E402


def test_stage_runs_and_fingerprints(tmp_path):
    out = str(tmp_path / "result.json")
    calls = []

    def fn():
        calls.append(1)
        open(out, "w").write("{}")

    ftlib.stage("s", out, {"lr": 1e-4, "steps": 100}, fn)
    assert calls == [1]
    assert os.path.exists(out + ".fp.json")

    # same fingerprint → skip
    ftlib.stage("s", out, {"lr": 1e-4, "steps": 100}, fn)
    assert calls == [1]

    # different fingerprint → refuse loudly, never silently reuse
    with pytest.raises(SystemExit, match="different parameters"):
        ftlib.stage("s", out, {"lr": 3e-5, "steps": 100}, fn)
    assert calls == [1]


def test_stage_refuses_unfingerprinted_output(tmp_path):
    """A pre-scaffold output (no .fp.json) must not be silently reused."""
    out = str(tmp_path / "old.json")
    open(out, "w").write("{}")
    with pytest.raises(SystemExit, match="different parameters"):
        ftlib.stage("s", out, {"steps": 4}, lambda: None)


def test_stage_missing_output_fails(tmp_path):
    out = str(tmp_path / "never.json")
    with pytest.raises(SystemExit, match="missing"):
        ftlib.stage("s", out, {}, lambda: None)
    assert not os.path.exists(out + ".fp.json")
