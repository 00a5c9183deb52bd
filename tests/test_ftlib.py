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


def test_run_retries_stall_exit_code(tmp_path):
    """Exit code 86 (trainer stall-abort) is retryable; other codes are not."""
    marker = tmp_path / "attempts"
    script = tmp_path / "flaky.py"
    script.write_text(
        "import os, sys\n"
        "p = sys.argv[1]\n"
        "n = int(open(p).read()) if os.path.exists(p) else 0\n"
        "open(p, 'w').write(str(n + 1))\n"
        "sys.exit(86 if n < 2 else 0)\n")
    log = str(tmp_path / "run.log")

    # two stalls then success, within the retry budget
    ftlib.run([sys.executable, str(script), str(marker)], log, retries=2)
    assert marker.read_text() == "3"

    # stall beyond the budget → SystemExit
    marker.unlink()
    with pytest.raises(SystemExit, match="stage failed"):
        ftlib.run([sys.executable, str(script), str(marker)], log, retries=1)

    # a non-retryable exit code fails immediately even with retries left
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(3)\n")
    marker2 = tmp_path / "attempts2"
    with pytest.raises(SystemExit, match="stage failed"):
        ftlib.run([sys.executable, str(bad), str(marker2)], log, retries=2)


def test_trainer_stall_watchdog_fires_and_beats_defer():
    import time

    from softspoken_tpu.train.fit import _StallWatchdog

    fired = []
    wd = _StallWatchdog(0.3, abort=fired.append)
    try:
        # heartbeats keep it alive past several timeout windows
        for _ in range(4):
            time.sleep(0.15)
            wd.beat(1)
        assert not fired
        # silence → abort(86)
        deadline = time.monotonic() + 5.0
        while not fired and time.monotonic() < deadline:
            time.sleep(0.05)
        assert fired == [86]
    finally:
        wd.stop()


def test_trainer_stall_watchdog_stop_prevents_abort():
    import time

    from softspoken_tpu.train.fit import _StallWatchdog

    fired = []
    wd = _StallWatchdog(0.2, abort=fired.append)
    wd.stop()
    time.sleep(0.6)
    assert not fired
