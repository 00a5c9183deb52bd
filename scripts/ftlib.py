"""Shared scaffold for the staged fine-tune experiments (ft_music /
ft_synth3 / ft_boundary): subprocess stages with logs, and
restart-safety that is FINGERPRINTED rather than existence-only.

The round-4 review found the existence-only skip pattern unsound: a
stale candidate from a --quick smoke (or a different-hyperparameter run)
in the same workdir was silently reused while the verdict JSON stamped
the CURRENT args as if they had produced it — a pre-registered-gate
evidence artifact attributing adopt/reject to an experiment that never
ran.  ``stage()`` therefore writes a ``<output>.fp.json`` fingerprint of
the parameters that produced each output; a rerun with matching
parameters skips, a rerun with different parameters refuses and names
the mismatch (use a fresh --workdir).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run(cmd, log_path, retries=0, retry_rcs=(86,)):
    """Run a stage command, retrying (bounded) on retryable exit codes.

    86 is the trainer's stall-abort code (fit_synthetic stall watchdog):
    the remote-TPU session died silently, so rerunning the same command on
    a fresh connection is the correct recovery."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for attempt in range(retries + 1):
        print(f"+ {' '.join(cmd)}  (log: {log_path})", flush=True)
        with open(log_path, "a") as lf:
            p = subprocess.run(cmd, stdout=lf, stderr=subprocess.STDOUT,
                               cwd=repo_root)
        if p.returncode == 0:
            return
        if attempt < retries and p.returncode in retry_rcs:
            print(f"stage exited {p.returncode} (retryable stall) — retry "
                  f"{attempt + 1}/{retries}", flush=True)
            continue
        raise SystemExit(
            f"stage failed ({p.returncode}): {' '.join(cmd)} — see {log_path}")


def stage(name: str, done_path: str, fingerprint: dict, fn) -> None:
    """Run ``fn()`` unless ``done_path`` already exists WITH a matching
    parameter fingerprint.  An existing output with a different (or
    missing) fingerprint aborts loudly instead of being silently reused."""
    fp_path = done_path.rstrip("/") + ".fp.json"
    if os.path.exists(done_path):
        prev = None
        if os.path.exists(fp_path):
            with open(fp_path) as f:
                prev = json.load(f)
        if prev == fingerprint:
            print(f"{name} skipped: {done_path} exists (same parameters)",
                  flush=True)
            return
        raise SystemExit(
            f"{name}: {done_path} exists but was produced with different "
            f"parameters ({prev} != {fingerprint}) — refusing to reuse it; "
            "use a fresh --workdir")
    fn()
    if not os.path.exists(done_path):
        raise SystemExit(f"{name}: expected output {done_path} missing")
    with open(fp_path, "w") as f:
        json.dump(fingerprint, f)
