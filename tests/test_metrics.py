import json
import logging
import time

from softspoken_tpu.runtime import StageTimers, ThroughputMeter
from softspoken_tpu.utils import JsonFormatter, setup_logging


def test_throughput_meter():
    m = ThroughputMeter(n_chips=2)
    m.add_audio(30.0)
    m.add_audio(30.0)
    s = m.summary()
    assert s["audio_seconds"] == 60.0
    assert s["audio_sec_per_wall_sec"] > 0
    assert s["audio_sec_per_wall_sec_per_chip"] * 2 == s["audio_sec_per_wall_sec"]
    m.reset()
    assert m.audio_seconds == 0.0


def test_stage_timers():
    t = StageTimers()
    with t.time("decode"):
        time.sleep(0.01)
    with t.time("decode"):
        pass
    with t.time("device"):
        pass
    assert t.counts["decode"] == 2
    assert t.totals["decode"] >= 0.01
    rep = json.loads(t.report())
    assert set(rep) == {"decode", "device"}


def test_json_formatter():
    rec = logging.LogRecord("x", logging.INFO, __file__, 1, "hello %s", ("w",), None)
    out = json.loads(JsonFormatter().format(rec))
    assert out["msg"] == "hello w"
    assert out["level"] == "INFO"


def test_setup_logging_idempotent(capsys):
    setup_logging(json_lines=True)
    setup_logging(json_lines=False)  # replaces handlers, no duplicates
    root = logging.getLogger()
    assert len(root.handlers) == 1


def test_analytic_flops_per_window():
    from softspoken_tpu.runtime.metrics import (
        analytic_flops_per_window, flops_per_audio_second, mfu,
    )

    f = analytic_flops_per_window()
    # ~7 GFLOP for mel + U-Net + mask head (spec head DCE'd in detection)
    assert 5e9 < f < 10e9
    assert analytic_flops_per_window(include_spec_head=True) > f
    assert flops_per_audio_second() == f / 0.6
    # MFU is a fraction of peak
    assert 0.0 < mfu(600.0) < 1.0
