"""Stage timers (engine/trace.py)."""
import json

from dropoutdecoding_tpu.engine.trace import StageTimer, profile_trace


def test_stage_timer_report(tmp_path):
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0
    path = tmp_path / "t.json"
    t.dump(str(path))
    assert json.load(open(path))["b"]["count"] == 1


def test_profile_trace_noop():
    with profile_trace(None):
        x = 1
    assert x == 1
