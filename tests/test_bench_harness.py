"""bench.py harness behavior (no TPU needed): the watchdog/fallback
machinery must emit exactly one JSON line no matter how legs fail.

The driver runs ``python bench.py`` once per round; a wedge anywhere —
including FIRST backend contact, which rides the flaky sandbox relay —
must degrade to the cached result instead of hanging (round-2 verdict:
the cached replay is fine, a silent hang is not).
"""

import importlib.util
import io
import json
import sys
from contextlib import redirect_stdout

import pytest


def load_bench():
    spec = importlib.util.spec_from_file_location("bench", "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def bench():
    mod = load_bench()
    yield mod
    sys.modules.pop("bench", None)


def test_probe_failure_emits_cached_json(bench, monkeypatch):
    """A dead relay at the probe leg (which now includes jax.devices(),
    the first backend contact) must print the cached result, flagged."""
    monkeypatch.setattr(bench, "measure_probe",
                        lambda: (_ for _ in ()).throw(RuntimeError("wedge")))
    fake_cache = {"metric": "slides_per_hour_e2e_1chip", "value": 123.4,
                  "unit": "u", "vs_baseline": 1.7}
    monkeypatch.setattr(bench.json, "load", lambda f: dict(fake_cache))
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench.main()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, "bench must print exactly ONE JSON line"
    out = json.loads(lines[0])
    assert out["cached"] is True
    assert "wedge" in out["cache_reason"]
    assert out["value"] == 123.4


def test_run_leg_reraises_keyboard_interrupt(bench, monkeypatch):
    """Ctrl-C must stop the bench, not be recorded as a leg failure."""
    results: dict = {}
    failures: dict = {}

    def interrupted():
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        bench.run_leg("probe", interrupted, results, failures)
    assert failures == {}


def test_run_leg_degrades_leg_errors(bench):
    results: dict = {}
    failures: dict = {}
    ok = bench.run_leg("probe", lambda: (_ for _ in ()).throw(
        RuntimeError("relay died")), results, failures)
    assert ok is False
    assert "relay died" in failures["probe"]
    assert results == {}


def test_leg_timeout_is_base_exception(bench):
    """LegTimeout must not be swallowable by a leg's `except Exception`
    retry loop (the probe leg did exactly that in testing)."""
    assert issubclass(bench.LegTimeout, BaseException)
    assert not issubclass(bench.LegTimeout, Exception)


def test_run_leg_times_out_hung_leg(bench, monkeypatch):
    """A leg that never returns (e.g. backend init blocked inside a C call
    — SIGALRM cannot interrupt that; observed live) must be reported as a
    LegTimeout failure via the join-based watchdog, not hang the bench."""
    import time as _time

    monkeypatch.setitem(bench.LEG_TIMEOUTS, "probe", 1)
    results: dict = {}
    failures: dict = {}
    t0 = _time.perf_counter()
    ok = bench.run_leg("probe", lambda: _time.sleep(60), results, failures)
    assert ok is False
    assert _time.perf_counter() - t0 < 10
    assert "LegTimeout" in failures["probe"]
    assert results == {}
