"""bench.py outage tolerance (VERDICT r2 item 6).

BENCH_r02.json recorded rc=1 with `parsed: null` because a full axon
outage crashed bench.py at import-time backend init with a bare
traceback. These tests simulate the outage: the poll loop must retry
within its window, give up when the window closes, and main() must emit
a structured {"error": ...} JSON line (never a bare traceback) so the
driver's parsed field is non-null even on a dead backend.
"""
import json
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import bench  # noqa: E402


def _probe_seq(results):
    it = iter(results)

    def probe():
        return next(it)

    return probe


def test_wait_recovers_mid_window():
    logs = []
    ok = bench.wait_for_backend(
        window_s=100.0, probe=_probe_seq([False, False, True]),
        sleep_s=0.0, log=logs.append)
    assert ok
    assert any("recovered" in m for m in logs)


def test_wait_gives_up_after_window():
    # window 0 → exactly one probe, no sleep/retry
    ok = bench.wait_for_backend(
        window_s=0.0, probe=_probe_seq([False, True]), sleep_s=0.0)
    assert not ok


def test_wait_immediate_success_is_single_probe():
    calls = []

    def probe():
        calls.append(1)
        return True

    assert bench.wait_for_backend(window_s=300.0, probe=probe)
    assert len(calls) == 1


def test_main_emits_error_json_on_dead_backend(capsys, monkeypatch):
    monkeypatch.setenv("E4T_BENCH_OUTAGE_WAIT", "0")
    monkeypatch.delenv("E4T_PLATFORM", raising=False)
    with pytest.raises(SystemExit) as exc:
        bench.main(wait=lambda window: False)
    assert exc.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)  # driver-parseable, not a traceback
    assert "error" in parsed and parsed["value"] is None
    assert parsed["unit"] == "images/sec/chip"


def test_default_config_is_bf16_int8static_then_dpmpp(monkeypatch):
    """Default bench emits bf16 DDIM-50 first, int8-static DDIM-50, then
    the DPM++ 20-step int8-static fast-sampler row LAST (the
    validated-best headline a tail-parsing driver records)."""
    ran = []
    monkeypatch.delenv("E4T_BENCH_INT8", raising=False)
    monkeypatch.delenv("E4T_BENCH_SCHEDULER", raising=False)
    monkeypatch.delenv("E4T_BENCH_STEPS", raising=False)
    monkeypatch.setenv("E4T_PLATFORM", "cpu")  # skip the backend probe
    monkeypatch.setattr(bench, "run_bench",
                        lambda b, fallback=False, int8=None, scheduler=None,
                        steps=None: ran.append((int8, scheduler, steps)))
    bench.main(wait=lambda window: True)
    assert ran == [(False, None, None), ("static", None, None),
                   ("static", "dpmpp", 20)]


def test_explicit_scheduler_suppresses_extra_dpmpp_row(monkeypatch):
    """Setting E4T_BENCH_SCHEDULER/STEPS keeps the old per-config
    behavior (no surprise third line in targeted sweeps)."""
    ran = []
    monkeypatch.delenv("E4T_BENCH_INT8", raising=False)
    monkeypatch.setenv("E4T_BENCH_SCHEDULER", "dpmpp")
    monkeypatch.setenv("E4T_BENCH_STEPS", "20")
    monkeypatch.setenv("E4T_PLATFORM", "cpu")
    monkeypatch.setattr(bench, "run_bench",
                        lambda b, fallback=False, int8=None, scheduler=None,
                        steps=None: ran.append((int8, scheduler)))
    bench.main(wait=lambda window: True)
    assert ran == [(False, "dpmpp"), ("static", "dpmpp")]


def test_single_config_env_still_selects(monkeypatch):
    ran = []
    monkeypatch.setenv("E4T_BENCH_INT8", "static")
    monkeypatch.setenv("E4T_PLATFORM", "cpu")
    monkeypatch.setattr(bench, "run_bench",
                        lambda b, fallback=False, int8=None, scheduler=None,
                        steps=None: ran.append(int8))
    bench.main(wait=lambda window: True)
    assert ran == ["static"]
