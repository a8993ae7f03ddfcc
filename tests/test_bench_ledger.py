"""bench.py timeout-proofing: the incremental ledger + budget watchdog.

Round-4 postmortem: the driver artifact BENCH_r04.json was rc=124 /
parsed=null because bench.py printed its single JSON line only at the very
end — a timeout converted a 95%-done run into zero evidence.  These tests
pin the fix: results accumulate incrementally, the headline line is
emitted exactly once from whatever completed, and the watchdog emits a
valid line even when nothing completed.  Pure-host logic — no JAX.
"""

import json
import threading
import time

import bench


def _mk_result(value):
    return {"metric": "SDXL 1024x1024 25-NFE dpm++_2m_cfgpp throughput",
            "value": value, "unit": "images/sec/chip"}


def test_ledger_prefers_int8_headline(capsys):
    led = bench._Ledger(budget_s=0)
    led.record("sdxl", _mk_result(0.4))
    led.record("sdxl_int8", _mk_result(0.5))
    led.emit()
    line = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert line["value"] == 0.5
    assert line["vs_baseline"] == 0.5
    assert line["op_points"]["sdxl"]["value"] == 0.4
    assert "headline_note" in line


def test_ledger_emit_is_idempotent(capsys):
    led = bench._Ledger(budget_s=0)
    led.record("sdxl", _mk_result(0.4))
    led.emit()
    led.emit()
    led.emit(partial=True)
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert len(out) == 1


def test_ledger_empty_run_still_emits_valid_json(monkeypatch, capsys):
    """Zero completed op-points must still yield a parseable headline —
    with the subprocess TPU diagnosis attached so a 0.0 artifact is
    attributable (wedged tunnel vs real failure; PERF.md 'Operational')."""
    monkeypatch.setattr(bench._Ledger, "_diagnose_device",
                        staticmethod(lambda: {"healthy": False,
                                              "small_matmul_s": 2.5}))
    led = bench._Ledger(budget_s=0)
    led.emit(partial=True)
    line = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert line["value"] == 0.0 and line["partial"] is True
    assert "error" in line and line["unit"] == "images/sec/chip"
    assert line["tpu_diagnosis"] == {"healthy": False, "small_matmul_s": 2.5}


def test_diagnose_device_survives_probe_failure(monkeypatch):
    """The diagnosis must never take the emit path down with it."""
    import subprocess

    def boom(*a, **k):
        raise OSError("no such file")
    monkeypatch.setattr(subprocess, "run", boom)
    out = bench._Ledger._diagnose_device()
    assert "probe_error" in out and "OSError" in out["probe_error"]


def test_ledger_partial_records_skips(capsys):
    led = bench._Ledger(budget_s=0)
    led.record("sdxl", _mk_result(0.4))
    led.skipped.extend(["sd15", "sdxl_lightning"])
    led.emit(partial=True)
    line = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert line["partial"] is True
    assert line["skipped_op_points"] == ["sd15", "sdxl_lightning"]
    assert line["value"] == 0.4


def test_watchdog_emits_without_os_exit_when_done(capsys):
    """A completed run must NOT be killed by the watchdog: emit() sets the
    event the watchdog waits on, so the daemon thread exits silently."""
    led = bench._Ledger(budget_s=30)
    led.start_watchdog()
    led.record("sdxl", _mk_result(0.4))
    led.emit()
    time.sleep(0.05)
    out = [ln for ln in capsys.readouterr().out.splitlines()
           if ln.startswith("{")]
    assert len(out) == 1
    # the watchdog thread observed the event and will not fire
    assert led._emitted.is_set()


def test_watchdog_fires_at_budget(monkeypatch, capsys):
    """Watchdog path minus the os._exit: emits the partial line from a
    daemon thread when the budget elapses mid-'op-point'."""
    exited = threading.Event()
    monkeypatch.setattr(bench.os, "_exit", lambda code: exited.set())
    led = bench._Ledger(budget_s=0.2)
    led.record("sdxl", _mk_result(0.4))
    led.start_watchdog()
    assert exited.wait(timeout=5.0), "watchdog never fired"
    line = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert line["value"] == 0.4 and line["partial"] is True


def test_progress_file_written(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "PROGRESS_PATH",
                        str(tmp_path / "evidence" / "bench_progress.json"))
    led = bench._Ledger(budget_s=0)
    led.record("sdxl", _mk_result(0.4))
    data = json.loads((tmp_path / "evidence" / "bench_progress.json").read_text())
    assert data["completed"] == ["sdxl"]
    assert data["op_points"]["sdxl"]["value"] == 0.4


def test_default_op_points_are_the_slim_four():
    assert bench.DEFAULT_OP_POINTS == ("sdxl", "sdxl_int8", "sd15",
                                       "sdxl_lightning")
    # every default op-point must exist in the table
    for n in bench.DEFAULT_OP_POINTS:
        assert n in bench.OP_POINTS


def test_batch_sweep_survives_a_failing_point():
    """An OOM at one batch size is a sweep finding, not a crash: the row
    records the exception name + first message line, the sweep continues,
    and best_batch is picked from the points that completed (the round-5
    live failure mode: batch-2 whole-batch VAE decode OOMed mid-sweep)."""
    def fake_run(name, jnp, on_tpu, bundle_cache, quant_mode="dense",
                 batch_override=None):
        if batch_override == 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory\nlong tail")
        v = {4: 0.47, 8: 0.51}[batch_override]
        return {"value": v, "seconds_per_image": 1.0 / v, "mfu": 0.4}

    out = bench.run_batch_sweep("sdxl_int8", "2,4,8", None, True,
                                quant_mode="all", _run_op_point=fake_run)
    assert out["sweep"][2]["error"] == "RuntimeError"
    assert out["sweep"][2]["detail"].startswith("RESOURCE_EXHAUSTED")
    assert "\n" not in out["sweep"][2]["detail"]
    assert out["best_batch"] == 8 and out["best_value"] == 0.51
    # the shared-bundle dict and the result must be JSON-serializable
    json.dumps(out)


def test_batch_sweep_all_points_failing_has_null_best():
    def fake_run(*a, **k):
        raise MemoryError()
    out = bench.run_batch_sweep("sdxl", "4,8", None, True,
                                _run_op_point=fake_run)
    assert out["best_batch"] is None and out["best_value"] is None
    assert out["sweep"][4]["detail"] == ""
