"""Driver contract rehearsal for bench.py (VERDICT r4 next #1c).

Rounds 3 and 4 both forfeited the driver benchmark: rc=1 on an uncaught
kernel crash, then rc=124 with NO JSON line because everything printed at
the very end, after a probe-retry loop whose budget exceeded the driver's
wall clock. The contract now: one total deadline, incremental emission,
watchdog clean-exit, SIGTERM flush. These tests kill bench.py the way the
driver does and assert a parseable JSON line ALWAYS survives.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _last_json_line(text: str):
    out = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                pass
    return out


def _run(env_extra, timeout_s, sig=None, sig_after=None):
    env = dict(os.environ, **env_extra)
    proc = subprocess.Popen(
        [sys.executable, BENCH], cwd=REPO, env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    if sig is not None:
        time.sleep(sig_after)
        proc.send_signal(sig)
    try:
        out, _ = proc.communicate(timeout=timeout_s)
    except subprocess.TimeoutExpired:
        proc.kill()
        out, _ = proc.communicate()
        pytest.fail(f"bench.py outlived its {timeout_s}s bound")
    return proc.returncode, out


def _assert_contract(payload):
    assert payload is not None, "no parseable JSON line in bench output"
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in payload, f"driver field {key} missing"
    assert payload["metric"].startswith("steps_per_sec")


@pytest.mark.slow
def test_probe_failure_cpu_fallback_line_survives():
    """Probe forced to fail -> CPU fallback. A guard line is printed BEFORE
    the slow CPU measurement, so a kill at any later point keeps a tail
    line; the completed run exits 0 with a measured CPU value."""
    rc, out = _run({
        "HIPSC_BENCH_FORCE_PROBE_FAIL": "1",
        "HIPSC_BENCH_CELLS": "2000",
        "HIPSC_BENCH_DEADLINE_S": "200",
        "HIPSC_BENCH_SKIP_EXTRAS": "1",
    }, timeout_s=230)
    assert rc == 0
    payload = _last_json_line(out)
    _assert_contract(payload)
    assert payload["platform"] == "cpu-fallback"
    assert payload["value"] > 0.0  # the CPU measurement actually ran
    assert "last_tpu_measured" in payload
    # the guard line printed before the measurement is ALSO parseable
    first = _last_json_line(out.splitlines()[0])
    _assert_contract(first)


def test_probe_wedge_watchdog_exits_clean():
    """Probe wedged forever (simulated tunnel hang): the watchdog must
    force a CLEAN rc=0 exit with a parseable line before the deadline —
    a wedged PJRT call cannot be interrupted from Python."""
    t0 = time.monotonic()
    rc, out = _run({
        "HIPSC_BENCH_FORCE_PROBE_HANG": "1",
        "HIPSC_BENCH_DEADLINE_S": "20",
    }, timeout_s=60)
    assert rc == 0
    assert time.monotonic() - t0 < 45.0
    payload = _last_json_line(out)
    _assert_contract(payload)
    assert "deadline" in payload["error"]


def test_late_retry_upgrades_value_in_process():
    """Unit test of the late-TPU-retry bookkeeping (the wedge-recovery
    path, 2026-08-20 ops note): with the scratch file pre-populated the
    way a successful retry child writes it, `value` must be upgraded to
    the TPU number, the interim CPU figures preserved as cpu_fallback_*,
    and the platform re-labeled."""
    sys.path.insert(0, REPO)
    import bench

    scratch = f"/tmp/hipsc_late_retry_{os.getpid()}.jsonl"
    with open(scratch, "w") as f:
        f.write(json.dumps({"100k": 5.0}) + "\n")
        f.write(json.dumps({"500k": 1.25}) + "\n")

    class _Proc:
        def wait(self, timeout=None):
            return 0

        def kill(self):
            pass

    saved = (bench._results.copy(), bench._T0,
             bench.subprocess.Popen, os.environ.get(
                 "HIPSC_BENCH_NO_LATE_RETRY"))
    try:
        os.environ.pop("HIPSC_BENCH_NO_LATE_RETRY", None)
        bench._results.clear()
        bench._results.update({"100k": 0.9, "platform": "cpu-fallback",
                               "error": "probe timed out"})
        bench._T0 = time.monotonic()  # full deadline available
        bench.subprocess.Popen = lambda *a, **k: _Proc()
        assert bench._late_tpu_retry() is True
        payload = bench._payload()
    finally:
        bench._results.clear()
        bench._results.update(saved[0])
        bench._T0 = saved[1]
        bench.subprocess.Popen = saved[2]
        if saved[3] is not None:
            os.environ["HIPSC_BENCH_NO_LATE_RETRY"] = saved[3]
        if os.path.exists(scratch):
            os.remove(scratch)
    assert payload["value"] == 5.0
    assert payload["steps_per_sec_500k_cells"] == 1.25
    assert payload["platform"] == "tpu-late-retry"
    assert payload["cpu_fallback_100k_steps_per_sec"] == 0.9
    assert "recovered mid-run" in payload["error"]


@pytest.mark.slow
def test_probe_failure_long_deadline_lands_500k_on_cpu():
    """With budget left after the 100k CPU fallback, the 500k point must
    also land on the CPU backend so BOTH headline points exist in a
    fully-wedged artifact. The late retry is explicitly disabled: on this
    dev box the axon sitecustomize overrides JAX_PLATFORMS=cpu, so the
    retry child would reach the REAL TPU and (correctly) upgrade the line
    — measured doing exactly that when this test first ran."""
    rc, out = _run({
        "HIPSC_BENCH_FORCE_PROBE_FAIL": "1",
        "HIPSC_BENCH_NO_LATE_RETRY": "1",
        "HIPSC_BENCH_CELLS": "2000",
        "HIPSC_BENCH_CELLS_LARGE": "4000",
        "HIPSC_BENCH_DEADLINE_S": "500",
        "HIPSC_BENCH_SKIP_EXTRAS": "1",
    }, timeout_s=400)
    assert rc == 0
    payload = _last_json_line(out)
    _assert_contract(payload)
    assert payload["platform"] == "cpu-fallback"
    assert payload["value"] > 0.0
    assert payload.get("steps_per_sec_500k_cells", 0.0) > 0.0


def test_sigterm_flushes_parseable_line():
    """The driver's `timeout` sends SIGTERM first: the handler must flush
    a best-effort line and exit instead of dying silent (round 4's exact
    failure mode)."""
    # sig_after must outlast interpreter startup (~5.5 s: sitecustomize
    # pre-imports jax before bench.py line 1 — no handler can exist
    # earlier); the driver's real kill comes after minutes
    rc, out = _run({
        "HIPSC_BENCH_FORCE_PROBE_HANG": "1",
        "HIPSC_BENCH_DEADLINE_S": "600",
    }, timeout_s=60, sig=signal.SIGTERM, sig_after=12.0)
    assert rc == 0
    payload = _last_json_line(out)
    _assert_contract(payload)
    assert "SIGTERM" in payload["error"]
