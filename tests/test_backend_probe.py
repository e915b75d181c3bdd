"""Backend-outage probing + outage-aware retry loops (driver hardening)."""

import sys
import time

import pytest

from dbsr_tpu.utils.backend_probe import backend_ready, wait_for_backend

TRUE = [sys.executable, "-c", "pass"]
FALSE = [sys.executable, "-c", "raise SystemExit(1)"]
HANG = [sys.executable, "-c", "import time; time.sleep(60)"]


def test_backend_ready_true():
    assert backend_ready(probe_argv=TRUE)


def test_backend_ready_failure():
    assert not backend_ready(probe_argv=FALSE)


def test_backend_ready_hang_times_out():
    t0 = time.monotonic()
    assert not backend_ready(timeout=1.0, probe_argv=HANG)
    assert time.monotonic() - t0 < 30


def test_backend_ready_logs_stderr_reason():
    """A fast nonzero exit logs the last stderr line so config errors
    (unregistered JAX_PLATFORMS plugin) are diagnosable from driver logs."""
    logs = []
    bad = [sys.executable, "-c",
           "import sys; print('boom: Backend axon is not in the list of "
           "known backends', file=sys.stderr); sys.exit(1)"]
    assert not backend_ready(probe_argv=bad, log=logs.append)
    assert any("boom" in m for m in logs)
    assert any("configuration error" in m for m in logs)


def test_backend_ready_logs_timeout_reason():
    logs = []
    assert not backend_ready(timeout=1.0, probe_argv=HANG, log=logs.append)
    assert any("timed out" in m for m in logs)


def test_wait_for_backend_immediate():
    logs = []
    assert wait_for_backend(probe_argv=TRUE, log=logs.append)
    assert logs == []  # no outage -> no log noise


def test_wait_for_backend_gives_up_and_logs():
    logs = []
    assert not wait_for_backend(probe_argv=FALSE, poll_interval=0.05,
                                max_wait=0.2, log=logs.append)
    assert any("unreachable" in m for m in logs)
    assert any("giving up" in m for m in logs)


def test_wait_for_backend_recovers(tmp_path):
    """Probe fails twice (the outage), then succeeds — deterministic via a
    call counter, no timing race."""
    count = tmp_path / "count"
    probe = [sys.executable, "-c", (
        "import pathlib, sys\n"
        f"c = pathlib.Path({str(count)!r})\n"
        "n = int(c.read_text()) + 1 if c.exists() else 1\n"
        "c.write_text(str(n))\n"
        "sys.exit(0 if n >= 3 else 1)\n")]
    logs = []
    assert wait_for_backend(probe_argv=probe, poll_interval=0.05,
                            max_wait=30.0, log=logs.append)
    assert any("unreachable" in m for m in logs)
    assert any("recovered" in m for m in logs)


def test_ablation_sh_outage_does_not_consume_attempts(tmp_path, monkeypatch):
    """flow_ablation.sh: failures during an outage never exhaust retries;
    the stage reruns once the backend is back."""
    sys.path.insert(0, "util_scripts")
    import flow_ablation

    state = {"calls": 0}

    def fake_ready(*a, **k):
        # backend down for the first two post-failure checks
        return state["calls"] > 2

    def fake_wait(*a, **k):
        return True

    monkeypatch.setattr("dbsr_tpu.utils.backend_probe.backend_ready",
                        fake_ready)
    monkeypatch.setattr("dbsr_tpu.utils.backend_probe.wait_for_backend",
                        fake_wait)

    script = tmp_path / "stage.py"
    script.write_text(
        "import pathlib, sys\n"
        f"c = pathlib.Path({str(tmp_path / 'count')!r})\n"
        "n = int(c.read_text()) + 1 if c.exists() else 1\n"
        "c.write_text(str(n))\n"
        "sys.exit(0 if n >= 4 else 1)\n")

    import subprocess as sp
    real_run = sp.run

    def counting_run(argv, **kw):
        state["calls"] += 1
        return real_run([sys.executable, str(script)], **{
            k: v for k, v in kw.items() if k != "cwd"})

    monkeypatch.setattr(flow_ablation.subprocess, "run", counting_run)
    flow_ablation.sh([sys.executable, str(script)], timeout=30,
                     env=None, log_path=str(tmp_path / "log"), retries=2)
    # 4 runs total: 2 uncounted (outage) + 1 counted failure + 1 success,
    # within a retries=2 budget
    assert state["calls"] == 4
