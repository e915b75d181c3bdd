"""Tests for the exclusive-chip pause guard (bench vs running campaign)."""

import os
import signal
import subprocess
import sys
import time

import pytest

from dbsr_tpu.utils import chip_guard


def _state(pid):
    with open(f"/proc/{pid}/stat") as f:
        stat = f.read()
    return stat[stat.rindex(")") + 1:].split()[0]


@pytest.fixture
def decoy():
    """A harmless subprocess whose cmdline carries a unique marker.
    Waits until the process is visible to the /proc cmdline scan — under
    heavy load (e.g. a concurrent real bench) the exec can lag the
    Popen return long enough for an immediate scan to miss it."""
    marker = f"chip_guard_decoy_{os.getpid()}"
    p = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(300)", marker])
    deadline = time.time() + 10
    while time.time() < deadline and not chip_guard.find_pids((marker,)):
        time.sleep(0.05)
    yield p, marker
    p.kill()
    p.wait()


def test_find_pids_matches_and_excludes(decoy):
    p, marker = decoy
    found = chip_guard.find_pids((marker,))
    assert p.pid in [pid for pid, _ in found]
    assert chip_guard.find_pids((marker,), exclude=[p.pid]) == []


def test_ancestors_include_self_and_parent():
    chain = chip_guard._ancestors(os.getpid())
    assert chain[0] == os.getpid()
    assert os.getppid() in chain


def test_pause_resumes_decoy(decoy, monkeypatch):
    p, marker = decoy
    monkeypatch.setattr(chip_guard, "WATCHDOG_PATTERNS", (marker,))
    monkeypatch.setattr(chip_guard, "DRIVER_PATTERNS", ())
    monkeypatch.setattr(chip_guard, "STAGE_PATTERNS", ())
    logs = []
    with chip_guard.ChipPause(log=logs.append) as paused:
        assert p.pid in paused
        deadline = time.time() + 5
        while _state(p.pid) != "T" and time.time() < deadline:
            time.sleep(0.05)
        assert _state(p.pid) == "T"
    deadline = time.time() + 5
    while _state(p.pid) == "T" and time.time() < deadline:
        time.sleep(0.05)
    assert _state(p.pid) != "T"
    assert any("paused" in m for m in logs) and any(
        "resumed" in m for m in logs)


def test_pause_with_no_match_is_noop(monkeypatch):
    monkeypatch.setattr(chip_guard, "WATCHDOG_PATTERNS",
                        ("no_such_process_pattern_xyz",))
    monkeypatch.setattr(chip_guard, "DRIVER_PATTERNS", ())
    monkeypatch.setattr(chip_guard, "STAGE_PATTERNS", ())
    with chip_guard.ChipPause(log=lambda m: None) as paused:
        assert paused == []


def test_unpauser_resumes_after_guard_death(decoy, monkeypatch):
    """The detached unpauser must SIGCONT the decoy even when the
    guard process dies without running its __exit__ (SIGKILL)."""
    p, marker = decoy
    guard_src = (
        "import os, sys, time\n"
        "sys.path.insert(0, sys.argv[1])\n"
        "from dbsr_tpu.utils import chip_guard\n"
        "chip_guard.WATCHDOG_PATTERNS = (sys.argv[2],)\n"
        "chip_guard.DRIVER_PATTERNS = ()\n"
        "chip_guard.STAGE_PATTERNS = ()\n"
        "g = chip_guard.ChipPause(log=lambda m: None)\n"
        "g.__enter__()\n"
        "print('entered', flush=True)\n"
        "time.sleep(300)\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    guard = subprocess.Popen([sys.executable, "-c", guard_src, repo, marker],
                             stdout=subprocess.PIPE, text=True)
    try:
        assert guard.stdout.readline().strip() == "entered"
        deadline = time.time() + 5
        while _state(p.pid) != "T" and time.time() < deadline:
            time.sleep(0.05)
        assert _state(p.pid) == "T"
        guard.kill()  # __exit__ never runs
        guard.wait()
        deadline = time.time() + 15  # unpauser polls every 2 s
        while _state(p.pid) == "T" and time.time() < deadline:
            time.sleep(0.2)
        assert _state(p.pid) != "T"
    finally:
        if guard.poll() is None:
            guard.kill()
            guard.wait()
        try:
            os.kill(p.pid, signal.SIGCONT)
        except OSError:
            pass
