"""Pause/resume guard for exclusive use of the (single) TPU chip.

``bench.py`` and the probe scripts need the chip to themselves — a
training campaign running concurrently on the same chip both corrupts
the measurement and slows the campaign. This module SIGSTOPs any running
campaign/probe process tree for the duration of a measurement and
SIGCONTs it afterwards.

Robustness: alongside the in-process ``finally``-based resume, a tiny
DETACHED "unpauser" subprocess is spawned that waits for the measuring
process to exit (however it dies — including SIGKILL by a driver
timeout) and then resumes every stopped pid. A double SIGCONT is
harmless, so both paths always run.

Stop order matters:

1. the stale-log watchdog first (``campaign_watchdog.py`` would otherwise
   see the paused stage's silent log and kill it),
2. then the campaign/probe DRIVERS (so no new stage subprocess is
   spawned between scan and stop),
3. then a RE-SCAN for stage subprocesses (training/eval processes the
   driver may have spawned in the meantime).

The /proc scan matches script names in command lines, excludes the
calling process and its ancestors, and only ever sends SIGSTOP/SIGCONT —
a false match is paused and resumed, never killed. (This is why the
repo's no-``pkill -f`` rule doesn't apply: nothing is terminated.)
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
from typing import Iterable, List, Sequence, Tuple

WATCHDOG_PATTERNS = ("campaign_watchdog.py",)
DRIVER_PATTERNS = ("chip_queue.py", "queue_rerun.py", "session_queue.py",
                   "round4_queue.py", "parity_campaign.py",
                   "flow_ablation.py", "pwc_pretrain_probe.py")
STAGE_PATTERNS = ("run_training.py", "run_evaluation.py", "eval_worker.py",
                  "generate_synthetic_burst_val.py", "train_perf_probe.py",
                  "synth_perf_probe.py", "tpu_parity_check.py")
ALL_PATTERNS = WATCHDOG_PATTERNS + DRIVER_PATTERNS + STAGE_PATTERNS


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().decode("utf-8", "replace").replace("\0", " ")
    except OSError:
        return ""


def _ancestors(pid: int) -> List[int]:
    """pid plus its parent chain up to init (via /proc stat field 4)."""
    chain = []
    while pid > 1:
        chain.append(pid)
        try:
            with open(f"/proc/{pid}/stat") as f:
                stat = f.read()
            # field 2 is "(comm)" and may contain spaces/parens: parse
            # after the LAST ')'.
            pid = int(stat[stat.rindex(")") + 1:].split()[1])
        except (OSError, ValueError, IndexError):
            break
    return chain


def find_pids(patterns: Sequence[str],
              exclude: Iterable[int] = ()) -> List[Tuple[int, str]]:
    """(pid, cmdline) of processes whose cmdline contains any pattern.

    ``exclude`` pids (typically the caller and its ancestors) are never
    returned, so a measuring script whose own launch command mentions a
    pattern (e.g. a shell wrapper echoing a log path) can't pause itself.
    """
    excl = set(exclude)
    out = []
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        pid = int(d)
        if pid in excl:
            continue
        cmd = _cmdline(pid)
        if cmd and any(p in cmd for p in patterns):
            out.append((pid, cmd.strip()))
    return out


def _signal_all(pids: Iterable[int], sig: int) -> List[int]:
    ok = []
    for pid in pids:
        try:
            os.kill(pid, sig)
            ok.append(pid)
        except OSError:
            pass
    return ok


def _spawn_unpauser(guard_pid: int, pids: Sequence[int]) -> None:
    """Detached process that SIGCONTs ``pids`` once ``guard_pid`` exits,
    no matter how it exits. Belt-and-braces next to the in-process
    resume; double SIGCONT is a no-op."""
    script = (
        "import os,sys,time\n"
        "gp=int(sys.argv[1]); pids=[int(p) for p in sys.argv[2:]]\n"
        "while os.path.exists(f'/proc/{gp}'): time.sleep(2)\n"
        "for p in reversed(pids):\n"
        "  try: os.kill(p,18)\n"  # SIGCONT
        "  except OSError: pass\n")
    subprocess.Popen(
        [sys.executable, "-c", script, str(guard_pid)]
        + [str(p) for p in pids],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)


class ChipPause:
    """Context manager: pause any campaign/probe processes for the block.

    >>> with ChipPause() as paused:
    ...     ...  # exclusive chip measurements
    """

    def __init__(self, log=None):
        self._log = log or (lambda m: print(m, file=sys.stderr, flush=True))
        self.paused: List[int] = []

    def __enter__(self):
        excl = _ancestors(os.getpid())
        stopped: List[int] = []
        # 1. watchdog, 2. drivers — stop before they can react/spawn.
        for pats in (WATCHDOG_PATTERNS, DRIVER_PATTERNS):
            found = find_pids(pats, exclude=excl)
            stopped += _signal_all([p for p, _ in found], signal.SIGSTOP)
        # 3. re-scan for stages only after the drivers are frozen.
        found = find_pids(STAGE_PATTERNS, exclude=excl + stopped)
        stopped += _signal_all([p for p, _ in found], signal.SIGSTOP)
        self.paused = stopped
        if stopped:
            self._log(f"chip_guard: paused {len(stopped)} campaign/probe "
                      f"process(es) {stopped} for exclusive chip use")
            _spawn_unpauser(os.getpid(), stopped)
        return self.paused

    def __exit__(self, *exc):
        if self.paused:
            # Reverse of stop order: stages/drivers first, the watchdog
            # LAST — it must not observe the world before the stage is
            # running again (its own suspension-grace handles the stale
            # log; this ordering removes one more race).
            _signal_all(list(reversed(self.paused)), signal.SIGCONT)
            self._log(f"chip_guard: resumed {self.paused}")
            self.paused = []
        return False
