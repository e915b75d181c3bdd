"""Accelerator-backend liveness probing for long-running drivers.

Campaign/ablation drivers shell out to training/eval stages that each can
take hours; a transient backend outage (observed on relayed TPU runtimes:
the tunnel process dies and every new ``jax.devices()`` blocks for tens of
minutes before failing UNAVAILABLE) would otherwise burn the stage's
bounded retry budget on attempts that cannot possibly succeed. These
helpers let a driver distinguish "the stage failed" from "the backend is
unreachable" and pause the retry clock for the latter.

The probe runs in a SUBPROCESS: on a wedged relay, backend init hangs
inside ``jax.devices()`` and cannot be interrupted in-process, so an
in-process probe would wedge the driver itself. (Fail-safe counterpart of
the reference's crash-retry trainer loop, ``trainers/base_trainer.py:59-85``,
which assumes the accelerator always comes back by itself.)
"""

from __future__ import annotations

import subprocess
import sys
import time
from typing import Callable, Optional, Sequence

_PROBE_SNIPPET = "import jax; jax.devices()"


def backend_ready(timeout: float = 90.0,
                  probe_argv: Optional[Sequence[str]] = None) -> bool:
    """True when a fresh process can initialize the JAX backend within
    ``timeout`` seconds. ``probe_argv`` overrides the probe command
    (tests)."""
    argv = list(probe_argv) if probe_argv is not None else [
        sys.executable, "-c", _PROBE_SNIPPET]
    try:
        return subprocess.run(
            argv, timeout=timeout, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL).returncode == 0
    except subprocess.TimeoutExpired:
        return False


def wait_for_backend(poll_interval: float = 150.0,
                     max_wait: Optional[float] = None,
                     timeout: float = 90.0,
                     probe_argv: Optional[Sequence[str]] = None,
                     log: Callable[[str], None] = print) -> bool:
    """Block until :func:`backend_ready`; returns False if ``max_wait``
    elapses first. Logs once when waiting starts and once on recovery so
    driver logs show the outage window."""
    if backend_ready(timeout=timeout, probe_argv=probe_argv):
        return True
    t0 = time.monotonic()
    log(f"[backend_probe] accelerator backend unreachable; polling every "
        f"{poll_interval:.0f}s" + (f" (max {max_wait:.0f}s)" if max_wait
                                   else ""))
    while True:
        if max_wait is not None and time.monotonic() - t0 > max_wait:
            log("[backend_probe] backend still unreachable after "
                f"{time.monotonic() - t0:.0f}s; giving up")
            return False
        time.sleep(poll_interval)
        if backend_ready(timeout=timeout, probe_argv=probe_argv):
            log(f"[backend_probe] backend recovered after "
                f"{time.monotonic() - t0:.0f}s")
            return True
