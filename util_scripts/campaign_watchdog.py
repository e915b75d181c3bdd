"""Stale-log watchdog for campaign/ablation stage subprocesses.

Observed relay failure mode (round 3, twice): the backend stays
reachable — fresh processes init fine — but one in-flight execution is
lost and the trainer blocks forever on its result fetch. The driver's
chunk timeout (2h) eventually recovers, but idles the chip for the
remainder of the window. This watchdog kills the STAGE subprocess as
soon as the campaign log has been silent too long, so the driver's
outage-aware retry loop resumes from the last checkpoint within
minutes instead of hours.

Run it next to a campaign:

    python util_scripts/campaign_watchdog.py \
        --log /root/dbsr_campaign_r3/campaign.log \
        [--stale 900] [--interval 60] [--pattern run_training.py]

Only a process whose command line matches ``--pattern`` AND whose own
age exceeds the staleness threshold is killed (never the driver, never
a fresh subprocess still compiling — TPU first-compiles after a resume
stay under ~8 min; training prints every ~6 s once running).
"""

import argparse
import os
import sys
import time


def find_stage_pids(pattern: str):
    """PIDs whose cmdline contains ``pattern`` (excluding this process).

    /proc-based on purpose: no pgrep -f (a pattern kill from a shell
    could match the caller's own command line; here the caller's
    cmdline is campaign_watchdog.py, which never matches a stage
    pattern, and we additionally exclude our own pid)."""
    pids = []
    me = os.getpid()
    for d in os.listdir("/proc"):
        if not d.isdigit() or int(d) == me:
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().decode("utf-8", "replace").replace("\0", " ")
        except OSError:
            continue
        if pattern in cmd:
            pids.append((int(d), cmd.strip()))
    return pids


def pid_age(pid: int) -> float:
    """Seconds since the process started (via /proc stat mtime)."""
    try:
        return time.time() - os.stat(f"/proc/{pid}").st_mtime
    except OSError:
        return 0.0


def should_kill(log_mtime: float, pid_start_age: float, now: float,
                stale: float, grace_start: float = 0.0) -> bool:
    """Kill only when BOTH the log has been silent for ``stale`` seconds
    and the stage process is older than ``stale`` (a fresh subprocess
    legitimately produces no log lines while compiling).

    ``grace_start`` restarts the staleness clock: silence before that
    instant doesn't count. Used after the watchdog detects it was itself
    suspended (``bench.py``'s chip_guard SIGSTOPs the whole campaign tree
    including this watchdog — on resume the log is legitimately
    ~pause-duration old and the stage needs ``stale`` fresh seconds
    before it can be called wedged; round 3 saw exactly this misfire)."""
    return (now - max(log_mtime, grace_start)) > stale \
        and pid_start_age > stale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--stale", type=float, default=900.0)
    ap.add_argument("--interval", type=float, default=60.0)
    ap.add_argument("--pattern", default="run_training.py")
    args = ap.parse_args()

    print(f"watchdog: log={args.log} stale>{args.stale:.0f}s "
          f"pattern={args.pattern!r}", flush=True)
    grace_start = time.time()  # startup grace: pre-existing silence
    prev_wake = time.time()    # doesn't count against the stage
    while True:
        time.sleep(args.interval)
        now = time.time()
        if now - prev_wake > 3 * args.interval:
            # We were suspended (chip_guard pause for an exclusive-chip
            # bench) — the log's silence over that window is ours, not
            # the stage's. Restart the staleness clock.
            print(f"{time.strftime('%F %T')} watchdog: detected own "
                  f"suspension of {now - prev_wake:.0f}s; restarting "
                  "staleness clock", flush=True)
            grace_start = now
        prev_wake = now
        try:
            mtime = os.stat(args.log).st_mtime
        except OSError:
            continue
        for pid, cmd in find_stage_pids(args.pattern):
            age = pid_age(pid)
            if should_kill(mtime, age, now, args.stale, grace_start):
                print(f"{time.strftime('%F %T')} watchdog: log silent "
                      f"{now - mtime:.0f}s, killing wedged stage pid "
                      f"{pid} ({cmd})", flush=True)
                try:
                    os.kill(pid, 15)
                except OSError as e:
                    print(f"  kill failed: {e}", flush=True)


if __name__ == "__main__":
    main()
