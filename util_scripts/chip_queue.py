"""Serial chip-work queue: babysit the parity campaign, then run the
flow-protocol ablation — keeping the single TPU chip productive across
session/round boundaries without manual intervention.

1. Wait for the running campaign driver; if it exited without printing
   ``campaign complete`` (e.g. it exhausted its per-stage retries during
   a relay outage), relaunch it — every campaign stage is idempotent and
   resumes from checkpoints.
2. When the campaign is complete, retarget the stale-log watchdog at the
   ablation log (the campaign log goes permanently silent at that point;
   a watchdog still aimed at it would kill every later ``run_training.py``
   stage) and run the frozen/e2e/scratch flow ablation
   (``util_scripts/flow_ablation.py`` — itself resumable per arm).
3. Run the PWC curriculum probe ladder (big-clean-flow pretrain, then
   transfer to the dbsr small-flow regime).

Usage:
    nohup python util_scripts/chip_queue.py \
        --campaign_ws /root/dbsr_campaign_r3 \
        --ablation_ws /root/dbsr_ablation_r3 \
        --ablation_epochs 20 > /root/chip_queue.out 2>&1 &
"""

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAMPAIGN_PIDFILE = "/tmp/campaign.pid"
WATCHDOG_PIDFILE = "/tmp/watchdog.pid"


def alive(pidfile: str) -> bool:
    try:
        with open(pidfile) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)
    except (OSError, ValueError):
        return False
    # os.kill(pid, 0) SUCCEEDS on zombies: a launcher that Popen()s a
    # driver and never wait()s leaves the dead driver in Z state, and a
    # babysitter trusting kill-0 then waits on the corpse forever
    # (observed live in round 5 — the killed campaign driver was never
    # relaunched). A zombie is dead for every purpose a pidfile serves.
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[1].split()[0] != "Z"
    except (OSError, IndexError):
        return False


def campaign_complete(ws: str) -> bool:
    try:
        with open(os.path.join(ws, "driver.out")) as f:
            return "campaign complete" in f.read()
    except OSError:
        return False


def find_driver(ws: str, proc: str = "/proc"):
    """Pid of a live parity_campaign driver for EXACTLY workspace ``ws``
    (by its ``--workspace`` argument, compared normpathed — a raw
    substring match would adopt a driver for ``.../r3b`` when asked
    about ``.../r3``), found by /proc cmdline scan, else None. Guards
    against a CLOBBERED pidfile: going by the pidfile alone, a stale
    entry makes the queue relaunch a SECOND driver over the same
    workspace — two trainers then race on one chip and one checkpoint
    directory (observed live in round 3 when an unrelated launch
    overwrote /tmp/campaign.pid). (Deliberately re-implements a tiny
    /proc scan instead of importing dbsr_tpu.utils.chip_guard: the
    queue must run without the repo on the launcher's PYTHONPATH.)"""
    want = os.path.normpath(ws)
    for pid in os.listdir(proc):
        if not pid.isdigit():
            continue
        try:
            with open(os.path.join(proc, pid, "cmdline"), "rb") as f:
                argv = f.read().decode("utf-8", "replace").split("\0")
        except OSError:
            continue
        if not any("parity_campaign.py" in a for a in argv):
            continue
        for i, a in enumerate(argv[:-1]):
            if a == "--workspace" and \
                    os.path.normpath(argv[i + 1]) == want:
                return int(pid)
    return None


def _child_env() -> dict:
    """Child env with the repo importable: scripts run as
    ``python util_scripts/x.py`` get util_scripts/ (not the repo root)
    as sys.path[0], and the queue's own launcher may not have exported
    PYTHONPATH=/root/repo. PREPEND rather than replace — dropping an
    existing entry (e.g. a backend-plugin sitecustomize dir) breaks
    device discovery in every descendant."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


def launch(argv, out_path: str, pidfile: str) -> None:
    # a fresh post-reset launch writes <ws>/snapshot.out before any
    # stage has created the workspace directory
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "a") as out:
        p = subprocess.Popen(argv, cwd=REPO, stdout=out,
                             stderr=subprocess.STDOUT,
                             start_new_session=True, env=_child_env())
    with open(pidfile, "w") as f:
        f.write(str(p.pid))
    print(f"launched {' '.join(argv)} pid={p.pid}", flush=True)


def retarget_watchdog(log_path: str, pidfile: str = WATCHDOG_PIDFILE,
                      sleep=time.sleep) -> None:
    """Kill the current watchdog (by pidfile, never by pattern) and start
    one aimed at ``log_path``."""
    try:
        with open(pidfile) as f:
            os.kill(int(f.read().strip()), 15)
            print("killed previous watchdog", flush=True)
    except (OSError, ValueError):
        pass
    sleep(1)
    launch([sys.executable, "util_scripts/campaign_watchdog.py",
            "--log", log_path],
           os.path.join(os.path.dirname(log_path), "watchdog.out"),
           pidfile)


def campaign_phase(args, pidfile: str = CAMPAIGN_PIDFILE, poll_s: int = 120,
                   sleep=time.sleep) -> None:
    """Block until the campaign prints completion, relaunching a dead
    driver up to ``--max_relaunches`` times (then fall through so the
    rest of the queue still runs on whatever checkpoints exist)."""
    relaunches = 0
    while not campaign_complete(args.campaign_ws):
        if alive(pidfile):
            sleep(poll_s)
            continue
        found = find_driver(args.campaign_ws)
        if found is not None:
            # pidfile went stale (clobbered / queue restart) but a driver
            # IS running — adopt it instead of launching a duplicate
            print(f"pidfile stale but driver {found} is running; adopting",
                  flush=True)
            with open(pidfile, "w") as f:
                f.write(str(found))
            sleep(poll_s)
            continue
        if relaunches >= args.max_relaunches:
            print("campaign driver dead and relaunch budget exhausted; "
                  "continuing to ablation with whatever checkpoints exist",
                  flush=True)
            break
        relaunches += 1
        print(f"campaign driver died incomplete; relaunch {relaunches}",
              flush=True)
        launch([sys.executable, "util_scripts/parity_campaign.py",
                "--workspace", args.campaign_ws, "--eval_batch", "2"],
               os.path.join(args.campaign_ws, "driver.out"),
               pidfile)
        sleep(poll_s)
    print(f"campaign phase done (complete={campaign_complete(args.campaign_ws)})",
          flush=True)


def ablation_argv(args):
    """Ablation command line; reuses the campaign's PWC pretrain
    checkpoint and frozen val set when present — no duplicate
    pretrain/valgen chip time, and every arm scores on the SAME val set
    as the campaign trajectory (directly comparable dB)."""
    abl = [sys.executable, "util_scripts/flow_ablation.py",
           "--workspace", args.ablation_ws,
           "--epochs", str(args.ablation_epochs),
           "--arms", args.ablation_arms]
    if os.path.isdir(os.path.join(args.campaign_ws, "pwcnet",
                                  "pretrain_synthetic")):
        abl += ["--pwc_workspace", args.campaign_ws]
    if os.path.isdir(os.path.join(args.campaign_ws, "procedural_val",
                                  "gt")):
        abl += ["--val_dir",
                os.path.join(args.campaign_ws, "procedural_val")]
    return abl


def ablation_phase(args, run=subprocess.call,
                   watchdog_pidfile: str = WATCHDOG_PIDFILE) -> int:
    os.makedirs(args.ablation_ws, exist_ok=True)
    retarget_watchdog(os.path.join(args.ablation_ws, "ablation.log"),
                      pidfile=watchdog_pidfile)
    rc = run(ablation_argv(args), cwd=REPO, env=_child_env())
    print(f"ablation rc={rc}", flush=True)
    return rc


def probe_phase(args, run=subprocess.call) -> None:
    """PWC curriculum probe ladder. Round-3 finding: from-scratch PWC on
    the dbsr regime converges to the zero-flow baseline (EPE 2.30). Test
    the FlyingChairs-style curriculum hypothesis: learn on big clean
    flows first, then transfer to the small-flow RAW regime. The
    transfer stage only runs if the bigflow stage saved its artifact."""
    if args.probe_steps <= 0:
        return
    pws = args.ablation_ws
    big = os.path.join(pws, "pwc_bigflow_params.ckpt")
    rc1 = run(
        [sys.executable, "util_scripts/pwc_pretrain_probe.py",
         "--regime", "bigflow", "--weights", "fine",
         "--steps", str(args.probe_steps), "--save", big,
         "--log", os.path.join(pws, "probe_bigflow.jsonl")],
        cwd=REPO, env=_child_env())
    print(f"probe bigflow rc={rc1}", flush=True)
    if rc1 == 0 and os.path.exists(big):
        rc2 = run(
            [sys.executable, "util_scripts/pwc_pretrain_probe.py",
             "--regime", "dbsr", "--weights", "fine",
             "--steps", str(args.probe_steps // 2),
             "--init_from", big,
             "--save", os.path.join(pws, "pwc_curriculum_params.ckpt"),
             "--log", os.path.join(pws, "probe_dbsr_transfer.jsonl")],
            cwd=REPO, env=_child_env())
        print(f"probe dbsr-transfer rc={rc2}", flush=True)


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaign_ws", required=True)
    ap.add_argument("--ablation_ws", required=True)
    ap.add_argument("--ablation_epochs", type=int, default=20)
    # Default arms exclude "frozen": the parity campaign IS the frozen
    # arm (identical config/seed/val set), so its trajectory row at
    # --ablation_epochs is the frozen number — rerunning it would spend
    # ~1 h of chip reproducing a known curve.
    ap.add_argument("--ablation_arms", default="e2e,scratch")
    ap.add_argument("--max_relaunches", type=int, default=3)
    ap.add_argument("--probe_steps", type=int, default=30000,
                    help="PWC curriculum probe budget (0 disables)")
    return ap.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    campaign_phase(args)
    ablation_phase(args)
    probe_phase(args)
    print("chip queue complete", flush=True)


if __name__ == "__main__":
    main()
