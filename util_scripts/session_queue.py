"""Serial chip-work queue for the post-reset guarded campaign session.

The VM reset between sessions wiped every campaign workspace (the
completed 100-epoch damaged run, its guarded rerun, and the queued
probe/seed-2 work). This queue rebuilds the round-3 chip agenda from
scratch on the single TPU chip, unattended:

  1. babysit the fresh GUARDED parity campaign (relaunch a dead driver,
     adopt one whose pidfile was clobbered) until it prints
     ``campaign complete``;
  2. run the PWC curriculum probe ladder (bigflow 30k steps, then
     transfer to the dbsr small-flow regime at half budget) — the
     round-3 learnability hypothesis left queued when the VM reset;
  3. seed a seed-2 variance campaign from the finished run (epoch-0
     checkpoint pins the init; pwcnet dir + frozen val set shared) and
     babysit it too. Its trajectory gives run-to-run error bars on the
     headline PSNR. Resumable across round boundaries: the campaign
     driver is detached, so it keeps training even if this queue dies.

The flow-protocol ablation from ``chip_queue.py`` is deliberately NOT
re-queued: its numbers (frozen 32.41 / e2e 32.34 / scratch 32.02 dB at
20 epochs) were recorded in PERF.md before the wipe and the conclusion
(pretrain-then-freeze validated) is not in doubt.

Usage:
    nohup python util_scripts/session_queue.py \
        --campaign_ws /root/dbsr_campaign_r3c \
        --probe_ws /root/dbsr_probe_r3c \
        --seed2_ws /root/dbsr_campaign_r3c_s2 \
        > /root/session_queue.out 2>&1 &
"""

import argparse
import importlib.util
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_HERE, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


cq = _load("chip_queue")
qr = _load("queue_rerun")


def babysit_campaign(ws: str, extra_args, pidfile: str,
                     max_relaunches: int = 3, poll_s: int = 120,
                     sleep=time.sleep) -> None:
    """Block until ``ws``'s campaign prints completion; relaunch a dead
    driver (with ``extra_args`` — unlike ``chip_queue.campaign_phase``,
    whose hardcoded relaunch argv would drop a seed-variance
    ``--train_set`` override) and adopt a live one whose pidfile went
    stale."""
    relaunches = 0
    while not cq.campaign_complete(ws):
        if cq.alive(pidfile):
            sleep(poll_s)
            continue
        found = cq.find_driver(ws)
        if found is not None:
            print(f"pidfile stale but driver {found} runs {ws}; adopting",
                  flush=True)
            with open(pidfile, "w") as f:
                f.write(str(found))
            sleep(poll_s)
            continue
        if relaunches >= max_relaunches:
            print(f"{ws}: driver dead, relaunch budget exhausted; "
                  "moving on with whatever checkpoints exist", flush=True)
            break
        relaunches += 1
        print(f"{ws}: driver died incomplete; relaunch {relaunches}",
              flush=True)
        cq.launch([sys.executable, "util_scripts/parity_campaign.py",
                   "--workspace", ws] + list(extra_args),
                  os.path.join(ws, "driver.out"), pidfile)
        sleep(poll_s)
    print(f"campaign phase done for {ws} "
          f"(complete={cq.campaign_complete(ws)})", flush=True)


def launch_snapshot(ws: str, launch=None, alive=None) -> str:
    """Detach a reset-proofing snapshot daemon for ``ws`` (no-op when
    one is already alive per its pidfile). The daemon commits the
    campaign trajectory into dbsr_tpu/artifacts/campaigns/ as rows land
    and the best params-only checkpoint on completion — VM resets wiped
    two rounds of campaign results that lived only in the workspace."""
    import hashlib

    ws = os.path.abspath(ws)  # the daemon runs with cwd=REPO
    label = os.path.basename(os.path.normpath(ws))
    # hash of the full path: two workspaces sharing a basename must not
    # deduplicate onto one daemon via the pidfile
    digest = hashlib.sha1(ws.encode()).hexdigest()[:8]
    pidfile = f"/tmp/snapshot_{label}_{digest}.pid"
    if (alive or cq.alive)(pidfile):
        return pidfile
    (launch or cq.launch)(
        [sys.executable, "util_scripts/snapshot_campaign.py",
         "--workspace", ws, "--label", label],
        os.path.join(ws, "snapshot.out"), pidfile)
    return pidfile


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaign_ws", required=True)
    ap.add_argument("--probe_ws", required=True)
    ap.add_argument("--seed2_ws", required=True)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--probe_steps", type=int, default=30000)
    ap.add_argument("--max_relaunches", type=int, default=3)
    args = ap.parse_args(argv)

    os.makedirs(args.campaign_ws, exist_ok=True)
    launch_snapshot(args.campaign_ws)
    babysit_campaign(args.campaign_ws,
                     ["--chunk", str(args.chunk)],
                     cq.CAMPAIGN_PIDFILE, args.max_relaunches)

    # curriculum probe: no run_training.py subprocesses, so the stale
    # watchdog left aimed at the finished campaign log cannot match
    # (and is retargeted before the seed-2 trainers start)
    os.makedirs(args.probe_ws, exist_ok=True)
    probe_args = argparse.Namespace(ablation_ws=args.probe_ws,
                                    probe_steps=args.probe_steps)
    cq.probe_phase(probe_args)

    try:
        seeded = qr.prepare_rerun_workspace(args.campaign_ws,
                                            args.seed2_ws, from_epoch=0)
    except OSError as e:
        # epoch-0 checkpoint missing: still comparable without seeding —
        # valgen is seed-pinned (identical bursts) and the flow net
        # comes from the same repo artifact; only the param init varies
        seeded = False
        print(f"seed-2 seeding skipped ({e}); campaign will rebuild "
              "from the repo artifact + deterministic valgen", flush=True)
    print(f"seed-2 workspace seeded={seeded} ({args.seed2_ws})",
          flush=True)
    cq.retarget_watchdog(os.path.join(args.seed2_ws, "campaign.log"))
    os.makedirs(args.seed2_ws, exist_ok=True)
    launch_snapshot(args.seed2_ws)
    babysit_campaign(args.seed2_ws,
                     ["--chunk", str(args.chunk),
                      "--train_set", "seed=2"],
                     cq.CAMPAIGN_PIDFILE, args.max_relaunches)
    print("session queue complete", flush=True)


if __name__ == "__main__":
    main()
