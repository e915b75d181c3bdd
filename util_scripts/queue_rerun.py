"""Queue a GUARDED parity-campaign rerun behind the running chip queue.

Round-3 finding: the completed 100-epoch campaign plateaued at 32.79 dB
because an epoch at 1.48x the best loss slipped under the then-2.0x
divergence factor and was checkpointed (epochs 8-9 blow-up; the
pre-reset run, identical through epoch 5, tracked ~1.3 dB higher). The
trainer now aborts such epochs (1.4x epoch + 3x intra-epoch guards).
This script reruns the campaign under those guards WITHOUT repaying the
clean prefix or the fixed stages:

  1. wait for the chip-work queue (ablation + probes) to release the
     chip (pidfile exit);
  2. seed a fresh workspace from the damaged run: the pre-damage
     DBSR checkpoint (epoch 5 by default), the PWC pretrain directory,
     and the frozen procedural val set (symlink — identical bursts, so
     rerun dB rows are directly comparable to the damaged trajectory);
  3. retarget the stale-log watchdog and launch
     ``util_scripts/parity_campaign.py`` on the new workspace.

Deliberately reuses the damaged run's per-epoch RNG streams (same
seeds): epoch 8's blow-up should REPRODUCE, which makes the rerun a
live end-to-end test of the guard — the trainer must refuse the
checkpoint, roll back to epoch 7, and continue on a reseeded stream.

Usage:
    nohup python util_scripts/queue_rerun.py \
        --src_ws /root/dbsr_campaign_r3 --dst_ws /root/dbsr_campaign_r3b \
        --queue_pidfile /tmp/chip_queue.pid > /root/queue_rerun.out 2>&1 &
"""

import argparse
import importlib.util
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "chip_queue", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "chip_queue.py"))
cq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cq)

NET_SUB = os.path.join("dbsr", "default_synthetic")
NET_NAME = "dbsr_synthetic"


def prepare_rerun_workspace(src_ws: str, dst_ws: str,
                            from_epoch: int = 5) -> bool:
    """Seed ``dst_ws`` from ``src_ws`` so the campaign driver resumes
    from ``from_epoch`` instead of repaying the pretrain/valgen stages
    and the clean training prefix. Idempotent: no-ops (returns False)
    when the destination already holds any DBSR checkpoint, so a
    relaunched queue never clobbers rerun progress."""
    dst_net = os.path.join(dst_ws, NET_SUB)
    if any(f.startswith(NET_NAME) and f.endswith(".ckpt")
           for f in (os.listdir(dst_net) if os.path.isdir(dst_net)
                     else ())):
        return False
    os.makedirs(dst_net, exist_ok=True)

    ck = f"{NET_NAME}_ep{from_epoch:04d}.ckpt"
    shutil.copyfile(os.path.join(src_ws, NET_SUB, ck),
                    os.path.join(dst_net, ck))

    # pretrained flow: small, copy (keeps the rerun self-contained even
    # if the source workspace is cleaned up)
    src_pwc = os.path.join(src_ws, "pwcnet")
    dst_pwc = os.path.join(dst_ws, "pwcnet")
    if os.path.isdir(src_pwc) and not os.path.isdir(dst_pwc):
        shutil.copytree(src_pwc, dst_pwc)

    # frozen val set: large (171 MB of PNGs) and shared read-only —
    # symlink so the rerun scores on the IDENTICAL bursts
    dst_val = os.path.join(dst_ws, "procedural_val")
    if not os.path.exists(dst_val):
        os.symlink(os.path.join(src_ws, "procedural_val"), dst_val)

    # carry over the from_epoch eval so the driver doesn't re-score it
    marker = f"eval_ep{from_epoch:04d}.json"
    src_marker = os.path.join(src_ws, marker)
    if os.path.exists(src_marker):
        shutil.copyfile(src_marker, os.path.join(dst_ws, marker))
        row = None
        with open(os.path.join(src_ws, "campaign_trajectory.jsonl")) as f:
            for line in f:
                r = json.loads(line)
                if r.get("epoch") == from_epoch:
                    row = line  # last occurrence wins (restart re-scores)
        if row is not None:
            with open(os.path.join(dst_ws, "campaign_trajectory.jsonl"),
                      "w") as f:
                f.write(row)
    return True


def wait_for_pidfile_exit(pidfile: str, poll_s: int = 60,
                          sleep=time.sleep) -> None:
    while cq.alive(pidfile):
        sleep(poll_s)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_ws", required=True)
    ap.add_argument("--dst_ws", required=True)
    ap.add_argument("--from_epoch", type=int, default=5)
    ap.add_argument("--queue_pidfile", default="/tmp/chip_queue.pid")
    ap.add_argument("--poll_s", type=int, default=60)
    ap.add_argument("--campaign_args", default="",
                    help="extra args appended to the parity_campaign "
                         "launch (space-separated), e.g. "
                         "'--train_set seed=2' for a seed-variance arm")
    args = ap.parse_args(argv)

    print(f"waiting for {args.queue_pidfile} to exit", flush=True)
    wait_for_pidfile_exit(args.queue_pidfile, args.poll_s)
    print("chip free; preparing rerun workspace", flush=True)

    seeded = prepare_rerun_workspace(args.src_ws, args.dst_ws,
                                     args.from_epoch)
    print(f"workspace seeded={seeded} ({args.dst_ws})", flush=True)

    cq.retarget_watchdog(os.path.join(args.dst_ws, "campaign.log"))
    cq.launch([sys.executable, "util_scripts/parity_campaign.py",
               "--workspace", args.dst_ws, "--eval_batch", "2"]
              + args.campaign_args.split(),
              os.path.join(args.dst_ws, "driver.out"),
              cq.CAMPAIGN_PIDFILE)
    print("guarded rerun launched", flush=True)


if __name__ == "__main__":
    main()
