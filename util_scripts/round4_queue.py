"""Round-4 chip-work queue: flagship campaign -> 20-epoch arms.

Runs unattended (survives round boundaries — stages are detached
campaign drivers that resume from checkpoints):

  1. babysit the flagship r4 campaign (lite aligner, dead-leaves
     source) to epoch 100;
  2. mixed-corpus A/B arm: 20 epochs with ``--set mix=mixed``
     (``data/procedural.py:MIXED_RECIPE``), SAME frozen val set and
     pretrained aligner — the source-statistics experiment VERDICT r3
     #2 asked for. Its epoch-20 score vs the flagship's epoch-20
     trajectory row is the A/B;
  3. seed-variance arm: 20 epochs with ``--set seed=2`` — run-to-run
     error bars at epoch-20 granularity (VERDICT r3 #7) at 1/5th the
     chip cost of a full second campaign.

Each arm workspace is seeded with the flagship's FROZEN val set
(copied, so scores are on identical bursts) and inherits the pretrained
aligner from the repo artifact via ``parity_campaign.py``'s seeding.

Usage:
    nohup python util_scripts/round4_queue.py \
        --campaign_ws /root/dbsr_campaign_r4 > /root/r4_queue.out 2>&1 &
"""

import argparse
import importlib.util
import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_HERE)


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_HERE, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


cq = _load("chip_queue")
sq = _load("session_queue")


def seed_arm_workspace(src_ws: str, arm_ws: str) -> None:
    """Give an arm the flagship's frozen val set (identical bursts =>
    directly comparable scores)."""
    os.makedirs(arm_ws, exist_ok=True)
    src_val = os.path.join(src_ws, "procedural_val")
    dst_val = os.path.join(arm_ws, "procedural_val")
    if os.path.isdir(src_val) and not os.path.isdir(dst_val):
        shutil.copytree(src_val, dst_val)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaign_ws", required=True)
    ap.add_argument("--arm_epochs", type=int, default=20)
    ap.add_argument("--arms", default="mix:mix=mixed,s2:seed=2",
                    metavar="NAME:K=V[;K=V],...",
                    help="suffix:overrides pairs for the post-campaign "
                         "20-epoch arms ('' disables)")
    ap.add_argument("--campaign_set", action="append", default=[],
                    metavar="K=V",
                    help="--train_set overrides for the FLAGSHIP campaign "
                         "(repeatable) — passed on every relaunch, so a "
                         "babysat mixed-corpus flagship keeps its corpus "
                         "across driver restarts")
    ap.add_argument("--max_relaunches", type=int, default=3)
    args = ap.parse_args(argv)

    ws = os.path.abspath(args.campaign_ws)
    flag_extra = []
    for kv in args.campaign_set:
        flag_extra += ["--train_set", kv]
    sq.launch_snapshot(ws)
    sq.babysit_campaign(ws, flag_extra, cq.CAMPAIGN_PIDFILE,
                        args.max_relaunches)

    for spec in args.arms.split(","):
        if not spec:
            continue
        name, _, overrides = spec.partition(":")
        arm_ws = f"{ws}_{name}"
        seed_arm_workspace(ws, arm_ws)
        extra = []
        for kv in overrides.split(";"):
            if kv:
                extra += ["--train_set", kv]
        sq.launch_snapshot(arm_ws)
        sq.babysit_campaign(
            arm_ws, ["--epochs", str(args.arm_epochs)] + extra,
            cq.CAMPAIGN_PIDFILE, args.max_relaunches)
    print("round4 queue complete", flush=True)


if __name__ == "__main__":
    main()
