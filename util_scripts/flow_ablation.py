"""Frozen-flow vs end-to-end-flow ablation (reference protocol question).

The reference always trains DBSR with a pretrained, FROZEN PWC aligner
(``models/dbsr/dbsrnet.py:44,59-60``); the zero-egress fallback trains the
aligner end-to-end. This script quantifies the accuracy delta between the
two protocols under identical data, schedule, and seed:

  arm A  frozen    — pretrained flow grafted, aligner frozen (reference)
  arm B  e2e       — pretrained flow grafted, aligner trained end-to-end
  arm C  scratch   — no pretrained flow, aligner trained from init
                     (the pre-round-3 zero-egress default; optional)

Each arm runs ``dbsr/default_synthetic`` for ``--epochs`` epochs in its
own workspace subdirectory (shared PWC pretrain checkpoint + shared frozen
val set), is scored through the real eval CLI (boundary 40, 2^14
quantize), and the deltas land in ``<workspace>/ablation.json`` + a
markdown table on stdout. Resumable per arm (trainer checkpoints).

Usage:
    python util_scripts/flow_ablation.py --workspace /root/dbsr_ablation \
        [--epochs 20] [--pwc_epochs 15] [--val_bursts 300] [--arms frozen,e2e]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM_OVERRIDES = {
    # (train_alignment, use pretrained flow ckpt)
    "frozen": ["--set", "train_alignment=False"],
    "e2e": ["--set", "train_alignment=True"],
    "scratch": ["--set", "train_alignment=True",
                "--set", "pwc_checkpoint="],
}


def sh(args, timeout, env, log_path, retries: int = 3):
    """Run a stage subprocess; a timeout (wedged relay) or failure is
    retried — training/eval stages resume from their checkpoints, same
    semantics as ``parity_campaign.sh``. A backend outage pauses the
    retry clock instead of consuming attempts
    (``dbsr_tpu/utils/backend_probe.py``)."""
    sys.path.insert(0, REPO)
    from dbsr_tpu.utils.backend_probe import backend_ready, wait_for_backend

    attempt = 0
    while attempt < retries:
        wait_for_backend(log=lambda m: print(m, flush=True))
        print(f"+ {' '.join(args)} (timeout {timeout}s)", flush=True)
        with open(log_path, "a") as log:
            log.write(f"\n===== {time.strftime('%F %T')} {' '.join(args)}\n")
            log.flush()
            try:
                p = subprocess.run(args, cwd=REPO, env=env, stdout=log,
                                   stderr=subprocess.STDOUT, timeout=timeout)
                rc = p.returncode
            except subprocess.TimeoutExpired:
                rc = -1
        if rc == 0:
            return
        if not backend_ready():
            print(f"  rc={rc} during a backend outage — attempt not "
                  "counted", flush=True)
            continue
        attempt += 1
        print(f"  attempt {attempt} rc={rc}; see {log_path}", flush=True)
    raise RuntimeError(f"{args[:3]}... failed {retries} times; "
                       f"see {log_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--pwc_epochs", type=int, default=15)
    ap.add_argument("--val_bursts", type=int, default=300)
    ap.add_argument("--arms", default="frozen,e2e",
                    help="comma-separated subset of "
                         f"{sorted(ARM_OVERRIDES)}")
    ap.add_argument("--pwc_workspace", default=None,
                    help="reuse an existing PWC pretrain workspace "
                         "(e.g. the parity campaign's) instead of "
                         "pretraining here")
    ap.add_argument("--val_dir", default=None,
                    help="reuse an existing frozen val set directory")
    ap.add_argument("--timeout", type=int, default=14400)
    args = ap.parse_args(argv)

    arms = [a.strip() for a in args.arms.split(",") if a.strip()]
    unknown = [a for a in arms if a not in ARM_OVERRIDES]
    if unknown:
        ap.error(f"unknown arms {unknown}; choose from "
                 f"{sorted(ARM_OVERRIDES)}")

    ws = os.path.abspath(args.workspace)
    os.makedirs(ws, exist_ok=True)
    log_path = os.path.join(ws, "ablation.log")
    py = sys.executable

    # ---- shared PWC pretrain checkpoint ----
    pwc_ws = os.path.abspath(args.pwc_workspace) if args.pwc_workspace \
        else ws
    needs_pwc = any(a in ("frozen", "e2e") for a in arms)
    if needs_pwc and not args.pwc_workspace:
        env = dict(os.environ, DBSR_TPU_WORKSPACE_DIR=pwc_ws)
        sh([py, "run_training.py", "pwcnet", "pretrain_synthetic",
            "--set", f"epochs={args.pwc_epochs}"], args.timeout, env,
           log_path)
    pwc_dir = os.path.join(pwc_ws, "pwcnet", "pretrain_synthetic")

    # ---- shared frozen val set ----
    val_dir = os.path.abspath(args.val_dir) if args.val_dir \
        else os.path.join(ws, "procedural_val")
    if not os.path.isdir(os.path.join(val_dir, "gt")):
        sh([py, "util_scripts/generate_synthetic_burst_val.py",
            "--procedural", str(max(args.val_bursts // 2, 1)),
            "--out_dir", val_dir, "--num_bursts", str(args.val_bursts),
            "--seed", "20260817"], args.timeout, dict(os.environ), log_path)

    # ---- arms ----
    results = {}
    for arm in arms:
        arm_ws = os.path.join(ws, arm)
        env = dict(os.environ,
                   DBSR_TPU_WORKSPACE_DIR=arm_ws,
                   DBSR_TPU_SYNBURSTVAL_DIR=val_dir)
        extra = list(ARM_OVERRIDES[arm])
        if arm in ("frozen", "e2e"):
            from glob import glob
            cks = sorted(glob(os.path.join(pwc_dir, "pwcnet_synth_ep*.ckpt")))
            if not cks:
                raise RuntimeError(f"no PWC checkpoint in {pwc_dir}")
            extra += ["--set", f"pwc_checkpoint={cks[-1]}"]
        sh([py, "run_training.py", "dbsr", "default_synthetic",
            "--set", f"epochs={args.epochs}"] + extra,
           args.timeout, env, log_path)
        out_json = os.path.join(ws, f"eval_{arm}.json")
        sh([py, "run_evaluation.py", "synburst", "compute_score",
            "dbsr_default", "--no_lpips", "--json", out_json],
           args.timeout, env, log_path)
        with open(out_json) as f:
            scores = json.load(f)
        results[arm] = {m: next(iter(v.values())) for m, v in scores.items()}
        print(f"{arm}: {results[arm]}", flush=True)

    with open(os.path.join(ws, "ablation.json"), "w") as f:
        json.dump({"epochs": args.epochs, "arms": results}, f, indent=2)
    print(f"\n| arm | PSNR (dB) | SSIM |  ({args.epochs} epochs)")
    print("|---|---|---|")
    for arm, r in results.items():
        print(f"| {arm} | {r.get('psnr', float('nan')):.2f} | "
              f"{r.get('ssim', float('nan')):.4f} |")
    return results


if __name__ == "__main__":
    main()
