"""Quantify the train/eval degradation-kernel mismatch.

Training synthesizes bursts with the FUSED single-pass resample (the
fast path, ``data/synthetic.py:BurstConfig.fused_resample``); frozen
val sets always use the STRICT two-stage kernel (the reference's
protocol, ``synthetic_burst_generation.py:202-238``). If the two
kernels' image statistics differ enough, every campaign dB is measured
through a distribution shift the trainer never saw — at ~32 dB the
difference sat inside seed noise (round 3); at 36+ dB it may not.

This experiment makes the gap a measurement instead of a worry:

  1. generate a FUSED-kernel twin of the frozen val set (same seed =>
     identical source images, crops and burst trajectories; ONLY the
     resampling kernel differs);
  2. score the banked model-zoo artifacts (``dbsr_zoo``) on both sets;
  3. print a per-artifact strict-vs-fused PSNR/SSIM table as JSON.

Reading: fused >> strict  => the checkpoint is kernel-specialized and
campaign numbers understate it by the gap (train strict or close the
kernel gap); fused ~= strict => the mismatch is immaterial at this
accuracy and the fast path stays justified.

Usage:
    python util_scripts/kernel_mismatch.py \
        --val_dir /root/dbsr_campaign_r4mix/procedural_val \
        [--out /root/kernel_mismatch.json] [--num_bursts 300]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sh(argv, env, what, timeout=3600):
    print(f"+ {' '.join(argv)}", flush=True)
    rc = subprocess.run(argv, cwd=REPO, env=env, timeout=timeout).returncode
    if rc != 0:
        raise RuntimeError(f"{what} failed (rc={rc})")


def score(val_dir, out_json, env):
    e = dict(env)
    e["DBSR_TPU_SYNBURSTVAL_DIR"] = val_dir
    sh([sys.executable, "run_evaluation.py", "synburst", "compute_score",
        "dbsr_zoo", "--no_lpips", "--json", out_json], e,
       f"scoring on {val_dir}")
    with open(out_json) as f:
        return json.load(f)


def mismatch_table(strict: dict, fused: dict) -> dict:
    """Per-net strict-vs-fused comparison from two compute_score JSON
    dicts (``{metric: {net: value}}``)."""
    table = {}
    for net in sorted(strict.get("psnr", {})):
        table[net] = {
            "psnr_strict": strict["psnr"][net],
            "psnr_fused": fused.get("psnr", {}).get(net),
            "ssim_strict": strict.get("ssim", {}).get(net),
            "ssim_fused": fused.get("ssim", {}).get(net),
        }
        if table[net]["psnr_fused"] is not None:
            table[net]["psnr_gap_fused_minus_strict"] = (
                table[net]["psnr_fused"] - table[net]["psnr_strict"])
    return table


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--val_dir", required=True,
                    help="the STRICT-kernel frozen val set (campaign's "
                         "procedural_val)")
    ap.add_argument("--fused_dir", default=None,
                    help="where to build/find the fused twin (default: "
                         "<val_dir>_fused)")
    ap.add_argument("--num_bursts", type=int, default=300)
    ap.add_argument("--seed", type=int, default=20260817,
                    help="MUST match the strict set's generation seed")
    ap.add_argument("--out", default="/root/kernel_mismatch.json")
    args = ap.parse_args(argv)

    env = dict(os.environ)
    fused_dir = args.fused_dir or args.val_dir.rstrip("/") + "_fused"
    if not os.path.exists(os.path.join(
            fused_dir, "gt", f"{args.num_bursts - 1:04d}",
            "meta_info.pkl")):
        sh([sys.executable, "util_scripts/generate_synthetic_burst_val.py",
            "--procedural", str(max(args.num_bursts // 2, 1)),
            "--out_dir", fused_dir, "--num_bursts", str(args.num_bursts),
            "--seed", str(args.seed), "--fused_resample"], env,
           "fused val set generation")

    strict = score(args.val_dir, args.out + ".strict.json", env)
    fused = score(fused_dir, args.out + ".fused.json", env)

    table = mismatch_table(strict, fused)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2), flush=True)
    return table


if __name__ == "__main__":
    main()
