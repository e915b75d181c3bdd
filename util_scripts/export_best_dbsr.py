"""Export the best DBSR checkpoint of a campaign into the repo (model
zoo artifact).

Reads the campaign's ``campaign_trajectory.jsonl``, picks the
highest-PSNR scored epoch (last occurrence wins when a restarted
campaign re-scored an epoch), strips that checkpoint to its parameter
tree (params-only container — eval/serving material, not a resume
point; the reference analogously ships ``dbsr_synthetic_default.pth``
weights in its Model Zoo, ``README.md:250-268``), and writes it under
``dbsr_tpu/artifacts/`` where git preserves it across VM resets.

Usage:
    python util_scripts/export_best_dbsr.py \
        --workspace /root/dbsr_campaign_r3b \
        [--out dbsr_tpu/artifacts/dbsr_synthetic_params.ckpt]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def best_epoch(traj_path: str, have=None) -> tuple:
    """(epoch, psnr) of the highest-PSNR scored epoch; last line wins
    per epoch (restarted campaigns re-append early epochs). With
    ``have`` (a container of epochs whose checkpoints exist), restrict
    to those: after a VM reset, the trajectory keeps rows from the lost
    lineage whose checkpoints no longer exist — exporting must fall
    back to the best epoch that is actually on disk, or banking wedges
    for the whole replay window."""
    rows = {}
    with open(traj_path) as f:
        for line in f:
            r = json.loads(line)
            if "epoch" in r and "psnr" in r:
                rows[r["epoch"]] = r["psnr"]
    if have is not None:
        rows = {e: p for e, p in rows.items() if e in have}
    if not rows:
        raise ValueError(f"no scored epochs in {traj_path}"
                         + ("" if have is None
                            else " with a checkpoint on disk"))
    e = max(rows, key=lambda k: rows[k])
    return e, rows[e]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--out", default=os.path.join(
        REPO, "dbsr_tpu", "artifacts", "dbsr_synthetic_params.ckpt"))
    args = ap.parse_args(argv)

    from dbsr_tpu.training.checkpoint import (list_checkpoints,
                                              load_checkpoint,
                                              resolve_checkpoint,
                                              save_params_artifact)

    src_dir = os.path.join(args.workspace, "dbsr", "default_synthetic")
    have = {e for e, _ in list_checkpoints(src_dir, "dbsr_synthetic")}
    epoch, psnr = best_epoch(
        os.path.join(args.workspace, "campaign_trajectory.jsonl"),
        have=have)
    path = resolve_checkpoint(src_dir, "dbsr_synthetic", epoch)
    header, raw = load_checkpoint(path)
    out = save_params_artifact(args.out, header, {"params": raw["params"]})
    print(f"exported {path} (epoch {epoch}, {psnr:.2f} dB) -> {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)")
    return out


if __name__ == "__main__":
    main()
