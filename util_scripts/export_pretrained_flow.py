"""Export a params-only pretrained-flow artifact into the repo.

The parity campaign's pretrained PWC checkpoint lives in the campaign
workspace, which does NOT survive VM resets (round 3 lost the full
epoch-60 campaign to one). This strips the latest
``pwcnet/pretrain_synthetic`` checkpoint to its parameter tree (drops
Adam state — the graft only needs params, reference
``models/dbsr/dbsrnet.py:59-60`` likewise loads weights only), and
writes it in the standard checkpoint container to
``dbsr_tpu/artifacts/`` where git preserves it.

``parity_campaign.py`` seeds a wiped workspace from this artifact and
skips the ~30 min pretrain stage; ``find_pretrained_flow`` resolves it
like any checkpoint (the header carries ``params_only`` so trainers
refuse to RESUME from it — it is graft material, not a resume point).

Usage:
    python util_scripts/export_pretrained_flow.py \
        --workspace /root/dbsr_campaign_r3 \
        [--aligner pwc|lite] [--out dbsr_tpu/artifacts/<name>.ckpt]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# aligner kind -> (workspace subdir, net_name, default artifact name)
ALIGNERS = {
    "pwc": (os.path.join("pwcnet", "pretrain_synthetic"),
            "pwcnet_synth", "pwcnet_synth_params.ckpt"),
    "lite": (os.path.join("align_lite", "pretrain_synthetic"),
             "align_lite", "align_lite_params.ckpt"),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workspace", required=True)
    ap.add_argument("--aligner", choices=sorted(ALIGNERS), default="pwc")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from dbsr_tpu.training.checkpoint import (load_checkpoint,
                                              resolve_checkpoint,
                                              save_params_artifact)

    subdir, net_name, artifact = ALIGNERS[args.aligner]
    out_path = args.out or os.path.join(REPO, "dbsr_tpu", "artifacts",
                                        artifact)
    src_dir = os.path.join(args.workspace, subdir)
    path = resolve_checkpoint(src_dir, net_name)
    if path is None:
        raise SystemExit(f"no {net_name} checkpoint in {src_dir}")
    header, raw = load_checkpoint(path)
    out = save_params_artifact(out_path, header, {"params": raw["params"]})
    print(f"exported {path} (epoch {header['epoch']}) -> {out} "
          f"({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
