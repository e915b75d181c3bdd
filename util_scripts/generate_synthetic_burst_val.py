"""Generate a SyntheticBurstVal-format validation set on device.

Our equivalent of the reference's pre-generated 300-burst validation set
(the reference ships it as a download; zero-egress environments can
regenerate one from any folder of RGB images with the same synthesis
pipeline). Uses the eval protocol shapes: 14-frame bursts of 48x48 packed
RAW from 384^2 crops at x4 downsampling.

Usage:
    python util_scripts/generate_synthetic_burst_val.py \
        --source_dir <folder of RGB images> --out_dir <val set dir> \
        [--num_bursts 300] [--seed 0]

Zero-egress mode: ``--procedural N`` replaces ``--source_dir`` with N
on-device dead-leaves source images (``dbsr_tpu/data/procedural.py``) —
the frozen val set for training campaigns without staged natural data.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--source_dir", default=None)
    p.add_argument("--procedural", type=int, default=None, metavar="N",
                   help="use N procedural dead-leaves source images "
                        "instead of --source_dir")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--num_bursts", type=int, default=300)
    p.add_argument("--burst_size", type=int, default=14)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fused_resample", action="store_true",
                   help="synthesize with the FUSED single-pass resample "
                        "kernel (the training fast path) instead of the "
                        "strict two-stage kernel eval sets normally use "
                        "— for measuring the train/eval degradation-"
                        "kernel mismatch (same seed => same source "
                        "images, crops and trajectories; only the "
                        "resampling kernel differs)")
    args = p.parse_args()
    if (args.source_dir is None) == (args.procedural is None):
        p.error("exactly one of --source_dir / --procedural is required")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dbsr_tpu.data.datasets import ImageFolder, write_synthetic_burst_val
    from dbsr_tpu.data.pipeline import center_crop, random_resized_crop
    from dbsr_tpu.data.synthetic import BurstConfig, rgb2rawburst

    cfg = BurstConfig(burst_size=args.burst_size, crop_sz=(384, 384),
                      downsample_factor=4, border_crop=24,
                      max_translation=24.0, max_rotation=1.0,
                      fused_resample=args.fused_resample)
    if args.procedural is not None:
        from dbsr_tpu.data.procedural import ProceduralImages
        ds = ProceduralImages(args.procedural,
                              hw=(max(cfg.pre_crop_sz),) * 2,
                              seed=args.seed + 777)
    else:
        ds = ImageFolder(args.source_dir)
    rng = np.random.default_rng(args.seed)

    synth = jax.jit(lambda key, img: rgb2rawburst(key, img, cfg))

    def samples():
        for i in range(args.num_bursts):
            idx = int(rng.integers(0, len(ds)))
            frame, _ = ds.get_image(idx)
            frame = frame.astype(np.float32) / 255.0
            if min(frame.shape[:2]) < max(cfg.pre_crop_sz):
                continue
            crop = random_resized_crop(rng, frame, cfg.pre_crop_sz)
            out = synth(jax.random.key(args.seed * 100003 + i),
                        jnp.asarray(crop))
            yield {"burst": np.asarray(out["burst"]),
                   "frame_gt": np.asarray(out["frame_gt"]),
                   "meta": jax.tree.map(np.asarray, out["meta"])}
            if (i + 1) % 10 == 0:
                print(f"{i + 1}/{args.num_bursts}", flush=True)

    write_synthetic_burst_val(args.out_dir, samples())
    print(f"wrote {args.num_bursts} bursts to {args.out_dir}")


if __name__ == "__main__":
    main()
