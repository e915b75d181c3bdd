"""Result gallery: input / prediction / ground-truth panels for selected
validation bursts of a trained checkpoint.

For each requested burst index this writes three intermediate PNGs —
the reference frame of the RAW input burst (pseudo-RGB, nearest x8
upscale, i.e. what a no-op "SR" would show), the model prediction, and
the ground truth — and composes them into one labeled side-by-side
panel via ``make_comparison`` (reference analog:
``evaluation/synburst/visualize_results.py`` + the comparison demo).

Usage:
    python util_scripts/make_gallery.py \
        --checkpoint <ckpt> --val_dir <SyntheticBurstVal dir> \
        --bursts 0,3,7 --out docs/gallery [--batch 4]
"""

import argparse
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def _pseudo_rgb_x(frame_raw: np.ndarray, scale: int) -> np.ndarray:
    """Packed RGGB [h, w, 4] -> nearest-upscaled RGB [h*s, w*s, 3]
    (reference pseudo-RGB convention: R, mean(G1, G2), B —
    ``encoders.py:52``)."""
    rgb = np.stack([frame_raw[..., 0],
                    (frame_raw[..., 1] + frame_raw[..., 2]) / 2.0,
                    frame_raw[..., 3]], axis=-1)
    return np.repeat(np.repeat(rgb, scale, axis=0), scale, axis=1)


def _gamma(img: np.ndarray) -> np.ndarray:
    """Display transform: linear -> approximate sRGB (the val GT/preds
    are linear RGB; raw linear renders misleadingly dark)."""
    return np.clip(img, 0.0, 1.0) ** (1.0 / 2.2)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--val_dir", required=True)
    ap.add_argument("--bursts", default="0,3,7")
    ap.add_argument("--out", default="docs/gallery")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--burst_size", type=int, default=14)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from dbsr_tpu.data.datasets import SyntheticBurstVal
    from dbsr_tpu.ops.metrics import psnr as psnr_fn
    from dbsr_tpu.serving import load_predictor
    from dbsr_tpu.utils.png16 import write_png

    idxs = [int(x) for x in args.bursts.split(",") if x]
    ds = SyntheticBurstVal(args.val_dir, burst_size=args.burst_size)
    b0, _, _ = ds[idxs[0]]
    hw = b0.shape[1:3]
    pred_fn = load_predictor(args.checkpoint,
                             batch_size=min(args.batch, len(idxs)),
                             burst_size=args.burst_size, burst_hw=hw,
                             dtype=None if args.f32 else jnp.bfloat16)

    spec = importlib.util.spec_from_file_location(
        "make_comparison", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "make_comparison.py"))
    mc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mc)

    os.makedirs(args.out, exist_ok=True)
    # predict in REAL batches: per-burst calls would pad 1 -> batch_size
    # and pay batch_size x the device work per burst
    items = {i: ds[i] for i in idxs}
    preds = {}
    bs = pred_fn.batch_size
    for lo in range(0, len(idxs), bs):
        chunk = idxs[lo:lo + bs]
        out = pred_fn(np.stack([items[i][0] for i in chunk]))
        preds.update(zip(chunk, out))
    for i in idxs:
        burst, gt, meta = items[i]
        pred = preds[i]
        scale = gt.shape[0] // hw[0]
        err = float(np.asarray(psnr_fn(
            jnp.asarray(pred)[None], jnp.asarray(gt)[None],
            boundary_ignore=40)))
        tmp = {}
        for name, img in (
                ("input", _gamma(_pseudo_rgb_x(burst[0], scale))),
                ("prediction", _gamma(pred)),
                ("ground_truth", _gamma(gt))):
            path = os.path.join(args.out, f"_{name}_{i:04d}.png")
            write_png(path, (np.clip(img, 0, 1) * 65535).astype(np.uint16))
            tmp[name] = path
        panel = os.path.join(args.out, f"burst{i:04d}")
        mc.main([f"input x8={tmp['input']}",
                 f"dbsr_tpu {err:.2f} dB={tmp['prediction']}",
                 f"ground truth={tmp['ground_truth']}",
                 "--out", panel])
        for path in tmp.values():
            os.remove(path)
        print(f"burst {i:04d}: {err:.2f} dB -> {panel}.png", flush=True)


if __name__ == "__main__":
    main()
