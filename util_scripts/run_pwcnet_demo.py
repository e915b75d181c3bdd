"""Standalone two-image optical flow demo.

Re-design of reference ``external/pwcnet/run.py`` (self-contained flow
estimation between two images): loads two RGB images, runs our flax
PWC-Net (optionally with converted pretrained torch weights), and writes
the flow as a color-coded PNG plus a .npy array.

Usage:
    python util_scripts/run_pwcnet_demo.py --first a.png --second b.png \
        --out flow [--weights pwcnet-network-default.pth]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def flow_to_color(flow):
    """Simple HSV-style flow visualization (hue=direction, sat=magnitude)."""
    import numpy as np

    fx, fy = flow[..., 0], flow[..., 1]
    mag = np.sqrt(fx**2 + fy**2)
    ang = np.arctan2(fy, fx)
    h = (ang + np.pi) / (2 * np.pi)
    s = np.clip(mag / (mag.max() + 1e-6), 0, 1)
    # HSV -> RGB
    i = (h * 6).astype(int) % 6
    f = h * 6 - np.floor(h * 6)
    v = np.ones_like(s)
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)
    rgb = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [np.stack([v, t, p], -1), np.stack([q, v, p], -1),
         np.stack([p, v, t], -1), np.stack([p, q, v], -1),
         np.stack([t, p, v], -1), np.stack([v, p, q], -1)])
    return (rgb * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--first", required=True)
    p.add_argument("--second", required=True)
    p.add_argument("--out", default="flow")
    p.add_argument("--weights", default=None,
                   help="optional torch .pth PWC checkpoint to convert")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dbsr_tpu.data.datasets import _load_image
    from dbsr_tpu.models.pwcnet import PWCNet
    from dbsr_tpu.utils.png16 import write_png

    a = jnp.asarray(_load_image(args.first)).astype(jnp.float32)[None] / 255.0
    b = jnp.asarray(_load_image(args.second)).astype(jnp.float32)[None] / 255.0

    net = PWCNet()
    if args.weights:
        from dbsr_tpu.utils.convert_pwcnet import load_pwcnet_torch_checkpoint
        params = {"params": {"net": load_pwcnet_torch_checkpoint(
            args.weights)}}
    else:
        print("no --weights given: using random init (flow quality will be "
              "meaningless; this exercises the pipeline only)")
        params = net.init(jax.random.key(0), a, b)

    flow = np.asarray(jax.jit(net.apply)(params, a, b))[0]
    np.save(args.out + ".npy", flow)
    write_png(args.out + ".png", flow_to_color(flow))
    print(f"flow: mean |u|={np.abs(flow[..., 0]).mean():.3f} "
          f"|v|={np.abs(flow[..., 1]).mean():.3f} -> {args.out}.png/.npy")


if __name__ == "__main__":
    main()
