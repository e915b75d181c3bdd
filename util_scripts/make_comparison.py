"""Labeled side-by-side / toggle-GIF comparison of result images.

TPU-native analog of the reference's comparison demo
(``external/pwcnet/comparison/comparison.py:1-40``), generalized from two
hard-coded flow PNGs to any set of result images or saved-results
directories (the output of ``evaluation/*/save_results`` or
``run_pwcnet_demo.py``): each input gets a label burned in (outlined text,
like the reference's halo loop), and the tool writes

  * ``<out>.png`` — a side-by-side strip of all labeled images, and/or
  * ``<out>.gif`` — a toggle animation cycling through them (the
    reference uses moviepy+ImageMagick; PIL writes the GIF natively).

Usage:
    python util_scripts/make_comparison.py \
        ours=/results/dbsr_tpu ref=/results/reference --image 0014.png \
        --out /tmp/cmp --gif --fps 1

    python util_scripts/make_comparison.py a=flow_a.png b=flow_b.png \
        --out /tmp/flowcmp
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
from PIL import Image, ImageDraw, ImageFont


def _load(spec: str, image: str | None) -> tuple[str, Image.Image]:
    """``label=path`` -> (label, RGB image). ``path`` may be a PNG file or
    a saved-results directory (then ``--image`` selects the file)."""
    if "=" in spec:
        label, path = spec.split("=", 1)
    else:
        label, path = os.path.basename(spec), spec
    if os.path.isdir(path):
        if not image:
            raise SystemExit(
                f"{path} is a directory — pass --image <name.png> to pick "
                "the result file to compare")
        path = os.path.join(path, image)
    return label, Image.open(path).convert("RGB")


def _label(im: Image.Image, text: str, font_size: int = 24) -> Image.Image:
    """Burn an outlined label into the bottom-left corner (the reference
    draws a white halo by stamping the text at every offset within radius
    5 then the black text on top — same effect, cheaper stroke API)."""
    im = im.copy()
    draw = ImageDraw.Draw(im)
    try:
        font = ImageFont.truetype(
            "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
            font_size)
    except OSError:
        font = ImageFont.load_default()
    x, y = 16, im.height - font_size - 16
    draw.text((x, y), text, fill=(0, 0, 0), font=font,
              stroke_width=max(2, font_size // 8),
              stroke_fill=(255, 255, 255))
    return im


def make_comparison(specs, image=None, out="comparison", gif=False,
                    strip=True, fps=1.0, font_size=24):
    """Build the labeled strip PNG and/or toggle GIF; returns written paths."""
    frames = []
    for spec in specs:
        label, im = _load(spec, image)
        frames.append(_label(im, label, font_size))
    h = min(f.height for f in frames)
    frames = [f if f.height == h else
              f.resize((round(f.width * h / f.height), h),
                       Image.Resampling.LANCZOS) for f in frames]
    written = []
    if strip:
        strip_im = Image.new(
            "RGB", (sum(f.width for f in frames), h), (0, 0, 0))
        x = 0
        for f in frames:
            strip_im.paste(f, (x, 0))
            x += f.width
        path = out + ".png"
        strip_im.save(path)
        written.append(path)
    if gif:
        path = out + ".gif"
        frames[0].save(path, save_all=True, append_images=frames[1:],
                       duration=int(1000 / fps), loop=0)
        written.append(path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("inputs", nargs="+",
                   help="label=path specs; path = PNG file or "
                        "saved-results directory")
    p.add_argument("--image", default=None,
                   help="result filename to pick inside directories")
    p.add_argument("--out", default="comparison",
                   help="output path stem (writes <out>.png / <out>.gif)")
    p.add_argument("--gif", action="store_true",
                   help="also write a toggle GIF")
    p.add_argument("--no_strip", action="store_true",
                   help="skip the side-by-side strip PNG")
    p.add_argument("--fps", type=float, default=1.0)
    p.add_argument("--font_size", type=int, default=24)
    args = p.parse_args(argv)
    written = make_comparison(args.inputs, args.image, args.out,
                              gif=args.gif, strip=not args.no_strip,
                              fps=args.fps, font_size=args.font_size)
    for w in written:
        print(w)
    return 0


if __name__ == "__main__":
    sys.exit(main())
