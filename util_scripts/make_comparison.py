"""Labeled side-by-side comparison GIF of result images.

Equivalent of the reference's PWC-port comparison artifact generator
(``external/pwcnet/comparison/comparison.py``: two labeled frames cycled
as a GIF), generalized to N images and free of the moviepy/ImageMagick/
system-font dependencies — labels are drawn with PIL's built-in bitmap
font on an outlined box, and the GIF is written by PIL itself.

Usage:
    python util_scripts/make_comparison.py out.gif \
        a.png "reference flow" b.png "dbsr_tpu flow" [--fps 1]
"""

import argparse

import numpy as np
from PIL import Image, ImageDraw


def label_image(img: Image.Image, text: str) -> Image.Image:
    img = img.convert("RGB")
    d = ImageDraw.Draw(img)
    x, y = 12, img.height - 28
    pad = 6
    box = d.textbbox((x, y), text)
    d.rectangle((box[0] - pad, box[1] - pad, box[2] + pad, box[3] + pad),
                fill=(0, 0, 0))
    d.text((x, y), text, fill=(255, 255, 255))
    return img


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", help="output .gif path")
    p.add_argument("pairs", nargs="+",
                   help="alternating: image path, label, ...")
    p.add_argument("--fps", type=float, default=1.0)
    args = p.parse_args()
    if len(args.pairs) % 2:
        p.error("expected alternating IMAGE LABEL pairs")

    frames = []
    size = None
    for path, text in zip(args.pairs[0::2], args.pairs[1::2]):
        img = Image.open(path)
        if size is None:
            size = img.size
        elif img.size != size:
            img = img.resize(size, Image.BILINEAR)
        frames.append(label_image(img, text))

    frames[0].save(args.out, save_all=True, append_images=frames[1:],
                   duration=int(1000 / args.fps), loop=0)
    print(f"wrote {args.out} ({len(frames)} frames, "
          f"{np.prod(size)} px each)")


if __name__ == "__main__":
    main()
