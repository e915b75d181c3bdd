"""Host-side dataset readers (numpy/PIL, no torch).

Re-design of the reference ``dataset/`` package: same on-disk formats and
split conventions, returning channels-last numpy arrays.

Channel-order note: the reference reads images with cv2 (BGR order) and
writes its pre-generated validation PNGs with cv2 as well, so its arrays
are consistently "BGR-as-RGB". We use PIL (true RGB) consistently; when
reading cv2-written reference artifacts (SyntheticBurstVal), the
``cv2_channel_order`` flag swaps channels so the in-memory array matches
what the reference pipeline would see.
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
    _HAVE_PIL = True
except Exception:  # pragma: no cover
    _HAVE_PIL = False


def _load_image(path: str) -> np.ndarray:
    """Load an 8-bit image as uint8 RGB [H, W, 3].

    JPEGs take the native libjpeg-turbo path (``native/dbsr_io.cpp``,
    ~2.8x PIL; bit-exact — both are libjpeg), matching the reference's
    jpeg4py fast loader (``data/image_loader.py:5-61``). Everything else
    (and any decode failure) falls back to PIL.
    """
    if path.lower().endswith((".jpg", ".jpeg")):
        try:
            from dbsr_tpu.utils.native_io import read_jpeg
            return read_jpeg(path)
        except Exception:
            pass
    if not _HAVE_PIL:
        raise RuntimeError("PIL unavailable; cannot load images")
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _load_png_raw(path: str) -> np.ndarray:
    """Load a PNG preserving dtype/channels (uint16-capable).

    Uses the native C++ decoder when built (``native/dbsr_io.cpp``), else
    our pure-Python codec (``dbsr_tpu/utils/png16.py``). Pillow is not an
    option here: it downcasts 16-bit color PNGs to 8 bits, corrupting RAW
    data.
    """
    from dbsr_tpu.utils.native_io import read_png
    return read_png(path)


class BaseImageDataset:
    """Single-image dataset contract (reference
    ``dataset/base_image_dataset.py:19-87``)."""

    def __init__(self, name: str, root: str):
        self.name = name
        self.root = root

    def get_name(self) -> str:
        return self.name

    def get_num_images(self) -> int:
        raise NotImplementedError

    def __len__(self):
        return self.get_num_images()

    def get_image(self, im_id: int, info: Optional[dict] = None):
        raise NotImplementedError

    def get_image_info(self, im_id: int) -> dict:
        return {}


class ZurichRAW2RGB(BaseImageDataset):
    """Canon sRGB images from the Zurich RAW->RGB dataset, used as the
    synthesis source (reference ``dataset/zurichraw2rgb.py:22-78``):
    ``<root>/<split>/canon/{i}.jpg`` with 46,839 train / 1,204 test."""

    SPLIT_SIZES = {"train": 46839, "test": 1204}

    def __init__(self, root: str, split: str = "train"):
        super().__init__("ZurichRAW2RGB", root)
        if split not in self.SPLIT_SIZES:
            raise ValueError(f"unknown split {split!r}")
        self.split = split
        self.img_pth = os.path.join(root, split, "canon")
        n = self.SPLIT_SIZES[split]
        # tolerate partial local copies: trust the listing if it is smaller
        if os.path.isdir(self.img_pth):
            present = len([f for f in os.listdir(self.img_pth)
                           if f.endswith(".jpg")])
            n = min(n, present) if present else n
        self.image_list = [f"{i:d}.jpg" for i in range(n)]

    def get_num_images(self) -> int:
        return len(self.image_list)

    def get_image(self, im_id: int, info: Optional[dict] = None):
        frame = _load_image(os.path.join(self.img_pth, self.image_list[im_id]))
        return frame, info if info is not None else {}


class ImageFolder(BaseImageDataset):
    """Generic folder-of-images dataset (reference
    ``dataset/imagefolder.py:21-61``)."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp")

    def __init__(self, root: str, name: str = "ImageFolder"):
        super().__init__(name, root)
        self.image_list = sorted(
            f for f in os.listdir(root) if f.lower().endswith(self.EXTS))

    def get_num_images(self) -> int:
        return len(self.image_list)

    def get_image(self, im_id: int, info: Optional[dict] = None):
        frame = _load_image(os.path.join(self.root, self.image_list[im_id]))
        return frame, info if info is not None else {}


class SyntheticBurstVal:
    """Pre-generated 300-burst validation set (reference
    ``dataset/synthetic_burst_val_set.py:22-79``): per index,
    ``bursts/{idx:04d}/im_raw_{i:02d}.png`` (uint16, scale 2^14, 4-channel
    packed RGGB) and ``gt/{idx:04d}/im_rgb.png`` + ``meta_info.pkl``.

    Returns numpy: burst ``[14, 48, 48, 4]`` float32, gt ``[384, 384, 3]``
    float32, meta dict.
    """

    def __init__(self, root: str, burst_size: int = 14,
                 cv2_channel_order: Optional[bool] = None,
                 num_bursts: Optional[int] = None):
        """``num_bursts=None`` infers the set size from the ``gt/``
        directory (generated sets may be smaller/larger than the
        reference's 300, e.g. ``parity_campaign.py --val_bursts``)."""
        self.root = root
        if num_bursts is None:
            gt_dir = os.path.join(root, "gt")
            if os.path.isdir(gt_dir):
                num_bursts = sum(
                    1 for d in os.listdir(gt_dir)
                    if d.isdigit() and os.path.isdir(
                        os.path.join(gt_dir, d)))
            if not num_bursts:
                num_bursts = 300  # reference set size
        self.burst_list = list(range(num_bursts))
        self.burst_size = burst_size
        if cv2_channel_order is None:
            # our writer drops a format marker; reference artifacts
            # (cv2-written) have none and need the swap
            cv2_channel_order = not os.path.exists(
                os.path.join(root, "format.json"))
        self.cv2_channel_order = cv2_channel_order

    def __len__(self):
        return len(self.burst_list)

    def _fix_channels(self, im: np.ndarray) -> np.ndarray:
        """cv2-written files have their first/third channels swapped
        relative to a PIL read; undo to recover the writer's array."""
        if self.cv2_channel_order and im.ndim == 3 and im.shape[-1] >= 3:
            im = im.copy()
            im[..., [0, 2]] = im[..., [2, 0]]
        return im

    def _read_burst_image(self, index: int, image_id: int) -> np.ndarray:
        p = os.path.join(self.root, "bursts", f"{index:04d}",
                         f"im_raw_{image_id:02d}.png")
        im = self._fix_channels(_load_png_raw(p))
        return im.astype(np.float32) / (2**14)

    def _read_gt_image(self, index: int) -> np.ndarray:
        p = os.path.join(self.root, "gt", f"{index:04d}", "im_rgb.png")
        im = self._fix_channels(_load_png_raw(p))
        return im.astype(np.float32) / (2**14)

    def _read_meta_info(self, index: int) -> dict:
        p = os.path.join(self.root, "gt", f"{index:04d}", "meta_info.pkl")
        with open(p, "rb") as f:
            return pickle.load(f)

    def __getitem__(self, index: int):
        burst = np.stack([self._read_burst_image(index, i)
                          for i in range(self.burst_size)])
        gt = self._read_gt_image(index)
        meta = self._read_meta_info(index)
        meta["burst_name"] = f"{index:04d}"
        return burst, gt, meta


def write_synthetic_burst_val(root: str, samples) -> None:
    """Write a SyntheticBurstVal-format dataset (our equivalent of the
    reference's pre-generated val set + ``evaluation/synburst/
    save_results.py`` quantization protocol: uint16 at 2^14 scale).

    ``samples`` yields dicts with ``burst`` [N, h, w, 4], ``frame_gt``
    [H, W, 3] (float in [0, 1]) and ``meta``.
    """
    import json as _json

    from dbsr_tpu.utils.png16 import write_png
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "format.json"), "w") as f:
        _json.dump({"writer": "dbsr_tpu", "channel_order": "rgb",
                    "scale": 2**14}, f)
    for idx, s in enumerate(samples):
        bdir = os.path.join(root, "bursts", f"{idx:04d}")
        gdir = os.path.join(root, "gt", f"{idx:04d}")
        os.makedirs(bdir, exist_ok=True)
        os.makedirs(gdir, exist_ok=True)
        burst = np.asarray(s["burst"])
        for i in range(burst.shape[0]):
            arr = (np.clip(burst[i], 0, 1) * (2**14)).astype(np.uint16)
            write_png(os.path.join(bdir, f"im_raw_{i:02d}.png"), arr)
        gt = (np.clip(np.asarray(s["frame_gt"]), 0, 1) * (2**14)).astype(
            np.uint16)
        write_png(os.path.join(gdir, "im_rgb.png"), gt)
        with open(os.path.join(gdir, "meta_info.pkl"), "wb") as f:
            pickle.dump(_to_plain(s.get("meta", {})), f)


def _to_plain(tree):
    """Convert jax/np scalars in a meta dict to plain python for pickling."""
    import numpy as _np
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    if hasattr(tree, "shape"):
        a = _np.asarray(tree)
        return a.item() if a.ndim == 0 else a
    return tree
