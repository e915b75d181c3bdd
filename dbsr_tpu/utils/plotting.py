"""Generic tensor-display helpers (re-design of reference
``utils/plotting.py:7-46``).

The reference displays tensors in interactive matplotlib/OpenCV windows;
this environment is headless, so the same operations render to PNG files
(or return uint8 arrays) instead. Accepts jax/numpy arrays in NHWC/HWC/HW
layouts (the reference's CHW inputs are auto-detected and transposed).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def to_display(a, value_range: Tuple[Optional[float], Optional[float]]
               = (None, None)) -> np.ndarray:
    """Normalize any 2-4D tensor to a uint8 [H, W, 3] display image.

    Squeezes singleton leading dims, transposes CHW -> HWC when the first
    axis looks like channels, maps ``value_range`` (default: data min/max)
    to [0, 255], and broadcasts grayscale to RGB.
    """
    a = np.asarray(a, np.float32)
    a = np.squeeze(a)
    if a.ndim == 3 and a.shape[0] in (1, 3) and a.shape[-1] not in (1, 3):
        a = np.transpose(a, (1, 2, 0))  # CHW -> HWC
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError(f"cannot display tensor of shape {a.shape}")
    if a.shape[-1] == 1:
        a = np.repeat(a, 3, axis=-1)
    elif a.shape[-1] == 4:  # packed RGGB -> naive RGB for display
        a = np.stack([a[..., 0], 0.5 * (a[..., 1] + a[..., 2]), a[..., 3]],
                     axis=-1)
    elif a.shape[-1] != 3:
        a = a.mean(axis=-1, keepdims=True).repeat(3, axis=-1)

    lo = a.min() if value_range[0] is None else value_range[0]
    hi = a.max() if value_range[1] is None else value_range[1]
    a = (a - lo) / (hi - lo + 1e-12)
    return np.clip(a * 255.0 + 0.5, 0, 255).astype(np.uint8)


def save_tensor(a, path: str,
                value_range: Tuple[Optional[float], Optional[float]]
                = (None, None)) -> None:
    """Headless ``show_tensor``: render the tensor to a PNG file."""
    from PIL import Image

    Image.fromarray(to_display(a, value_range)).save(path)


def tensor_grid(tensors: Sequence, cols: int = 4, pad: int = 2,
                value_range=(None, None)) -> np.ndarray:
    """Tile tensors into one uint8 grid image (all resized-by-padding to
    the max tile size), for burst/feature-map inspection."""
    tiles = [to_display(t, value_range) for t in tensors]
    th = max(t.shape[0] for t in tiles)
    tw = max(t.shape[1] for t in tiles)
    cols = max(1, min(cols, len(tiles)))
    rows = -(-len(tiles) // cols)
    grid = np.zeros((rows * (th + pad) - pad, cols * (tw + pad) - pad, 3),
                    np.uint8)
    for i, t in enumerate(tiles):
        r, c = divmod(i, cols)
        y = r * (th + pad)
        x = c * (tw + pad)
        grid[y:y + t.shape[0], x:x + t.shape[1]] = t
    return grid


def describe(a, name: str = "tensor") -> str:
    """One-line numeric summary (shape/dtype/min/mean/max/nan count) —
    the quick-look the reference got from dropping into a viewer."""
    x = np.asarray(a)
    finite = np.isfinite(x)
    fx = x[finite].astype(np.float64) if finite.any() else np.zeros(1)
    return (f"{name}: shape={tuple(x.shape)} dtype={x.dtype} "
            f"min={fx.min():.4g} mean={fx.mean():.4g} max={fx.max():.4g} "
            f"nonfinite={int((~finite).sum())}")
