"""Packed-RAW <-> flat Bayer conversions (channels-last).

Re-design of reference ``data/raw_image_processing.py:19-94``. The packed
representation is ``[..., H/2, W/2, 4]`` with plane order (R, Gr, Gb, B) for
an RGGB mosaic; the flat representation is the full-resolution single-channel
Bayer image ``[..., H, W]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_raw_image(im_raw: jax.Array) -> jax.Array:
    """Flat Bayer ``[..., H, W]`` -> packed ``[..., H/2, W/2, 4]``
    (reference ``raw_image_processing.py:64-77``, channel order RGGB)."""
    return jnp.stack(
        [
            im_raw[..., 0::2, 0::2],
            im_raw[..., 0::2, 1::2],
            im_raw[..., 1::2, 0::2],
            im_raw[..., 1::2, 1::2],
        ],
        axis=-1,
    )


def flatten_raw_image(im_packed: jax.Array) -> jax.Array:
    """Packed ``[..., h, w, 4]`` -> flat Bayer ``[..., 2h, 2w]``
    (reference ``raw_image_processing.py:80-94``)."""
    h, w = im_packed.shape[-3], im_packed.shape[-2]
    out = jnp.zeros(im_packed.shape[:-3] + (2 * h, 2 * w), im_packed.dtype)
    out = out.at[..., 0::2, 0::2].set(im_packed[..., 0])
    out = out.at[..., 0::2, 1::2].set(im_packed[..., 1])
    out = out.at[..., 1::2, 0::2].set(im_packed[..., 2])
    out = out.at[..., 1::2, 1::2].set(im_packed[..., 3])
    return out


def bayer_crop_to_rggb(im_flat: jax.Array, pattern: str) -> jax.Array:
    """Shift-crop a flat Bayer image so its top-left 2x2 tile reads RGGB.

    Equivalent to reference ``convert_to_rggb``
    (``raw_image_processing.py:19-61``): BGGR drops one row+col, GRBG drops a
    column, GBRG drops a row. Output loses up to 2 pixels per axis so shapes
    stay static per pattern.
    """
    pattern = pattern.lower()
    if pattern == "rggb":
        return im_flat
    if pattern == "grbg":
        return im_flat[..., :, 1:-1]
    if pattern == "gbrg":
        return im_flat[..., 1:-1, :]
    if pattern == "bggr":
        return im_flat[..., 1:-1, 1:-1]
    raise ValueError(f"unknown bayer pattern {pattern!r}")
