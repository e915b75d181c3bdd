"""Gaussian filtering utilities (jittable, channels-last).

Re-design of reference ``models/layers/filtering.py:20-62``: separable 1-D /
2-D Gaussian kernels and a reflect-padded depthwise convolution. The
depthwise application lowers to an XLA grouped conv, which fuses well on TPU.
"""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax
import jax.numpy as jnp


def gauss_1d(sz: int, sigma: float, center, end_pad: int = 0,
             density: bool = False) -> jax.Array:
    """1-D Gaussian sampled at ``[-(sz-1)/2, ..., (sz+1)/2 + end_pad - 1]``.

    ``center`` may be scalar or ``[n]``; returns ``[n, sz + end_pad]``
    (reference ``filtering.py:20-26``).
    """
    center = jnp.atleast_1d(jnp.asarray(center, jnp.float32))
    k = jnp.arange(-(sz - 1) / 2, (sz + 1) / 2 + end_pad, dtype=jnp.float32)
    g = jnp.exp(-1.0 / (2 * sigma**2) * (k[None, :] - center[:, None]) ** 2)
    if density:
        g = g / (math.sqrt(2 * math.pi) * sigma)
    return g


def gauss_2d(sz: Union[int, Tuple[int, int]], sigma, center=(0.0, 0.0),
             end_pad: Tuple[int, int] = (0, 0), density: bool = False) -> jax.Array:
    """2-D Gaussian ``[n, H, W]`` as outer product of two 1-D Gaussians
    (reference ``filtering.py:29-40``)."""
    if isinstance(sigma, (float, int)):
        sigma = (sigma, sigma)
    if isinstance(sz, int):
        sz = (sz, sz)
    center = jnp.atleast_2d(jnp.asarray(center, jnp.float32))
    gy = gauss_1d(sz[0], sigma[0], center[:, 0], end_pad[0], density)
    gx = gauss_1d(sz[1], sigma[1], center[:, 1], end_pad[1], density)
    return gy[:, None, :] * gx[:, :, None]


def get_gaussian_kernel(sd: float, ksz: int = None) -> Tuple[jax.Array, int]:
    """Normalized 2-D Gaussian kernel ``[ksz, ksz]``; ksz defaults to 4*sd+1
    (reference ``filtering.py:43-51``)."""
    if ksz is None:
        ksz = int(4 * sd + 1)
    assert ksz % 2 == 1
    k = gauss_2d(ksz, sd, (0.0, 0.0), density=True)[0]
    return k / k.sum(), ksz


def apply_kernel(im: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise-convolve ``[..., H, W, C]`` with a ``[kh, kw]`` kernel,
    reflect padding (reference ``filtering.py:54-62``).

    Applied identically to every channel via a grouped XLA conv.
    """
    kh, kw = kernel.shape
    lead = im.shape[:-3]
    H, W, C = im.shape[-3:]
    x = im.reshape((-1, H, W, C))
    x = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
                mode="reflect")
    # depthwise: HWIO with feature_group_count=C, I=1, O=C
    kern = jnp.broadcast_to(kernel[:, :, None, None].astype(im.dtype),
                            (kh, kw, 1, C))
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
        precision=jax.lax.Precision.HIGHEST)
    return out.reshape(lead + (H, W, C))
