"""Geometric augmentation: affine transform construction (jittable).

Re-design of reference ``data/synthetic_burst_generation.py:105-128``
(``get_tmat``): builds the 2x3 affine used to jitter burst frames, composed
as ``scale @ rot_about_center @ shear @ translation``. All inputs may be
traced scalars so the whole burst synthesis runs inside jit.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Compose two [..., 3, 3] homogeneous matrices.

    HIGHEST precision: TPU MXU DEFAULT truncates f32 to bf16, and affine
    entries carry pixel-scale translations (bf16 ulp at 400 is 2 px).
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _homo(m2x3: jax.Array) -> jax.Array:
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], m2x3.dtype), m2x3.shape[:-2] + (1, 3))
    return jnp.concatenate([m2x3, bottom], axis=-2)


def get_tmat(image_shape: Tuple[int, int], translation, theta_deg,
             shear_values, scale_factors) -> jax.Array:
    """2x3 affine for (translation, rotation-about-center, shear, scale).

    Matches reference ``get_tmat`` (``synthetic_burst_generation.py:105-128``)
    exactly: rotation uses the cv2.getRotationMatrix2D convention (CCW
    ``theta`` in degrees about the image center ``(w/2, h/2)``); shear is
    centered by offsetting with ``-shear * dim/2``; composition order is
    ``scale @ rot @ shear @ trans``. Scalars may be traced; ``image_shape``
    must be static.
    """
    im_h, im_w = image_shape
    tx = jnp.asarray(translation[0], jnp.float32)
    ty = jnp.asarray(translation[1], jnp.float32)
    theta = jnp.asarray(theta_deg, jnp.float32) * (math.pi / 180.0)
    sx = jnp.asarray(shear_values[0], jnp.float32)
    sy = jnp.asarray(shear_values[1], jnp.float32)
    k0 = jnp.asarray(scale_factors[0], jnp.float32)
    k1 = jnp.asarray(scale_factors[1], jnp.float32)

    one = jnp.ones_like(tx)
    zero = jnp.zeros_like(tx)

    t_trans = jnp.stack([
        jnp.stack([one, zero, tx]),
        jnp.stack([zero, one, ty]),
        jnp.stack([zero, zero, one]),
    ])

    a = jnp.cos(theta)
    b = jnp.sin(theta)
    cx, cy = im_w * 0.5, im_h * 0.5
    # cv2.getRotationMatrix2D: [[a, b, (1-a)cx - b*cy], [-b, a, b*cx + (1-a)cy]]
    t_rot = jnp.stack([
        jnp.stack([a, b, (1 - a) * cx - b * cy]),
        jnp.stack([-b, a, b * cx + (1 - a) * cy]),
        jnp.stack([zero, zero, one]),
    ])

    t_shear = jnp.stack([
        jnp.stack([one, sx, -sx * 0.5 * im_w]),
        jnp.stack([sy, one, -sy * 0.5 * im_h]),
        jnp.stack([zero, zero, one]),
    ])

    t_scale = jnp.stack([
        jnp.stack([k0, zero, zero]),
        jnp.stack([zero, k1, zero]),
        jnp.stack([zero, zero, one]),
    ])

    t = _compose(t_scale, _compose(t_rot, _compose(t_shear, t_trans)))
    return t[:2, :]


def sample_burst_transform(key: jax.Array, image_shape: Tuple[int, int],
                           downsample_factor: float,
                           params: dict, is_reference: bool) -> jax.Array:
    """Sample one burst frame's 2x3 affine from ``params`` distributions.

    Matches the sampling of reference
    ``single2lrburst`` (``synthetic_burst_generation.py:166-205``):
      * reference frame (``is_reference``): only the half-pixel centering
        shift ``d/2 - 0.5`` so downsampled pixel centers align with the HR
        grid;
      * other frames: translation ~ U[-T, T]^2 (or the centering shift if
        T <= 0.01), rotation ~ U[-R, R] deg, shear ~ U[-S, S]^2,
        anisotropic log-scale via ``max_ar_factor`` / ``max_scale``.

    ``params`` keys (all optional, default 0): max_translation, max_rotation,
    max_shear, max_ar_factor, max_scale. Returns a ``[2, 3]`` matrix.
    """
    d = float(downsample_factor)
    shift = (d / 2.0) - 0.5
    if is_reference:
        return get_tmat(image_shape, (shift, shift), 0.0, (0.0, 0.0), (1.0, 1.0))

    kt, kr, ks, ka, kc = jax.random.split(key, 5)
    max_t = float(params.get("max_translation", 0.0))
    if max_t <= 0.01:
        translation = (jnp.float32(shift), jnp.float32(shift))
    else:
        t = jax.random.uniform(kt, (2,), minval=-max_t, maxval=max_t)
        translation = (t[0], t[1])

    max_r = float(params.get("max_rotation", 0.0))
    theta = jax.random.uniform(kr, minval=-max_r, maxval=max_r)

    max_s = float(params.get("max_shear", 0.0))
    sh = jax.random.uniform(ks, (2,), minval=-max_s, maxval=max_s)

    max_ar = float(params.get("max_ar_factor", 0.0))
    ar = jnp.exp(jax.random.uniform(ka, minval=-max_ar, maxval=max_ar))
    max_sc = float(params.get("max_scale", 0.0))
    sc = jnp.exp(jax.random.uniform(kc, minval=-max_sc, maxval=max_sc))

    return get_tmat(image_shape, translation, theta, (sh[0], sh[1]), (sc, sc * ar))
