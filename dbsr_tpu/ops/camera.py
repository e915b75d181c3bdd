"""Forward / inverse camera ISP ops (jittable, NHWC, explicit PRNG keys).

TPU-native re-design of the reference camera pipeline
(`data/camera_pipeline.py:27-182` in the reference repo, itself based on the
"unprocessing" model of Brooks et al.). All functions:

  * take images shaped ``[..., H, W, C]`` (channels LAST — native TPU layout;
    the reference uses CHW),
  * are pure and jit-compatible; randomness comes from explicit
    ``jax.random`` keys so synthesis can run fully on device and be vmapped
    over a batch,
  * broadcast over arbitrary leading batch dims.

Distribution parity with the reference (same distributions, different RNG
stream): CCM = row-normalized convex combination of four fixed XYZ->cam
matrices times rgb2xyz (`camera_pipeline.py:27-58`); gains rgb~1/N(0.8,0.1),
red~U[1.9,2.4], blue~U[1.5,1.9] (`:61-69`); smoothstep tone curve with exact
sin/asin inverse (`:72-81`); gamma 2.2 (`:84-93`); highlight-protected inverse
gains (`:123-136`); RGGB/GRBG mosaic to 4-channel half-res packing
(`:139-162`); log-log shot/read noise model (`:165-182`).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# Four fixed XYZ -> camera CCMs whose convex combinations span the camera
# space (reference `data/camera_pipeline.py:30-41`).
XYZ2CAMS = jnp.array(
    [
        [[1.0234, -0.2969, -0.2266],
         [-0.5625, 1.6328, -0.0469],
         [-0.0703, 0.2188, 0.6406]],
        [[0.4913, -0.0541, -0.0202],
         [-0.613, 1.3513, 0.2906],
         [-0.1564, 0.2151, 0.7183]],
        [[0.838, -0.263, -0.0639],
         [-0.2887, 1.0725, 0.2496],
         [-0.0627, 0.1427, 0.5438]],
        [[0.6596, -0.2079, -0.0562],
         [-0.4782, 1.3016, 0.1933],
         [-0.097, 0.1581, 0.5181]],
    ],
    dtype=jnp.float32,
)

# sRGB -> XYZ (D65), reference `data/camera_pipeline.py:51-53`.
RGB2XYZ = jnp.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ],
    dtype=jnp.float32,
)


def random_ccm(key: jax.Array) -> jax.Array:
    """Random RGB -> camera CCM: row-normalized convex combo of 4 bases.

    Matches the distribution of reference `camera_pipeline.py:27-58`.
    Returns a ``[3, 3]`` matrix.
    """
    weights = jax.random.uniform(key, (4, 1, 1))
    xyz2cam = (XYZ2CAMS * weights).sum(axis=0) / weights.sum()
    rgb2cam = jnp.matmul(xyz2cam, RGB2XYZ,
                         precision=jax.lax.Precision.HIGHEST)
    return rgb2cam / rgb2cam.sum(axis=-1, keepdims=True)


def random_gains(key: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Random brightening + white-balance gains.

    rgb_gain = 1/N(0.8, 0.1), red ~ U[1.9, 2.4], blue ~ U[1.5, 1.9]
    (reference `camera_pipeline.py:61-69`). Returns three scalars.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    rgb_gain = 1.0 / (jax.random.normal(k1) * 0.1 + 0.8)
    red_gain = jax.random.uniform(k2, minval=1.9, maxval=2.4)
    blue_gain = jax.random.uniform(k3, minval=1.5, maxval=1.9)
    return rgb_gain, red_gain, blue_gain


def apply_smoothstep(image: jax.Array) -> jax.Array:
    """Global tone mapping curve 3x^2 - 2x^3 (reference `:72-75`)."""
    return 3.0 * image**2 - 2.0 * image**3


def invert_smoothstep(image: jax.Array) -> jax.Array:
    """Exact inverse of the smoothstep tone curve (reference `:78-81`)."""
    image = jnp.clip(image, 0.0, 1.0)
    return 0.5 - jnp.sin(jnp.arcsin(1.0 - 2.0 * image) / 3.0)


def gamma_expansion(image: jax.Array) -> jax.Array:
    """Gamma -> linear; clamps near zero for gradient stability (`:84-87`)."""
    return jnp.clip(image, 1e-8) ** 2.2


def gamma_compression(image: jax.Array) -> jax.Array:
    """Linear -> gamma (`:90-93`)."""
    return jnp.clip(image, 1e-8) ** (1.0 / 2.2)


def apply_ccm(image: jax.Array, ccm: jax.Array) -> jax.Array:
    """Apply a color matrix to an ``[..., H, W, 3]`` image (`:96-106`).

    ``ccm`` may carry leading batch dims (``[..., 3, 3]``) matching the
    image's leading dims.
    """
    # HIGHEST: keep the color transform exact f32 on TPU (MXU DEFAULT
    # would truncate both CCM entries and pixel values to bf16)
    return jnp.einsum("...ij,...hwj->...hwi", ccm, image,
                      precision=jax.lax.Precision.HIGHEST)


def apply_gains(image: jax.Array, rgb_gain, red_gain, blue_gain) -> jax.Array:
    """Apply WB/brightening gains to a 3- or 4-channel image (`:109-120`).

    Channel order RGB or packed RGGB (channels-last). Gains may be scalars or
    arrays with leading batch dims matching the image's.
    """
    rgb_gain, red_gain, blue_gain = (jnp.asarray(g, image.dtype)
                                     for g in (rgb_gain, red_gain, blue_gain))
    one = jnp.ones_like(red_gain)
    if image.shape[-1] == 3:
        gains = jnp.stack([red_gain, one, blue_gain], axis=-1)
    elif image.shape[-1] == 4:
        gains = jnp.stack([red_gain, one, one, blue_gain], axis=-1)
    else:
        raise ValueError(f"expected 3 or 4 channels, got {image.shape[-1]}")
    gains = gains * rgb_gain[..., None]
    gains = gains[..., None, None, :]  # broadcast over H, W
    return jnp.clip(image * gains, 0.0, 1.0)


def safe_invert_gains(image: jax.Array, rgb_gain, red_gain, blue_gain) -> jax.Array:
    """Invert gains with highlight protection on an RGB image (`:123-136`).

    Near-white pixels keep gain ~1 (quadratic mask above inflection 0.9) so
    saturated regions do not dim when inverting white balance.
    """
    rgb_gain, red_gain, blue_gain = (jnp.asarray(g, image.dtype)
                                     for g in (rgb_gain, red_gain, blue_gain))
    one = jnp.ones_like(red_gain)
    gains = jnp.stack([1.0 / red_gain, one, 1.0 / blue_gain], axis=-1) / rgb_gain[..., None]
    gains = gains[..., None, None, :]

    gray = image.mean(axis=-1, keepdims=True)
    inflection = 0.9
    mask = (jnp.clip(gray - inflection, 0.0) / (1.0 - inflection)) ** 2.0
    safe_gains = jnp.maximum(mask + (1.0 - mask) * gains, gains)
    return image * safe_gains


def mosaic(image: jax.Array, mode: str = "rggb") -> jax.Array:
    """Extract Bayer planes: ``[..., H, W, 3]`` -> ``[..., H/2, W/2, 4]``.

    Packed half-res representation (reference `:139-162`). ``rggb`` channel
    order is (R, Gr, Gb, B); ``grbg`` is (Gr, R, B, Gb).
    """
    r = image[..., 0]
    g = image[..., 1]
    b = image[..., 2]
    if mode == "rggb":
        planes = (
            r[..., 0::2, 0::2],
            g[..., 0::2, 1::2],
            g[..., 1::2, 0::2],
            b[..., 1::2, 1::2],
        )
    elif mode == "grbg":
        planes = (
            g[..., 0::2, 0::2],
            r[..., 0::2, 1::2],
            b[..., 0::2, 1::2],
            g[..., 1::2, 1::2],
        )
    else:
        raise ValueError(f"unknown bayer mode {mode!r}")
    return jnp.stack(planes, axis=-1)


def demosaic_naive(packed: jax.Array) -> jax.Array:
    """Cheap pseudo-RGB from packed RGGB: (R, (G1+G2)/2, B), half resolution.

    Used by the encoder to feed the flow network (reference
    `models/dbsr/encoders.py:52`).
    """
    return jnp.stack(
        [packed[..., 0], 0.5 * (packed[..., 1] + packed[..., 2]), packed[..., 3]],
        axis=-1,
    )


LOG_MIN_SHOT_NOISE = math.log(0.0001)
LOG_MAX_SHOT_NOISE = math.log(0.012)


def random_noise_levels(key: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sample (shot, read) noise from the log-log linear model (`:165-175`).

    log(shot) ~ U[log 1e-4, log 0.012];
    log(read) = 2.18*log(shot) + 1.20 + N(0, 0.26).
    """
    k1, k2 = jax.random.split(key)
    log_shot = jax.random.uniform(
        k1, minval=LOG_MIN_SHOT_NOISE, maxval=LOG_MAX_SHOT_NOISE)
    shot = jnp.exp(log_shot)
    log_read = 2.18 * log_shot + 1.20 + jax.random.normal(k2) * 0.26
    read = jnp.exp(log_read)
    return shot, read


def add_noise(key: jax.Array, image: jax.Array, shot_noise=0.01,
              read_noise=0.0005) -> jax.Array:
    """Add heteroscedastic shot+read noise: var = im*shot + read (`:178-182`).

    ``shot_noise``/``read_noise`` may be scalars or arrays with leading batch
    dims (broadcast against the image's leading dims).
    """
    shot_noise = jnp.asarray(shot_noise, image.dtype)
    read_noise = jnp.asarray(read_noise, image.dtype)
    extra = (None,) * (image.ndim - shot_noise.ndim)
    shot = shot_noise[(...,) + extra] if extra else shot_noise
    read = read_noise[(...,) + extra] if extra else read_noise
    variance = image * shot + read
    noise = jax.random.normal(key, image.shape, image.dtype) * jnp.sqrt(variance)
    return image + noise


def process_linear_image_rgb(image: jax.Array, meta: dict,
                             return_np: bool = False) -> jax.Array:
    """Linear sensor RGB -> display sRGB using synthesis-time meta info.

    Forward ISP used for visualization / postprocessing (reference
    `data/postprocessing_functions.py:49-64`): gains -> CCM -> gamma ->
    smoothstep, then clip.
    ``meta`` needs keys: cam2rgb, rgb_gain, red_gain, blue_gain, and optional
    bools gamma / smoothstep.
    """
    image = apply_gains(image, meta["rgb_gain"], meta["red_gain"], meta["blue_gain"])
    image = apply_ccm(image, meta["cam2rgb"])
    if meta.get("gamma", True):
        image = gamma_compression(image)
    if meta.get("smoothstep", True):
        image = apply_smoothstep(image)
    return jnp.clip(image, 0.0, 1.0)
