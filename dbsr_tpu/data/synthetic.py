"""On-device synthetic RAW burst generation (the framework's headline
architectural divergence from the reference).

The reference runs burst synthesis on CPU inside 8 dataloader worker
processes (`data/synthetic_burst_generation.py:23-246`: cv2.warpAffine /
cv2.resize on uint8 + torch ISP ops) — the known input-bound bottleneck.
Here the entire pipeline — inverse ISP, per-frame random affine, border
crop, x4 downsample, Bayer mosaic, shot/read noise — is a single jittable,
vmappable function of (PRNG key, HR RGB crop). The host only streams decoded
RGB crops; synthesis fuses into the training step on TPU, reading the crop
from HBM once.

Semantics parity with the reference (`rgb2rawburst`, `single2lrburst`,
`SyntheticBurstProcessing.__call__` at `data/processing.py:85-123`):
  * frame 0 gets only the half-pixel centering shift (d/2 - 0.5); frames
    1..N-1 sample random translation/rotation/shear/scale
    (`synthetic_burst_generation.py:166-205`);
  * per-frame dense flow-to-base vectors are tracked through the inverse
    transform of the integer sampling grid, border-cropped, downsampled with
    the same bilinear resize, and divided by the downsample factor
    (`:215-245`);
  * the ground truth is the full-res linear image border-cropped by
    ``border_crop`` (`processing.py:112-115`);
  * noise/CCM/gain distributions match `camera_pipeline.py`.

One deliberate divergence: the reference round-trips the linear image
through uint8 before warping (`single2lrburst:151-156`), quantizing to 8
bits; we stay in float32 end to end (strictly higher fidelity; parity is
demonstrated at the metric level, not bit level).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dbsr_tpu.ops import augment, camera, interp


class BurstConfig(NamedTuple):
    """Static configuration of the synthetic burst generator.

    Mirrors the reference's `burst_transformation_params` +
    `image_processing_params` dicts (e.g.
    `train_settings/dbsr/default_synthetic.py:37-44`) plus the geometry.
    All fields are Python constants so the whole generator stays
    shape-static under jit.
    """
    burst_size: int = 8
    crop_sz: Tuple[int, int] = (384, 384)
    downsample_factor: int = 4
    border_crop: int = 24
    max_translation: float = 24.0
    max_rotation: float = 1.0
    max_shear: float = 0.0
    max_scale: float = 0.0
    max_ar_factor: float = 0.0
    random_ccm: bool = True
    random_gains: bool = True
    smoothstep: bool = True
    gamma: bool = True
    add_noise: bool = True
    # Fuse per-frame affine warp + border crop + downsample into ONE
    # bilinear resample evaluated directly on the LR grid (composed affine).
    # ~16x less gather work (the dominant cost of the on-device pipeline:
    # 856 ms of a 1016 ms B=16 train step measured on v5e). The reference
    # warps at full resolution then decimates with bilinear taps
    # (`synthetic_burst_generation.py:209-229`), so the degradation kernel
    # differs slightly (two-stage bilinear vs one-stage); flow vectors are
    # EXACT under fusion (evaluated affine instead of resampled grids).
    # Off by default for reference parity.
    fused_resample: bool = False

    @property
    def pre_crop_sz(self) -> Tuple[int, int]:
        """HR crop size fed to the generator (crop + 2*border_crop)."""
        return (self.crop_sz[0] + 2 * self.border_crop,
                self.crop_sz[1] + 2 * self.border_crop)

    @property
    def burst_hw(self) -> Tuple[int, int]:
        """Packed-RAW burst frame size."""
        return (self.crop_sz[0] // self.downsample_factor // 2,
                self.crop_sz[1] // self.downsample_factor // 2)

    def transform_params(self) -> dict:
        return {
            "max_translation": self.max_translation,
            "max_rotation": self.max_rotation,
            "max_shear": self.max_shear,
            "max_scale": self.max_scale,
            "max_ar_factor": self.max_ar_factor,
        }


def invert_isp(key: jax.Array, image: jax.Array, cfg: BurstConfig):
    """sRGB -> linear sensor space, returning (linear image, meta).

    Matches reference `rgb2rawburst` steps 1-5
    (`synthetic_burst_generation.py:47-77`): sample CCM + gains, invert
    smoothstep, invert gamma, apply rgb2cam, safe-invert gains, clip.
    """
    k_ccm, k_gain = jax.random.split(key)
    if cfg.random_ccm:
        rgb2cam = camera.random_ccm(k_ccm)
    else:
        rgb2cam = jnp.eye(3, dtype=jnp.float32)
    cam2rgb = jnp.linalg.inv(rgb2cam)

    if cfg.random_gains:
        rgb_gain, red_gain, blue_gain = camera.random_gains(k_gain)
    else:
        rgb_gain = red_gain = blue_gain = jnp.float32(1.0)

    if cfg.smoothstep:
        image = camera.invert_smoothstep(image)
    if cfg.gamma:
        image = camera.gamma_expansion(image)
    image = camera.apply_ccm(image, rgb2cam)
    image = camera.safe_invert_gains(image, rgb_gain, red_gain, blue_gain)
    image = jnp.clip(image, 0.0, 1.0)

    meta = {
        "rgb2cam": rgb2cam,
        "cam2rgb": cam2rgb,
        "rgb_gain": rgb_gain,
        "red_gain": red_gain,
        "blue_gain": blue_gain,
        "smoothstep": cfg.smoothstep,
        "gamma": cfg.gamma,
    }
    return image, meta


def _lr_frame(image: jax.Array, tmat: jax.Array, cfg: BurstConfig):
    """Warp HR image by ``tmat``, border-crop, downsample; also produce the
    inverse-transformed sampling grid (for flow computation).

    Mirrors reference `single2lrburst` per-frame body
    (`synthetic_burst_generation.py:202-238`). With ``cfg.fused_resample``
    the three resampling stages collapse into one bilinear sample at the
    composed affine coordinates (see BurstConfig note).
    """
    H, W = image.shape[-3], image.shape[-2]
    b = cfg.border_crop
    d = cfg.downsample_factor
    inv = interp.invert_2x3(tmat)

    if cfg.fused_resample:
        out_hw = ((H - 2 * b) // d, (W - 2 * b) // d)
        # LR pixel q samples the cropped fine grid at (q+0.5)*d - 0.5,
        # offset by the border crop, then through the inverse affine
        # (elementwise — see apply_affine_to_points precision note).
        q = interp.base_grid(*out_hw)
        fine = (q + 0.5) * d - 0.5 + b
        coords = interp.apply_affine_to_points(inv, fine)
        lr = interp.sample_bilinear(image, coords, "zeros")
        pos_inv_lr = coords / d
        return lr, pos_inv_lr

    warped = interp.warp_affine(image, tmat)

    grid = interp.base_grid(H, W)  # [H, W, 2] (x, y)
    pos_inv = interp.apply_affine_to_points(inv, grid)

    if b > 0:
        warped = warped[..., b:-b, b:-b, :]
        pos_inv = pos_inv[..., b:-b, b:-b, :]

    out_hw = (warped.shape[-3] // d, warped.shape[-2] // d)
    lr = interp.resize_bilinear(warped, out_hw)
    pos_inv_lr = interp.resize_bilinear(pos_inv, out_hw) / d
    return lr, pos_inv_lr


def single2lrburst(key: jax.Array, image: jax.Array, cfg: BurstConfig):
    """HR linear image -> (LR RGB burst [N,h,w,3], flow-to-base [N,h,w,2]).

    Frame 0 is the reference (centering shift only); frames 1..N-1 are
    randomly transformed and warped. Flow vectors are differences of the
    inverse-transformed sampling grids, matching
    `synthetic_burst_generation.py:243-245`. Convention note: flow_i =
    pos_inv_i - pos_inv_0 is the difference of SOURCE sampling positions,
    so reconstructing the base frame from frame i uses the negated flow:
    lr_0(p) ~= lr_i(p - flow_i(p)).
    """
    hw = (image.shape[-3], image.shape[-2])
    tparams = cfg.transform_params()

    ref_tmat = augment.sample_burst_transform(
        key, hw, cfg.downsample_factor, tparams, is_reference=True)

    oth_keys = jax.random.split(key, cfg.burst_size - 1)
    oth_tmats = jax.vmap(
        lambda k: augment.sample_burst_transform(
            k, hw, cfg.downsample_factor, tparams, is_reference=False)
    )(oth_keys)

    tmats = jnp.concatenate([ref_tmat[None], oth_tmats], axis=0)

    # Fused path with pure translation/rotation transforms: the bilinear
    # sampling runs in the gather-free Pallas band kernel (one batched
    # call over frames; ops/resample_pallas.py — the XLA gather
    # formulation is ~9 cycles/index and dominated the train step). Flow
    # grids stay exact XLA arithmetic either way.
    rotation_only = (cfg.max_shear == 0.0 and cfg.max_scale == 0.0
                     and cfg.max_ar_factor == 0.0)
    if cfg.fused_resample and rotation_only:
        from dbsr_tpu.ops.resample_pallas import affine_resample

        H, W = image.shape[-3], image.shape[-2]
        b = cfg.border_crop
        d = cfg.downsample_factor
        out_hw = ((H - 2 * b) // d, (W - 2 * b) // d)
        invs = jax.vmap(interp.invert_2x3)(tmats)            # [N, 2, 3]
        lr = affine_resample(image, invs, out_hw, d, b,
                             max_rotation_deg=max(cfg.max_rotation, 0.1))
        q = interp.base_grid(*out_hw)
        fine = (q + 0.5) * d - 0.5 + b
        pos_inv = interp.apply_affine_to_points(invs, fine) / d
    elif rotation_only:
        # STRICT two-stage chain (reference parity: full-res warp ->
        # border crop -> x4 bilinear resize), with the full-res warp in
        # the same band kernel at d=1 (HIGHEST precision = exact f32,
        # identical samples to warp_affine; the XLA gather ran ~850 ms of
        # a B=16 step). Falls back to gathers automatically off-TPU.
        from dbsr_tpu.ops.resample_pallas import affine_resample

        H, W = image.shape[-3], image.shape[-2]
        b = cfg.border_crop
        d = cfg.downsample_factor
        out_hw = ((H - 2 * b) // d, (W - 2 * b) // d)
        invs = jax.vmap(interp.invert_2x3)(tmats)
        warped = affine_resample(
            image, invs, (H, W), 1, 0,
            max_rotation_deg=max(cfg.max_rotation, 0.1),
            precision="highest")
        grid = interp.base_grid(H, W)
        pos_inv = interp.apply_affine_to_points(invs, grid)
        if b > 0:
            warped = warped[:, b:-b, b:-b, :]
            pos_inv = pos_inv[:, b:-b, b:-b, :]
        lr = interp.resize_bilinear(warped, out_hw)
        pos_inv = interp.resize_bilinear(pos_inv, out_hw) / d
    else:
        lr, pos_inv = jax.vmap(lambda t: _lr_frame(image, t, cfg))(tmats)
    flow = pos_inv - pos_inv[:1]
    return lr, flow


def rgb2rawburst(key: jax.Array, image: jax.Array, cfg: BurstConfig):
    """Full on-device synthesis: sRGB HR crop -> noisy packed-RAW LR burst.

    Returns a dict with:
      burst      [N, h/2, w/2, 4]  noisy packed RGGB burst
      frame_gt   [H-2b, W-2b, 3]   border-cropped linear-RGB ground truth
      burst_rgb  [N, h, w, 3]      clean LR RGB burst (pre-mosaic)
      flow       [N, h, w, 2]      dense flow to the base frame
      meta       dict              ISP params for re-processing + noise levels

    Composition matches reference `rgb2rawburst`
    (`synthetic_burst_generation.py:23-102`) + the GT border crop of
    `SyntheticBurstProcessing` (`data/processing.py:112-115`).
    """
    k_isp, k_burst, k_noiselvl, k_noise = jax.random.split(key, 4)

    linear, meta = invert_isp(k_isp, image, cfg)
    burst_rgb, flow = single2lrburst(k_burst, linear, cfg)
    burst = camera.mosaic(burst_rgb)

    if cfg.add_noise:
        shot, read = camera.random_noise_levels(k_noiselvl)
        burst = camera.add_noise(k_noise, burst, shot, read)
    else:
        shot = jnp.float32(0.0)
        read = jnp.float32(0.0)
    burst = jnp.clip(burst, 0.0, 1.0)

    b = cfg.border_crop
    frame_gt = linear[..., b:-b, b:-b, :] if b > 0 else linear

    meta = dict(meta)
    meta["shot_noise_level"] = shot
    meta["read_noise_level"] = read
    return {
        "burst": burst,
        "frame_gt": frame_gt,
        "burst_rgb": burst_rgb,
        "flow": flow,
        "meta": meta,
    }


@partial(jax.jit, static_argnums=(2,))
def synthesize_batch(key: jax.Array, hr_crops: jax.Array, cfg: BurstConfig):
    """vmapped batch synthesis: ``hr_crops`` ``[B, H+2b, W+2b, 3]`` ->
    batched burst sample dict. This is the device-side half of the data
    pipeline; hosts feed raw RGB crops, everything else happens here."""
    keys = jax.random.split(key, hr_crops.shape[0])
    return jax.vmap(lambda k, im: rgb2rawburst(k, im, cfg))(keys, hr_crops)
