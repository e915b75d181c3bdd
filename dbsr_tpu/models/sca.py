"""Spatial-and-color alignment for real-burst supervision (jittable).

Re-design of reference ``models/loss/spatial_color_alignment.py``: BurstSR
ground truth (DSLR) is neither pixel- nor color-registered with the
prediction (smartphone burst), so before any loss/metric the prediction is
(1) warped to the GT with PWC-Net flow (no-grad, max-normalized inputs),
and (2) color-matched by a per-image 3x3 least-squares transform estimated
between the Gaussian-smoothed warped base RAW frame and the downsampled GT;
pixels whose color-fit error exceeds 20/255 are masked invalid.

Everything is channels-last and batched; the least-squares solve uses
``jnp.linalg.lstsq`` vmapped over the batch (replacing the deprecated
``torch.lstsq`` loop, reference ``spatial_color_alignment.py:40-42``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from dbsr_tpu.ops.filtering import apply_kernel, get_gaussian_kernel
from dbsr_tpu.ops.interp import resize_bilinear, warp


def match_colors(im_ref: jax.Array, im_q: jax.Array, im_test: jax.Array,
                 gauss_kernel: jax.Array,
                 err_thresh: float = 20.0) -> Tuple[jax.Array, jax.Array]:
    """Estimate a 3x3 color transform im_q -> im_ref and apply to im_test.

    Matches reference ``match_colors`` (``spatial_color_alignment.py:23-68``):
    Gaussian smoothing, 5-px interior crop, per-image least squares,
    validity = fit error < ``err_thresh``/255, mask upsampled to
    ``im_test`` resolution with a 0.9 threshold.

    im_ref / im_q: ``[B, h, w, 3]``; im_test: ``[B, H, W, 3]``.
    Returns (im_test_transformed ``[B, H, W, 3]``, valid ``[B, H, W, 1]``).
    """
    bi = 5
    ref_s = apply_kernel(im_ref, gauss_kernel)[:, bi:-bi, bi:-bi]
    q_s = apply_kernel(im_q, gauss_kernel)[:, bi:-bi, bi:-bi]

    B = ref_s.shape[0]
    ref_f = ref_s.reshape(B, -1, 3)
    q_f = q_s.reshape(B, -1, 3)

    def solve(a, b):
        # min ||a @ c - b|| via normal equations: c = (A^T A + eps)^-1 A^T B.
        # The system is 3x3 and well-conditioned for smoothed image stats;
        # this avoids jnp.linalg.lstsq's SVD, which lowers poorly on TPU.
        hi = jax.lax.Precision.HIGHEST  # exact f32 on the TPU MXU
        ata = jnp.matmul(a.T, a, precision=hi) \
            + 1e-6 * jnp.eye(3, dtype=a.dtype)
        atb = jnp.matmul(a.T, b, precision=hi)
        return jnp.linalg.solve(ata, atb)

    c_mat = jax.vmap(solve)(q_f, ref_f)  # [B, 3, 3]

    hi = jax.lax.Precision.HIGHEST
    q_conv = jnp.einsum("bnc,bcd->bnd", q_f, c_mat,
                        precision=hi).reshape(ref_s.shape)
    err = jnp.linalg.norm((q_conv - ref_s) * 255.0, axis=-1)  # [B, h', w']
    valid = (err < err_thresh).astype(jnp.float32)[..., None]

    pad = (im_q.shape[-2] - valid.shape[-2]) // 2
    valid = jnp.pad(valid, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    valid = resize_bilinear(valid, im_test.shape[-3:-1])
    valid = valid > 0.9

    test_f = im_test.reshape(B, -1, 3)
    test_conv = jnp.einsum("bnc,bcd->bnd", test_f, c_mat,
                           precision=jax.lax.Precision.HIGHEST).reshape(
        im_test.shape)
    return test_conv, valid


def make_aligned_l2(alignment_apply: Callable, sr_factor: int = 4,
                    boundary_ignore: int = None) -> Callable:
    """AlignedL2 (reference ``image_quality_v2.py:166-191``): SCA the
    prediction to the GT, then validity-masked MSE with optional boundary
    crop. Returns ``fn(pred, gt, burst) -> scalar``."""
    sca = make_sca(alignment_apply, sr_factor)

    def aligned_l2(pred, gt, burst):
        from dbsr_tpu.ops.metrics import pixel_error
        pred_m, valid = sca(pred, gt, burst)
        return pixel_error(pred_m, gt, "l2", boundary_ignore,
                           valid.astype(jnp.float32))

    return aligned_l2


def make_sca(alignment_apply: Callable, sr_factor: int = 4,
             gauss_sd: float = 1.5) -> Callable:
    """Build the SCA function ``(pred, gt, burst) -> (pred_warped_m, valid)``.

    ``alignment_apply(source, target) -> flow`` is a bound PWC-Net apply
    (e.g. ``lambda s, t: pwc.apply(pwc_params, s, t)``); flow is computed
    under ``stop_gradient`` on max-normalized inputs (reference
    ``spatial_color_alignment.py:87-90``).
    """
    gauss_kernel, _ = get_gaussian_kernel(gauss_sd)

    def sca(pred: jax.Array, gt: jax.Array,
            burst: jax.Array) -> Tuple[jax.Array, jax.Array]:
        flow = alignment_apply(pred / (pred.max() + 1e-6),
                               gt / (gt.max() + 1e-6))
        flow = jax.lax.stop_gradient(flow)

        pred_warped = warp(pred, flow)

        ds = 1.0 / (2.0 * sr_factor)
        h, w = gt.shape[-3], gt.shape[-2]
        ds_hw = (int(h * ds), int(w * ds))
        flow_ds = resize_bilinear(flow, ds_hw) * ds

        # base RAW frame as pseudo-RGB channels (R, G1, B) — reference
        # `spatial_color_alignment.py:100` uses channels [0, 1, 3]
        burst_0 = burst[:, 0][..., jnp.array([0, 1, 3])]
        burst_0_warped = warp(burst_0, flow_ds)
        gt_ds = resize_bilinear(gt, ds_hw)

        return match_colors(gt_ds, burst_0_warped, pred_warped, gauss_kernel)

    return sca
