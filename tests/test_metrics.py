"""Metric tests: closed forms and torch-based SSIM oracle."""

import math

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dbsr_tpu.ops import metrics


def _rand(shape, seed=0):
    return np.random.RandomState(seed).rand(*shape).astype(np.float32)


def test_pixel_error_l1_l2():
    pred = jnp.asarray(_rand((2, 8, 8, 3)))
    gt = jnp.asarray(_rand((2, 8, 8, 3), seed=1))
    l1 = metrics.pixel_error(pred, gt, "l1")
    l2 = metrics.pixel_error(pred, gt, "l2")
    d = np.asarray(pred) - np.asarray(gt)
    np.testing.assert_allclose(np.asarray(l1), np.abs(d).mean(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(l2), (d**2).mean(), rtol=1e-5)


def test_pixel_error_boundary_ignore():
    pred = jnp.zeros((1, 10, 10, 1))
    gt = jnp.zeros((1, 10, 10, 1)).at[0, 0, 0, 0].set(5.0)
    # error only at the boundary -> ignored
    err = metrics.pixel_error(pred, gt, "l1", boundary_ignore=2)
    assert float(err) == 0.0


def test_pixel_error_valid_mask_elem_ratio():
    """Mask broadcast over channels uses the elem-ratio correction."""
    pred = jnp.ones((1, 4, 4, 3))
    gt = jnp.zeros((1, 4, 4, 3))
    valid = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
    err = metrics.pixel_error(pred, gt, "l1", valid=valid)
    # all errors are 1; masked mean should still be 1
    np.testing.assert_allclose(float(err), 1.0, rtol=1e-5)


def test_psnr_closed_form():
    pred = jnp.zeros((1, 8, 8, 1))
    gt = jnp.full((1, 8, 8, 1), 0.1)
    expected = 20 * math.log10(1.0) - 10 * math.log10(0.01)
    np.testing.assert_allclose(float(metrics.psnr(pred, gt)), expected,
                               rtol=1e-5)


def test_psnr_is_per_sample_mean():
    pred = jnp.zeros((2, 8, 8, 1))
    gt = jnp.stack([jnp.full((8, 8, 1), 0.1), jnp.full((8, 8, 1), 0.2)])
    p1 = -10 * math.log10(0.01)
    p2 = -10 * math.log10(0.04)
    np.testing.assert_allclose(float(metrics.psnr(pred, gt)),
                               (p1 + p2) / 2, rtol=1e-5)


def test_psnr_filters_nonfinite():
    """A perfect sample (infinite PSNR) is dropped from the average."""
    pred = jnp.stack([jnp.zeros((8, 8, 1)), jnp.zeros((8, 8, 1))])
    gt = jnp.stack([jnp.zeros((8, 8, 1)), jnp.full((8, 8, 1), 0.1)])
    np.testing.assert_allclose(float(metrics.psnr(pred, gt)),
                               -10 * math.log10(0.01), rtol=1e-5)


def _torch_ssim_oracle(img1, img2, window_size=11, L=1.0, spatial=False):
    """Independent SSIM oracle (standard Wang et al. formulation, Gaussian
    window sigma 1.5, VALID padding, per-channel)."""
    coords = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(coords**2) / (2 * 1.5**2))
    g = (g / g.sum()).float()
    window = (g[:, None] @ g[None, :])[None, None]
    C = img1.shape[1]
    window = window.expand(C, 1, -1, -1)

    mu1 = F.conv2d(img1, window, groups=C)
    mu2 = F.conv2d(img2, window, groups=C)
    s11 = F.conv2d(img1 * img1, window, groups=C) - mu1**2
    s22 = F.conv2d(img2 * img2, window, groups=C) - mu2**2
    s12 = F.conv2d(img1 * img2, window, groups=C) - mu1 * mu2
    C1, C2 = (0.01 * L) ** 2, (0.03 * L) ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1**2 + mu2**2 + C1) * (s11 + s22 + C2))
    return m if spatial else m.mean()


def test_ssim_matches_torch_oracle():
    a = _rand((2, 20, 20, 3), seed=3)
    b = np.clip(a + _rand((2, 20, 20, 3), seed=4) * 0.1, 0, 1).astype(
        np.float32)
    ours = metrics.ssim(jnp.asarray(a), jnp.asarray(b))
    oracle = _torch_ssim_oracle(torch.from_numpy(a).permute(0, 3, 1, 2),
                                torch.from_numpy(b).permute(0, 3, 1, 2))
    np.testing.assert_allclose(float(ours), float(oracle), atol=1e-5)


def test_ssim_identical_images():
    a = jnp.asarray(_rand((1, 16, 16, 3), seed=5))
    np.testing.assert_allclose(float(metrics.ssim(a, a)), 1.0, atol=1e-5)


def test_ssim_metric_boundary_and_spatial_shape():
    a = jnp.asarray(_rand((1, 32, 32, 3), seed=6))
    b = jnp.asarray(_rand((1, 32, 32, 3), seed=7))
    v = metrics.ssim_metric(a, b, boundary_ignore=4)
    assert -1.0 <= float(v) <= 1.0


def test_msssim_identical_is_one():
    a = jnp.asarray(_rand((1, 176, 176, 3), seed=8))
    np.testing.assert_allclose(float(metrics.msssim(a, a)), 1.0, atol=1e-4)


def test_msssim_decreases_with_noise():
    a = jnp.asarray(_rand((1, 176, 176, 3), seed=9))
    b = jnp.clip(a + jnp.asarray(_rand((1, 176, 176, 3), seed=10) - 0.5) * 0.2,
                 0, 1)
    assert float(metrics.msssim(a, b)) < float(metrics.msssim(a, a))


def test_pixel_error_l2_sqrt_masked():
    """l2_sqrt with a validity mask: per-pixel channel-norm error, masked
    mean with the elem-ratio correction (reference accepts this combination
    but its lambda crashes, image_quality_v2.py:36-38,60 — we implement the
    evident intent)."""
    pred = jnp.asarray(_rand((1, 4, 4, 3)))
    gt = jnp.asarray(_rand((1, 4, 4, 3), seed=1))
    valid = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)

    err = metrics.pixel_error(pred, gt, "l2_sqrt", valid=valid)

    d = np.asarray(pred) - np.asarray(gt)
    per_pixel = np.sqrt((d**2).sum(-1))  # [1, 4, 4]
    v = np.asarray(valid)[..., 0]
    expected = (per_pixel * v).sum() / (
        v.sum() * (per_pixel.size / v.size) + 1e-12)
    np.testing.assert_allclose(float(err), expected, rtol=1e-5)
    # full mask == unmasked mean
    full = metrics.pixel_error(pred, gt, "l2_sqrt",
                               valid=jnp.ones((1, 4, 4, 1)))
    np.testing.assert_allclose(float(full), per_pixel.mean(), rtol=1e-5)
