"""Tests for the on-device synthetic burst generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbsr_tpu.data.synthetic import BurstConfig, rgb2rawburst, single2lrburst, synthesize_batch
from dbsr_tpu.ops import augment, interp


SMALL = BurstConfig(burst_size=4, crop_sz=(64, 64), downsample_factor=4,
                    border_crop=8, max_translation=6.0, max_rotation=1.0)


def _img(seed=0, hw=None):
    hw = hw or SMALL.pre_crop_sz
    return jnp.asarray(
        np.random.RandomState(seed).rand(hw[0], hw[1], 3).astype(np.float32))


def test_shapes():
    out = rgb2rawburst(jax.random.key(0), _img(), SMALL)
    N = SMALL.burst_size
    assert out["burst"].shape == (N, 8, 8, 4)
    assert out["frame_gt"].shape == (64, 64, 3)
    assert out["burst_rgb"].shape == (N, 16, 16, 3)
    assert out["flow"].shape == (N, 16, 16, 2)
    assert out["burst"].dtype == jnp.float32


def test_values_in_range():
    out = rgb2rawburst(jax.random.key(1), _img(1), SMALL)
    b = np.asarray(out["burst"])
    assert b.min() >= 0.0 and b.max() <= 1.0


def test_reference_frame_flow_is_zero():
    """Frame 0 is the base: its flow-to-base must be identically zero."""
    out = rgb2rawburst(jax.random.key(2), _img(2), SMALL)
    np.testing.assert_allclose(np.asarray(out["flow"][0]), 0.0, atol=1e-5)


def test_other_frames_have_nonzero_flow():
    out = rgb2rawburst(jax.random.key(3), _img(3), SMALL)
    fl = np.asarray(out["flow"][1:])
    assert np.abs(fl).max() > 0.05


def test_flow_magnitude_bounded_by_translation():
    """Flow (in LR pixels) should be ~<= max_translation/downsample + small
    rotation contribution."""
    cfg = SMALL._replace(max_rotation=0.0)
    out = rgb2rawburst(jax.random.key(4), _img(4), cfg)
    fl = np.asarray(out["flow"])
    # max_translation=6 HR px -> 1.5 LR px; reference shift adds ~0.4
    assert np.abs(fl).max() <= (6.0 / 4.0) + 0.5


def test_pure_translation_flow_matches_closed_form():
    """With rotation/shear/scale off, flow for frame i is constant
    (t_ref - t_i)/d ... verified against the synthesized transforms."""
    cfg = SMALL._replace(max_rotation=0.0, max_shear=0.0, max_scale=0.0)
    key = jax.random.key(5)
    img = _img(5)
    lr, flow = single2lrburst(key, img, cfg)
    fl = np.asarray(flow)
    # each frame's flow field must be spatially constant for pure translation
    for i in range(cfg.burst_size):
        assert fl[i].std(axis=(0, 1)).max() < 1e-4


def test_flow_warp_consistency():
    """Warping a non-reference LR frame by the NEGATED stored flow
    reproduces the reference LR frame (away from borders).

    The stored flow follows the reference convention
    (`synthetic_burst_generation.py:243-245`): flow_i = pos_inv_i -
    pos_inv_0, i.e. the difference of source-sampling positions, which is
    the negative of the warp-convention flow (ref(p) = oth(p - flow(p))).
    """
    cfg = BurstConfig(burst_size=3, crop_sz=(96, 96), downsample_factor=2,
                      border_crop=12, max_translation=8.0, max_rotation=0.5)
    img = _img(6, cfg.pre_crop_sz)
    # smooth the random image so bilinear resampling error is small
    from dbsr_tpu.ops.filtering import get_gaussian_kernel, apply_kernel
    k, _ = get_gaussian_kernel(2.0)
    img = apply_kernel(img, k)
    lr, flow = single2lrburst(jax.random.key(7), img, cfg)
    warped1 = interp.warp(lr[1], -flow[1])
    a = np.asarray(warped1)[6:-6, 6:-6]
    b = np.asarray(lr[0])[6:-6, 6:-6]
    assert np.abs(a - b).mean() < 0.01


def test_gt_is_border_cropped_linear():
    cfg = SMALL._replace(add_noise=False)
    key = jax.random.key(8)
    out = rgb2rawburst(key, _img(8), cfg)
    from dbsr_tpu.data.synthetic import invert_isp
    k_isp, _, _, _ = jax.random.split(key, 4)
    linear, _ = invert_isp(k_isp, _img(8), cfg)
    b = cfg.border_crop
    np.testing.assert_allclose(np.asarray(out["frame_gt"]),
                               np.asarray(linear[b:-b, b:-b]), atol=1e-6)


def test_no_noise_burst_is_mosaic_of_rgb():
    cfg = SMALL._replace(add_noise=False)
    out = rgb2rawburst(jax.random.key(9), _img(9), cfg)
    from dbsr_tpu.ops.camera import mosaic
    np.testing.assert_allclose(
        np.asarray(out["burst"]),
        np.clip(np.asarray(mosaic(out["burst_rgb"])), 0, 1), atol=1e-6)


def test_synthesize_batch_jits_and_batches():
    crops = jnp.stack([_img(i) for i in range(2)])
    out = synthesize_batch(jax.random.key(10), crops, SMALL)
    assert out["burst"].shape == (2, 4, 8, 8, 4)
    assert out["frame_gt"].shape == (2, 64, 64, 3)
    # different batch elements get different random params
    assert not np.allclose(np.asarray(out["meta"]["rgb_gain"][0]),
                           np.asarray(out["meta"]["rgb_gain"][1]))


def test_deterministic_given_key():
    crops = jnp.stack([_img(0)])
    a = synthesize_batch(jax.random.key(3), crops, SMALL)
    b = synthesize_batch(jax.random.key(3), crops, SMALL)
    np.testing.assert_allclose(np.asarray(a["burst"]), np.asarray(b["burst"]))


def test_fused_resample_close_to_two_stage():
    """Fused warp+downsample approximates the two-stage path (different
    resampling kernel, same geometry): flows equal to high precision,
    images close on smooth content."""
    from dbsr_tpu.ops.filtering import apply_kernel, get_gaussian_kernel
    cfg2 = SMALL._replace(add_noise=False)
    cfgf = cfg2._replace(fused_resample=True)
    img = _img(11)
    k, _ = get_gaussian_kernel(2.0)
    img = apply_kernel(img, k)
    key = jax.random.key(12)
    lr_a, flow_a = single2lrburst(key, img, cfg2)
    lr_b, flow_b = single2lrburst(key, img, cfgf)
    # flows: fused evaluates the affine exactly; two-stage resamples the
    # grid (same affine function, so interpolation is exact too)
    np.testing.assert_allclose(np.asarray(flow_a), np.asarray(flow_b),
                               atol=1e-3)
    diff = np.abs(np.asarray(lr_a) - np.asarray(lr_b))
    assert diff.mean() < 0.02


def test_fused_resample_shapes_and_ranges():
    cfgf = SMALL._replace(fused_resample=True)
    out = rgb2rawburst(jax.random.key(13), _img(13), cfgf)
    assert out["burst"].shape == (SMALL.burst_size, 8, 8, 4)
    b = np.asarray(out["burst"])
    assert b.min() >= 0.0 and b.max() <= 1.0
    np.testing.assert_allclose(np.asarray(out["flow"][0]), 0.0, atol=1e-5)
