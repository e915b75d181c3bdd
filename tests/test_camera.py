"""Unit tests for the camera ISP ops (closed-form / statistical checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbsr_tpu.ops import camera


def test_smoothstep_roundtrip():
    x = jnp.linspace(0.01, 0.99, 101)
    y = camera.apply_smoothstep(camera.invert_smoothstep(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_gamma_roundtrip():
    x = jnp.linspace(0.01, 1.0, 50)
    y = camera.gamma_compression(camera.gamma_expansion(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5)


def test_random_ccm_rows_sum_to_one():
    for seed in range(5):
        ccm = camera.random_ccm(jax.random.key(seed))
        np.testing.assert_allclose(np.asarray(ccm.sum(axis=-1)), 1.0, atol=1e-6)


def test_apply_ccm_matches_matmul():
    key = jax.random.key(0)
    im = jax.random.uniform(key, (5, 7, 3))
    ccm = camera.random_ccm(jax.random.key(1))
    out = camera.apply_ccm(im, ccm)
    expected = np.einsum("ij,hwj->hwi", np.asarray(ccm), np.asarray(im))
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_apply_ccm_batched():
    im = jax.random.uniform(jax.random.key(0), (4, 5, 7, 3))
    ccms = jnp.stack([camera.random_ccm(jax.random.key(i)) for i in range(4)])
    out = camera.apply_ccm(im, ccms)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(out[b]), np.asarray(camera.apply_ccm(im[b], ccms[b])),
            rtol=1e-5)


def test_gains_invert_roughly():
    """safe_invert_gains then apply_gains is close to identity away from
    saturation."""
    im = jax.random.uniform(jax.random.key(0), (16, 16, 3), minval=0.1,
                            maxval=0.6)
    g = (1.1, 2.0, 1.7)
    inv = camera.safe_invert_gains(im, *g)
    back = camera.apply_gains(inv, *g)
    np.testing.assert_allclose(np.asarray(back), np.asarray(im), atol=1e-5)


def test_safe_invert_gains_protects_highlights():
    white = jnp.ones((4, 4, 3))
    out = camera.safe_invert_gains(white, 1.0, 2.0, 1.8)
    # mask==1 at white, so gains become max(1, gain)=1 for the attenuating
    # channels -> white stays white
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_mosaic_rggb_layout():
    H, W = 6, 8
    im = jnp.stack(
        [jnp.full((H, W), 1.0), jnp.full((H, W), 2.0), jnp.full((H, W), 3.0)],
        axis=-1)
    out = camera.mosaic(im, "rggb")
    assert out.shape == (H // 2, W // 2, 4)
    np.testing.assert_allclose(np.asarray(out[..., 0]), 1.0)
    np.testing.assert_allclose(np.asarray(out[..., 1]), 2.0)
    np.testing.assert_allclose(np.asarray(out[..., 2]), 2.0)
    np.testing.assert_allclose(np.asarray(out[..., 3]), 3.0)


def test_mosaic_subsamples_correct_positions():
    H, W = 4, 4
    r = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    im = jnp.stack([r, r + 100, r + 200], axis=-1)
    out = camera.mosaic(im, "rggb")
    # R at (0,0): values r[0::2,0::2]
    np.testing.assert_allclose(np.asarray(out[..., 0]),
                               np.asarray(r[0::2, 0::2]))
    np.testing.assert_allclose(np.asarray(out[..., 1]),
                               np.asarray(r[0::2, 1::2] + 100))
    np.testing.assert_allclose(np.asarray(out[..., 2]),
                               np.asarray(r[1::2, 0::2] + 100))
    np.testing.assert_allclose(np.asarray(out[..., 3]),
                               np.asarray(r[1::2, 1::2] + 200))


def test_noise_statistics():
    key = jax.random.key(42)
    im = jnp.full((256, 256, 4), 0.5)
    shot, read = 0.01, 0.0005
    noisy = camera.add_noise(key, im, shot, read)
    resid = np.asarray(noisy - im)
    expected_var = 0.5 * shot + read
    assert abs(resid.var() - expected_var) / expected_var < 0.05
    assert abs(resid.mean()) < 1e-3


def test_random_noise_levels_in_range():
    for seed in range(10):
        shot, read = camera.random_noise_levels(jax.random.key(seed))
        assert 0.0001 <= float(shot) <= 0.012


def test_demosaic_naive():
    packed = jax.random.uniform(jax.random.key(0), (8, 8, 4))
    rgb = camera.demosaic_naive(packed)
    np.testing.assert_allclose(np.asarray(rgb[..., 0]), np.asarray(packed[..., 0]))
    np.testing.assert_allclose(
        np.asarray(rgb[..., 1]),
        np.asarray(0.5 * (packed[..., 1] + packed[..., 2])), rtol=1e-6)


def test_add_noise_batched_levels():
    key = jax.random.key(0)
    im = jnp.full((2, 8, 8, 4), 0.5)
    shot = jnp.array([0.01, 0.001])
    read = jnp.array([0.0005, 0.00005])
    out = camera.add_noise(key, im, shot, read)
    assert out.shape == im.shape
