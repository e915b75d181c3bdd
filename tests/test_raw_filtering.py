"""Tests for RAW packing round-trips and Gaussian filtering."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dbsr_tpu.ops import filtering, raw


def test_pack_flatten_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).rand(8, 10).astype(np.float32))
    packed = raw.pack_raw_image(x)
    assert packed.shape == (4, 5, 4)
    back = raw.flatten_raw_image(packed)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_pack_positions():
    x = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
    p = raw.pack_raw_image(x)
    assert float(p[0, 0, 0]) == 0.0   # (0,0)
    assert float(p[0, 0, 1]) == 1.0   # (0,1)
    assert float(p[0, 0, 2]) == 4.0   # (1,0)
    assert float(p[0, 0, 3]) == 5.0   # (1,1)


def test_bayer_crop_to_rggb_shapes():
    x = jnp.ones((8, 8))
    assert raw.bayer_crop_to_rggb(x, "rggb").shape == (8, 8)
    assert raw.bayer_crop_to_rggb(x, "grbg").shape == (8, 6)
    assert raw.bayer_crop_to_rggb(x, "gbrg").shape == (6, 8)
    assert raw.bayer_crop_to_rggb(x, "bggr").shape == (6, 6)


def test_gauss_kernel_normalized():
    k, ksz = filtering.get_gaussian_kernel(sd=1.5)
    assert ksz == 7
    np.testing.assert_allclose(float(k.sum()), 1.0, rtol=1e-6)
    # symmetric
    np.testing.assert_allclose(np.asarray(k), np.asarray(k)[::-1, ::-1],
                               atol=1e-7)


def test_apply_kernel_matches_torch_reflect_conv():
    im = np.random.RandomState(1).rand(2, 12, 12, 3).astype(np.float32)
    k, ksz = filtering.get_gaussian_kernel(sd=1.0)
    out = filtering.apply_kernel(jnp.asarray(im), k)

    t = torch.from_numpy(im).permute(0, 3, 1, 2).reshape(-1, 1, 12, 12)
    pad = ksz // 2
    t = F.pad(t, [pad] * 4, mode="reflect")
    kern = torch.from_numpy(np.asarray(k))[None, None].float()
    expected = F.conv2d(t, kern).reshape(2, 3, 12, 12).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), expected.numpy(), atol=1e-5)


def test_gauss_2d_separable():
    g = filtering.gauss_2d(5, 1.0, (0.0, 0.0), density=True)[0]
    g1 = filtering.gauss_1d(5, 1.0, 0.0, density=True)[0]
    np.testing.assert_allclose(np.asarray(g),
                               np.outer(np.asarray(g1), np.asarray(g1)),
                               rtol=1e-6)
