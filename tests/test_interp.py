"""Resampling parity tests against torch (grid_sample / interpolate).

torch (CPU) serves as the behavioral oracle for the exact half-pixel /
align-corner conventions the reference relies on; these tests pin our
gather-based implementations to it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dbsr_tpu.ops import interp


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.rand(*shape).astype(np.float32)


def test_resize_bilinear_matches_torch_down():
    im = _rand((1, 24, 32, 3))
    out = interp.resize_bilinear(jnp.asarray(im), (6, 8))
    t = F.interpolate(torch.from_numpy(im).permute(0, 3, 1, 2), size=(6, 8),
                      mode="bilinear", align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_resize_bilinear_matches_torch_up():
    im = _rand((2, 12, 9, 4), seed=1)
    out = interp.resize_bilinear(jnp.asarray(im), (30, 21))
    t = F.interpolate(torch.from_numpy(im).permute(0, 3, 1, 2), size=(30, 21),
                      mode="bilinear", align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    im = _rand((2, 10, 14, 3), seed=2)
    grid = (np.random.RandomState(3).rand(2, 7, 9, 2) * 2.4 - 1.2).astype(
        np.float32)
    out = interp.grid_sample(jnp.asarray(im), jnp.asarray(grid),
                             padding_mode=padding_mode,
                             align_corners=align_corners)
    t = F.grid_sample(torch.from_numpy(im).permute(0, 3, 1, 2),
                      torch.from_numpy(grid), mode="bilinear",
                      padding_mode=padding_mode, align_corners=align_corners)
    np.testing.assert_allclose(
        np.asarray(out), t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_warp_matches_reference_semantics():
    """Our warp == torch pipeline of the reference models/layers/warp.py."""
    im = _rand((2, 12, 16, 5), seed=4)
    flow = (np.random.RandomState(5).rand(2, 12, 16, 2) * 6 - 3).astype(
        np.float32)
    out = interp.warp(jnp.asarray(im), jnp.asarray(flow))

    # reference-equivalent torch computation (pixel-centered grid + flow,
    # normalized, grid_sample align_corners=False, zeros padding)
    feat = torch.from_numpy(im).permute(0, 3, 1, 2)
    fl = torch.from_numpy(flow).permute(0, 3, 1, 2)
    B, C, H, W = feat.shape
    rowv, colv = torch.meshgrid(torch.arange(0.5, H + 0.5),
                                torch.arange(0.5, W + 0.5), indexing="ij")
    grid = torch.stack((colv, rowv), dim=0)[None].float() + fl
    gx = 2.0 * grid[:, 0] / W - 1.0
    gy = 2.0 * grid[:, 1] / H - 1.0
    gn = torch.stack((gx, gy), dim=-1)
    expected = F.grid_sample(feat, gn, mode="bilinear", padding_mode="zeros",
                             align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), expected.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_backwarp_matches_reference_semantics():
    """Our backwarp == the PWC-Net backwarp incl. flow scaling + mask."""
    im = _rand((2, 8, 12, 3), seed=6)
    flow = (np.random.RandomState(7).rand(2, 8, 12, 2) * 4 - 2).astype(
        np.float32)
    out = interp.backwarp(jnp.asarray(im), jnp.asarray(flow))

    ten_in = torch.from_numpy(im).permute(0, 3, 1, 2)
    ten_flow = torch.from_numpy(flow).permute(0, 3, 1, 2)
    H, W = ten_flow.shape[2], ten_flow.shape[3]
    hor = torch.linspace(-1.0 + 1.0 / W, 1.0 - 1.0 / W, W).view(
        1, 1, 1, -1).expand(-1, -1, H, -1)
    ver = torch.linspace(-1.0 + 1.0 / H, 1.0 - 1.0 / H, H).view(
        1, 1, -1, 1).expand(-1, -1, -1, W)
    grid = torch.cat([hor, ver], 1)
    fl = torch.cat([ten_flow[:, 0:1] / ((W - 1.0) / 2.0),
                    ten_flow[:, 1:2] / ((H - 1.0) / 2.0)], 1)
    ones = ten_flow.new_ones(ten_flow.shape[0], 1, H, W)
    inp = torch.cat([ten_in, ones], 1)
    sampled = F.grid_sample(inp, (grid + fl).permute(0, 2, 3, 1),
                            mode="bilinear", padding_mode="zeros",
                            align_corners=False)
    mask = sampled[:, -1:]
    mask = (mask > 0.999).float()
    expected = sampled[:, :-1] * mask
    np.testing.assert_allclose(
        np.asarray(out), expected.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_warp_zero_flow_is_identity():
    im = _rand((1, 9, 9, 2), seed=8)
    out = interp.warp(jnp.asarray(im), jnp.zeros((1, 9, 9, 2)))
    np.testing.assert_allclose(np.asarray(out), im, atol=1e-6)


def test_warp_integer_translation():
    im = _rand((1, 8, 8, 1), seed=9)
    flow = jnp.ones((1, 8, 8, 2)) * jnp.array([2.0, 0.0])
    out = np.asarray(interp.warp(jnp.asarray(im), flow))
    # out[y, x] = im[y, x+2]
    np.testing.assert_allclose(out[0, :, :6, 0], im[0, :, 2:, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, :, 6:, 0], 0.0, atol=1e-6)


def test_warp_affine_identity():
    im = _rand((5, 7, 3), seed=10)
    tmat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    out = interp.warp_affine(jnp.asarray(im), tmat)
    np.testing.assert_allclose(np.asarray(out), im, atol=1e-6)


def test_warp_affine_translation():
    """tmat maps src->dst: translation by (+1, 0) moves content right."""
    im = np.zeros((5, 5, 1), np.float32)
    im[2, 2, 0] = 1.0
    tmat = jnp.array([[1.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    out = np.asarray(interp.warp_affine(jnp.asarray(im), tmat))
    assert out[2, 3, 0] == pytest.approx(1.0, abs=1e-6)
    assert out[2, 2, 0] == pytest.approx(0.0, abs=1e-6)


def test_warp_affine_matches_torch_affine_grid():
    """Cross-check a rotation warp against torch affine_grid/grid_sample.

    torch affine_grid(theta, align_corners=False) maps normalized dst coords
    through theta to normalized src coords. Build theta from our inverse
    matrix expressed in normalized coordinates.
    """
    im = _rand((1, 16, 16, 2), seed=11)
    from dbsr_tpu.ops.augment import get_tmat
    tmat = get_tmat((16, 16), (1.5, -0.5), 10.0, (0.0, 0.0), (1.0, 1.0))
    out = interp.warp_affine(jnp.asarray(im[0]), tmat)

    inv = np.asarray(interp.invert_2x3(tmat))
    H = W = 16
    # normalized coord n related to pixel coord p: p = ((n+1)*S-1)/2
    # => n = (2p+1)/S - 1. Compose: n_src = A n_dst + b.
    S = np.diag([2.0 / W, 2.0 / H])
    Sinv = np.diag([W / 2.0, H / 2.0])
    M = inv[:, :2]
    t = inv[:, 2]
    A = S @ M @ Sinv
    b = S @ (M @ np.array([(W - 1) / 2.0, (H - 1) / 2.0]) + t) - np.array(
        [(W - 1) / W, (H - 1) / H])
    theta = torch.tensor(
        np.concatenate([A, b[:, None]], axis=1)[None], dtype=torch.float32)
    grid = F.affine_grid(theta, (1, 2, H, W), align_corners=False)
    expected = F.grid_sample(torch.from_numpy(im).permute(0, 3, 1, 2), grid,
                             mode="bilinear", padding_mode="zeros",
                             align_corners=False)
    np.testing.assert_allclose(
        np.asarray(out), expected.permute(0, 2, 3, 1).numpy()[0], atol=1e-4)


def test_sample_bilinear_grad_finite():
    im = jnp.asarray(_rand((1, 8, 8, 2), seed=12))
    flow = jnp.zeros((1, 8, 8, 2)) + 0.3

    def loss(f):
        return interp.warp(im, f).sum()

    g = jax.grad(loss)(flow)
    assert np.isfinite(np.asarray(g)).all()


def test_backwarp_matmul_matches_gather_f32():
    """Dense hat-matrix backwarp == gather backwarp exactly at f32
    (HIGHEST-precision matmuls), including the validity mask, at every
    PWC decoder-level shape of the DBSR training geometry."""
    key = jax.random.key(3)
    for (h, w, c) in [(32, 32, 32), (16, 16, 64), (8, 8, 96), (4, 4, 128)]:
        k1, k2, key = jax.random.split(key, 3)
        im = jax.random.normal(k1, (3, h, w, c), jnp.float32)
        # flows large enough to push samples out of frame (mask active)
        flow = jax.random.normal(k2, (3, h, w, 2), jnp.float32) * (h / 4)
        want = interp.backwarp(im, flow)
        got = interp.backwarp_matmul(im, flow)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_backwarp_matmul_grad_matches_gather():
    key = jax.random.key(5)
    im = jax.random.normal(jax.random.fold_in(key, 0), (2, 8, 8, 16),
                           jnp.float32)
    flow = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 2),
                             jnp.float32) * 1.7

    def loss(fn, f, x):
        return (fn(x, f) ** 2).sum()

    g_ref = jax.grad(lambda f, x: loss(interp.backwarp, f, x),
                     argnums=(0, 1))(flow, im)
    g_new = jax.grad(lambda f, x: loss(interp.backwarp_matmul, f, x),
                     argnums=(0, 1))(flow, im)
    for a, b in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_backwarp_auto_dispatches_by_size_and_backend():
    """Off-TPU the auto path must be the gather formulation regardless of
    size (exact equality); the matmul path is still importable/correct."""
    im = jax.random.normal(jax.random.key(7), (1, 6, 6, 4), jnp.float32)
    flow = jnp.ones((1, 6, 6, 2), jnp.float32) * 0.3
    np.testing.assert_array_equal(np.asarray(interp.backwarp_auto(im, flow)),
                                  np.asarray(interp.backwarp(im, flow)))


def test_backwarp_matmul_dflow_matches_gather_at_exact_kinks():
    """At exact-integer sample coordinates (bilinear kinks) the dflow
    must follow the gather/torch floor-tap convention (one-sided
    difference im[i+1]-im[i]), not the hat |.|-subgradient (0). bf16
    flows land on kinks with ~1% rate (e.g. flow 1.875 -> offset exactly
    2.0 after the W/(W-1) scale), which made the two conventions diverge
    by 34% of grad scale at isolated pixels — on-chip parity catch,
    round 3."""
    H = W = 16
    im = jax.random.normal(jax.random.key(2), (1, H, W, 8), jnp.float32)
    # flow whose effective displacement flow * W/(W-1) is EXACTLY integer
    flow = jnp.full((1, H, W, 2), 1.875, jnp.float32)  # 1.875*16/15 == 2
    cot = jax.random.normal(jax.random.key(3), (1, H, W, 8), jnp.float32)

    def loss(fn, f, x):
        return (fn(x, f) * cot).sum()

    g_ref = jax.grad(lambda f, x: loss(interp.backwarp, f, x))(flow, im)
    g_new = jax.grad(lambda f, x: loss(interp.backwarp_matmul, f, x))(
        flow, im)
    assert float(jnp.abs(g_ref).max()) > 0.1  # kink grads are non-zero
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
