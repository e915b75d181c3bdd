"""Pallas warp kernel: interpret-mode parity with the gather warp +
gradient path."""

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.ops import interp
from dbsr_tpu.ops.warp_pallas import _warp_pallas_impl, warp_auto, warp_pallas


def test_interpret_matches_gather_warp():
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))
    flow = jnp.asarray((rng.rand(2, 8, 8, 2) * 6 - 3).astype(np.float32))
    out_p = _warp_pallas_impl(feat, flow, interpret=True)
    out_x = interp.warp(feat, flow)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5)


def test_interpret_zero_flow_identity():
    feat = jnp.asarray(np.random.RandomState(1).rand(1, 4, 4, 8).astype(
        np.float32))
    out = _warp_pallas_impl(feat, jnp.zeros((1, 4, 4, 2)), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat), atol=1e-6)


def test_interpret_out_of_range_zeros():
    feat = jnp.ones((1, 4, 4, 8))
    flow = jnp.full((1, 4, 4, 2), 10.0)  # everything samples out of range
    out = _warp_pallas_impl(feat, flow, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_pallas_backward_matches_autodiff():
    """The Pallas backward kernels (transposed / derivative one-hot
    matmuls) must equal the autodiff VJP of the gather warp exactly
    (including border clipping and zero-masking)."""
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))
    flow = jnp.asarray((rng.rand(2, 8, 8, 2) * 6 - 3).astype(np.float32))
    g = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))

    _, vjp_ref = jax.vjp(interp.warp, feat, flow)
    df_ref, dfl_ref = vjp_ref(g)

    from dbsr_tpu.ops.warp_pallas import _warp_bwd_pallas
    df, dfl = _warp_bwd_pallas(feat, flow, g, interpret=True)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfl), np.asarray(dfl_ref),
                               atol=1e-4)


def test_pallas_backward_integer_flow_boundary():
    """Integer flows put samples exactly on pixels/borders — the
    piecewise-constant clip/mask gradients must still match autodiff."""
    feat = jnp.asarray(np.random.RandomState(3).rand(1, 6, 6, 8).astype(
        np.float32))
    flow = jnp.zeros((1, 6, 6, 2)).at[..., 0].set(2.0).at[..., 1].set(-1.0)
    g = jnp.ones((1, 6, 6, 8))
    _, vjp_ref = jax.vjp(interp.warp, feat, flow)
    df_ref, dfl_ref = vjp_ref(g)
    from dbsr_tpu.ops.warp_pallas import _warp_bwd_pallas
    df, dfl = _warp_bwd_pallas(feat, flow, g, interpret=True)
    np.testing.assert_allclose(np.asarray(df), np.asarray(df_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dfl), np.asarray(dfl_ref),
                               atol=1e-5)


def test_warp_auto_cpu_falls_back():
    feat = jnp.zeros((1, 4, 4, 256))
    flow = jnp.zeros((1, 4, 4, 2))
    out = warp_auto(feat, flow)  # CPU backend -> gather path
    assert out.shape == feat.shape
