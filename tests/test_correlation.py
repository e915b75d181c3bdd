"""Cost-volume tests: brute-force oracle, Pallas-vs-XLA, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.ops import correlation


def _brute_force(first, second, max_disp=4):
    """Direct loop implementation of the CUDA kernel semantics."""
    B, H, W, C = first.shape
    p = max_disp
    second_p = np.pad(second, ((0, 0), (p, p), (p, p), (0, 0)))
    n = (2 * p + 1) ** 2
    out = np.zeros((B, H, W, n), np.float32)
    for c in range(n):
        dx = c % (2 * p + 1) - p
        dy = c // (2 * p + 1) - p
        for y in range(H):
            for x in range(W):
                out[:, y, x, c] = (
                    first[:, y, x, :] * second_p[:, y + dy + p, x + dx + p, :]
                ).sum(-1) / C
    return out


def test_xla_matches_brute_force():
    rng = np.random.RandomState(0)
    first = rng.rand(2, 6, 7, 5).astype(np.float32)
    second = rng.rand(2, 6, 7, 5).astype(np.float32)
    out = np.asarray(correlation.correlation_xla(
        jnp.asarray(first), jnp.asarray(second)))
    expected = _brute_force(first, second)
    # channel ordering check relies on asymmetric inputs
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_channel_order_matches_cuda_kernel():
    """Channel c encodes (dy = c//9 - 4, dx = c%9 - 4)."""
    B, H, W, C = 1, 12, 12, 3
    first = np.zeros((B, H, W, C), np.float32)
    second = np.zeros((B, H, W, C), np.float32)
    first[0, 6, 6, :] = 1.0
    second[0, 8, 5, :] = 1.0  # at (y=6+dy, x=6+dx) with dy=2, dx=-1
    out = np.array(correlation.correlation_xla(
        jnp.asarray(first), jnp.asarray(second)))
    c_expected = (2 + 4) * 9 + (-1 + 4)
    assert out[0, 6, 6, c_expected] == 1.0
    out[0, 6, 6, c_expected] = 0.0
    assert np.abs(out).max() == 0.0


def test_pallas_interpret_matches_xla():
    rng = np.random.RandomState(1)
    first = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))
    second = jnp.asarray(rng.rand(2, 8, 8, 16).astype(np.float32))
    out_p = correlation._correlation_pallas_fwd_impl(first, second,
                                                     interpret=True)
    out_x = correlation.correlation_xla(first, second)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)


def test_gradients_match_numerical():
    rng = np.random.RandomState(2)
    first = jnp.asarray(rng.rand(1, 5, 5, 3).astype(np.float32))
    second = jnp.asarray(rng.rand(1, 5, 5, 3).astype(np.float32))

    def loss(f, s):
        out = correlation.correlation_xla(f, s)
        return (out**2).sum()

    g_f, g_s = jax.grad(loss, argnums=(0, 1))(first, second)

    # numerical check on a few coordinates
    eps = 1e-3
    for (y, x, ch) in [(0, 0, 0), (2, 3, 1), (4, 4, 2)]:
        fp = first.at[0, y, x, ch].add(eps)
        fm = first.at[0, y, x, ch].add(-eps)
        num = (loss(fp, second) - loss(fm, second)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_f[0, y, x, ch]),
                                   np.asarray(num), rtol=2e-2)
        sp = second.at[0, y, x, ch].add(eps)
        sm = second.at[0, y, x, ch].add(-eps)
        num = (loss(first, sp) - loss(first, sm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g_s[0, y, x, ch]),
                                   np.asarray(num), rtol=2e-2)


def test_cost_volume_dispatch_cpu():
    first = jnp.ones((1, 4, 4, 2))
    second = jnp.ones((1, 4, 4, 2))
    out = correlation.cost_volume(first, second)
    assert out.shape == (1, 4, 4, 81)
    # center channel (no displacement) is mean over channels of 1*1 = 1
    center = correlation.NUM_OFFSETS // 2
    np.testing.assert_allclose(np.asarray(out[..., center]), 1.0)


def test_pallas_backward_kernel_interpret_matches_xla_vjp():
    """The one-pass Pallas backward (both grads) == XLA formulation's VJP
    (interpret mode; compiled parity runs on-chip via tpu_parity_check)."""
    import jax

    from dbsr_tpu.ops.correlation import (_correlation_pallas_bwd_impl,
                                          correlation_xla)

    rng = np.random.RandomState(3)
    first = jnp.asarray(rng.randn(2, 10, 12, 16).astype(np.float32))
    second = jnp.asarray(rng.randn(2, 10, 12, 16).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 10, 12, 81).astype(np.float32))

    df_p, ds_p = _correlation_pallas_bwd_impl(first, second, g,
                                              interpret=True)
    _, vjp = jax.vjp(correlation_xla, first, second)
    df_x, ds_x = vjp(g)
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ds_p), np.asarray(ds_x),
                               atol=1e-5)


def test_vmem_envelope_gate():
    """Planes above 16x16 must auto-route to the XLA formulation: the
    single-block Pallas kernels' scoped-VMEM stack exceeds v5e's 16 MB
    limit there (measured: 22.96M @ 24x24xC64, 38.05M @ 32x32xC32 — found
    live when the d=1 flow-pretrain task fed a 128-preprocessed pyramid)."""
    from dbsr_tpu.ops.correlation import fits_pallas_envelope

    assert fits_pallas_envelope((24, 16, 16, 196))
    assert fits_pallas_envelope((1, 8, 32, 64))     # plane 256
    assert not fits_pallas_envelope((24, 24, 24, 64))
    assert not fits_pallas_envelope((24, 32, 32, 32))
