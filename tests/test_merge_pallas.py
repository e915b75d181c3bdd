"""Interpret-mode parity of the fused softmax-merge kernel vs the XLA
oracle (compiled-TPU parity is covered by util_scripts/tpu_parity_check.py).
Reference semantics: ``models/dbsr/merging.py:117-124``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbsr_tpu.ops.merge_pallas import (_merge_bwd_impl, _merge_fwd_impl,
                                       fused_softmax_merge_xla, merge_auto)


def _inputs(dtype, B=2, N=5, H=16, W=8, C=256, seed=0):
    kf, kl = jax.random.split(jax.random.key(seed))
    feat = jax.random.normal(kf, (B, N, H, W, C), jnp.float32)
    logits = 3.0 * jax.random.normal(kl, (B, N, H, W, C), jnp.float32)
    return feat.astype(dtype), logits.astype(dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fwd_matches_oracle(dtype):
    feat, logits = _inputs(dtype)
    got = _merge_fwd_impl(feat, logits, interpret=True)
    want = fused_softmax_merge_xla(feat, logits)
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.float32(got), np.float32(want),
                               atol=tol, rtol=tol)


def test_bwd_matches_oracle_vjp():
    feat, logits = _inputs(jnp.float32)
    g = jax.random.normal(jax.random.key(7), feat.shape[:1] + feat.shape[2:],
                          jnp.float32)
    _, vjp = jax.vjp(fused_softmax_merge_xla, feat, logits)
    want_df, want_dl = vjp(g)
    got_df, got_dl = _merge_bwd_impl(feat, logits, g, interpret=True)
    np.testing.assert_allclose(np.float32(got_df), np.float32(want_df),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.float32(got_dl), np.float32(want_dl),
                               atol=1e-5, rtol=1e-5)


def test_merge_auto_cpu_fallback_and_grads():
    # On the CPU test backend merge_auto must take the XLA path and be
    # differentiable end to end.
    feat, logits = _inputs(jnp.float32, B=1, N=3, H=4, W=4, C=16)

    def loss(f, l):
        return merge_auto(f, l).sum()

    gf, gl = jax.grad(loss, argnums=(0, 1))(feat, logits)
    _, vjp = jax.vjp(fused_softmax_merge_xla, feat, logits)
    wf, wl = vjp(jnp.ones(feat.shape[:1] + feat.shape[2:], jnp.float32))
    np.testing.assert_allclose(np.float32(gf), np.float32(wf), atol=1e-6)
    np.testing.assert_allclose(np.float32(gl), np.float32(wl), atol=1e-6)


def test_softmax_numerics_large_logits():
    # max-subtraction must keep exp() finite for large logits
    feat, logits = _inputs(jnp.float32, B=1, N=4, H=8, W=16, C=128, seed=3)
    logits = logits * 40.0
    got = _merge_fwd_impl(feat, logits, interpret=True)
    want = fused_softmax_merge_xla(feat, logits)
    assert np.isfinite(np.float32(got)).all()
    np.testing.assert_allclose(np.float32(got), np.float32(want), atol=1e-5,
                               rtol=1e-5)
