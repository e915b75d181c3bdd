"""Interpret-mode parity of the affine band-resample kernel vs the gather
oracle (compiled-TPU parity: util_scripts/tpu_parity_check.py). Covers the
fused-synthesis geometry (x4 downsample, border crop, sub-degree rotation,
+-24 px translation) of ``data/synthetic.py:_lr_frame``."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dbsr_tpu.ops.resample_pallas import (_xla_oracle,
                                          affine_resample,
                                          affine_resample_interpret,
                                          band_rows_needed)


def _invs(n, max_rot_deg, max_trans, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        th = math.radians(rng.uniform(-max_rot_deg, max_rot_deg))
        tx, ty = rng.uniform(-max_trans, max_trans, size=2)
        c, s = math.cos(th), math.sin(th)
        out.append([[c * scale, -s, tx], [s, c * scale, ty]])
    return jnp.asarray(out, jnp.float32)


@pytest.mark.parametrize("rot,trans", [(1.0, 24.0), (0.0, 3.0)])
def test_band_kernel_matches_gather(rot, trans):
    H = W = 96  # smaller geometry, same structure (d=4, border)
    d, border = 4, 8
    out_hw = ((H - 2 * border) // d, (W - 2 * border) // d)
    image = jax.random.uniform(jax.random.key(0), (H, W, 3), jnp.float32)
    invs = _invs(5, rot, trans)
    band = band_rows_needed(max(rot, 0.1), d, out_hw[1])
    got = affine_resample_interpret(image, invs, out_hw, d, border, band)
    want = _xla_oracle(image, invs, out_hw, d, border)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_band_kernel_zero_padding_edges():
    # translations large enough to pull taps outside the image
    H = W = 64
    d, border = 2, 4
    out_hw = ((H - 2 * border) // d, (W - 2 * border) // d)
    image = jax.random.uniform(jax.random.key(1), (H, W, 3), jnp.float32)
    invs = _invs(4, 0.5, 40.0, seed=3)
    band = band_rows_needed(0.5, d, out_hw[1])
    got = affine_resample_interpret(image, invs, out_hw, d, border, band)
    want = _xla_oracle(image, invs, out_hw, d, border)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_dispatch_cpu_falls_back_and_differentiates():
    H = W = 48
    d, border = 2, 2
    out_hw = ((H - 2 * border) // d, (W - 2 * border) // d)
    image = jax.random.uniform(jax.random.key(2), (H, W, 3), jnp.float32)
    invs = _invs(3, 0.5, 2.0, seed=5)
    out = affine_resample(image, invs, out_hw, d, border)
    want = _xla_oracle(image, invs, out_hw, d, border)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
    # differentiable (CPU path)
    g = jax.grad(lambda im: affine_resample(im, invs, out_hw, d,
                                            border).sum())(image)
    assert np.isfinite(np.asarray(g)).all()


def test_band_bound():
    assert band_rows_needed(1.0, 4, 96) >= 11
    assert band_rows_needed(1.0, 4, 96) % 8 == 0
    assert band_rows_needed(0.0, 4, 96) == 16
