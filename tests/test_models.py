"""Model shape/compile/grad tests (tiny configs, CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dbsr_tpu.models import layers
from dbsr_tpu.models.dbsr import DBSRNet, dbsrnet_tiny
from dbsr_tpu.models.pwcnet import PWCNet, PWCFlowNet


def test_pixel_shuffle_matches_torch():
    x = np.random.RandomState(0).rand(2, 3, 4, 8).astype(np.float32)
    ours = layers.pixel_shuffle(jnp.asarray(x), 2)
    t = torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), 2)
    np.testing.assert_allclose(np.asarray(ours),
                               t.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_torch_conv_transpose_matches_torch():
    x = np.random.RandomState(1).rand(1, 6, 5, 3).astype(np.float32)
    mod = layers.TorchConvTranspose(4, kernel_size=4, stride=2, padding=1)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))
    assert out.shape == (1, 12, 10, 4)

    tconv = torch.nn.ConvTranspose2d(3, 4, 4, stride=2, padding=1)
    # copy our params into torch: our kernel [kh, kw, in, out] -> torch [in, out, kh, kw]
    k = np.asarray(params["params"]["kernel"]).transpose(2, 3, 0, 1)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(k))
        tconv.bias.copy_(torch.from_numpy(np.asarray(params["params"]["bias"])))
    expected = tconv(torch.from_numpy(x).permute(0, 3, 1, 2)).detach()
    np.testing.assert_allclose(np.asarray(out),
                               expected.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_icnr_init_produces_uniform_subpixels():
    mod = layers.PixShuffleUpsampler(4, upsample_factor=2, icnrinit=True,
                                     activation="none")
    x = jnp.asarray(np.random.RandomState(2).rand(1, 6, 6, 8).astype(
        np.float32))
    params = mod.init(jax.random.key(0), x)
    out = np.asarray(mod.apply(params, x))
    # at init, each 2x2 subpixel block must be constant (nearest upsample)
    blocks = out.reshape(1, 6, 2, 6, 2, 4)
    np.testing.assert_allclose(blocks.std(axis=(2, 4)), 0.0, atol=1e-6)


def test_resblock_shapes_and_residual():
    mod = layers.ResBlock(8)
    x = jnp.zeros((2, 6, 6, 8))
    params = mod.init(jax.random.key(0), x)
    out = mod.apply(params, x)
    assert out.shape == x.shape


def test_pwc_flownet_level2_output():
    net = PWCFlowNet()
    a = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.key(0), a, a)
    flow = net.apply(params, a, a)
    assert flow.shape == (1, 16, 16, 2)


def test_pwcnet_wrapper_resizes_and_scales():
    net = PWCNet()
    a = jnp.zeros((2, 48, 48, 3))
    params = net.init(jax.random.key(0), a, a)
    flow = net.apply(params, a, a)
    assert flow.shape == (2, 48, 48, 2)


def test_dbsr_tiny_forward_shapes():
    net = dbsrnet_tiny()
    burst = jnp.zeros((2, 4, 16, 16, 4))
    params = net.init(jax.random.key(0), burst)
    pred, aux = jax.jit(lambda p, b: net.apply(p, b))(params, burst)
    assert pred.shape == (2, 128, 128, 3)
    assert aux["offsets"].shape == (2, 3, 16, 16, 2)
    assert aux["fusion_weights"].shape == (2, 4, 16, 16, 16)
    # fusion weights sum to 1 over the frame axis (softmax)
    np.testing.assert_allclose(
        np.asarray(aux["fusion_weights"].sum(axis=1)), 1.0, atol=1e-5)


def test_dbsr_tiny_grad_flows_but_not_into_frozen_flownet():
    net = dbsrnet_tiny()
    burst = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 16, 16, 4).astype(np.float32))
    params = net.init(jax.random.key(1), burst)

    def loss(p):
        pred, _ = net.apply(p, burst)
        return (pred**2).mean()

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    align_norm = 0.0
    other_norm = 0.0
    for path, leaf in flat:
        n = float(jnp.abs(leaf).sum())
        if "alignment_net" in jax.tree_util.keystr(path):
            align_norm += n
        else:
            other_norm += n
    assert align_norm == 0.0, "frozen flow net received gradients"
    assert other_norm > 0.0


def test_dbsr_train_alignment_grads_flow():
    net = dbsrnet_tiny(train_alignment=True)
    burst = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 16, 16, 4).astype(np.float32))
    params = net.init(jax.random.key(1), burst)

    def loss(p):
        pred, _ = net.apply(p, burst)
        return (pred**2).mean()

    g = jax.grad(loss)(params)
    align_norm = sum(
        float(jnp.abs(leaf).sum())
        for path, leaf in jax.tree_util.tree_leaves_with_path(g)
        if "alignment_net" in jax.tree_util.keystr(path))
    assert align_norm > 0.0


def test_fused_s2d_decoder_exactness():
    """The space-to-depth decoder path produces identical outputs from the
    same parameters (it is a weight-space transform, not a different
    architecture)."""
    burst = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 16, 16, 4).astype(np.float32))
    net_a = dbsrnet_tiny()
    params = net_a.init(jax.random.key(0), burst)
    net_b = dbsrnet_tiny(fused_s2d_decoder=True)
    pa, _ = net_a.apply(params, burst)
    pb, _ = net_b.apply(params, burst)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-6)


def test_ref_offset_noise(monkeypatch):
    """ref_offset_noise perturbs the reference frame's zero offsets only
    when the `offset_noise` RNG stream is supplied (reference
    merging.py:92-99); without the stream (eval) the output is unchanged."""
    burst = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, 16, 16, 4).astype(np.float32))
    net0 = dbsrnet_tiny()
    netN = dbsrnet_tiny(ref_offset_noise=0.25)
    params = net0.init(jax.random.key(0), burst)

    p0, _ = net0.apply(params, burst)
    # no RNG stream -> noise inactive, identical to the zero-offset net
    pN_eval, _ = netN.apply(params, burst)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(pN_eval),
                               atol=1e-6)
    # RNG stream -> output changes
    pN_train, _ = netN.apply(params, burst,
                             rngs={"offset_noise": jax.random.key(3)})
    assert float(jnp.abs(pN_train - p0).max()) > 1e-6
    # two different keys -> different outputs (noise actually random)
    pN_train2, _ = netN.apply(params, burst,
                              rngs={"offset_noise": jax.random.key(4)})
    assert float(jnp.abs(pN_train - pN_train2).max()) > 1e-7
