"""Block-level numerical parity against torch-built equivalents.

The reference's building blocks are torch modules; these tests rebuild the
same computation in torch with OUR weights copied over, pinning our flax
blocks to the reference semantics (conv padding/layout, post-activation
residual, leaky-relu slope).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dbsr_tpu.models.layers import ConvBlock, ResBlock


def _to_torch_conv(kernel, bias):
    """HWIO -> torch OIHW."""
    w = torch.from_numpy(np.asarray(kernel).transpose(3, 2, 0, 1).copy())
    b = torch.from_numpy(np.asarray(bias).copy()) if bias is not None else None
    return w, b


def test_convblock_matches_torch_conv_relu():
    x = np.random.RandomState(0).rand(2, 9, 11, 5).astype(np.float32)
    mod = ConvBlock(7, kernel_size=3, activation="relu")
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    conv = params["params"]["Conv_0"]
    w, b = _to_torch_conv(conv["kernel"], conv["bias"])
    t = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), w, b, padding=1)
    t = F.relu(t)
    np.testing.assert_allclose(np.asarray(out),
                               t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_convblock_stride2_matches_torch():
    """The PWC extractor's stride-2 convs (torch k=3, s=2, p=1)."""
    x = np.random.RandomState(1).rand(1, 16, 16, 4).astype(np.float32)
    mod = ConvBlock(8, kernel_size=3, stride=2, activation="lrelu")
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    conv = params["params"]["Conv_0"]
    w, b = _to_torch_conv(conv["kernel"], conv["bias"])
    t = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), w, b, stride=2,
                 padding=1)
    t = F.leaky_relu(t, 0.1)
    assert out.shape == tuple(t.permute(0, 2, 3, 1).shape)
    np.testing.assert_allclose(np.asarray(out),
                               t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_convblock_dilated_matches_torch():
    """The PWC refiner's dilated convs (torch k=3, dilation=d, padding=d)."""
    x = np.random.RandomState(2).rand(1, 20, 20, 6).astype(np.float32)
    mod = ConvBlock(4, kernel_size=3, dilation=4, activation="none")
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    conv = params["params"]["Conv_0"]
    w, b = _to_torch_conv(conv["kernel"], conv["bias"])
    t = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2), w, b,
                 padding=4, dilation=4)
    np.testing.assert_allclose(np.asarray(out),
                               t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_resblock_matches_torch_reference_structure():
    """Post-activation residual: relu(conv2(relu(conv1(x))) + x)
    (reference blocks.py:63-97)."""
    x = np.random.RandomState(3).rand(2, 8, 8, 6).astype(np.float32)
    mod = ResBlock(6)
    params = mod.init(jax.random.key(0), jnp.asarray(x))
    out = mod.apply(params, jnp.asarray(x))

    p = params["params"]
    w1, b1 = _to_torch_conv(p["ConvBlock_0"]["Conv_0"]["kernel"],
                            p["ConvBlock_0"]["Conv_0"]["bias"])
    w2, b2 = _to_torch_conv(p["ConvBlock_1"]["Conv_0"]["kernel"],
                            p["ConvBlock_1"]["Conv_0"]["bias"])
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    h = F.relu(F.conv2d(xt, w1, b1, padding=1))
    h = F.conv2d(h, w2, b2, padding=1)
    t = F.relu(h + xt)
    np.testing.assert_allclose(np.asarray(out),
                               t.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_conv_init_statistics_match_torch_defaults():
    """Our kernel/bias init reproduces torch nn.Conv2d defaults
    (kaiming-uniform a=sqrt(5): U[-1/sqrt(fan_in), 1/sqrt(fan_in)])."""
    mod = ConvBlock(64, kernel_size=3, activation="none")
    x = jnp.zeros((1, 8, 8, 32))
    params = mod.init(jax.random.key(0), x)
    k = np.asarray(params["params"]["Conv_0"]["kernel"])
    bound = 1.0 / np.sqrt(3 * 3 * 32)
    assert np.abs(k).max() <= bound + 1e-7
    # roughly uniform: std of U[-b,b] is b/sqrt(3)
    assert abs(k.std() - bound / np.sqrt(3)) < 0.1 * bound
