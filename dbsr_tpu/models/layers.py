"""Reusable flax.linen layers (NHWC): conv blocks, residual blocks,
sub-pixel upsampling with ICNR init and Gaussian smoothing.

TPU-native re-design of reference ``models/layers/{blocks,upsampling,
initializations}.py``. Initialization matches torch ``nn.Conv2d`` defaults
(kaiming-uniform a=sqrt(5) => U[-1/sqrt(fan_in), 1/sqrt(fan_in)] for both
kernel and bias) so training dynamics are comparable to the reference.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default weight init for HWIO kernels.

    kaiming_uniform(a=sqrt(5)) reduces to U[-b, b] with
    b = 1/sqrt(fan_in), fan_in = kh*kw*in_ch.
    """
    kh, kw, in_ch, _ = shape
    bound = 1.0 / math.sqrt(kh * kw * in_ch)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_bias_init(fan_in: int):
    """torch nn.Conv2d default bias init: U[-1/sqrt(fan_in), 1/sqrt(fan_in)]."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound,
                                  maxval=bound)

    return init


def get_activation(name: str) -> Optional[Callable]:
    """Activation factory (reference ``blocks.py:19-36``)."""
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "sigmoid":
        return nn.sigmoid
    if name == "tanh":
        return nn.tanh
    if name == "none":
        return None
    raise ValueError(f"unknown activation {name!r}")


class ConvBlock(nn.Module):
    """conv (+ optional BN) (+ activation) — reference ``blocks.py:46-60``."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    batch_norm: bool = False
    activation: str = "relu"
    dtype: Any = None
    s2d: bool = False  # apply in space-to-depth-2 space (same params)

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d:
            assert self.stride == 1 and self.dilation == 1 \
                and not self.batch_norm
            x = S2DConv(self.features, self.kernel_size, self.use_bias,
                        self.dtype, name="Conv_0")(x)
            act = get_activation(self.activation)
            return act(x) if act is not None else x
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME" if self.stride == 1 else
            [( (self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2 )] * 2,
            use_bias=self.use_bias,
            kernel_init=torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        act = get_activation(self.activation)
        return act(x) if act is not None else x


class ResBlock(nn.Module):
    """Post-activation residual block: act(conv-act-conv(x) + x)
    (reference ``blocks.py:63-97``)."""
    features: int
    batch_norm: bool = False
    activation: str = "relu"
    dtype: Any = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBlock(self.features, 3, batch_norm=self.batch_norm,
                        activation=self.activation, dtype=self.dtype,
                        s2d=self.s2d)(x, train)
        out = ConvBlock(self.features, 3, batch_norm=self.batch_norm,
                        activation="none", dtype=self.dtype,
                        s2d=self.s2d)(out, train)
        act = get_activation(self.activation)
        return act(out + x)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC pixel shuffle with torch channel convention:
    ``out[..., h*r+i, w*r+j, c] = in[..., h, w, c*r*r + i*r + j]``."""
    *lead, H, W, C = x.shape
    assert C % (r * r) == 0
    c_out = C // (r * r)
    x = x.reshape(*lead, H, W, c_out, r, r)
    # [..., H, W, c, i, j] -> [..., H, i, W, j, c]
    x = jnp.moveaxis(x, (-3, -2, -1), (-1, -4, -2))
    return x.reshape(*lead, H * r, W * r, c_out)


def icnr_init(r: int):
    """ICNR initializer for the pre-shuffle conv kernel (HWIO).

    Draws a kaiming-normal subkernel with out_ch/r^2 channels and repeats
    each output channel r^2 times, so the r^2 sub-pixel phases start
    identical and pixel-shuffle produces a checkerboard-free (nearest-
    upsampled) output at init. Re-design of reference
    ``initializations.py:21-38`` (arXiv:1707.02937).
    """

    def init(key, shape, dtype=jnp.float32):
        kh, kw, in_ch, out_ch = shape
        assert out_ch % (r * r) == 0
        sub = nn.initializers.kaiming_normal()(
            key, (kh, kw, in_ch, out_ch // (r * r)), dtype)
        return jnp.repeat(sub, r * r, axis=-1)

    return init


class PixShuffleUpsampler(nn.Module):
    """Sub-pixel convolution upsampler (reference ``upsampling.py:22-66``):
    1x1 conv to ``features * r^2`` -> pixel shuffle x r -> optional
    depthwise Gaussian blur (zero padding, matching ``F.conv2d`` default)
    to suppress checkerboard artifacts."""
    features: int
    upsample_factor: int = 2
    activation: str = "relu"
    icnrinit: bool = False
    gauss_blur_sd: Optional[float] = None
    gauss_ksz: int = 3
    dtype: Any = None
    s2d_output: bool = False  # emit s2d rep (4x channels at half res)

    @nn.compact
    def __call__(self, x):
        r = self.upsample_factor
        pre = self.features * r * r
        fan_in = x.shape[-1]
        x = nn.Conv(
            pre, (1, 1), use_bias=not self.icnrinit,
            kernel_init=icnr_init(r) if self.icnrinit else torch_conv_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)
        act = get_activation(self.activation)
        if act is not None:
            x = act(x)
        if self.s2d_output:
            assert r % 2 == 0
            # fold space-to-depth into the shuffle via channel permutation
            x = pixel_shuffle(x[..., s2d_shuffle_permutation(self.features,
                                                             r)], r // 2)
        else:
            x = pixel_shuffle(x, r)

        if self.gauss_blur_sd is not None:
            from dbsr_tpu.ops.filtering import gauss_2d
            k = gauss_2d(self.gauss_ksz, self.gauss_blur_sd, (0.0, 0.0),
                         density=True)[0]
            k = (k / k.sum()).astype(x.dtype)
            lead = x.shape[:-3]
            xx = x.reshape((-1,) + x.shape[-3:])
            if self.s2d_output:
                # depthwise fine blur -> block-diagonal coarse conv. A
                # grouped conv with 4-channel groups is pathologically slow
                # on TPU (+14 ms measured); a dense 128-ch conv with a
                # block-diagonal kernel costs ~1 ms despite 32x the FLOPs.
                # Phase-major: out (p*C + c) uses in (q*C + c) with weight
                # k1[.., q, p].
                k1 = s2d_conv_kernel(k[:, :, None, None])  # [3,3,4,4]
                eye = jnp.eye(self.features, dtype=k1.dtype)
                kern = jnp.einsum("hwqp,cd->hwqcpd", k1, eye).reshape(
                    k1.shape[0], k1.shape[1], 4 * self.features,
                    4 * self.features).astype(x.dtype)
                xx = jax.lax.conv_general_dilated(
                    xx, kern, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            else:
                C = x.shape[-1]
                kern = jnp.broadcast_to(k[:, :, None, None],
                                        (self.gauss_ksz, self.gauss_ksz, 1, C))
                xx = jax.lax.conv_general_dilated(
                    xx, kern, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=C)
            x = xx.reshape(lead + xx.shape[-3:])
        return x


class TorchConvTranspose(nn.Module):
    """Transposed conv with exact torch ``nn.ConvTranspose2d(k, s, p)``
    semantics: input dilated by s, padded by k-1-p, correlated with the
    spatially-flipped kernel. Needed for PWC-Net's 4x4/s2/p1 up-convs so
    converted torch weights reproduce identical outputs."""
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        in_ch = x.shape[-1]
        # torch convtranspose default init: kaiming_uniform(a=sqrt(5)) with
        # fan_in computed from weight shape [in, out, k, k] -> out*k*k? torch
        # uses weight.size(1)*k*k = out*k*k; bias bound likewise.
        fan_in = self.features * k * k
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, self.dtype, -bound, bound),
            (k, k, in_ch, self.features))
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, self.dtype, -bound, bound),
            (self.features,))
        pad = k - 1 - p
        kernel = kernel.astype(x.dtype)
        bias = bias.astype(x.dtype)
        out = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias


# ---------------------------------------------------------------------------
# Space-to-depth conv transform: run small-channel convs at coarse
# resolution with 4x channels, where the MXU is efficient.
#
# A 3x3 (or 1x1) stride-1 SAME conv at fine resolution is exactly
# equivalent to a 3x3 SAME conv on the space-to-depth-by-2 representation
# with a structured kernel: measured on v5e, the DBSR decoder's post-
# shuffle stage (384^2 x 32ch) runs 1.5x faster this way (9.1 -> 6.2 ms).
# Channel layout is PHASE-major: s2d channel index = (qy*2 + qx)*C + c,
# so each sub-pixel phase occupies a CONTIGUOUS channel block — the layout
# the Pallas fine-patch conv kernel (ops/conv_s2d_pallas.py) slices for
# free. Parameters are always fine-resolution; the layout is compute-only.
# ---------------------------------------------------------------------------

def s2d_conv_kernel(k: jax.Array) -> jax.Array:
    """Transform a fine-resolution conv kernel ``[kh, kw, C, O]`` (kh=kw in
    {1, 3}) into the equivalent coarse kernel ``[3, 3, 4C, 4O]`` (or
    ``[1, 1, 4C, 4O]`` for 1x1) over the space-to-depth-2 representation
    (phase-major channel blocks)."""
    kh, kw, C, O = k.shape
    assert kh == kw and kh in (1, 3)
    ksz = 3 if kh == 3 else 1
    span = 1 if kh == 3 else 0
    K = jnp.zeros((ksz, ksz, 4 * C, 4 * O), k.dtype)
    for py in range(2):
        for px in range(2):
            for qy in range(2):
                for qx in range(2):
                    for dy in range(-span, span + 1):
                        for dx in range(-span, span + 1):
                            du = 2 * dy + qy - py
                            dv = 2 * dx + qx - px
                            if -span <= du <= span and -span <= dv <= span:
                                qi = qy * 2 + qx
                                pi = py * 2 + px
                                K = K.at[dy + span, dx + span,
                                         qi * C:(qi + 1) * C,
                                         pi * O:(pi + 1) * O].set(
                                    k[du + span, dv + span])
    return K


class S2DConv(nn.Module):
    """Conv with fine-resolution params applied in space-to-depth space.

    Parameters are IDENTICAL in name and shape to the plain ``nn.Conv``
    inside ``ConvBlock`` (instantiate with ``name='Conv_0'``), so standard
    checkpoints apply unchanged; only the compute path differs. Input and
    output are s2d tensors (``4*features`` channels, c-major phases).
    """
    features: int
    kernel_size: int = 3
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_base = x.shape[-1] // 4
        shape = (self.kernel_size, self.kernel_size, in_base, self.features)
        fan_in = self.kernel_size * self.kernel_size * in_base
        kernel = self.param("kernel", torch_conv_kernel_init, shape)
        # match flax nn.Conv dtype semantics: explicit dtype wins, else
        # promote input/params to a common type
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        if self.kernel_size == 3:
            # fine-patch Pallas kernel on TPU (true conv FLOPs at full MXU
            # lanes); falls back to the structured-dense formulation when
            # the lane/VMEM constraints don't hold (ops/conv_s2d_pallas.py)
            from dbsr_tpu.ops.conv_s2d_pallas import conv3x3_s2d_auto
            out = conv3x3_s2d_auto(x, kernel)
        else:
            K = s2d_conv_kernel(kernel).astype(dt)
            out = jax.lax.conv_general_dilated(
                x, K, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            bias = self.param("bias", make_torch_bias_init(fan_in),
                              (self.features,))
            # phase-major: same per-phase bias tiled over the 4 blocks
            out = out + jnp.tile(bias, 4).astype(out.dtype)
        return out


def s2d_shuffle_permutation(c_out: int, r: int) -> jnp.ndarray:
    """Channel permutation folding s2d into pixel-shuffle.

    ``pixel_shuffle(x[..., perm], r // 2)`` yields exactly
    ``space_to_depth(pixel_shuffle(x, r), 2)`` in PHASE-major layout:
    position ``((qy*2 + qx)*C + c) * (r/2)^2 + di*(r/2) + dj`` takes the
    old channel ``c*r^2 + (2di+qy)*r + (2dj+qx)``.
    """
    rc = r // 2
    perm = []
    for qy in range(2):
        for qx in range(2):
            for c in range(c_out):
                for di in range(rc):
                    for dj in range(rc):
                        perm.append(c * r * r + (2 * di + qy) * r
                                    + (2 * dj + qx))
    return jnp.asarray(perm, jnp.int32)


def depth_to_space_phase_major(x: jax.Array, r: int = 2) -> jax.Array:
    """Inverse of phase-major space-to-depth: ``[..., H, W, r*r*C]`` with
    channel ``(qy*r + qx)*C + c`` -> ``[..., H*r, W*r, C]``."""
    *lead, H, W, RC = x.shape
    C = RC // (r * r)
    x = x.reshape(*lead, H, W, r, r, C)
    # [..., H, W, qy, qx, c] -> [..., H, qy, W, qx, c]
    x = jnp.moveaxis(x, (-3, -2), (-4, -2))
    return x.reshape(*lead, H * r, W * r, C)
