"""PWC-Net correlation cost volume — the framework's custom TPU kernel.

TPU-native replacement for the reference's only native-code component, the
CUDA/CuPy correlation kernel (`external/pwcnet/correlation/correlation.py`,
396 LoC of CUDA C). Semantics (matching `kernel_Correlation_updateOutput`,
reference `correlation.py:35-103`):

    out[b, y, x, c] = (1/C) * sum_ch first[b, y, x, ch]
                                   * second[b, y+dy, x+dx, ch]

with displacement channel ``c = (dy+4)*9 + (dx+4)`` for dy, dx in [-4, 4]
(x-offset ``s2o = c % 9 - 4``, y-offset ``s2p = c // 9 - 4``), zero padding
outside ``second``. 81 output channels, channels-last.

Two implementations:
  * ``correlation_xla`` — 81 static shifted multiplies + channel-mean;
    XLA fuses these well and autodiff is automatic. This is the correctness
    oracle and the gradient path.
  * ``correlation_pallas`` — a Pallas kernel that loads ``first`` and the
    padded ``second`` into VMEM once and produces all 81 channels in one
    pass, making the op bandwidth-optimal (the XLA version re-reads operands
    per displacement unless fusion keeps them resident). Wrapped in
    ``jax.custom_vjp``; the backward is a pair of one-pass Pallas kernels
    (one per gradient) over VMEM-resident operands (our analog of the
    reference's hand-written ``updateGradFirst/Second``,
    `correlation.py:105-233`):

        d_first[y, x, ch]  = (1/C) * sum_o g[y, x, o] * s[y+dy_o, x+dx_o, ch]
        d_second[v, w, ch] = (1/C) * sum_o g[v-dy_o, w-dx_o, o]
                                         * f[v-dy_o, w-dx_o, ch]

    i.e. the same shifted-window structure with negated offsets and the
    (g * f) product — no scatter anywhere.

``cost_volume`` is the public entry: picks Pallas on TPU, XLA elsewhere.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_DISP = 4
NUM_OFFSETS = (2 * MAX_DISP + 1) ** 2  # 81


def _offsets():
    for dy in range(-MAX_DISP, MAX_DISP + 1):
        for dx in range(-MAX_DISP, MAX_DISP + 1):
            yield dy, dx


def correlation_xla(first: jax.Array, second: jax.Array) -> jax.Array:
    """Shifted-window cost volume: ``[B, H, W, C] x2 -> [B, H, W, 81]``."""
    B, H, W, C = first.shape
    p = MAX_DISP
    second_p = jnp.pad(second, ((0, 0), (p, p), (p, p), (0, 0)))
    outs = []
    for dy, dx in _offsets():
        shifted = jax.lax.dynamic_slice(
            second_p, (0, dy + p, dx + p, 0), (B, H, W, C))
        outs.append(jnp.mean(first * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)


def _corr_kernel(first_ref, second_ref, out_ref):
    """Pallas body: one batch item per grid step, all 81 channels in one
    pass. Accumulates in f32 regardless of input dtype (bf16-safe)."""
    f = first_ref[0].astype(jnp.float32)   # [H, W, C] in VMEM
    s = second_ref[0].astype(jnp.float32)  # [H+2p, W+2p, C] in VMEM
    H, W, C = f.shape
    inv_c = 1.0 / C
    outs = []
    for dy, dx in _offsets():
        sl = s[dy + MAX_DISP:dy + MAX_DISP + H, dx + MAX_DISP:dx + MAX_DISP + W, :]
        outs.append(jnp.sum(f * sl, axis=-1) * inv_c)
    out_ref[0] = jnp.stack(outs, axis=-1).astype(out_ref.dtype)


def _correlation_pallas_fwd_impl(first: jax.Array, second: jax.Array,
                                 interpret: bool = False) -> jax.Array:
    B, H, W, C = first.shape
    p = MAX_DISP
    second_p = jnp.pad(second, ((0, 0), (p, p), (p, p), (0, 0)))
    return pl.pallas_call(
        _corr_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 2 * p, W + 2 * p, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, NUM_OFFSETS), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, NUM_OFFSETS), first.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * NUM_OFFSETS,
            bytes_accessed=4 * B * H * W * (2 * C + NUM_OFFSETS),
            transcendentals=0,
        ),
        interpret=interpret,
    )(first, second_p)


def _corr_dfirst_kernel(second_pad_ref, g_ref, dfirst_ref):
    """d_first[y, x, c] = (1/C) sum_o g[y, x, o] * sp[y+dy_o, x+dx_o, c].
    Static slices only; f32 accumulation regardless of input dtype."""
    p = MAX_DISP
    sp = second_pad_ref[0].astype(jnp.float32)  # [H+2p, W+2p, C]
    g = g_ref[0].astype(jnp.float32)            # [H, W, 81]
    H, W = g.shape[0], g.shape[1]
    C = sp.shape[-1]

    df = jnp.zeros((H, W, C), jnp.float32)
    for o, (dy, dx) in enumerate(_offsets()):
        go = g[:, :, o:o + 1]
        df = df + go * sp[p + dy:p + dy + H, p + dx:p + dx + W, :]
    dfirst_ref[0] = (df * (1.0 / C)).astype(dfirst_ref.dtype)


def _corr_dsecond_kernel(first_pad_ref, g_pad_ref, dsecond_ref):
    """d_second[v, w, c] = (1/C) sum_o g[v-dy_o, w-dx_o, o]
    * f[v-dy_o, w-dx_o, c] — the same shifted-window structure as d_first
    with negated offsets, reading PADDED f and g so every shift is a
    static slice (Mosaic has no value-level dynamic_update_slice, so a
    shift-accumulator formulation is not lowerable)."""
    p = MAX_DISP
    fp = first_pad_ref[0].astype(jnp.float32)  # [H+2p, W+2p, C]
    gp = g_pad_ref[0].astype(jnp.float32)      # [H+2p, W+2p, 81]
    H, W = fp.shape[0] - 2 * p, fp.shape[1] - 2 * p
    C = fp.shape[-1]

    ds = jnp.zeros((H, W, C), jnp.float32)
    for o, (dy, dx) in enumerate(_offsets()):
        gfo = gp[p - dy:p - dy + H, p - dx:p - dx + W, o:o + 1]
        ds = ds + gfo * fp[p - dy:p - dy + H, p - dx:p - dx + W, :]
    dsecond_ref[0] = (ds * (1.0 / C)).astype(dsecond_ref.dtype)


def _correlation_pallas_bwd_impl(first, second, g, interpret=False):
    """Two single-pass kernels (one per gradient): a fused both-gradients
    kernel holds 4 large operands plus the unrolled loop's pipeline
    temporaries live and blows the ~16 MB scoped-VMEM stack limit even at
    small shapes (observed: 17.45M at [4,16,16,64])."""
    B, H, W, C = first.shape
    p = MAX_DISP
    Hp, Wp = H + 2 * p, W + 2 * p
    pad = ((0, 0), (p, p), (p, p), (0, 0))
    first_p = jnp.pad(first, pad)
    second_p = jnp.pad(second, pad)
    g_p = jnp.pad(g, pad)
    cost = pl.CostEstimate(
        flops=2 * B * H * W * C * NUM_OFFSETS,
        bytes_accessed=4 * B * H * W * (2 * C + NUM_OFFSETS),
        transcendentals=0,
    )
    df = pl.pallas_call(
        _corr_dfirst_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, NUM_OFFSETS), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), first.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(second_p, g)
    ds = pl.pallas_call(
        _corr_dsecond_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hp, Wp, NUM_OFFSETS), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), second.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(first_p, g_p)
    return df, ds


@jax.custom_vjp
def correlation_pallas(first: jax.Array, second: jax.Array) -> jax.Array:
    return _correlation_pallas_fwd_impl(first, second)


def _corr_fwd(first, second):
    return _correlation_pallas_fwd_impl(first, second), (first, second)


def _corr_bwd(res, g):
    first, second = res
    return tuple(_correlation_pallas_bwd_impl(first, second, g))


correlation_pallas.defvjp(_corr_fwd, _corr_bwd)


# Largest spatial plane (H*W) the single-block kernels compile for.
# Empirical scoped-VMEM envelope on v5e (16 MB stack limit): 16x16 passes
# at every PWC channel width (up to C=196); 24x24 @ C=64 and 32x32 @ C=64
# both OOM the unrolled 81-offset pipeline (22.96M / >16M scoped allocs).
# Every DBSR production shape (48x48 packed burst -> 64-preprocessed PWC,
# levels 16/8/4/2/1) is inside the envelope; larger planes (e.g. the d=1
# flow-pretraining task's 128-preprocessed pyramid, standalone PWC demos)
# fall back to the XLA formulation, which fuses well at those sizes.
_MAX_PALLAS_PLANE = 16 * 16


def fits_pallas_envelope(shape: Tuple[int, ...]) -> bool:
    """True when the correlation kernels' scoped-VMEM footprint is known
    to fit for ``[B, H, W, C]`` (see ``_MAX_PALLAS_PLANE``)."""
    return shape[-3] * shape[-2] <= _MAX_PALLAS_PLANE


def cost_volume(first: jax.Array, second: jax.Array,
                use_pallas: bool = None) -> jax.Array:
    """81-channel local cost volume (public entry).

    ``use_pallas=None`` auto-selects: the Pallas kernel on TPU backends for
    shapes inside the VMEM envelope, the XLA formulation elsewhere (CPU
    tests, interpret-mode debugging, oversized planes).
    """
    if use_pallas is None:
        from dbsr_tpu.ops.backend import pallas_enabled
        use_pallas = pallas_enabled() and fits_pallas_envelope(first.shape)
    if use_pallas:
        return correlation_pallas(first, second)
    return correlation_xla(first, second)
