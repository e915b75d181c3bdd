"""Pallas TPU kernel fusing the burst-fusion softmax with the weighted sum.

The merging stage (reference ``models/dbsr/merging.py:117-124``) ends with

    weights = softmax(logits, axis=frame)        # [B, N, h, w, C]
    fused   = sum_n weights_n * feat_n           # [B, h, w, C]

At flagship shapes (N=8..14, 48x48, C=512) both operands are tens-to-
hundreds of MB; the unfused XLA lowering runs multiple HBM passes over
``logits`` (max, exp-sum, normalize) plus one over ``feat`` and
materializes ``weights``. This kernel computes the whole reduction in ONE
pass per operand: each grid step loads an [N, T, Cb] tile pair into VMEM,
does the frame-axis softmax in f32, and writes only the [T, Cb] fused tile.

The backward is a single Pallas kernel as well (the VJP of softmax-then-
weighted-sum needs the softmax again, so it recomputes weights from the
saved inputs in VMEM — cheaper than materializing [B, N, h, w, C] weights
to HBM in the forward):

    dfeat_n   = w_n * g
    dlogits_n = w_n * g * (feat_n - fused)

``fused_softmax_merge`` is the public custom-vjp entry;
``fused_softmax_merge_xla`` is the plain-XLA oracle (CPU tests, fallback).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_P = 128


def fused_softmax_merge_xla(feat: jax.Array, logits: jax.Array) -> jax.Array:
    """Oracle: ``[B, N, h, w, C] x2 -> [B, h, w, C]``."""
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
    return (feat.astype(jnp.float32) * w).sum(axis=1).astype(feat.dtype)


def _tiles(P: int, C: int, dtype):
    """Tile sizes keeping the BACKWARD kernel's VMEM footprint (two input
    tiles + two output tiles, [N, TP, TC] each, plus f32 softmax temps)
    under the 16 MB scoped limit at N=14 — measured OOM (16.16M) with f32
    at TC=256; fits at 128. bf16 operands fit at 256. The op is HBM-bound,
    so smaller blocks barely affect throughput."""
    tp = _TILE_P if P % _TILE_P == 0 else None
    tc = 128 if jnp.dtype(dtype) == jnp.float32 else 256
    while tc > 0 and C % tc:
        tc //= 2
    return tp, (tc if tc >= 128 or tc == C else None)


def _merge_kernel(feat_ref, logits_ref, out_ref):
    l = logits_ref[0].astype(jnp.float32)  # [N, T, Cb]
    f = feat_ref[0].astype(jnp.float32)
    m = l.max(axis=0, keepdims=True)
    e = jnp.exp(l - m)
    out = (e * f).sum(axis=0) / e.sum(axis=0)
    out_ref[0] = out.astype(out_ref.dtype)


def _merge_bwd_kernel(feat_ref, logits_ref, g_ref, dfeat_ref, dlogits_ref):
    l = logits_ref[0].astype(jnp.float32)  # [N, T, Cb]
    f = feat_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)       # [T, Cb]
    m = l.max(axis=0, keepdims=True)
    e = jnp.exp(l - m)
    w = e / e.sum(axis=0, keepdims=True)   # [N, T, Cb]
    fused = (w * f).sum(axis=0)            # [T, Cb]
    wg = w * g[None]
    dfeat_ref[0] = wg.astype(dfeat_ref.dtype)
    dlogits_ref[0] = (wg * (f - fused[None])).astype(dlogits_ref.dtype)


def _merge_fwd_impl(feat, logits, interpret=False):
    B, N, H, W, C = feat.shape
    P = H * W
    TP, TC = _tiles(P, C, feat.dtype)
    f = feat.reshape(B, N, P, C)
    l = logits.reshape(B, N, P, C)
    out = pl.pallas_call(
        _merge_kernel,
        grid=(B, P // TP, C // TC),
        in_specs=[
            pl.BlockSpec((1, N, TP, TC), lambda b, t, c: (b, 0, t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, TP, TC), lambda b, t, c: (b, 0, t, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TP, TC), lambda b, t, c: (b, t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), feat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * N * P * C,
            bytes_accessed=2 * feat.size * feat.dtype.itemsize
            + B * P * C * feat.dtype.itemsize,
            transcendentals=B * N * P * C,
        ),
        interpret=interpret,
    )(f, l)
    return out.reshape(B, H, W, C)


def _merge_bwd_impl(feat, logits, g, interpret=False):
    B, N, H, W, C = feat.shape
    P = H * W
    TP, TC = _tiles(P, C, feat.dtype)
    f = feat.reshape(B, N, P, C)
    l = logits.reshape(B, N, P, C)
    gf = g.reshape(B, P, C)
    dfeat, dlogits = pl.pallas_call(
        _merge_bwd_kernel,
        grid=(B, P // TP, C // TC),
        in_specs=[
            pl.BlockSpec((1, N, TP, TC), lambda b, t, c: (b, 0, t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, TP, TC), lambda b, t, c: (b, 0, t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TP, TC), lambda b, t, c: (b, t, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N, TP, TC), lambda b, t, c: (b, 0, t, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, TP, TC), lambda b, t, c: (b, 0, t, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, P, C), feat.dtype),
            jax.ShapeDtypeStruct((B, N, P, C), logits.dtype),
        ],
        interpret=interpret,
    )(f, l, gf)
    return (dfeat.reshape(feat.shape), dlogits.reshape(logits.shape))


@jax.custom_vjp
def fused_softmax_merge(feat: jax.Array, logits: jax.Array) -> jax.Array:
    """One-pass frame-softmax weighted sum:
    ``[B, N, h, w, C] x2 -> [B, h, w, C]`` (f32 softmax internally)."""
    return _merge_fwd_impl(feat, logits)


def _fwd(feat, logits):
    return _merge_fwd_impl(feat, logits), (feat, logits)


def _bwd(res, g):
    feat, logits = res
    return _merge_bwd_impl(feat, logits, g)


fused_softmax_merge.defvjp(_fwd, _bwd)


def merge_auto(feat: jax.Array, logits: jax.Array) -> jax.Array:
    """Dispatch: Pallas fusion on TPU when the shape tiles cleanly
    (P % 128 == 0, C a multiple of a >=128 block or C itself), XLA oracle
    otherwise (CPU tests, odd shapes)."""
    B, N, H, W, C = feat.shape
    TP, TC = _tiles(H * W, C, feat.dtype)
    from dbsr_tpu.ops.backend import pallas_enabled
    if pallas_enabled() and TP is not None and TC is not None:
        return fused_softmax_merge(feat, logits)
    return fused_softmax_merge_xla(feat, logits)
