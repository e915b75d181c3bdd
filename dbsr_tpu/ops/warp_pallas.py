"""Pallas TPU kernel for dense bilinear warping of wide-channel features.

Motivation: the encoder warps ``[B*(N-1), 48, 48, 512]`` embeddings by
per-pixel flow (reference ``encoders.py:80``). The straightforward
gather-based formulation (``ops/interp.py:sample_bilinear``) is
gather-bound on TPU — measured ~9.3 ms of a 34 ms DBSR forward (B=4).

Kernel idea: bilinear warping is a sparse linear operator — each output
pixel is a 4-tap weighted sum of input pixels. For wide channels it pays to
materialize the operator tile-by-tile as a one-hot matrix and ride the MXU:

    for each tile of T output pixels:
        W_tile[T, P] = sum_taps w_tap(p) * onehot(col == idx_tap(p))
        out[T, C]    = W_tile @ feat_flat[P, C]        # MXU matmul

The one-hot build is T*P*4 VPU compares (cheap); the matmul runs at MXU
rates instead of gather rates. Zeros padding is folded into the tap weights
(out-of-range taps get weight 0), matching ``sample_bilinear`` semantics
exactly.

Gradient: ``jax.custom_vjp`` with BOTH backwards as Pallas kernels —
d_feat is the transposed one-hot operator matmul (``_dfeat_kernel``) and
d_flow contracts the derivative operators against the features
(``_dflow_kernel``); the autodiff backward of a gather would be a
scatter-add, far slower on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dbsr_tpu.ops import interp

_TILE = 256


def _tile(P: int, dtype) -> int:
    """Output-pixel tile size. f32 kernels run the MXU at HIGHEST precision
    (see ``_dot``), whose scratch + the [T, P] one-hot operator must fit
    the 16 MB scoped-VMEM limit — measured OOM at T=256/Cb=256 f32 at
    48x48x512; fits at T=128/Cb=128."""
    t = 128 if jnp.dtype(dtype) == jnp.float32 else _TILE
    return t if P % t == 0 else P


def _dot(wmat: jax.Array, rhs: jax.Array) -> jax.Array:
    """[T, P] operator-matrix @ [P, C] features with f32 accumulation.

    TPU MXU DEFAULT precision truncates f32 inputs to bf16 — measured
    ~4.5e-3 relative error vs the gather formulation on-chip (invisible in
    interpret mode). Force HIGHEST (full f32) for f32 operands; bf16
    operands keep DEFAULT (native rate).
    """
    prec = (jax.lax.Precision.HIGHEST if rhs.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        wmat.astype(rhs.dtype), rhs, (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)


def _channel_block(C: int, dtype) -> int:
    """Channel-block size so the per-tile VMEM footprint (feat block +
    one-hot operator + HIGHEST-precision matmul scratch) stays under the
    16 MB scoped limit. f32 needs smaller blocks: full-precision MXU
    matmuls use ~3x the scratch of bf16."""
    cap = 128 if jnp.dtype(dtype) == jnp.float32 else 512
    if C <= cap:
        return C
    cb = cap
    while C % cb:
        cb //= 2
    return cb


def _warp_kernel(feat_ref, flow_ref, out_ref, *, H, W, T):
    P = H * W
    feat = feat_ref[0].reshape(P, feat_ref.shape[-1])
    fl = flow_ref[0].astype(jnp.float32)  # [T, 2]

    t = pl.program_id(1)
    pix = t * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    py = (pix // W).astype(jnp.float32)
    px = (pix % W).astype(jnp.float32)
    x = px + fl[:, 0:1]
    y = py + fl[:, 1:2]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    cols = jax.lax.broadcasted_iota(jnp.int32, (T, P), 1)
    wmat = jnp.zeros((T, P), jnp.float32)
    for dy, dx, w in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        yi = y0 + dy
        xi = x0 + dx
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = yc * W + xc  # [T, 1]
        tap_w = jnp.where(valid, w, 0.0)  # [T, 1]
        wmat = wmat + jnp.where(cols == idx, tap_w, 0.0)

    out = _dot(wmat, feat)
    out_ref[0] = out.astype(out_ref.dtype)


def _warp_pallas_impl(feat: jax.Array, flow: jax.Array,
                      interpret: bool = False) -> jax.Array:
    B, H, W, C = feat.shape
    P = H * W
    T = _tile(P, feat.dtype)
    Cb = _channel_block(C, feat.dtype)
    flow_flat = flow.reshape(B, P, 2)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, H=H, W=W, T=T),
        grid=(B, P // T, C // Cb),
        in_specs=[
            pl.BlockSpec((1, H, W, Cb), lambda b, t, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 2), lambda b, t, c: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Cb), lambda b, t, c: (b, t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), feat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * P * P * C // (P // T) + 8 * B * P * P,
            bytes_accessed=feat.size * feat.dtype.itemsize * (P // T)
            + flow.size * 4 + B * P * C * feat.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(feat, flow_flat)
    return out.reshape(B, H, W, C)


def _tap_weights(fl, px, py, H, W):
    """Shared tap geometry: returns per-tap (idx, w, dwdx, dwdy, valid).

    ``fl`` [T, 2] f32 flow, ``px``/``py`` [T, 1] f32 pixel coords.
    """
    x = px + fl[:, 0:1]
    y = py + fl[:, 1:2]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    taps = []
    for dy, dx, w, dwdx, dwdy in (
        (0, 0, (1 - wy) * (1 - wx), -(1 - wy), -(1 - wx)),
        (0, 1, (1 - wy) * wx, (1 - wy), -wx),
        (1, 0, wy * (1 - wx), -wy, (1 - wx)),
        (1, 1, wy * wx, wy, wx),
    ):
        yi = y0 + dy
        xi = x0 + dx
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = yc * W + xc
        taps.append((idx, jnp.where(valid, w, 0.0),
                     jnp.where(valid, dwdx, 0.0),
                     jnp.where(valid, dwdy, 0.0)))
    return taps


def _dfeat_kernel(flow_ref, g_ref, out_ref, *, H, W, T):
    """d_feat tile = W^T_tile @ g: for a tile of INPUT pixels q, gather the
    transposed operator rows from all P output pixels' taps."""
    P = H * W
    fl = flow_ref[0].astype(jnp.float32)  # [P, 2] — full flow
    g = g_ref[0].reshape(P, g_ref.shape[-1])

    t = pl.program_id(1)
    qrange = t * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)  # [T,1]

    pix = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    py = (pix // W).astype(jnp.float32)
    px = (pix % W).astype(jnp.float32)
    # taps of every output pixel p (row vectors [1, P])
    x = px + fl[:, 0].reshape(1, P)
    y = py + fl[:, 1].reshape(1, P)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    wt = jnp.zeros((T, P), jnp.float32)
    for dy, dx, w in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        yi = y0 + dy
        xi = x0 + dx
        valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        idx = yc * W + xc  # [1, P]
        tap_w = jnp.where(valid, w, 0.0)  # [1, P]
        wt = wt + jnp.where(idx == qrange, tap_w, 0.0)

    out = _dot(wt, g)
    out_ref[0] = out.astype(out_ref.dtype)


def _dflow_kernel(feat_ref, flow_ref, g_ref, out_ref, *, H, W, T):
    """d_flow tile: build derivative operators Dx/Dy for a tile of OUTPUT
    pixels, matmul against feat (one channel block per grid step,
    accumulated into the output), then row-dot with g."""
    P = H * W
    feat = feat_ref[0].reshape(P, feat_ref.shape[-1])
    fl = flow_ref[0].astype(jnp.float32)  # [T, 2]
    g = g_ref[0]  # [T, Cb]

    t = pl.program_id(1)
    pix = t * T + jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    py = (pix // W).astype(jnp.float32)
    px = (pix % W).astype(jnp.float32)

    cols = jax.lax.broadcasted_iota(jnp.int32, (T, P), 1)
    dxmat = jnp.zeros((T, P), jnp.float32)
    dymat = jnp.zeros((T, P), jnp.float32)
    for idx, w, dwdx, dwdy in _tap_weights(fl, px, py, H, W):
        hit = cols == idx
        dxmat = dxmat + jnp.where(hit, dwdx, 0.0)
        dymat = dymat + jnp.where(hit, dwdy, 0.0)

    fx = _dot(dxmat, feat)
    fy = _dot(dymat, feat)
    gf = g.astype(jnp.float32)
    dfx = (fx * gf).sum(axis=1, keepdims=True)
    dfy = (fy * gf).sum(axis=1, keepdims=True)
    contrib = jnp.concatenate([dfx, dfy], axis=1).astype(out_ref.dtype)

    # channel blocks (last grid axis, innermost) accumulate into the tile
    @pl.when(pl.program_id(2) == 0)
    def _init():
        out_ref[0] = contrib

    @pl.when(pl.program_id(2) != 0)
    def _acc():
        out_ref[0] += contrib


def _warp_bwd_pallas(feat, flow, g, interpret=False):
    B, H, W, C = feat.shape
    P = H * W
    T = _tile(P, feat.dtype)
    Cb = _channel_block(C, feat.dtype)
    flow_flat = flow.reshape(B, P, 2)
    g_flat = g.reshape(B, P, C)

    dfeat = pl.pallas_call(
        functools.partial(_dfeat_kernel, H=H, W=W, T=T),
        grid=(B, P // T, C // Cb),
        in_specs=[
            pl.BlockSpec((1, P, 2), lambda b, t, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, Cb), lambda b, t, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Cb), lambda b, t, c: (b, t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, C), feat.dtype),
        interpret=interpret,
    )(flow_flat, g_flat).reshape(B, H, W, C)

    dflow = pl.pallas_call(
        functools.partial(_dflow_kernel, H=H, W=W, T=T),
        grid=(B, P // T, C // Cb),
        in_specs=[
            pl.BlockSpec((1, H, W, Cb), lambda b, t, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 2), lambda b, t, c: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, Cb), lambda b, t, c: (b, t, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 2), lambda b, t, c: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, 2), flow.dtype),
        interpret=interpret,
    )(feat, flow_flat, g_flat).reshape(B, H, W, 2)

    return dfeat, dflow


@jax.custom_vjp
def warp_pallas(feat: jax.Array, flow: jax.Array) -> jax.Array:
    """MXU-formulated bilinear warp (zeros padding), semantics identical to
    ``interp.warp(feat, flow)``. Forward AND backward are Pallas kernels
    (the autodiff backward of a gather is a scatter-add, which is far
    slower on TPU than these transposed/derivative one-hot matmuls)."""
    return _warp_pallas_impl(feat, flow)


def _fwd(feat, flow):
    return _warp_pallas_impl(feat, flow), (feat, flow)


def _bwd(res, g):
    feat, flow = res
    return _warp_bwd_pallas(feat, flow, g)


warp_pallas.defvjp(_fwd, _bwd)


def warp_auto(feat: jax.Array, flow: jax.Array,
              min_channels: int = 128) -> jax.Array:
    """Dispatch: Pallas one-hot-matmul warp on TPU for wide channels (where
    it beats gathers), XLA gather formulation otherwise."""
    from dbsr_tpu.ops.backend import pallas_enabled
    use_pallas = (pallas_enabled()
                  and feat.ndim == 4
                  and feat.shape[-1] >= min_channels)
    if use_pallas:
        return warp_pallas(feat, flow)
    return interp.warp(feat, flow)
