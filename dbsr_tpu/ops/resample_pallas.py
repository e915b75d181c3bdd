"""Pallas TPU kernel for affine bilinear burst resampling (gather-free).

The fused synthesis resample (``data/synthetic.py:_lr_frame``) samples each
LR frame at composed-affine coordinates with ``interp.sample_bilinear`` —
an XLA gather. Measured on v5e (util_scripts/synth_perf_probe.py, B=16,
N=8, 96^2 outputs from 432^2 sources): the gather runs at ~9 cycles per
index and dominates the entire on-device synthesis (42 of 42 ms); layout
tricks (2-D slice gathers, bf16 operands) make it worse, because XLA:TPU
lowers general gathers serially and pads C=3 operands 42x on the lane dim.

This kernel removes the gather by exploiting the affine structure:

  * for one OUTPUT ROW r, the source y-coordinate v(x) is linear in x and
    spans at most ``|inv10| * d * (ow-1) + 3`` source rows — a narrow BAND
    (<= 10 rows at the reference's max 1-degree rotation);
  * the source x-coordinate u(x) is the same for every band row.

So each output row is two small dense contractions against the band, with
bilinear "hat" weight matrices built by vectorized iota arithmetic
(no indices, no gathers):

  stage A (x-interp, MXU):  xint_c[b, x] = band_c[b, :] @ hat(u(x) - u')
  stage B (y-blend, VPU):   out_c[x]     = sum_b hat(v(x) - row_b) * xint_c

Zeros-padding semantics emerge naturally: taps outside the image have no
band row / no column, so their hat weight multiplies nothing — exactly
``sample_bilinear(..., 'zeros')``.

Numerics: the stage-A matmul runs at MXU DEFAULT precision (bf16 operand
truncation, ~4e-3 relative). The reference pipeline itself round-trips the
warped image through uint8 (``synthetic_burst_generation.py:151-156``,
quantization 4e-3 absolute), so this is at / above reference fidelity;
pass ``precision='highest'`` for exact-f32 verification runs.

The kernel needs no gradient: synthesis consumes data crops (no grads flow
into it); a custom_vjp still routes any accidental AD to the XLA gather
formulation's VJP.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dbsr_tpu.ops import interp


def band_rows_needed(max_rotation_deg: float, downsample: int,
                     out_w: int) -> int:
    """Static bound on source rows touched by one output row, plus the
    hat/floor margin (3) and the 8-row slack from aligning the band start
    down to a sublane multiple (compiled Mosaic requires provably 8-aligned
    dynamic-slice starts on the sublane dim), rounded up to 8."""
    span = (math.sin(math.radians(max_rotation_deg)) * downsample
            * (out_w - 1)) + 12.0
    return max(16, int(math.ceil(span / 8.0)) * 8)


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _resample_kernel(inv_ref, src_ref, out_ref, *, H, W, C, OH, OW, BAND,
                     d, border, prec):
    n = pl.program_id(0)
    inv00 = inv_ref[n, 0]
    inv01 = inv_ref[n, 1]
    inv02 = inv_ref[n, 2]
    inv10 = inv_ref[n, 3]
    inv11 = inv_ref[n, 4]
    inv12 = inv_ref[n, 5]

    # Mosaic's tpu.iota is integer-only; cast after generation
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0).astype(
        jnp.float32)                                               # [W, 1]
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (1, OW), 1).astype(
        jnp.float32)                                               # [1, OW]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (BAND, 1), 0).astype(
        jnp.float32)                                               # [BAND,1]
    fx = (iota_x + 0.5) * d - 0.5 + border                         # [1, OW]
    fx0 = 0.5 * d - 0.5 + border
    fxe = (OW - 0.5) * d - 0.5 + border

    def row(r, _):
        fy = (r.astype(jnp.float32) + 0.5) * d - 0.5 + border
        u = inv00 * fx + inv01 * fy + inv02                        # [1, OW]
        v = inv10 * fx + inv11 * fy + inv12                        # [1, OW]

        v0 = inv10 * fx0 + inv11 * fy + inv12
        ve = inv10 * fxe + inv11 * fy + inv12
        # align down to a sublane multiple (hat weights use absolute row
        # indices, so the extra leading rows contribute zero)
        ystart = jnp.clip(
            jnp.floor(jnp.minimum(v0, ve)).astype(jnp.int32) - 1,
            0, H - BAND)
        ystart = pl.multiple_of((ystart // 8) * 8, 8)

        # x-interp hat operator [W, OW] (shared by channels and band rows)
        wx = _hat(iota_w - u).astype(src_ref.dtype)
        # y-blend hat [BAND, OW] against ABSOLUTE source row indices
        wy = _hat(v - (ystart.astype(jnp.float32) + iota_b))

        for c in range(C):
            band = src_ref[pl.ds(c * H + ystart, BAND), :]   # [BAND, W]
            xint = jax.lax.dot_general(
                band, wx, (((1,), (0,)), ((), ())),
                precision=prec, preferred_element_type=jnp.float32)
            out_c = (wy * xint).sum(axis=0, keepdims=True)   # [1, OW]
            out_ref[0, c, pl.ds(r, 1), :] = out_c.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, OH, row, 0, unroll=False)


def _resample_impl(src_chw: jax.Array, invs: jax.Array,
                   out_hw: Tuple[int, int], d: int, border: int,
                   H: int, W: int, C: int, band: int,
                   precision: str, interpret: bool) -> jax.Array:
    N = invs.shape[0]
    OH, OW = out_hw
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    kern = functools.partial(
        _resample_kernel, H=H, W=W, C=C, OH=OH, OW=OW, BAND=band,
        d=float(d), border=float(border), prec=prec)
    out = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            # whole [N, 6] affine table in SMEM (compiled Pallas requires
            # SMEM blocks to equal the array dims); indexed by program_id
            pl.BlockSpec((N, 6), lambda n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C * H, W), lambda n: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, OH, OW), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, C, OH, OW), src_chw.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * (band + W) * OW * C,
            bytes_accessed=(C * H * W * 4
                            + N * OH * (band * W + OW * C) * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(invs, src_chw)
    return out


def _xla_oracle(image, invs, out_hw, d, border):
    """Gather-based reference: sample_bilinear at the composed affine."""
    q = interp.base_grid(*out_hw)
    fine = (q + 0.5) * d - 0.5 + border

    def one(inv):
        coords = interp.apply_affine_to_points(inv.reshape(2, 3), fine)
        return interp.sample_bilinear(image, coords, "zeros")

    return jax.vmap(one)(invs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _resample_prim(image, invs, out_hw, d, border, band, precision):
    H, W, C = image.shape
    src_chw = jnp.transpose(image, (2, 0, 1)).reshape(C * H, W)
    inv_flat = invs.reshape(-1, 6)
    out = _resample_impl(src_chw, inv_flat, out_hw, d, border, H, W, C,
                         band, precision, interpret=False)
    return jnp.transpose(out, (0, 2, 3, 1))  # [N, OH, OW, C]


def _prim_fwd(image, invs, out_hw, d, border, band, precision):
    return (_resample_prim(image, invs, out_hw, d, border, band, precision),
            (image, invs))


def _prim_bwd(out_hw, d, border, band, precision, res, g):
    image, invs = res
    _, vjp = jax.vjp(lambda im, iv: _xla_oracle(im, iv, out_hw, d, border),
                     image, invs)
    return vjp(g)


_resample_prim.defvjp(_prim_fwd, _prim_bwd)


def affine_resample_interpret(image, invs, out_hw, d, border, band,
                              precision="highest"):
    """Interpret-mode entry for CPU tests."""
    H, W, C = image.shape
    src_chw = jnp.transpose(image, (2, 0, 1)).reshape(C * H, W)
    out = _resample_impl(src_chw, invs.reshape(-1, 6), out_hw, d, border,
                         H, W, C, band, precision, interpret=True)
    return jnp.transpose(out, (0, 2, 3, 1))


def affine_resample(image: jax.Array, invs: jax.Array,
                    out_hw: Tuple[int, int], d: int, border: int,
                    max_rotation_deg: float = 1.0,
                    precision: str = "default") -> jax.Array:
    """Bilinear-sample ``image`` ``[H, W, C]`` at composed-affine LR
    coordinates for a burst of ``invs`` ``[N, 2, 3]`` inverse transforms:
    output pixel (r, x) of frame n samples
    ``inv_n @ ((x+.5)d-.5+border, (r+.5)d-.5+border, 1)`` with zeros
    padding — equal to the gather formulation in ``_lr_frame``.

    Dispatches to the Pallas band kernel on TPU (requires rotation-only
    affines bounded by ``max_rotation_deg`` so the band is static); XLA
    gathers elsewhere.
    """
    band = band_rows_needed(max_rotation_deg, d, out_hw[1])
    H = image.shape[0]
    from dbsr_tpu.ops.backend import pallas_enabled
    use_pallas = (pallas_enabled() and band <= min(64, H)
                  and image.ndim == 3)
    if use_pallas:
        return _resample_prim(image, invs, out_hw, d, border, band,
                              precision)
    return _xla_oracle(image, invs, out_hw, d, border)
