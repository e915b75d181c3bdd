"""Pallas TPU kernel: exact 3x3 conv over the space-to-depth-2 rep via
fine-aligned patches — the true conv FLOPs at full MXU lane utilization.

Problem: the DBSR decoder's post-shuffle stage is 3x3 convs on 32-channel
384^2 activations (reference ``models/dbsr/decoders.py:40-52``). Plain
NHWC convs at 32 channels run the MXU at ~1/4 lane utilization (measured
~9 TF/s). The framework's first fix (``models/layers.py:s2d_conv_kernel``)
rewrites the conv over the half-res 128-channel space-to-depth rep with a
structured dense kernel — full lanes, but the structured kernel is 75%
zeros, so it executes 4x the true FLOPs (measured ~88 TF/s realized ->
~22 TF/s effective).

This kernel removes the zero-padding waste. For each coarse output pixel
(a 2x2 block of fine pixels) the union of the four fine 3x3 receptive
fields is a fine 4x4 window = 16C values. Assembling that window as a
patch row and multiplying by a [16C, 4O] weight matrix (the fine kernel
scattered to its valid (tap, phase) slots — 9/16 nonzero) computes the
exact conv at 16/9 of the true FLOPs with K = 16C = 512 and N = 4O = 128
fully-utilized MXU dims: ~2.25x less MXU work than the structured-dense
formulation.

Layout contract: phase-major s2d (channel = (qy*2+qx)*C + c, the layout
``models/layers.py`` produces), so each fine phase is a CONTIGUOUS channel
block and patch assembly is 16 static slices — no gathers, no lane
striding.

Gradients (``jax.custom_vjp``):
  * d_input — the input-grad of a SAME 3x3 conv is a SAME 3x3 conv with
    the spatially-flipped, in/out-transposed kernel: the SAME Pallas
    kernel, called with ``flip(k).swap(io)``.
  * d_kernel/d_bias — tiny outputs ([3,3,C,O]); computed by XLA from the
    unfolded fine-resolution arrays (a filter-grad conv XLA handles well).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# (row/col offset into the 1-coarse-pixel-padded array, fine phase) for
# fine tap index t in 0..3: fine coord = 2*Y + t - 1.
_PIECE = ((0, 1), (1, 0), (1, 1), (2, 0))


def _slot_table():
    """Patch-slot permutation making every scratch store LANE-ALIGNED.

    Piece (ty, tx) reads input-phase channels ``q*C:(q+1)*C`` (lane
    offset ``(q*C) % 128``). Assigning it patch slot ``s`` with
    ``s % 4 == q`` makes the destination offset ``(s*C) % 128`` equal the
    source offset whenever ``(4*C) % 128 == 0`` (the dispatch gate), so
    Mosaic never relayouts a vector between slice and store — a plain
    lane-offset concatenate of the 16 pieces is not lowerable
    ("result/input offset mismatch on non-concat dimension")."""
    free = {q: [s for s in range(16) if s % 4 == q] for q in range(4)}
    slots = []
    for ty in range(4):
        for tx in range(4):
            q = _PIECE[ty][1] * 2 + _PIECE[tx][1]
            slots.append(free[q].pop(0))
    return tuple(slots)


_SLOT = _slot_table()


def block_weight(k: jax.Array) -> jax.Array:
    """Scatter a fine ``[3, 3, C, O]`` kernel into the fine-patch weight
    matrix ``[16*C, 4*O]`` (patch index = ``_SLOT[ty*4+tx]*C + c``, output
    channel = (py*2 + px)*O + o)."""
    _, _, C, O = k.shape
    W = jnp.zeros((16, C, 4, O), k.dtype)
    for ty in range(4):
        for tx in range(4):
            for py in range(2):
                for px in range(2):
                    dy = ty - 1 - py
                    dx = tx - 1 - px
                    if -1 <= dy <= 1 and -1 <= dx <= 1:
                        W = W.at[_SLOT[ty * 4 + tx], :, py * 2 + px, :].set(
                            k[dy + 1, dx + 1])
    return W.reshape(16 * C, 4 * O)


def _conv_kernel(x_ref, w_ref, out_ref, patch_ref, *, Tr, W2, C):
    """One output row-band: assemble fine 4x4 patches into a VMEM
    scratch via 16 lane-aligned static-slice stores, one MXU matmul.
    ``x_ref`` holds this band's Tr+2 padded input rows."""
    for ty in range(4):
        off_y, py = _PIECE[ty]
        slab = x_ref[0, 0, off_y:off_y + Tr]  # [Tr, W2+2, 4C], static
        for tx in range(4):
            off_x, px = _PIECE[tx]
            q = py * 2 + px
            s = _SLOT[ty * 4 + tx]
            patch_ref[:, :, s * C:(s + 1) * C] = slab[
                :, off_x:off_x + W2, q * C:(q + 1) * C]
    patches = patch_ref[...].reshape(Tr * W2, 16 * C)

    w = w_ref[...]
    prec = (jax.lax.Precision.HIGHEST if patches.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    out = jax.lax.dot_general(
        patches, w.astype(patches.dtype), (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32)
    out_ref[0] = out.reshape(Tr, W2, w.shape[-1]).astype(out_ref.dtype)


# Per-instance scoped-VMEM target. The hard stack limit is ~16 MB; leave
# headroom for Mosaic pipeline temporaries (a whole-image input block
# double-buffers to 19+ MB at the decoder's 192^2x128 train shape —
# observed OOM).
_VMEM_BUDGET = 10 * 1024 * 1024


def _band_vmem(Tr: int, W2: int, C4: int, O4: int, itemsize: int) -> int:
    """Estimated per-instance stack bytes: double-buffered input band +
    patch scratch (+ a matmul temporary of the same size) + double-
    buffered output band + resident weight."""
    C = C4 // 4
    return (2 * (Tr + 2) * (W2 + 2) * C4 * itemsize
            + 2 * Tr * W2 * 16 * C * itemsize
            + 2 * Tr * W2 * O4 * itemsize
            + 16 * C * O4 * itemsize)


def _row_block(H2: int, W2: int, C4: int, O4: int, itemsize: int) -> int:
    """Rows per grid instance: the largest divisor of H2 whose band fits
    the VMEM budget; 0 if even single-row bands don't fit (caller falls
    back to the structured-dense XLA formulation)."""
    for t in (16, 8, 4, 2, 1):
        if H2 % t == 0 and _band_vmem(t, W2, C4, O4,
                                      itemsize) <= _VMEM_BUDGET:
            return t
    return 0


def _conv3x3_block_impl(x: jax.Array, wmat: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """``x`` [B, H2, W2, 4C] phase-major s2d -> [B, H2, W2, 4O].

    The grid runs over (batch, row-band); each instance sees only its
    Tr+2 padded input rows. Overlapping windows can't be expressed with
    blocked BlockSpecs, so the halo'd bands are materialized by XLA
    first ((Tr+2)/Tr ~ 1.1x input bytes — noise next to the matmul)."""
    B, H2, W2, C4 = x.shape
    C = C4 // 4
    O4 = wmat.shape[-1]
    Tr = _row_block(H2, W2, C4, O4, jnp.dtype(x.dtype).itemsize)
    assert Tr > 0, "shape exceeds VMEM budget; caller must gate on it"
    nb = H2 // Tr
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bands = jnp.stack([xp[:, i * Tr:i * Tr + Tr + 2] for i in range(nb)],
                      axis=1)  # [B, nb, Tr+2, W2+2, 4C]
    return pl.pallas_call(
        functools.partial(_conv_kernel, Tr=Tr, W2=W2, C=C),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, 1, Tr + 2, W2 + 2, C4),
                         lambda b, r: (b, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * C, O4), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tr, W2, O4), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H2, W2, O4), x.dtype),
        scratch_shapes=[pltpu.VMEM((Tr, W2, 16 * C), x.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H2 * W2 * 16 * C * O4,
            bytes_accessed=x.size * x.dtype.itemsize
            + B * H2 * W2 * O4 * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bands, wmat)


def _unfold(x: jax.Array) -> jax.Array:
    """Phase-major s2d [B, H2, W2, 4C] -> fine [B, 2*H2, 2*W2, C]."""
    from dbsr_tpu.models.layers import depth_to_space_phase_major
    return depth_to_space_phase_major(x, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def conv3x3_s2d_pallas(x: jax.Array, k: jax.Array) -> jax.Array:
    """Exact fine-resolution 3x3 SAME conv computed on the phase-major s2d
    rep (see module doc). ``x`` [B, H2, W2, 4C], ``k`` [3, 3, C, O] (fine
    parameters) -> [B, H2, W2, 4O]. Bias is the caller's job."""
    return _conv3x3_block_impl(x, block_weight(k).astype(x.dtype))


def _fwd(x, k):
    return conv3x3_s2d_pallas(x, k), (x, k)


def _bwd(res, g):
    x, k = res
    # input grad: SAME conv of g with flipped, io-swapped kernel
    k_rot = jnp.flip(k, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _conv3x3_block_impl(g, block_weight(k_rot).astype(g.dtype))
    # kernel grad via the fine-resolution formulation (tiny output);
    # f32 operands — x/g may be bf16 while the kernel param is f32
    x_fine = _unfold(x).astype(jnp.float32)
    g_fine = _unfold(g).astype(jnp.float32)

    # precision follows the forward's contract: exact for f32 inputs,
    # MXU-native for bf16
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def fine_conv(kk):
        return jax.lax.conv_general_dilated(
            x_fine, kk.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
            preferred_element_type=jnp.float32)

    _, vjp = jax.vjp(fine_conv, k)
    (dk,) = vjp(g_fine)
    return dx, dk.astype(k.dtype)


conv3x3_s2d_pallas.defvjp(_fwd, _bwd)


def _shapes_dispatchable(x_shape, kernel_shape, dtype) -> bool:
    """Lane/VMEM dispatch gate for the fine-patch kernel. Both matmul
    orientations must fit a row band: the forward contracts C4 -> 4*O
    but the custom-VJP d_input kernel runs with channels swapped
    (g: 4*O -> C4) — gating on the forward alone admits shapes whose
    backward crashes on the Tr > 0 assert despite a clean forward."""
    B, H2, W2, C4 = x_shape
    O = kernel_shape[-1]
    itemsize = jnp.dtype(dtype).itemsize
    return (kernel_shape[0] == 3 and kernel_shape[1] == 3
            and C4 % 128 == 0 and (4 * O) % 128 == 0
            and W2 % 8 == 0
            and _row_block(H2, W2, C4, 4 * O, itemsize) > 0
            and _row_block(H2, W2, 4 * O, C4, itemsize) > 0)


def conv3x3_s2d_auto(x: jax.Array, kernel: jax.Array,
                     force: bool = None) -> jax.Array:
    """Dispatch: fine-patch Pallas kernel on TPU when the lane/VMEM
    constraints hold, else the structured-dense XLA formulation
    (``models/layers.py:s2d_conv_kernel``).

    OPT-IN (``DBSR_FINE_PATCH_S2D=1``): although the kernel does 2.25x
    less MXU work than the structured-dense conv, the halo'd row bands it
    materializes in HBM cost more than the saved FLOPs at the decoder's
    shapes — measured whole-bench REGRESSION 135.6 -> 89.0 train and
    236.2 -> 211.9 eval bursts/s. A manual-DMA variant (input resident in
    HBM/ANY, per-band async copies, no materialization) is the path to
    making this win; until then the dense formulation stays the default.
    """
    import os

    from dbsr_tpu.ops.backend import pallas_enabled
    ok = (os.environ.get("DBSR_FINE_PATCH_S2D") == "1"
          and pallas_enabled()
          and _shapes_dispatchable(x.shape, kernel.shape, x.dtype))
    if force is not None:
        ok = force
    if not ok:
        from dbsr_tpu.models.layers import s2d_conv_kernel
        K = s2d_conv_kernel(kernel).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, K, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return conv3x3_s2d_pallas(x, kernel)
