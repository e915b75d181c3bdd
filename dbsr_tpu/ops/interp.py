"""Resampling primitives: bilinear resize, grid sampling, flow warps, affine.

TPU-native replacements for every resampling op the reference uses through
cv2 / torch (`cv2.resize`, `cv2.warpAffine`, `F.interpolate`,
`F.grid_sample`, `models/layers/warp.py:19`, `pwcnet.py:16` backwarp) —
implemented as gather-based bilinear sampling that XLA lowers to efficient
TPU gathers, fully differentiable, and exactly matching the half-pixel /
align-corner conventions of the originals:

  * ``resize_bilinear``  == torch ``F.interpolate(mode='bilinear',
    align_corners=False)`` == ``cv2.resize(INTER_LINEAR)`` (half-pixel
    centers, NO antialiasing, edge clamp). Note ``jax.image.resize`` is NOT
    equivalent (it antialiases on downsampling), hence this implementation.
  * ``grid_sample``      == torch ``F.grid_sample`` (normalized grid,
    align_corners=False/True, zeros/border padding).
  * ``warp``             == reference ``models/layers/warp.py:19-46``
    (pixel-centered grid + flow, zeros padding).
  * ``backwarp``         == reference ``models/alignment/pwcnet.py:16-38``
    including its W/(W-1) flow scaling quirk and the validity mask.
  * ``warp_affine``      == ``cv2.warpAffine(borderMode=CONSTANT)``:
    forward matrix maps src->dst; sampling uses the inverse map on integer
    pixel coordinates.

All functions are channels-last (``[..., H, W, C]``) and broadcast over
leading batch dims via vmap-free batched gathers.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def _axis_resize_coords(in_size: int, out_size: int,
                        scale: Optional[float] = None) -> jax.Array:
    """Source sampling coordinates for half-pixel bilinear resize.

    src = (dst + 0.5) * (in/out) - 0.5 (torch align_corners=False / cv2).
    """
    if scale is None:
        scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=jnp.float32)
    return (dst + 0.5) * scale - 0.5


def _gather_axis_linear(x: jax.Array, coords: jax.Array, axis: int) -> jax.Array:
    """Linear interpolation along one axis at float ``coords`` (edge clamp)."""
    in_size = x.shape[axis]
    i0 = jnp.floor(coords)
    w = coords - i0
    i0 = i0.astype(jnp.int32)
    i1 = i0 + 1
    i0c = jnp.clip(i0, 0, in_size - 1)
    i1c = jnp.clip(i1, 0, in_size - 1)
    x0 = jnp.take(x, i0c, axis=axis)
    x1 = jnp.take(x, i1c, axis=axis)
    # reshape weights to broadcast along `axis`
    shape = [1] * x.ndim
    shape[axis] = coords.shape[0]
    w = w.reshape(shape)
    return x0 * (1.0 - w) + x1 * w


def resize_bilinear(im: jax.Array, out_hw: Tuple[int, int],
                    scale_hw: Optional[Tuple[float, float]] = None) -> jax.Array:
    """Separable bilinear resize of ``[..., H, W, C]`` to ``out_hw``.

    Half-pixel sampling, no antialiasing, edge-clamped — matches
    ``cv2.resize(INTER_LINEAR)`` and torch ``F.interpolate(bilinear,
    align_corners=False)``. ``scale_hw`` optionally fixes the coordinate
    scale (torch semantics when called with an explicit ``scale_factor``).
    """
    h_axis = im.ndim - 3
    w_axis = im.ndim - 2
    sh = scale_hw[0] if scale_hw is not None else None
    sw = scale_hw[1] if scale_hw is not None else None
    rows = _axis_resize_coords(im.shape[h_axis], out_hw[0], sh)
    cols = _axis_resize_coords(im.shape[w_axis], out_hw[1], sw)
    im = _gather_axis_linear(im, rows, h_axis)
    im = _gather_axis_linear(im, cols, w_axis)
    return im


def _batched_gather_hw(im: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather pixels: im ``[*B, H, W, C]``, iy/ix ``[*B, h, w]`` int32 ->
    ``[*B, h, w, C]``. Leading dims of im and indices must match."""
    H, W = im.shape[-3], im.shape[-2]
    flat = im.reshape(im.shape[:-3] + (H * W, im.shape[-1]))
    idx = iy * W + ix  # [*B, h, w]
    idx_flat = idx.reshape(idx.shape[:-2] + (-1,))  # [*B, h*w]
    out = jnp.take_along_axis(flat, idx_flat[..., None], axis=-2)
    return out.reshape(idx.shape + (im.shape[-1],))


def sample_bilinear(im: jax.Array, coords: jax.Array,
                    padding_mode: str = "zeros") -> jax.Array:
    """Bilinear sampling of ``[*B, H, W, C]`` at pixel ``coords`` ``[*B, h, w, 2]``.

    ``coords[..., 0]`` is x (width), ``coords[..., 1]`` is y, in integer-pixel
    index space (pixel centers at integers). ``padding_mode``:
      * ``'zeros'``  — out-of-range corner taps contribute 0 (torch zeros).
      * ``'border'`` — coordinates clamp to the edge (torch border).
    """
    H, W = im.shape[-3], im.shape[-2]
    x = coords[..., 0].astype(jnp.float32)
    y = coords[..., 1].astype(jnp.float32)

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = x - x0f
    wy = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    out = None
    for (dy, dx, w) in (
        (0, 0, (1 - wy) * (1 - wx)),
        (0, 1, (1 - wy) * wx),
        (1, 0, wy * (1 - wx)),
        (1, 1, wy * wx),
    ):
        yi = y0 + dy
        xi = x0 + dx
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        val = _batched_gather_hw(im, yc, xc)
        if padding_mode == "zeros":
            mask = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)).astype(im.dtype)
            w = w * mask
        elif padding_mode != "border":
            raise ValueError(f"unknown padding_mode {padding_mode!r}")
        term = val * w[..., None].astype(im.dtype)
        out = term if out is None else out + term
    return out


def grid_sample(im: jax.Array, grid: jax.Array, padding_mode: str = "zeros",
                align_corners: bool = False) -> jax.Array:
    """torch-semantics grid_sample: ``grid`` ``[*B, h, w, 2]`` in [-1, 1]."""
    H, W = im.shape[-3], im.shape[-2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5
    return sample_bilinear(im, jnp.stack([x, y], axis=-1), padding_mode)


def base_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Integer-pixel identity sampling grid ``[h, w, 2]`` with (x, y) order."""
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gx, gy], axis=-1)


def warp(feat: jax.Array, flow: jax.Array,
         padding_mode: str = "zeros") -> jax.Array:
    """Backward-warp ``feat`` ``[*B, H, W, C]`` by ``flow`` ``[*B, H, W, 2]``.

    Pixel p of the output samples ``feat`` at ``p + flow[p]`` (flow in (x, y)
    pixel units). Numerically equal to reference
    ``models/layers/warp.py:19-46`` (pixel-centered grid, grid_sample
    align_corners=False, zeros padding) — the 0.5-center offset and the -0.5
    denormalization cancel to exactly ``p + flow``.
    """
    H, W = feat.shape[-3], feat.shape[-2]
    coords = base_grid(H, W, jnp.float32) + flow.astype(jnp.float32)
    return sample_bilinear(feat, coords, padding_mode)


def backwarp(im: jax.Array, flow: jax.Array) -> jax.Array:
    """PWC-Net-style backwarp with validity mask, matching reference
    ``models/alignment/pwcnet.py:16-38`` exactly.

    The reference normalizes flow by (S-1)/2 but denormalizes the grid with
    align_corners=False (scale S/2), so the effective pixel displacement is
    ``flow * S/(S-1)`` per axis; out-of-frame samples are zeroed via a
    warped-ones mask thresholded at 0.999.
    """
    H, W = im.shape[-3], im.shape[-2]
    fx = flow[..., 0].astype(jnp.float32) * (W / (W - 1.0))
    fy = flow[..., 1].astype(jnp.float32) * (H / (H - 1.0))
    coords = base_grid(H, W, jnp.float32) + jnp.stack([fx, fy], axis=-1)
    out = sample_bilinear(im, coords, "zeros")
    # The reference materializes the mask by warping a ones image and
    # thresholding at 0.999 (pwcnet.py:31-37). Warped ones == sum of the
    # in-bounds tap weights, computed here analytically in f32 (no gather;
    # in bf16 the gathered 4-tap sum rounds to 0.9961 < 0.999, which
    # silently zeroed random interior pixels — caught by the on-chip
    # backwarp_matmul parity probe, round 3).
    ones = _warped_ones(coords, H, W)
    mask = (ones > 0.999).astype(im.dtype)[..., None]
    return out * mask


def _axis_ones(c: jax.Array, n: int) -> jax.Array:
    """Zeros-padding bilinear tap-weight sum along one axis, in f32.

    For a 1-D sample coordinate ``c`` the two taps are ``floor(c)`` and
    ``floor(c)+1`` with weights ``1-frac`` / ``frac``; the sum counts only
    in-bounds taps — exactly what sampling a ones image with zeros padding
    produces, but without the gather (and without bf16 rounding).
    """
    c = c.astype(jnp.float32)
    i0 = jnp.floor(c)
    frac = c - i0
    w0 = (1.0 - frac) * ((i0 >= 0.0) & (i0 <= n - 1.0)).astype(jnp.float32)
    w1 = frac * ((i0 >= -1.0) & (i0 <= n - 2.0)).astype(jnp.float32)
    return w0 + w1


def _warped_ones(coords: jax.Array, H: int, W: int) -> jax.Array:
    """Analytic f32 warped-ones image for sample ``coords`` ``[..., 2]``
    ((x, y) order): the separable product of per-axis in-bounds bilinear
    tap-weight sums. Equal to ``sample_bilinear(ones, coords, 'zeros')``
    evaluated in f32."""
    return _axis_ones(coords[..., 0], W) * _axis_ones(coords[..., 1], H)


def _hat_weights(coords: jax.Array, n: int) -> jax.Array:
    """Bilinear "hat" weight matrix ``[..., P, n]`` for 1-D sample
    coordinates ``[..., P]`` in the floor-tap convention:
    ``(1-frac)`` at column ``floor(c)`` and ``frac`` at ``floor(c)+1``.

    Row i of the result holds exactly the zeros-border bilinear tap
    weights of coordinate i over the n in-bounds source positions (an
    out-of-range tap simply has no column, so its weight is dropped —
    identical to :func:`sample_bilinear`'s ``padding_mode='zeros'``).
    Built elementwise on the VPU in f32 (coordinate math must never ride
    the MXU at DEFAULT precision — see PERF.md round-2 precision audit).

    The values equal ``max(0, 1 - |c - i|)``, but the derivative does
    not: that form's subgradient at exact-integer coordinates is 0
    (``d|x|/dx = 0`` at 0), while the gather VJP (and torch
    ``grid_sample``, reference ``pwcnet.py:16-38``) differentiates
    through ``frac = c - floor(c)`` and yields the one-sided difference
    ``im[i+1] - im[i]``. bf16 flows land on exact kinks with ~1% rate
    (e.g. flow 1.875 -> offset exactly 2.0 after the ``W/(W-1)`` scale),
    which made the two dflow conventions diverge at isolated pixels (up
    to 34% of the grad scale — on-chip parity catch, round 3). The
    one-hot-tap form below has the gather convention's derivative
    everywhere: ``dA/dc = onehot(floor(c)+1) - onehot(floor(c))``.
    """
    c = coords.astype(jnp.float32)
    i0 = jax.lax.stop_gradient(jnp.floor(c))[..., None]
    frac = c[..., None] - i0
    idx = jnp.arange(n, dtype=jnp.float32)
    oh0 = (idx == i0).astype(jnp.float32)
    oh1 = (idx == i0 + 1.0).astype(jnp.float32)
    return (1.0 - frac) * oh0 + frac * oh1


def backwarp_matmul(im: jax.Array, flow: jax.Array) -> jax.Array:
    """MXU formulation of :func:`backwarp` for small spatial sizes.

    The PWC decoder backwarps (reference ``models/alignment/pwcnet.py:
    16-38``) run at tiny pyramid resolutions (4x4 .. 32x32) with small
    channel counts, where XLA's gather lowering is index-rate-bound and
    the Pallas one-hot warp kernel's C >= 128 constraint doesn't hold.
    Here the warp is computed gather-free as two dense hat-matrix
    contractions: ``T[p, y, c] = sum_x Ax[p, x] im[y, x, c]`` (one MXU
    matmul) followed by a VPU multiply-reduce over y, with the validity
    mask free as the product of the hat row-sums (the warped-ones trick
    of the gather formulation, computed exactly). FLOPs scale as
    ``(H*W)^2 * C`` — use only when ``H*W`` is small (see
    :func:`backwarp_auto`).

    Numerically identical to :func:`backwarp` for f32 inputs (weight
    matmuls run at HIGHEST precision; bf16 inputs use bf16 weights like
    every other bf16 model op).
    """
    H, W = im.shape[-3], im.shape[-2]
    C = im.shape[-1]
    lead = im.shape[:-3]
    imf = im.reshape((-1, H, W, C))
    fl = flow.reshape((-1, H, W, 2)).astype(jnp.float32)
    # effective displacement matches backwarp(): reference normalizes by
    # (S-1)/2 and denormalizes with align_corners=False (scale S/2)
    sx = (jnp.arange(W, dtype=jnp.float32)[None, None, :]
          + fl[..., 0] * (W / (W - 1.0)))
    sy = (jnp.arange(H, dtype=jnp.float32)[None, :, None]
          + fl[..., 1] * (H / (H - 1.0)))
    P = H * W
    ax = _hat_weights(sx.reshape((-1, P)), W)  # [B, P, W] f32
    ay = _hat_weights(sy.reshape((-1, P)), H)  # [B, P, H] f32
    # warped-ones validity mask == product of hat row sums (exact, f32)
    ones = ax.sum(-1) * ay.sum(-1)
    mask = (ones > 0.999).astype(im.dtype)[..., None]

    bf16 = imf.dtype == jnp.bfloat16
    wdt = imf.dtype if bf16 else jnp.float32
    prec = None if bf16 else jax.lax.Precision.HIGHEST
    t = jnp.einsum("bpx,byxc->bpyc", ax.astype(wdt), imf, precision=prec)
    out = (ay.astype(wdt)[..., None] * t).sum(axis=2)
    return (out.astype(im.dtype) * mask).reshape(lead + (H, W, C))


# Above this many output positions the dense formulation's (H*W)^2*C FLOPs
# overtake the gather's index cost. 2304 covers AlignLite's full-res L0
# (48x48 at 24 ch — its one per-step backwarp above the old 2048 PWC-level
# bound): measured on-chip at [112, 48, 48, 24] bf16 the hat-matrix path is
# 2.18 ms vs the gather's 10.80 ms fwd (5x; f32 agreement 1.8e-07), the
# single largest chunk of the lite-vs-pwc protocol step-time gap
# (PERF.md round-4/5). Larger P grows quadratically — leave SCA/eval-size
# images on the gather path.
_BACKWARP_MATMUL_MAX_P = 2304


def backwarp_auto(im: jax.Array, flow: jax.Array) -> jax.Array:
    """Dispatch: dense hat-matrix backwarp on TPU at small spatial sizes,
    gather formulation otherwise (CPU tests, large images)."""
    from dbsr_tpu.ops.backend import pallas_enabled
    if pallas_enabled() and im.shape[-3] * im.shape[-2] <= _BACKWARP_MATMUL_MAX_P:
        return backwarp_matmul(im, flow)
    return backwarp(im, flow)


def invert_2x3(tmat: jax.Array) -> jax.Array:
    """Invert an affine ``[..., 2, 3]`` matrix (append [0,0,1], invert, crop)."""
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 1.0], tmat.dtype), tmat.shape[:-2] + (1, 3))
    full = jnp.concatenate([tmat, bottom], axis=-2)
    return jnp.linalg.inv(full)[..., :2, :]


def warp_affine(im: jax.Array, tmat: jax.Array,
                out_hw: Optional[Tuple[int, int]] = None) -> jax.Array:
    """cv2.warpAffine equivalent: ``tmat`` ``[..., 2, 3]`` maps src -> dst.

    Each destination pixel (integer coords) samples the source at
    ``inv(tmat) @ (x, y, 1)`` with bilinear interpolation and zero border
    (cv2 BORDER_CONSTANT), matching reference
    ``data/synthetic_burst_generation.py:209-210``.
    """
    H, W = im.shape[-3], im.shape[-2]
    if out_hw is None:
        out_hw = (H, W)
    inv = invert_2x3(tmat)
    g = base_grid(out_hw[0], out_hw[1], jnp.float32)  # [h, w, 2] (x, y)
    coords = apply_affine_to_points(inv, g)
    return sample_bilinear(im, coords, "zeros")


def apply_affine_to_points(tmat: jax.Array, points: jax.Array) -> jax.Array:
    """Apply ``[..., 2, 3]`` affine to ``[..., h, w, 2]`` (x, y) points.

    Computed ELEMENTWISE (VPU), never as a matmul: on TPU a coordinate
    einsum lowers to the MXU at DEFAULT precision, truncating f32 operands
    to bf16 — at image-scale coordinates (~430) the bf16 ulp is 2.0 PIXELS.
    Measured on v5e: sampling coordinates off by up to a pixel, output
    error 0.69 vs the exact result. Elementwise math is exact f32 on every
    backend.
    """
    t = tmat[..., None, None, :, :]  # [..., 1, 1, 2, 3]
    x = points[..., 0]
    y = points[..., 1]
    out_x = t[..., 0, 0] * x + t[..., 0, 1] * y + t[..., 0, 2]
    out_y = t[..., 1, 0] * x + t[..., 1, 1] * y + t[..., 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)
