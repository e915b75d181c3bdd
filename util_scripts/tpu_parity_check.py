"""On-chip Pallas-vs-XLA parity check (run on the REAL TPU).

Asserts, on compiled (non-interpret) TPU kernels:
  1. ``correlation_pallas`` == ``correlation_xla`` (fwd + grads), f32/bf16,
     at PWC level-2 and level-6 shapes (reference CUDA kernel semantics:
     ``external/pwcnet/correlation/correlation.py:35-233``).
  2. ``warp_pallas`` fwd + bwd == the gather-based ``ops.interp.warp`` VJP,
     f32/bf16, at the encoder shape (512ch 48x48) and a PWC feature shape.
  3. ``fused_softmax_merge`` fwd + bwd == the XLA softmax-weighted-sum,
     f32/bf16, at the eval (N=14) and train (N=8) fusion shapes
     (reference ``models/dbsr/merging.py:117-124``).

Interpret-mode CPU tests (tests/test_correlation.py, tests/test_warp_pallas.py)
do not validate tiling/VMEM layout/bf16 accumulation of the real kernels —
this script does. Usage: ``python util_scripts/tpu_parity_check.py``
(prints one PASS/FAIL line per check, exits non-zero on failure).
"""

import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

sys.path.insert(0, ".")

from dbsr_tpu.ops.correlation import correlation_pallas, correlation_xla
from dbsr_tpu.ops.interp import warp as warp_gather
from dbsr_tpu.ops.merge_pallas import (fused_softmax_merge,
                                       fused_softmax_merge_xla)
from dbsr_tpu.ops.warp_pallas import warp_pallas

FAILURES = []


def _check(name, a, b, tol):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    err = float(np.max(np.abs(a - b)))
    scale = float(np.max(np.abs(b)) + 1e-8)
    rel = err / scale
    ok = rel <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_abs={err:.3e} "
          f"rel={rel:.3e} tol={tol:.1e}")
    if not ok:
        FAILURES.append(name)


def check_correlation(shape, dtype, tol):
    tag = f"corr {shape} {jnp.dtype(dtype).name}"
    k1, k2, k3 = jax.random.split(jax.random.key(42), 3)
    first = jax.random.normal(k1, shape, jnp.float32).astype(dtype)
    second = jax.random.normal(k2, shape, jnp.float32).astype(dtype)

    out_p = jax.jit(correlation_pallas)(first, second)
    out_x = jax.jit(correlation_xla)(first, second)
    _check(f"{tag} fwd", out_p, out_x, tol)

    cot = jax.random.normal(k3, out_x.shape, jnp.float32).astype(dtype)

    def loss_p(f, s):
        return (correlation_pallas(f, s) * cot).sum()

    def loss_x(f, s):
        return (correlation_xla(f, s) * cot).sum()

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(first, second)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(first, second)
    _check(f"{tag} dfirst", gp[0], gx[0], tol)
    _check(f"{tag} dsecond", gp[1], gx[1], tol)


def check_warp(feat_shape, dtype, tol):
    tag = f"warp {feat_shape} {jnp.dtype(dtype).name}"
    B, H, W, C = feat_shape
    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    feat = jax.random.normal(k1, feat_shape, jnp.float32).astype(dtype)
    flow = (3.0 * jax.random.normal(k2, (B, H, W, 2), jnp.float32)
            ).astype(dtype)

    out_p = jax.jit(warp_pallas)(feat, flow)
    out_g = jax.jit(warp_gather)(feat, flow)
    _check(f"{tag} fwd", out_p, out_g, tol)

    cot = jax.random.normal(k3, out_g.shape, jnp.float32).astype(dtype)

    def loss(fn, f, fl):
        return (fn(f, fl) * cot).sum()

    gp = jax.jit(jax.grad(lambda f, fl: loss(warp_pallas, f, fl),
                          argnums=(0, 1)))(feat, flow)
    gg = jax.jit(jax.grad(lambda f, fl: loss(warp_gather, f, fl),
                          argnums=(0, 1)))(feat, flow)
    _check(f"{tag} dfeat", gp[0], gg[0], tol)
    # dflow multiplies feature-differences by cotangents: wider dynamic
    # range, so slightly looser in bf16.
    _check(f"{tag} dflow", gp[1], gg[1],
           tol * (4.0 if dtype == jnp.bfloat16 else 1.0))


def check_merge(shape, dtype, tol):
    B, N, H, W, C = shape
    tag = f"merge {shape} {jnp.dtype(dtype).name}"
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    feat = jax.random.normal(k1, shape, jnp.float32).astype(dtype)
    logits = (3.0 * jax.random.normal(k2, shape, jnp.float32)).astype(dtype)

    out_p = jax.jit(fused_softmax_merge)(feat, logits)
    out_x = jax.jit(fused_softmax_merge_xla)(feat, logits)
    _check(f"{tag} fwd", out_p, out_x, tol)

    cot = jax.random.normal(k3, out_x.shape, jnp.float32).astype(dtype)

    gp = jax.jit(jax.grad(
        lambda f, l: (fused_softmax_merge(f, l).astype(jnp.float32)
                      * cot.astype(jnp.float32)).sum(),
        argnums=(0, 1)))(feat, logits)
    gx = jax.jit(jax.grad(
        lambda f, l: (fused_softmax_merge_xla(f, l).astype(jnp.float32)
                      * cot.astype(jnp.float32)).sum(),
        argnums=(0, 1)))(feat, logits)
    _check(f"{tag} dfeat", gp[0], gx[0], tol)
    _check(f"{tag} dlogits", gp[1], gx[1], tol)


def check_resample(dtype_tol_default, tol_highest):
    """Affine band-resample kernel vs the gather oracle at the real
    synthesis geometry (432^2 -> 96^2, x4, border 24, rotation <= 1 deg,
    translation <= 24 px)."""
    import math

    import numpy as np

    from dbsr_tpu.ops.resample_pallas import (_resample_prim, _xla_oracle,
                                              band_rows_needed)

    H = W = 432
    d, border = 4, 24
    out_hw = ((H - 2 * border) // d, (W - 2 * border) // d)
    image = jax.random.uniform(jax.random.key(21), (H, W, 3), jnp.float32)
    rng = np.random.RandomState(2)
    invs = []
    for _ in range(8):
        th = math.radians(rng.uniform(-1.0, 1.0))
        tx, ty = rng.uniform(-24, 24, size=2)
        c, s = math.cos(th), math.sin(th)
        invs.append([[c, -s, tx], [s, c, ty]])
    invs = jnp.asarray(invs, jnp.float32)
    band = band_rows_needed(1.0, d, out_hw[1])

    want = jax.jit(lambda im, iv: _xla_oracle(im, iv, out_hw, d, border))(
        image, invs)
    got_h = jax.jit(lambda im, iv: _resample_prim(
        im, iv, out_hw, d, border, band, "highest"))(image, invs)
    _check("resample 432->96 highest", got_h, want, tol_highest)
    got_d = jax.jit(lambda im, iv: _resample_prim(
        im, iv, out_hw, d, border, band, "default"))(image, invs)
    _check("resample 432->96 default(bf16 MXU)", got_d, want,
           dtype_tol_default)

    # strict-path geometry: full-res d=1 warp (synthetic.py strict branch)
    band1 = band_rows_needed(1.0, 1, W)
    invs2 = invs[:3]
    want1 = jax.jit(lambda im, iv: _xla_oracle(im, iv, (H, W), 1, 0))(
        image, invs2)
    got1 = jax.jit(lambda im, iv: _resample_prim(
        im, iv, (H, W), 1, 0, band1, "highest"))(image, invs2)
    _check("resample 432 d=1 strict-warp highest", got1, want1, tol_highest)


def check_conv_s2d(dtype, tol, B=2, H2=24, W2=24):
    """Fine-patch s2d conv kernel (ops/conv_s2d_pallas.py) vs the
    structured-dense XLA formulation: fwd + d_input, compiled."""
    from dbsr_tpu.models.layers import s2d_conv_kernel
    from dbsr_tpu.ops.conv_s2d_pallas import (block_weight,
                                              conv3x3_s2d_pallas)

    C = O = 32
    tag = f"conv_s2d {B}x{H2}x{W2} {jnp.dtype(dtype).name}"
    k1, k2, k3 = jax.random.split(jax.random.key(31), 3)
    x = jax.random.normal(k1, (B, H2, W2, 4 * C), dtype)
    k = jax.random.normal(k2, (3, 3, C, O), jnp.float32) * 0.1
    cot = jax.random.normal(k3, (B, H2, W2, 4 * O), dtype)

    def oracle(x, k):
        # f32 operands throughout (mixed-dtype cotangents break the conv
        # transpose otherwise); the precision flag models the dtype's MXU
        # semantics — HIGHEST = exact f32 (what the Pallas kernel does
        # with f32 inputs), DEFAULT = bf16-truncated operands with f32
        # accumulation (what it does with bf16 inputs).
        K = s2d_conv_kernel(k)
        prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), K.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
            preferred_element_type=jnp.float32).astype(x.dtype)

    out_p = jax.jit(conv3x3_s2d_pallas)(x, k)
    out_x = jax.jit(oracle)(x, k)
    _check(f"{tag} fwd", out_p, out_x, tol)

    def loss_p(x, k):
        return (conv3x3_s2d_pallas(x, k).astype(jnp.float32)
                * cot.astype(jnp.float32)).sum()

    def loss_x(x, k):
        return (oracle(x, k).astype(jnp.float32)
                * cot.astype(jnp.float32)).sum()

    gx_p, gk_p = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(x, k)
    gx_x, gk_x = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(x, k)
    _check(f"{tag} d_input", gx_p, gx_x, tol)
    _check(f"{tag} d_kernel", gk_p, gk_x, tol)


def check_backwarp(shape, dtype, tol):
    """MXU hat-matrix backwarp (ops/interp.py:backwarp_matmul) vs the
    gather formulation at PWC decoder level shapes, fwd + grads."""
    from dbsr_tpu.ops.interp import backwarp, backwarp_matmul

    tag = f"backwarp {shape} {jnp.dtype(dtype).name}"
    B, H, W, C = shape
    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    im = jax.random.normal(k1, shape, jnp.float32).astype(dtype)
    flow = (0.15 * max(H, W) *
            jax.random.normal(k2, (B, H, W, 2), jnp.float32)).astype(dtype)

    out_m = jax.jit(backwarp_matmul)(im, flow)
    out_g = jax.jit(backwarp)(im, flow)
    _check(f"{tag} fwd", out_m, out_g, tol)

    cot = jax.random.normal(k3, out_g.shape, jnp.float32).astype(dtype)

    def loss(fn, x, fl):
        return (fn(x, fl) * cot).sum()

    gm = jax.jit(jax.grad(lambda x, fl: loss(backwarp_matmul, x, fl),
                          argnums=(0, 1)))(im, flow)
    gg = jax.jit(jax.grad(lambda x, fl: loss(backwarp, x, fl),
                          argnums=(0, 1)))(im, flow)
    _check(f"{tag} dim", gm[0], gg[0], tol)
    _check(f"{tag} dflow", gm[1], gg[1],
           tol * (4.0 if dtype == jnp.bfloat16 else 1.0))


def main():
    print(f"devices: {jax.devices()}")
    assert jax.default_backend() != "cpu", (
        "parity check must run on the real TPU (compiled kernels); "
        "CPU interpret-mode parity is covered by the unit tests")

    # PWC level-2 (64x64 input -> level-2 features 16x16x64) and the
    # smallest pyramid level; one bigger realistic shape for tiling stress.
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        check_correlation((4, 16, 16, 64), dtype, tol)
        check_correlation((4, 8, 8, 96), dtype, tol)
    # encoder warp shape (512ch 48x48, the hot path) + a PWC-level shape
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        check_warp((2, 48, 48, 512), dtype, tol)
        check_warp((2, 16, 16, 64), dtype, tol)
    # fused softmax-merge at eval (N=14) and train (N=8) fusion shapes
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        check_merge((2, 14, 48, 48, 512), dtype, tol)
        check_merge((2, 8, 48, 48, 512), dtype, tol)
    # MXU hat-matrix backwarp at PWC decoder level shapes
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        check_backwarp((2, 16, 16, 64), dtype, tol)
        check_backwarp((2, 32, 32, 32), dtype, tol)
    # affine band-resample (synthesis) kernel
    check_resample(dtype_tol_default=2e-2, tol_highest=1e-5)
    # fine-patch s2d conv (decoder post-shuffle stage)
    for dtype, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 3e-2)):
        check_conv_s2d(dtype, tol)

    if FAILURES:
        print(f"FAILED: {FAILURES}")
        sys.exit(1)
    print("ALL PARITY CHECKS PASSED (compiled TPU kernels)")


if __name__ == "__main__":
    main()
