"""Sub-stage breakdown of the fused on-device burst synthesis (B=16).

The full fused synthesis measures ~42 ms/step at B=16 (train_perf_probe),
the largest single stage of the training step. This script isolates the
pieces — inverse ISP (transcendental-heavy), the per-frame affine bilinear
resample (gather-heavy), flow-grid math, mosaic+noise (RNG) — to find
where the time goes. Methodology: bench.py (fori_loop, scalar fetch,
best-of-3 distinct inputs).
"""

import fcntl
import sys
import time

_lock = open("/tmp/tpu_probe.lock", "w")
fcntl.flock(_lock, fcntl.LOCK_EX)

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

B = 16
N = 8
ITERS = 8


def timeit(fn, *args):
    @jax.jit
    def loop(*a):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, acc: acc + fn(i, *a), jnp.float32(0.0))

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def report(name, ms):
    print(f"{name:40s} {ms:8.2f} ms", flush=True)


def main():
    from dbsr_tpu.data.synthetic import (BurstConfig, invert_isp,
                                         rgb2rawburst, single2lrburst,
                                         synthesize_batch)
    from dbsr_tpu.ops import camera, interp

    cfg = BurstConfig(burst_size=N, crop_sz=(384, 384), downsample_factor=4,
                      border_crop=24, max_translation=24.0, max_rotation=1.0,
                      fused_resample=True)
    key = jax.random.key(0)
    crops = jax.random.uniform(key, (B,) + cfg.pre_crop_sz + (3,),
                               jnp.float32)

    def full(i, crops):
        out = synthesize_batch(jax.random.fold_in(jax.random.key(1), i),
                               crops * (1 + 1e-6 * i), cfg)
        return out["burst"].sum() + out["frame_gt"].sum()
    report("full synthesis", timeit(full, crops))

    def isp_only(i, crops):
        def one(k, im):
            lin, _ = invert_isp(k, im, cfg)
            return lin
        keys = jax.random.split(jax.random.fold_in(jax.random.key(2), i), B)
        lin = jax.vmap(one)(keys, crops * (1 + 1e-6 * i))
        return lin.sum()
    report("inverse ISP only", timeit(isp_only, crops))

    def burst_only(i, crops):
        # skip ISP: treat the crop as already-linear
        def one(k, im):
            lr, flow = single2lrburst(k, im, cfg)
            return lr.sum() + flow.sum()
        keys = jax.random.split(jax.random.fold_in(jax.random.key(3), i), B)
        return jax.vmap(one)(keys, crops * (1 + 1e-6 * i)).sum()
    report("lr-burst (resample+flow) only", timeit(burst_only, crops))

    def burst_noflow(i, crops):
        # resample only, flow DCE'd away
        def one(k, im):
            lr, flow = single2lrburst(k, im, cfg)
            return lr.sum()
        keys = jax.random.split(jax.random.fold_in(jax.random.key(4), i), B)
        return jax.vmap(one)(keys, crops * (1 + 1e-6 * i)).sum()
    report("lr-burst resample only (no flow)", timeit(burst_noflow, crops))

    def mosaic_noise(i, x):
        k = jax.random.fold_in(jax.random.key(5), i)
        burst_rgb = x * (1 + 1e-6 * i)
        b = camera.mosaic(burst_rgb)
        shot, read = camera.random_noise_levels(k)
        b = camera.add_noise(k, b, shot, read)
        return jnp.clip(b, 0.0, 1.0).sum()
    lr_shape = (B, N, cfg.crop_sz[0] // 4, cfg.crop_sz[1] // 4, 3)
    lr = jax.random.uniform(key, lr_shape, jnp.float32)
    report("mosaic+noise only", timeit(mosaic_noise, lr))

    # raw bilinear gather at the same sampling shapes: 128 frames of 96x96
    # points from 432^2 source
    src = jax.random.uniform(key, (B * N,) + cfg.pre_crop_sz + (3,),
                             jnp.float32)
    coords = jax.random.uniform(
        key, (B * N, 96, 96, 2), jnp.float32) * 400.0

    def gather_only(i, src, coords):
        out = interp.sample_bilinear(src * (1 + 1e-6 * i), coords, "zeros")
        return out.sum()
    report("sample_bilinear 128x(96^2 from 432^2)",
           timeit(gather_only, src, coords))

    # --- candidate gather formulations (A/B) ---------------------------
    # XLA lays gather operands with C on the lane dim (C=3 -> 42.7x pad
    # expansion, seen in compile OOM dumps). Flattening (W, C) makes each
    # 2-row x 2-tap x C patch a contiguous [2, 2*C] slice on a [B, H, W*C]
    # operand whose lane dim is wide — one gather index per output pixel.
    def sample_bilinear_rowslice(im, coords):
        """Exact sample_bilinear('zeros') via ONE gather of a [2, 2C]
        contiguous slice per output pixel from a 1-padded [B, H, W*C]
        source."""
        H, W, C = im.shape[-3], im.shape[-2], im.shape[-1]
        x = coords[..., 0].astype(jnp.float32)
        y = coords[..., 1].astype(jnp.float32)
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        wx = x - x0f
        wy = y - y0f
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)

        imp = jnp.pad(im, ((0, 0), (1, 1), (1, 1), (0, 0)))
        flat = imp.reshape(imp.shape[0], H + 2, (W + 2) * C)
        ys = jnp.clip(y0 + 1, 0, H)          # [B, h, w]
        xs = jnp.clip(x0 + 1, 0, W) * C
        starts = jnp.stack([ys, xs], axis=-1)
        Bn, h, w = starts.shape[:3]
        starts_f = starts.reshape(Bn, h * w, 2)

        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(2, 3),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,),
        )
        taps = jax.lax.gather(
            flat, starts_f, dnums, slice_sizes=(1, 2, 2 * C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # [B, h*w, 2, 2C]
        taps = taps.reshape(Bn, h, w, 2, 2, C)

        out = jnp.zeros(taps.shape[:3] + (C,), im.dtype)
        for dy, dx, wgt in ((0, 0, (1 - wy) * (1 - wx)),
                            (0, 1, (1 - wy) * wx),
                            (1, 0, wy * (1 - wx)),
                            (1, 1, wy * wx)):
            yi = y0 + dy
            xi = x0 + dx
            mask = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            wgt = jnp.where(mask, wgt, 0.0).astype(im.dtype)
            out = out + taps[:, :, :, dy, dx, :] * wgt[..., None]
        return out

    def gather_rowslice(i, src, coords):
        out = sample_bilinear_rowslice(src * (1 + 1e-6 * i), coords)
        return out.sum()
    report("rowslice gather 128x(96^2 from 432^2)",
           timeit(gather_rowslice, src, coords))

    srcb = src.astype(jnp.bfloat16)

    def gather_bf16(i, src, coords):
        out = interp.sample_bilinear(src * (1 + 1e-6 * jnp.bfloat16(i)),
                                     coords, "zeros")
        return out.astype(jnp.float32).sum()
    report("sample_bilinear bf16 source", timeit(gather_bf16, srcb, coords))

    # Pallas band-resample kernel in isolation (same sampling shapes)
    from dbsr_tpu.ops.resample_pallas import (_resample_prim,
                                              band_rows_needed)
    import math as _math
    _rng = __import__("numpy").random.RandomState(3)
    _invs = []
    for _ in range(N):
        th = _math.radians(_rng.uniform(-1, 1))
        tx, ty = _rng.uniform(-24, 24, 2)
        c_, s_ = _math.cos(th), _math.sin(th)
        _invs.append([[c_, -s_, tx], [s_, c_, ty]])
    _invs = jnp.asarray(_invs, jnp.float32)
    _band = band_rows_needed(1.0, 4, 96)
    src1 = jax.random.uniform(key, (B,) + cfg.pre_crop_sz + (3,),
                              jnp.float32)

    def band_kernel(i, src, invs):
        out = jax.vmap(lambda im: _resample_prim(
            im, invs, (96, 96), 4, 24, _band, "default"))(
            src * (1 + 1e-6 * i))
        return out.sum()
    report("band-resample kernel 128x(96^2)",
           timeit(band_kernel, src1, _invs))

    # strict (reference two-stage) synthesis for comparison
    cfg_strict = cfg._replace(fused_resample=False)

    def full_strict(i, crops):
        out = synthesize_batch(jax.random.fold_in(jax.random.key(6), i),
                               crops * (1 + 1e-6 * i), cfg_strict)
        return out["burst"].sum() + out["frame_gt"].sum()
    report("full synthesis (strict two-stage)", timeit(full_strict, crops))


if __name__ == "__main__":
    main()
