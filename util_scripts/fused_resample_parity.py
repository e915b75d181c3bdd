"""Quantify the parity risk of ``BurstConfig.fused_resample`` (VERDICT #4).

Two paired on-chip training runs — identical seeds, batches, ISP/noise
draws — differing ONLY in the synthesis degradation kernel:
  A) strict:  per-frame full-res affine warp -> border crop -> x4 bilinear
              downsample (the reference's two-stage chain,
              ``synthetic_burst_generation.py:209-229``)
  B) fused:   one bilinear resample at the composed affine coordinates
              (20x faster; slightly different kernel support)

Both runs are validated against the SAME strict-kernel validation set
(the reference protocol — eval bursts are always strict), PSNR with
boundary_ignore=40. The report is the val-PSNR delta: if |delta| is within
run-to-run noise, fused_resample is safe for the parity run.

Data is procedural (zero-egress blocks Zurich): multi-octave filtered
noise with image-like spectra. Usage:

    python util_scripts/fused_resample_parity.py [--steps 2000] [--batch 16]
"""

import argparse
import fcntl
import sys
import time

_lock = open("/tmp/tpu_probe.lock", "w")
fcntl.flock(_lock, fcntl.LOCK_EX)

import numpy as np

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def procedural_pool(n, hw, seed):
    """Multi-octave filtered-noise RGB crops in [0, 1], uint8."""
    import jax
    import jax.numpy as jnp

    from dbsr_tpu.ops.interp import resize_bilinear

    H, W = hw

    @jax.jit
    def make(key):
        img = jnp.zeros((H, W, 3), jnp.float32)
        amp = 1.0
        total = 0.0
        for octave, base in enumerate((7, 14, 28, 56, 112)):
            k = jax.random.fold_in(key, octave)
            coarse = jax.random.uniform(k, (base, base, 3), jnp.float32)
            img = img + amp * resize_bilinear(coarse, (H, W))
            total += amp
            amp *= 0.55
        img = img / total
        lo = img.min()
        hi = img.max()
        return (img - lo) / (hi - lo + 1e-8)

    import jax

    # chunked + vmapped: 288 individual device calls through the relay
    # proved stall-prone (high per-call latency, one observed wedge);
    # 9 batched calls with per-chunk progress prints are robust.
    chunk = 32
    make_v = jax.jit(jax.vmap(make))
    pool = np.empty((n, H, W, 3), np.uint8)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        keys = jnp.stack([jax.random.key(seed * 100003 + i)
                          for i in range(lo, hi)])
        ims = np.asarray(make_v(keys))
        pool[lo:hi] = np.clip(ims * 255.0, 0, 255).astype(np.uint8)
        print(f"  pool {hi}/{n}", flush=True)
    return pool


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--val_bursts", type=int, default=32)
    ap.add_argument("--val_every", type=int, default=500)
    ap.add_argument("--pool", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dbsr_tpu.data.synthetic import BurstConfig, synthesize_batch
    from dbsr_tpu.models.dbsr import dbsrnet_cvpr2021
    from dbsr_tpu.ops.metrics import psnr
    from dbsr_tpu.training.actors import make_synthetic_actor

    def cfg(fused):
        return BurstConfig(burst_size=8, crop_sz=(384, 384),
                           downsample_factor=4, border_crop=24,
                           max_translation=24.0, max_rotation=1.0,
                           fused_resample=fused)

    print("building procedural pools...", flush=True)
    t0 = time.time()
    pool = procedural_pool(args.pool, cfg(False).pre_crop_sz, seed=1)
    val_pool = procedural_pool(args.val_bursts, cfg(False).pre_crop_sz,
                               seed=2)
    print(f"  {time.time() - t0:.0f}s", flush=True)

    # Fixed strict-kernel validation set (the reference protocol).
    strict_cfg = cfg(False)
    val_crops = jnp.asarray(val_pool.astype(np.float32) / 255.0)
    val_batch = synthesize_batch(jax.random.key(999), val_crops, strict_cfg)
    val_burst = val_batch["burst"]
    val_gt = val_batch["frame_gt"]

    def run(fused):
        c = cfg(fused)
        net = dbsrnet_cvpr2021(train_alignment=True, dtype=jnp.bfloat16,
                               fused_s2d_decoder=True)
        actor = make_synthetic_actor(net, boundary_ignore=40)
        tx = optax.adam(1e-4)
        init_burst = jnp.zeros((1, c.burst_size) + c.burst_hw + (4,))
        params = net.init(jax.random.key(7), init_burst)
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, key, crops):
            batch = synthesize_batch(key, crops, c)

            def loss_fn(p):
                loss, stats = actor(p, batch)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def val_psnr(params):
            pred, _ = net.apply(params, val_burst)
            # reference eval protocol: quantize to uint16/2^14 then PSNR
            q = jnp.round(jnp.clip(pred, 0.0, 1.0) * (2**14)) / (2**14)
            return psnr(q, val_gt, boundary_ignore=40)

        rng = np.random.RandomState(0)  # SAME batch order for both runs
        history = []
        t0 = time.time()
        # The axon relay client leaks EVERY host->device transfer's bytes
        # (measured 35.6 MB/step at f32 B=16 — OOM-killed a 2x2000-step
        # run at 130 GB RSS). Stage the pool in HBM once and index
        # on-device per step (leak ~0.1 MB/step).
        pool_dev = jnp.asarray(pool.astype(np.float32) / 255.0)
        for step in range(1, args.steps + 1):
            idx = jnp.asarray(rng.randint(0, args.pool, size=args.batch))
            crops = jnp.take(pool_dev, idx, axis=0)
            key = jax.random.fold_in(jax.random.key(123), step)
            params, opt_state, loss = train_step(params, opt_state, key,
                                                 crops)
            if step % args.val_every == 0 or step == args.steps:
                v = float(val_psnr(params))
                history.append((step, v))
                print(f"  [{'fused' if fused else 'strict'}] step {step}: "
                      f"loss={float(loss):.4f} val_psnr={v:.3f} dB "
                      f"({time.time() - t0:.0f}s)", flush=True)
        return history

    print("=== run A: strict resample ===", flush=True)
    hist_strict = run(False)
    print("=== run B: fused resample ===", flush=True)
    hist_fused = run(True)

    print("\nstep | strict dB | fused dB | delta")
    for (s, a), (_, b) in zip(hist_strict, hist_fused):
        print(f"{s:5d} | {a:9.3f} | {b:8.3f} | {b - a:+.3f}")
    print(f"\nFINAL DELTA (fused - strict): "
          f"{hist_fused[-1][1] - hist_strict[-1][1]:+.3f} dB over "
          f"{args.steps} steps")


if __name__ == "__main__":
    main()
