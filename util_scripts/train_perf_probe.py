"""Stage-level breakdown of the B=16 training step on the real chip.

Times (device-side fori_loop, scalar-fetch sync, best-of-3 — the bench.py
methodology) each stage of the train step in isolation, forward and
forward+backward:

  synthesis | encoder-embed | pwc-flow | warp | merging | decoder | full step

Use this to decide where the next perf pass goes (PERF.md "Future
targets"). Stages are timed with realistic input shapes/dtypes taken from
the actual pipeline (B=16, N=8, 48x48 packed RAW -> 384^2 RGB, bf16
compute / f32 params).
"""

import argparse
import fcntl
import json
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
HW = (48, 48)
ITERS = 8


def timeit(fn, *args):
    """Compile fn(i, *args)->scalar into a fori_loop, return ms/iter."""

    @jax.jit
    def loop(*a):
        return jax.lax.fori_loop(
            0, ITERS, lambda i, acc: acc + fn(i, *a), jnp.float32(0.0))

    float(loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


def report(name, ms):
    print(f"{name:34s} {ms:8.2f} ms", flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="all",
                   help="comma list: synth,embed,pwc,warp,merge,dec,"
                        "fwd,step")
    args = p.parse_args()
    want = set(args.stages.split(","))

    def on(s):
        return "all" in want or s in want

    import optax

    from dbsr_tpu.data.synthetic import BurstConfig, synthesize_batch
    from dbsr_tpu.models.dbsr import (AlignedEncoder, PixShuffleDecoder,
                                      ResEncoder, WeightedSumMerge,
                                      dbsrnet_cvpr2021)
    from dbsr_tpu.models.pwcnet import PWCNet
    from dbsr_tpu.ops.warp_pallas import warp_pallas
    from dbsr_tpu.training.actors import make_synthetic_actor

    dt = jnp.bfloat16
    key = jax.random.key(0)
    cfg = BurstConfig(burst_size=N, crop_sz=(384, 384), downsample_factor=4,
                      border_crop=24, max_translation=24.0, max_rotation=1.0,
                      fused_resample=True)

    crops = jax.random.uniform(key, (B,) + cfg.pre_crop_sz + (3,),
                               jnp.float32)
    burst = jax.random.uniform(key, (B, N) + HW + (4,), jnp.float32)

    if on("synth"):
        def synth(i, crops):
            out = synthesize_batch(jax.random.fold_in(jax.random.key(1), i),
                                   crops * (1 + 1e-6 * i), cfg)
            return out["burst"].sum() + out["frame_gt"].sum()
        report("synthesis (fused)", timeit(synth, crops))

    flat = burst.reshape((-1,) + HW + (4,))
    if on("embed"):
        enc = ResEncoder(dtype=dt)
        ep = enc.init(key, flat)

        def embed_f(i, p, x):
            return enc.apply(p, x * (1 + 1e-6 * i)).astype(jnp.float32).sum()
        report("encoder embed fwd (B*N=128)", timeit(embed_f, ep, flat))

        def embed_b(i, p, x):
            g = jax.grad(lambda pp: embed_f(i, pp, x))(p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))
        report("encoder embed fwd+bwd", timeit(embed_b, ep, flat))

    if on("pwc"):
        from dbsr_tpu.ops.camera import demosaic_naive
        rgb = demosaic_naive(burst)
        ref = jnp.broadcast_to(rgb[:, :1], (B, N - 1) + rgb.shape[-3:])
        a = ref.reshape((-1,) + rgb.shape[-3:])
        b = rgb[:, 1:].reshape((-1,) + rgb.shape[-3:])
        pwc = PWCNet(dtype=dt)
        pp = pwc.init(key, b, a)

        def pwc_f(i, p, x, y):
            return pwc.apply(p, x * (1 + 1e-6 * i), y).astype(
                jnp.float32).sum()
        report("pwc flow fwd (pairs=112)", timeit(pwc_f, pp, b, a))

        def pwc_b(i, p, x, y):
            g = jax.grad(lambda pp2: pwc_f(i, pp2, x, y))(p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))
        report("pwc flow fwd+bwd", timeit(pwc_b, pp, b, a))

    if on("warp"):
        feat = jax.random.uniform(key, (B * (N - 1),) + HW + (512,), dt)
        flow = jax.random.uniform(key, (B * (N - 1),) + HW + (2,),
                                  jnp.float32) * 4 - 2

        def warp_f(i, f, fl):
            return warp_pallas(f * (1 + 1e-6 * i), fl).astype(
                jnp.float32).sum()
        report("warp 512ch fwd (112 frames)", timeit(warp_f, feat, flow))

        def warp_b(i, f, fl):
            gf, gfl = jax.grad(
                lambda a, b2: warp_f(i, a, b2), argnums=(0, 1))(f, fl)
            return gf.astype(jnp.float32).sum() + gfl.sum()
        report("warp 512ch fwd+bwd", timeit(warp_b, feat, flow))

    if on("merge"):
        mrg = WeightedSumMerge(dtype=dt)
        enc_in = {
            "ref_feat": jax.random.uniform(key, (B, N - 1) + HW + (512,), dt),
            "oth_feat": jax.random.uniform(key, (B, N - 1) + HW + (512,), dt),
            "offsets": jax.random.uniform(key, (B, N - 1) + HW + (2,),
                                          jnp.float32),
        }
        mp = mrg.init(key, enc_in)

        def merge_f(i, p, x):
            x = dict(x, oth_feat=x["oth_feat"] * (1 + 1e-6 * i))
            return mrg.apply(p, x)["fused_enc"].astype(jnp.float32).sum()
        report("merging fwd", timeit(merge_f, mp, enc_in))

        def merge_b(i, p, x):
            g = jax.grad(lambda pp: merge_f(i, pp, x))(p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))
        report("merging fwd+bwd", timeit(merge_b, mp, enc_in))

    if on("dec"):
        dec = PixShuffleDecoder(dtype=dt, fused_s2d=True)
        fused = jax.random.uniform(key, (B,) + HW + (512,), dt)
        dp = dec.init(key, fused)

        def dec_f(i, p, x):
            return dec.apply(p, x * (1 + 1e-6 * i)).astype(jnp.float32).sum()
        report("decoder fwd (s2d)", timeit(dec_f, dp, fused))

        def dec_b(i, p, x):
            g = jax.grad(lambda pp: dec_f(i, pp, x))(p)
            return sum(jnp.sum(l.astype(jnp.float32))
                       for l in jax.tree.leaves(g))
        report("decoder fwd+bwd (s2d)", timeit(dec_b, dp, fused))

    if on("fwd") or on("step"):
        net = dbsrnet_cvpr2021(train_alignment=True, dtype=dt,
                               fused_s2d_decoder=True)
        params = net.init(key, burst[:1])
        actor = make_synthetic_actor(net, boundary_ignore=40)
        tx = optax.adam(1e-4)
        opt_state = tx.init(params)

        if on("fwd"):
            def fwd(i, p, x):
                pred, _ = net.apply(p, x * (1 + 1e-6 * i))
                return pred.sum()
            report("model fwd (B=16, N=8)", timeit(fwd, params, burst))

        if on("step"):
            def step(i, p, s, crops):
                batch = synthesize_batch(
                    jax.random.fold_in(jax.random.key(2), i),
                    crops * (1 + 1e-6 * i), cfg)
                loss, grads = jax.value_and_grad(
                    lambda pp: actor(pp, batch)[0])(p)
                up, _ = tx.update(grads, s, p)
                return loss + sum(jnp.sum(l.astype(jnp.float32))
                                  for l in jax.tree.leaves(up))
            report("FULL train step (synth+f+b+adam)",
                   timeit(step, params, opt_state, crops))


if __name__ == "__main__":
    main()
