"""Component-level timing of the SHIPPED AlignLite forward on the chip.

VERDICT r4 #3 / #6: the lite-aligner protocol step is ~15 ms/step
behind the PWC arm at near-identical analytic FLOPs, and the aligner's
own compute is <1 ms at the roofline — the cost is in small-op
overheads at the full-resolution levels. This probe times the forward
COMPONENT BY COMPONENT at the exact shipped shapes (B=16, N=8 bursts:
112 source frames vs 16 targets, 48x48 packed grid, bf16) so pass 2
targets the measured milliseconds, not the analytic ones:

  demosaic | extractor | cost_volume L0/L1/L2 | backwarp L0/L1 |
  decoder convs L0/L1/L2 | refiner | flow upsamples | full forward

Methodology matches bench.py: device-side fori_loop with index-varying
inputs, scalar-fetch sync, best of 3. Pauses a live campaign for the
measurement window (chip guard) unless --no_guard.

Usage:
    python util_scripts/align_perf_probe.py [--iters 8] [--no_guard]
"""

import argparse
import fcntl
import json
import os
import sys
import time

_lock = open("/tmp/tpu_probe.lock", "w")
fcntl.flock(_lock, fcntl.LOCK_EX)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

B, N, H, W = 16, 8, 48, 48
P = B * (N - 1)  # frame pairs per step
ITERS = 8


def analytic(fn, *args):
    """(flops, io_bytes) of ``fn(*args)``: XLA HLO cost-analysis FLOPs
    (CPU lowering, Pallas disabled — the same oracle numerator
    bench.py's MFU uses) and the perfect-fusion HBM traffic lower
    bound (read every input once + write every output once, bf16).
    ``max(flops/PEAK, io_bytes/HBM)`` is the component's optimistic
    roofline; a measured time well above it has fusion/layout/dispatch
    headroom, one near it is hardware-bound."""
    env = os.environ.get("DBSR_DISABLE_PALLAS")
    os.environ["DBSR_DISABLE_PALLAS"] = "1"
    try:
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.result_type(x)), args)
        with jax.default_device(jax.devices("cpu")[0]):
            ca = jax.jit(fn).lower(*shapes).cost_analysis()
            outs = jax.eval_shape(fn, *shapes)
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        size = lambda t: t.size * t.dtype.itemsize  # noqa: E731
        io = sum(size(x) for x in jax.tree.leaves(shapes)) + \
            sum(size(x) for x in jax.tree.leaves(outs))
        return flops, float(io)
    finally:
        if env is None:
            del os.environ["DBSR_DISABLE_PALLAS"]
        else:
            os.environ["DBSR_DISABLE_PALLAS"] = env


V5E_PEAK_BF16 = 197e12  # FLOP/s
V5E_HBM = 819e9         # B/s


def timeit(fn, *args, iters=None):
    iters = iters or ITERS

    @jax.jit
    def loop(*a):
        return jax.lax.fori_loop(
            0, iters, lambda i, acc: acc + fn(i, *a), jnp.float32(0.0))

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1000.0


def main(argv=None):
    global ITERS
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=ITERS)
    ap.add_argument("--no_guard", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test the probe on CPU (numbers are "
                         "meaningless; validates shapes/compile only)")
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)
    ITERS = args.iters
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dbsr_tpu.models.align_lite import (AlignLiteNet, BurstAlignLite,
                                            LiteDecoder, LiteExtractor,
                                            LiteRefiner)
    from dbsr_tpu.ops.camera import demosaic_naive
    from dbsr_tpu.ops.correlation import cost_volume
    from dbsr_tpu.ops.interp import backwarp_auto, resize_bilinear
    from dbsr_tpu.utils.chip_guard import ChipPause

    dt = jnp.bfloat16
    key = jax.random.key(0)
    burst = jax.random.uniform(key, (B, N, H, W, 4), jnp.float32)
    results = {}

    def report(name, ms, fn=None, args=()):
        row = {"ms": ms}
        line = f"{name:34s} {ms:8.3f} ms"
        if fn is not None:
            flops, io = analytic(lambda *a: fn(0, *a), *args)
            t_roof = max(flops / V5E_PEAK_BF16, io / V5E_HBM) * 1e3
            row.update(flops=flops, io_bytes=io, roofline_ms=t_roof,
                       x_roofline=ms / t_roof if t_roof else float("inf"))
            line += (f"  roof {t_roof:7.3f} ms  ({ms / t_roof:5.1f}x, "
                     f"{flops / 1e9:6.2f} GF, {io / 1e6:7.1f} MB)")
        results[name] = row
        print(line, flush=True)

    guard = ChipPause() if not args.no_guard else None
    if guard:
        guard.__enter__()
    try:
        # ---- full wrapper fwd (the number the train step pays) ----
        net = BurstAlignLite(dtype=dt)
        params = net.init(jax.random.key(1), burst)

        def full(i, p, b):
            return net.apply(p, b * (1 + 1e-6 * i)).astype(
                jnp.float32).sum()
        report("full BurstAlignLite fwd", timeit(full, params, burst),
               full, (params, burst))

        # ---- demosaic ----
        def demo(i, b):
            return demosaic_naive(b * (1 + 1e-6 * i)).astype(
                jnp.float32).sum()
        report("demosaic", timeit(demo, burst), demo, (burst,))

        # ---- extractor on all 128 images ----
        rgb = jnp.asarray(demosaic_naive(burst))
        imgs = rgb.reshape((-1, H, W, 3))  # 128 images
        ext = LiteExtractor(dtype=dt)
        ep = ext.init(jax.random.key(2), imgs)

        def extract(i, p, x):
            fs = ext.apply(p, x * (1 + 1e-6 * i))
            return sum(f.astype(jnp.float32).sum() for f in fs)
        report("extractor (128 imgs)", timeit(extract, ep, imgs),
               extract, (ep, imgs))

        # per-level feature tensors for component probes
        feats = jax.tree.map(
            lambda x: x, ext.apply(ep, imgs))
        f_pair = [jnp.asarray(f[:P], dt) for f in feats]
        f_tgt = [jnp.asarray(f[:P], dt) for f in feats]
        flows = [jnp.zeros((P, H // (2 ** l), W // (2 ** l), 2), dt)
                 for l in range(3)]

        for lvl in (0, 1, 2):
            a, b = f_pair[lvl], f_tgt[lvl]

            def cv(i, a, b):
                return cost_volume(a * (1 + 1e-6 * i), b).astype(
                    jnp.float32).sum()
            report(f"cost_volume L{lvl} {tuple(a.shape)}",
                   timeit(cv, a, b), cv, (a, b))

        for lvl in (0, 1):
            a, fl = f_pair[lvl], flows[lvl]

            def bw(i, a, fl):
                return backwarp_auto(a * (1 + 1e-6 * i), fl).astype(
                    jnp.float32).sum()
            report(f"backwarp L{lvl} {tuple(a.shape)}",
                   timeit(bw, a, fl), bw, (a, fl))

        for lvl in (0, 1, 2):
            dec = LiteDecoder(lvl, dtype=dt)
            fl = None if lvl == 2 else flows[lvl]
            dp = dec.init(jax.random.key(3), f_tgt[lvl], f_pair[lvl], fl)

            def decf(i, p, a, b, fl=fl, dec=dec):
                out, feat = dec.apply(p, a * (1 + 1e-6 * i), b, fl)
                return out.astype(jnp.float32).sum() + \
                    feat.astype(jnp.float32).sum()
            report(f"decoder L{lvl} (cv+convs)",
                   timeit(decf, dp, f_tgt[lvl], f_pair[lvl]),
                   decf, (dp, f_tgt[lvl], f_pair[lvl]))

        ref = LiteRefiner(dtype=dt)
        rx = jnp.concatenate([jnp.zeros((P, H, W, 32), dt), flows[0]],
                             axis=-1)
        rp = ref.init(jax.random.key(4), rx)

        def refine(i, p, x):
            return ref.apply(p, x * (1 + 1e-6 * i)).astype(
                jnp.float32).sum()
        report("refiner", timeit(refine, rp, rx), refine, (rp, rx))

        def ups(i, fl):
            out = resize_bilinear(fl * (1 + 1e-6 * i), (H, W)) * 2.0
            return out.astype(jnp.float32).sum()
        report("flow upsample L1->L0", timeit(ups, flows[1]),
               ups, (flows[1],))

        # ---- inner net without wrapper overhead ----
        inner = AlignLiteNet(dtype=dt)
        src = imgs[:P]
        tgt = imgs[:B]
        ip = inner.init(jax.random.key(5), src, tgt, target_repeat=N - 1)

        def inner_f(i, p, s, t):
            return inner.apply(p, s * (1 + 1e-6 * i), t,
                               target_repeat=N - 1).sum()
        report("AlignLiteNet fwd (inner)", timeit(inner_f, ip, src, tgt),
               inner_f, (ip, src, tgt))
    finally:
        if guard:
            guard.__exit__(None, None, None)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
