"""Per-stage roofline of the DBSR train step (VERDICT r3 #5).

For the two stages VERDICT r3 flagged (merging 28.2 ms, decoder 47.5 ms
of a 112 ms B=16 step — round-2 stage table in PERF.md), measure the
isolated fwd+bwd time on the chip and compare against both rooflines:

  * MXU:  t_flops = analytic FLOPs / 197 TFLOP/s (v5e bf16 peak)
  * HBM:  t_bytes = ideal bytes / 819 GB/s (v5e HBM)

"Ideal bytes" is the perfect-fusion lower bound computed from the conv
stack structure: every conv reads its input once and writes its output
once (weights are negligible at these channel counts), elementwise ops
fuse for free, and the backward re-reads saved activations once and
writes input/weight grads once (~3x the forward traffic for a conv
chain). A stage whose measured time sits near max(t_flops, t_bytes) is
at its roofline — further kernel work cannot help; a stage well above
it has fusion/layout headroom.

FLOPs come from XLA HLO cost analysis of the stage with Pallas disabled
(the same oracle-formulation numerator bench.py's MFU uses).

Usage (pauses a running campaign for the measurement window):
    python util_scripts/stage_roofline.py [--iters 16] [--no_guard]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

V5E_PEAK_BF16 = 197e12      # FLOP/s
V5E_HBM = 819e9             # B/s
B, N, H, W = 16, 8, 48, 48  # train shapes (packed grid)
C_ENC = 512


def analytic_flops(fn, *args):
    env = os.environ.get("DBSR_DISABLE_PALLAS")
    os.environ["DBSR_DISABLE_PALLAS"] = "1"
    try:
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                           jnp.result_type(x)), args)
        with jax.default_device(jax.devices("cpu")[0]):
            ca = jax.jit(fn).lower(*shapes).cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    finally:
        if env is None:
            del os.environ["DBSR_DISABLE_PALLAS"]
        else:
            os.environ["DBSR_DISABLE_PALLAS"] = env


def conv_chain_bytes(tensors, bwd: bool = True, dtype_bytes: int = 2):
    """Perfect-fusion traffic of a conv chain given the sequence of
    activation shapes [(pixels, channels), ...]: forward reads each
    input + writes each output once; backward re-reads saved
    activations and writes activation grads (~2x forward reads +
    forward-sized writes)."""
    fwd = sum(p * c for p, c in tensors) * dtype_bytes
    return fwd * (3 if bwd else 1)


def time_stage(name, fn, args, iters):
    """Device-side fori_loop timing with index-varying inputs (relay
    caches identical executions; block via scalar fetch)."""
    leaves, treedef = jax.tree.flatten(args)

    @jax.jit
    def loop(*leaves):
        def body(i, acc):
            scaled = [x * (1.0 + 1e-6 * i) if jnp.issubdtype(
                jnp.result_type(x), jnp.floating) else x for x in leaves]
            out = fn(*jax.tree.unflatten(treedef, scaled))
            return acc + jax.tree.leaves(out)[0].astype(jnp.float32).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(*leaves))  # compile + warm
    best = float("inf")
    for k in range(3):
        scaled = [x * (1.0 + 1e-5 * (k + 1)) if jnp.issubdtype(
            jnp.result_type(x), jnp.floating) else x for x in leaves]
        t0 = time.perf_counter()
        float(loop(*scaled))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--no_guard", action="store_true")
    ap.add_argument("--no_measure", action="store_true",
                    help="analytic rooflines only (no chip timing)")
    args = ap.parse_args()
    if args.no_measure:  # analytic mode must not touch the TPU backend
        jax.config.update("jax_platforms", "cpu")

    from dbsr_tpu.models.dbsr import PixShuffleDecoder, WeightedSumMerge

    px, px_hr = H * W, (8 * H) * (8 * W)
    stages = {}

    # ---- merging: WeightedSumMerge fwd+bwd at [B, N, 48, 48, 512] ----
    merge = WeightedSumMerge(input_dim=C_ENC, dtype=jnp.bfloat16)
    enc_in = {
        "ref_feat": jax.random.normal(
            jax.random.key(0), (B, N - 1, H, W, C_ENC), jnp.bfloat16),
        "oth_feat": jax.random.normal(
            jax.random.key(1), (B, N - 1, H, W, C_ENC), jnp.bfloat16),
        "offsets": jax.random.normal(
            jax.random.key(2), (B, N - 1, H, W, 2), jnp.bfloat16),
    }
    mparams = jax.jit(merge.init)(jax.random.key(3), enc_in)

    def merge_fb(params, inputs):
        def loss(p, x):
            out = merge.apply(p, x)["fused_enc"]
            return (out.astype(jnp.float32) ** 2).mean()

        l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, inputs)
        return l

    # ideal bytes: read ref/oth feats once, write fused once; the
    # predictor chain runs at 64-128 ch (~6% of the 512-ch traffic)
    n_all = B * N * px
    merge_tensors = [(n_all, C_ENC),            # all_feat read
                     (n_all, 64), (n_all, 64),  # proj, offsets branch
                     (n_all, 128), (n_all, 128), (n_all, 128),  # predictor
                     (n_all, C_ENC),            # logits
                     (B * px, C_ENC)]           # fused out
    stages["merging"] = dict(
        fn=merge_fb, args=(mparams, enc_in),
        flops=analytic_flops(merge_fb, mparams, enc_in),
        bytes=conv_chain_bytes(merge_tensors))

    # ---- aligner fwd (frozen in the shipped protocol): AlignLite vs
    # PWC on the train pair-batch [B*(N-1), 48, 48, 3] ----
    from dbsr_tpu.models.align_lite import AlignLiteNet
    from dbsr_tpu.models.pwcnet import PWCNet

    pairs = B * (N - 1)
    src = jax.random.uniform(jax.random.key(6), (pairs, H, W, 3),
                             jnp.float32).astype(jnp.bfloat16)
    tgt = jax.random.uniform(jax.random.key(7), (pairs, H, W, 3),
                             jnp.float32).astype(jnp.bfloat16)
    for name, net in (("aligner_lite", AlignLiteNet(dtype=jnp.bfloat16)),
                      ("aligner_pwc", PWCNet(dtype=jnp.bfloat16))):
        aparams = jax.jit(net.init)(jax.random.key(8), src, tgt)

        def align_fwd(params, a, b, net=net):
            return net.apply(params, a, b)

        # traffic is negligible next to the compute-path stages; report
        # FLOPs-roofline only (bytes ~ a few activations at 48^2)
        stages[name] = dict(
            fn=align_fwd, args=(aparams, src, tgt),
            flops=analytic_flops(align_fwd, aparams, src, tgt),
            bytes=pairs * H * W * (3 * 2 + 2) * 4)

    # ---- decoder: PixShuffleDecoder fwd+bwd at [B, 48, 48, 512] ----
    for s2d in (False, True):
        dec = PixShuffleDecoder(dtype=jnp.bfloat16, fused_s2d=s2d)
        fused = jax.random.normal(jax.random.key(4), (B, H, W, C_ENC),
                                  jnp.bfloat16)
        dparams = jax.jit(dec.init)(jax.random.key(5), fused)

        def dec_fb(params, x, dec=dec):
            def loss(p, xx):
                out = dec.apply(p, xx)
                return (out.astype(jnp.float32) ** 2).mean()

            l, g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
            return l

        npx = B * px
        dec_tensors = (
            [(npx, C_ENC), (npx, 64)]             # input conv
            + [(npx, 64)] * 10                    # 5 ResBlocks
            + [(npx, 32 * 64)]                    # pixshuffle conv out
            + [(B * px_hr, 32)] * 9               # 4 post ResBlocks + conv
            + [(B * px_hr, 3)])
        stages[f"decoder(s2d={s2d})"] = dict(
            fn=dec_fb, args=(dparams, fused),
            flops=analytic_flops(dec_fb, dparams, fused),
            bytes=conv_chain_bytes(dec_tensors))

    guard = None
    if not args.no_guard and not args.no_measure:
        from dbsr_tpu.utils.chip_guard import ChipPause
        guard = ChipPause()
        guard.__enter__()
    try:
        rows = []
        for name, s in stages.items():
            ms = float("nan") if args.no_measure else \
                time_stage(name, s["fn"], s["args"], args.iters) * 1e3
            t_mxu = s["flops"] / V5E_PEAK_BF16 * 1e3
            t_hbm = s["bytes"] / V5E_HBM * 1e3
            roof = max(t_mxu, t_hbm)
            rows.append({
                "stage": name, "measured_ms": round(ms, 2),
                "gflop": round(s["flops"] / 1e9, 1),
                "t_mxu_ms": round(t_mxu, 2),
                "ideal_gb": round(s["bytes"] / 1e9, 3),
                "t_hbm_ms": round(t_hbm, 2),
                "bound": "mxu" if t_mxu > t_hbm else "hbm",
                "roofline_ms": round(roof, 2),
                "headroom_x": round(ms / roof, 2),
            })
            print(json.dumps(rows[-1]), flush=True)
    finally:
        if guard is not None:
            guard.__exit__()
    return rows


if __name__ == "__main__":
    main()
