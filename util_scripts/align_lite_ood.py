"""AlignLite out-of-distribution EPE table (VERDICT r4 weak-#5).

The shipped frozen aligner's 0.098 px val EPE is measured on its own
training distribution (dead-leaves sources, translation-dominant
affines, fused degradation, the full noise draw). A 39 dB campaign
leans entirely on this frozen component, so this script measures EPE
on every regime the synthesis family can pose
(reference motion family: ``data/synthetic_burst_generation.py:160-186``),
using the synthesis pipeline's exact dense flow labels as ground truth:

  base        training distribution (sanity anchor vs the banked 0.098)
  mixed       MIXED_RECIPE sources (edges/gratings/noise/gradients)
  rot2x/rot4x rotation-heavy affines (2x / 4x the training max 1 deg)
  shear       shear+anisotropic-scale extremes (training had none)
  strict      strict two-stage degradation kernel (train uses fused)
  clean       no sensor noise (noise-grid corner)
  noise_max   pinned max-level shot/read noise (the other corner)
  trans_only  pure translation (isolates the rotation contribution)

Usage:
    python util_scripts/align_lite_ood.py [--batches 8] [--batch 8]
        [--artifact dbsr_tpu/artifacts/align_lite_params.ckpt] [--json OUT]
"""

import argparse
import fcntl
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_lock = open("/tmp/tpu_probe.lock", "w")
fcntl.flock(_lock, fcntl.LOCK_EX)

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dbsr_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def regimes(base_cfg):
    """name -> (cfg, pool_mix, noise_override) table."""
    c = base_cfg
    return {
        "base": (c, "deadleaves", None),
        "mixed": (c, "mixed", None),
        "rot2x": (c._replace(max_rotation=2.0), "deadleaves", None),
        "rot4x": (c._replace(max_rotation=4.0), "deadleaves", None),
        "shear": (c._replace(max_shear=0.2, max_scale=0.1,
                             max_ar_factor=0.1), "deadleaves", None),
        "strict": (c._replace(fused_resample=False), "deadleaves", None),
        "clean": (c._replace(add_noise=False), "deadleaves", None),
        "noise_max": (c._replace(add_noise=False), "deadleaves", "max"),
        "trans_only": (c._replace(max_rotation=0.0), "deadleaves", None),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", default=os.path.join(
        REPO, "dbsr_tpu", "artifacts", "align_lite_params.ckpt"))
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dbsr_tpu.data.procedural import ProceduralImagePool
    from dbsr_tpu.data.synthetic import BurstConfig, synthesize_batch
    from dbsr_tpu.models.align_lite import BurstAlignLite
    from dbsr_tpu.ops.camera import add_noise
    from dbsr_tpu.training.actors import pack_flow_to
    from dbsr_tpu.training.checkpoint import load_checkpoint

    _, raw = load_checkpoint(args.artifact)
    params = {"params": raw["params"]["params"]} \
        if "params" in raw["params"] else raw["params"]
    net = BurstAlignLite()

    # the aligner's training distribution (configs/align_lite/
    # pretrain_synthetic.py): fused kernel, full noise draw
    base_cfg = BurstConfig(
        burst_size=8, crop_sz=(384, 384), downsample_factor=4,
        border_crop=24, max_translation=24.0, max_rotation=1.0,
        fused_resample=True)

    # max-level noise corner of the reference's log-log model
    # (camera_pipeline.py:165-175): shot at its e^U upper bound, read on
    # the regression line (no jitter)
    shot_max = 0.012
    read_max = float(jnp.exp(2.18 * jnp.log(shot_max) + 1.20))

    def make_epe_fn(cfg, noise_override):
        @jax.jit
        def epe_batch(params, key, crops):
            k_synth, k_noise = jax.random.split(key)
            batch = synthesize_batch(k_synth, crops, cfg)
            burst = batch["burst"]
            if noise_override == "max":
                burst = jnp.clip(
                    add_noise(k_noise, burst, shot_max, read_max), 0.0, 1.0)
            pred = net.apply(params, burst)  # [B, N-1, h, w, 2]
            h, w = pred.shape[2:4]
            gt = pack_flow_to(-batch["flow"][:, 1:], (h, w))
            d = pred.astype(jnp.float32) - gt
            epe = jnp.sqrt((d * d).sum(-1))
            zero = jnp.sqrt((gt * gt).sum(-1))
            return epe.mean(), (epe < 0.5).mean(), zero.mean()

        return epe_batch

    table = {}
    for name, (cfg, mix, noise_override) in regimes(base_cfg).items():
        # chunk=2: the mix plan assigns generators PER CHUNK — at the
        # default chunk=32 a small pool is one chunk and "mixed"
        # silently degenerates to its first recipe entry (dead leaves)
        pool = ProceduralImagePool(
            max(args.batch * 2, 16), cfg.pre_crop_sz, seed=77, mix=mix,
            chunk=2)
        handle = pool.refresh(0)
        epe_fn = make_epe_fn(cfg, noise_override)
        epes, accs, zeros = [], [], []
        for b in range(args.batches):
            key = jax.random.fold_in(jax.random.key(20260820), b)
            k_idx, k_run = jax.random.split(key)
            idx = jax.random.randint(k_idx, (args.batch,), 0,
                                     handle.shape[0])
            crops = jnp.take(handle, idx, axis=0).astype(jnp.float32) / 255.0
            e, a, z = epe_fn(params, k_run, crops)
            epes.append(float(e))
            accs.append(float(a))
            zeros.append(float(z))
        row = {"epe_px": sum(epes) / len(epes),
               "acc_0.5px": sum(accs) / len(accs),
               "zero_flow_epe": sum(zeros) / len(zeros),
               "bursts": args.batches * args.batch}
        table[name] = row
        print(f"{name:11s} EPE {row['epe_px']:.3f} px | <0.5px "
              f"{row['acc_0.5px'] * 100:5.1f}% | zero-flow baseline "
              f"{row['zero_flow_epe']:.3f} px", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(table, f, indent=2)
        print(f"wrote {args.json}")
    return table


if __name__ == "__main__":
    main()
