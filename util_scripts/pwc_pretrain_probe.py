"""Fresh-data PWC pretraining probe (learnability experiments).

Round-3 finding: the shipped 15-epoch pretrain converges to the
zero-flow baseline (EPE 2.30 on the DBSR regime) — kernels, labels,
optimizer and precision were all exonerated (fixed-batch overfit works
on-chip; synthesis labels are warp-consistent; Pallas==XLA parity).
From-scratch PWC needs far more optimization than 15k steps, and the
published coarse-first level weights put ~90% of the loss mass on
pyramid levels whose displacement is sub-pixel for burst-SR flows
(L6 ~0.2px at 2x2 in the d=1 regime; reference training flows are
O(10x) larger — see ``models/alignment/pwcnet.py`` vs Chairs).

This driver runs ONE fresh-data arm and logs the EPE trend:

    python util_scripts/pwc_pretrain_probe.py \
        --steps 30000 [--lr 2e-4] [--warmup 500] [--batch 8] \
        [--regime bigflow|dbsr] [--weights fine|paper] [--log /path.jsonl]

Regimes:
  bigflow — d=1, 128x128 packed inputs, clean photometry, |flow| up to
            ~25 LR px: per-level displacement L2 3.4px @32x32 (in the
            +-4 correlation range), the most learnable posing found in
            round 3's probe ladder.
  dbsr    — the shipped pretrain task (d=4, 48x48 packed, full
            photometric nuisance) — what ``pwcnet/pretrain_synthetic``
            trains on.

Weights:
  fine    — {4: .08, 3: .16, 2: .32} (loss where the signal is)
  paper   — the published PWC weights {6: .32 ... 2: .005}
"""

import argparse
import json
import os
import sys
import time

# self-contained launch (sys.path[0] is util_scripts/, not the repo)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import dbsr_tpu.training.actors as actors

PRESETS = {
    "fine": {6: 0.0, 5: 0.0, 4: 0.08, 3: 0.16, 2: 0.32},
    "paper": dict(actors._PWC_LEVEL_WEIGHTS),
}


def make_cfg(regime):
    from dbsr_tpu.data.synthetic import BurstConfig
    if regime == "bigflow":
        return BurstConfig(
            burst_size=4, crop_sz=(256, 256), downsample_factor=1,
            border_crop=24, max_translation=24.0, max_rotation=1.0,
            random_ccm=False, random_gains=False, smoothstep=False,
            gamma=False, add_noise=False, fused_resample=True)
    return BurstConfig(
        burst_size=8, crop_sz=(384, 384), downsample_factor=4,
        border_crop=24, max_translation=24.0, max_rotation=1.0,
        random_ccm=True, random_gains=True, smoothstep=True, gamma=True,
        add_noise=True, fused_resample=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--warmup", type=int, default=500)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--regime", choices=("bigflow", "dbsr"),
                    default="bigflow")
    ap.add_argument("--weights", choices=sorted(PRESETS), default="fine")
    ap.add_argument("--pool", type=int, default=48)
    ap.add_argument("--log", default=None, help="append JSONL rows here")
    ap.add_argument("--save", default=None,
                    help="write a params-only artifact here (every 5000 "
                         "steps + at the end) — curriculum material")
    ap.add_argument("--init_from", default=None,
                    help="initialize from a params-only artifact (e.g. a "
                         "bigflow-regime probe's --save output: the "
                         "curriculum-transfer experiment)")
    args = ap.parse_args()

    actors._PWC_LEVEL_WEIGHTS = PRESETS[args.weights]

    from dbsr_tpu.data.procedural import (ProceduralImagePool,
                                          make_pool_prepare_fn)
    from dbsr_tpu.models.pwcnet import BurstFlowNet
    from dbsr_tpu.training.actors import make_flow_actor

    cfg = make_cfg(args.regime)
    print(f"regime={args.regime} weights={PRESETS[args.weights]} "
          f"lr={args.lr} warmup={args.warmup} B={args.batch} "
          f"backend={jax.default_backend()}", flush=True)

    pool_o = ProceduralImagePool(args.pool, cfg.pre_crop_sz, seed=0)
    pool = pool_o.refresh(0)
    prepare = make_pool_prepare_fn(cfg, args.batch)

    net = BurstFlowNet()
    actor = make_flow_actor(net)
    params = net.init(jax.random.key(2),
                      jnp.zeros((1, 2) + cfg.burst_hw + (4,)))
    if args.init_from:
        from flax import serialization

        from dbsr_tpu.training.checkpoint import load_checkpoint
        hdr, raw = load_checkpoint(args.init_from)
        params = serialization.from_state_dict(params, raw)
        print(f"initialized from {args.init_from} "
              f"(epoch {hdr.get('epoch')})", flush=True)

    def save_params(step_i):
        if not args.save:
            return
        from dbsr_tpu.training.checkpoint import save_params_artifact
        save_params_artifact(
            args.save,
            {"epoch": step_i, "net_name": "pwcnet_probe",
             "settings": {"regime": args.regime, "weights": args.weights,
                          "lr": args.lr, "init_from": args.init_from}},
            jax.device_get(params))
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, args.lr, args.warmup),
         optax.constant_schedule(args.lr)], [args.warmup])
    tx = optax.adam(sched)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key, pool):
        batch = prepare(key, pool)
        (loss, stats), grads = jax.value_and_grad(
            actor, has_aux=True)(params, batch)
        gnorm = optax.global_norm(grads)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss, stats, gnorm

    key = jax.random.key(0)
    t0 = time.time()
    for i in range(args.steps + 1):
        key, k = jax.random.split(key)
        if i % 200 == 0 and i:
            pool = pool_o.refresh(i)  # fresh imagery too
        params, opt, loss, stats, gnorm = step(params, opt, k, pool)
        if i % 500 == 0:
            row = {"step": i, "loss": float(loss),
                   "epe": float(stats["Stat/epe"]),
                   "acc": float(stats["Stat/acc_0.5px"]),
                   "gnorm": float(gnorm), "sec": round(time.time() - t0)}
            print(json.dumps(row), flush=True)
            if args.log:
                with open(args.log, "a") as f:
                    f.write(json.dumps(row) + "\n")
        if args.save and i and i % 5000 == 0:
            save_params(i)
    save_params(args.steps)


if __name__ == "__main__":
    main()
