"""Default DBSR training on synthetic bursts (TPU-native).

Mirrors reference ``train_settings/dbsr/default_synthetic.py:26-100``:
100 epochs x 1000 batches of 16, 8-frame bursts from 384^2 crops at x4
downsampling (24 px border crop, <=24 px translation, <=1 deg rotation),
L1 loss with boundary_ignore=40, Adam 1e-4 with StepLR(40, 0.2),
validation every 5 epochs on the Zurich test split.

Training protocol matches the reference: the flow net is PRETRAINED and
FROZEN (reference always loads downloaded PWC weights,
``models/dbsr/dbsrnet.py:59-60``, and keeps ``train_alignmentnet=False``,
``dbsrnet.py:44``). Zero-egress replacement: run
``python run_training.py pwcnet pretrain_synthetic`` first — this config
auto-detects its checkpoint, grafts it into ``encoder/alignment_net`` and
freezes it. Without a pretrained flow checkpoint it falls back to training
the aligner end-to-end (a protocol divergence, printed loudly).

TPU-native differences: burst synthesis runs on device inside the jitted
train step; data parallelism is a ``Mesh`` over all local devices instead
of ``nn.DataParallel``. When no Zurich data is staged, source imagery is
procedural on-device dead-leaves (``data/procedural.py``) — zero host
feed, zero downloads.
"""

import os

import jax


def make_data(settings, cfg, steps_per_epoch: int, val_batches: int = 200,
              val_interval: int = 5):
    """Build (loaders, prepare_fn, cast_uint8_inputs) for synthetic-burst
    training: Zurich RGB crops when ``env.zurichraw2rgb_dir`` is staged
    (reference data path), otherwise on-device procedural dead-leaves
    pools. Shared by ``dbsr/default_synthetic`` and
    ``pwcnet/pretrain_synthetic`` so both train on the same source
    distribution."""
    from dbsr_tpu.training.trainer import LoaderSpec

    B = settings.batch_size
    zdir = settings.env.zurichraw2rgb_dir
    if zdir and os.path.isdir(zdir):
        from dbsr_tpu.data.datasets import ZurichRAW2RGB
        from dbsr_tpu.data.pipeline import CropBatcher, RandomImageSampler

        train_ds = ZurichRAW2RGB(zdir, "train")
        val_ds = ZurichRAW2RGB(zdir, "test")
        # --set seed=N must vary the HOST crop/flip streams too, or a
        # "seed-variance" arm on the real-data path replays the same
        # image/crop sequence and only the device-side keys differ
        seed = getattr(settings, "seed", 0)
        train_batcher = CropBatcher(
            RandomImageSampler([train_ds], [1.0],
                               samples_per_epoch=B * steps_per_epoch),
            B, cfg.pre_crop_sz, random_flip=True, seed=seed)
        val_batcher = CropBatcher(
            RandomImageSampler([val_ds], [1.0],
                               samples_per_epoch=B * val_batches),
            B, cfg.pre_crop_sz, random_flip=True, seed=seed + 1)
        loaders = [
            LoaderSpec("train", train_batcher, training=True),
            LoaderSpec("val", val_batcher, training=False,
                       epoch_interval=val_interval),
        ]
        return loaders, None, True

    from dbsr_tpu.data.procedural import (ProceduralImagePool,
                                          ProceduralPoolBatcher,
                                          make_pool_prepare_fn)

    print("NOTE: no Zurich data staged (env.zurichraw2rgb_dir empty) — "
          "training on procedural dead-leaves source imagery "
          "(dbsr_tpu/data/procedural.py)", flush=True)
    pool_size = getattr(settings, "pool_size", 2048)
    # --set mix=mixed switches the TRAIN pool to the mixed procedural
    # corpus (MIXED_RECIPE); the val pool stays dead-leaves so scores
    # remain comparable across arms.
    train_pool = ProceduralImagePool(pool_size, cfg.pre_crop_sz,
                                     seed=getattr(settings, "seed", 0),
                                     mix=getattr(settings, "mix",
                                                 "deadleaves"))
    val_pool = ProceduralImagePool(max(pool_size // 8, 1), cfg.pre_crop_sz,
                                   seed=getattr(settings, "seed", 0) + 999)
    loaders = [
        LoaderSpec("train",
                   ProceduralPoolBatcher(train_pool, B, steps_per_epoch),
                   training=True),
        LoaderSpec("val",
                   ProceduralPoolBatcher(val_pool, B, val_batches),
                   training=False, epoch_interval=val_interval),
    ]
    # Multi-host: each process feeds its local pool slice and the jitted
    # step sees the assembled global pool; draw batch_size crops PER
    # PROCESS so the global batch is batch_size * process_count — the
    # same contract as the CropBatcher path (trainer.py:76-88).
    global_b = B * jax.process_count()
    return loaders, make_pool_prepare_fn(cfg, global_b), False


def find_pretrained_flow(settings):
    """Locate a pretrained flow checkpoint: ``settings.pwc_checkpoint``
    override, else the latest ``align_lite/pretrain_synthetic``
    checkpoint (the purpose-built aligner, preferred — see
    ``models/align_lite.py``), else the latest
    ``pwcnet/pretrain_synthetic`` checkpoint (the reference's analog is
    the downloaded ``pwcnet-network-default.pth``, ``install.sh:95-99``)."""
    from dbsr_tpu.training.checkpoint import resolve_checkpoint

    explicit = getattr(settings, "pwc_checkpoint", None)
    if explicit:
        return explicit
    lite_dir = os.path.join(settings.env.workspace_dir, "align_lite",
                            "pretrain_synthetic")
    lite = resolve_checkpoint(lite_dir, "align_lite")
    if lite:
        return lite
    pwc_dir = os.path.join(settings.env.workspace_dir, "pwcnet",
                           "pretrain_synthetic")
    return resolve_checkpoint(pwc_dir, "pwcnet_synth")


def flow_net_kind(flow_ckpt_path: str) -> str:
    """Which ``DBSRNet.flow_net`` a pretrained flow checkpoint grafts
    into, from its header's ``net_name`` (``align_lite*`` ->
    ``'lite'``, anything else -> ``'pwc'``)."""
    from dbsr_tpu.training.checkpoint import read_header

    name = read_header(flow_ckpt_path).get("net_name", "")
    return "lite" if name.startswith("align_lite") else "pwc"


def graft_alignment_params(params, flow_ckpt_path: str):
    """Graft a ``BurstFlowNet`` checkpoint's ``alignment_net`` subtree into
    a DBSRNet parameter tree (``encoder/alignment_net``) — the reference's
    ``load_state_dict`` of pretrained PWC weights
    (``dbsrnet.py:59-60``)."""
    from dbsr_tpu.training.checkpoint import load_checkpoint

    _, raw = load_checkpoint(flow_ckpt_path)
    sub = raw["params"]["params"]["alignment_net"]
    out = dict(params)
    out["params"] = dict(out["params"])
    enc = dict(out["params"]["encoder"])
    ref = enc["alignment_net"]
    # shape-check against the freshly initialized subtree
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
    sub_map = {jax.tree_util.keystr(p): v for p, v in
               jax.tree_util.tree_leaves_with_path(sub)}
    for path, leaf in ref_leaves:
        k = jax.tree_util.keystr(path)
        if k not in sub_map or sub_map[k].shape != leaf.shape:
            raise ValueError(
                f"pretrained flow checkpoint incompatible at {k}")
    enc["alignment_net"] = jax.tree.map(lambda x: x, sub)
    out["params"]["encoder"] = enc
    return out


def run(settings):
    settings.description = (
        "Default settings for training DBSR models on synthetic bursts "
        "(TPU-native, on-device synthesis)")
    settings.batch_size = getattr(settings, "batch_size", 16)
    settings.multi_device = getattr(settings, "multi_device", True)
    settings.print_interval = getattr(settings, "print_interval", 50)
    epochs = getattr(settings, "epochs", 100)
    steps_per_epoch = getattr(settings, "steps_per_epoch", 1000)

    from dbsr_tpu.data.synthetic import BurstConfig
    from dbsr_tpu.models.dbsr import dbsrnet_cvpr2021
    from dbsr_tpu.parallel.mesh import make_mesh
    from dbsr_tpu.training.actors import make_synthetic_actor
    from dbsr_tpu.training.checkpoint import (resolve_checkpoint,
                                              save_checkpoint)
    from dbsr_tpu.training.state import default_masked_adam, make_optimizer
    from dbsr_tpu.training.trainer import Trainer

    cfg = BurstConfig(
        burst_size=8, crop_sz=(384, 384), downsample_factor=4,
        border_crop=24, max_translation=24.0, max_rotation=1.0,
        max_shear=0.0, max_scale=0.0,
        random_ccm=True, random_gains=True, smoothstep=True, gamma=True,
        add_noise=True,
        # 5.8x faster training; slightly different degradation kernel than
        # the reference two-stage resampling (see PERF.md). Flip off for
        # strict synthesis parity.
        fused_resample=getattr(settings, "fused_resample", True))
    settings.burst_cfg = cfg

    loaders, prepare_fn, cast_uint8 = make_data(settings, cfg,
                                                steps_per_epoch)

    import jax.numpy as jnp
    # bf16 compute is the TPU-idiomatic default (MXU-native; params and
    # optimizer state stay f32 master weights — flax param_dtype). The
    # reference trains f32 on CUDA; --set compute_dtype=float32 restores
    # that at ~2x the step time.
    compute_dtype = getattr(settings, "compute_dtype", "bfloat16")
    if compute_dtype in ("bfloat16", "bf16"):
        compute_dtype = jnp.bfloat16
    elif compute_dtype in ("float32", "f32"):
        compute_dtype = None

    # Reference protocol: pretrained + frozen flow net when available
    # (dbsrnet.py:44,59-60); end-to-end fallback otherwise.
    flow_ckpt = find_pretrained_flow(settings)
    train_alignment = getattr(settings, "train_alignment",
                              flow_ckpt is None)
    if flow_ckpt is None:
        flow_net = getattr(settings, "flow_net", "pwc")
        print("WARNING: no pretrained flow checkpoint found — training "
              "the aligner end-to-end (reference protocol is "
              "pretrained+frozen; run `python run_training.py align_lite "
              "pretrain_synthetic` first)", flush=True)
    else:
        flow_net = getattr(settings, "flow_net", flow_net_kind(flow_ckpt))
        print(f"using pretrained flow weights: {flow_ckpt} "
              f"(flow_net={flow_net}, train_alignment={train_alignment})",
              flush=True)

    net = dbsrnet_cvpr2021(
        enc_init_dim=64, enc_num_res_blocks=9, enc_out_dim=512,
        dec_init_conv_dim=64, dec_num_pre_res_blocks=5,
        dec_post_conv_dim=32, dec_num_post_res_blocks=4,
        upsample_factor=cfg.downsample_factor * 2,
        offset_feat_dim=64, weight_pred_proj_dim=64,
        num_weight_predictor_res=3, gauss_blur_sd=1.0, icnrinit=True,
        train_alignment=train_alignment, flow_net=flow_net,
        fused_s2d_decoder=getattr(settings, "fused_s2d_decoder", True),
        dtype=compute_dtype)

    actor = make_synthetic_actor(net, loss_weight=1.0, boundary_ignore=40)

    workspace = os.path.join(settings.env.workspace_dir, "dbsr",
                             "default_synthetic")
    # Masked Adam drops the frozen aligner's (all-zero) moments from
    # opt_state: ~75 MB less per checkpoint save/fetch. Default ON for
    # fresh frozen-flow runs; resumes auto-match the checkpoint's
    # structure (masked/unmasked opt_states do not cross-restore).
    # --set masked_adam=True/False overrides.
    masked = default_masked_adam(
        workspace, "dbsr_synthetic", frozen=not train_alignment,
        explicit=getattr(settings, "masked_adam", None))
    tx = make_optimizer(base_lr=1e-4, step_size_epochs=40, gamma=0.2,
                        steps_per_epoch=steps_per_epoch,
                        clip_norm=getattr(settings, "grad_clip", None),
                        freeze_subtree="alignment_net" if masked else None)

    mesh = make_mesh() if settings.multi_device and len(jax.devices()) > 1 \
        else None
    trainer = Trainer(net, actor, tx, loaders, cfg, workspace,
                      net_name="dbsr_synthetic",
                      tensorboard_dir=os.path.join(
                          settings.env.tensorboard_dir, "dbsr",
                          "default_synthetic")
                      if settings.env.tensorboard_dir else None,
                      mesh=mesh, print_interval=settings.print_interval,
                      description=settings.description,
                      prepare_fn=prepare_fn, cast_uint8_inputs=cast_uint8,
                      # --set seed=N varies BOTH the source pools (above)
                      # and the on-device synthesis/crop streams — a full
                      # data-stream variance arm (init is still pinned by
                      # checkpoint restore when resuming from epoch 0)
                      seed=getattr(settings, "seed", 0),
                      header_settings={"masked_adam": masked})

    # warm-start: graft pretrained flow weights when starting fresh
    if flow_ckpt is not None and \
            resolve_checkpoint(workspace, "dbsr_synthetic") is None:
        state = trainer.init_state()
        state = state.replace(
            params=graft_alignment_params(state.params, flow_ckpt))
        save_checkpoint(workspace, "dbsr_synthetic", 0, state, net=net,
                        settings={"masked_adam": masked})
        print("grafted pretrained flow weights into encoder/alignment_net "
              "(saved as epoch-0 checkpoint)", flush=True)

    trainer.train(epochs, load_latest=True, fail_safe=True)
