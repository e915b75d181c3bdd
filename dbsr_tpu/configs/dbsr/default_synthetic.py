"""Default DBSR training on synthetic bursts (TPU-native).

Mirrors reference ``train_settings/dbsr/default_synthetic.py:26-100``:
100 epochs x 1000 batches of 16, 8-frame bursts from 384^2 crops at x4
downsampling (24 px border crop, <=24 px translation, <=1 deg rotation),
L1 loss with boundary_ignore=40, Adam 1e-4 with StepLR(40, 0.2),
validation every 5 epochs on the Zurich test split.

TPU-native differences: burst synthesis runs on device inside the jitted
train step; data parallelism is a ``Mesh`` over all local devices instead
of ``nn.DataParallel``; the flow net trains end-to-end by default when no
pretrained PWC weights are available (the reference always loads pretrained
weights downloaded in ``install.sh`` — zero-egress environments cannot).
"""

import os

import jax

from dbsr_tpu.data.datasets import ZurichRAW2RGB
from dbsr_tpu.data.pipeline import CropBatcher, RandomImageSampler
from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.models.dbsr import dbsrnet_cvpr2021
from dbsr_tpu.parallel.mesh import make_mesh
from dbsr_tpu.training.actors import make_synthetic_actor
from dbsr_tpu.training.state import make_optimizer
from dbsr_tpu.training.trainer import LoaderSpec, Trainer


def run(settings):
    settings.description = (
        "Default settings for training DBSR models on synthetic bursts "
        "(TPU-native, on-device synthesis)")
    settings.batch_size = getattr(settings, "batch_size", 16)
    settings.multi_device = getattr(settings, "multi_device", True)
    settings.print_interval = getattr(settings, "print_interval", 50)

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

    train_ds = ZurichRAW2RGB(settings.env.zurichraw2rgb_dir, "train")
    val_ds = ZurichRAW2RGB(settings.env.zurichraw2rgb_dir, "test")

    steps_per_epoch = 1000
    train_batcher = CropBatcher(
        RandomImageSampler([train_ds], [1.0],
                           samples_per_epoch=settings.batch_size * steps_per_epoch),
        settings.batch_size, cfg.pre_crop_sz, random_flip=True)
    val_batcher = CropBatcher(
        RandomImageSampler([val_ds], [1.0],
                           samples_per_epoch=settings.batch_size * 200),
        settings.batch_size, cfg.pre_crop_sz, random_flip=True, seed=1)

    loaders = [
        LoaderSpec("train", train_batcher, training=True),
        LoaderSpec("val", val_batcher, training=False, epoch_interval=5),
    ]

    import jax.numpy as jnp
    compute_dtype = getattr(settings, "compute_dtype", None)
    if compute_dtype == "bfloat16":
        compute_dtype = jnp.bfloat16

    net = dbsrnet_cvpr2021(
        enc_init_dim=64, enc_num_res_blocks=9, enc_out_dim=512,
        dec_init_conv_dim=64, dec_num_pre_res_blocks=5,
        dec_post_conv_dim=32, dec_num_post_res_blocks=4,
        upsample_factor=cfg.downsample_factor * 2,
        offset_feat_dim=64, weight_pred_proj_dim=64,
        num_weight_predictor_res=3, gauss_blur_sd=1.0, icnrinit=True,
        train_alignment=getattr(settings, "train_alignment", True),
        dtype=compute_dtype)

    actor = make_synthetic_actor(net, loss_weight=1.0, boundary_ignore=40)
    tx = make_optimizer(base_lr=1e-4, step_size_epochs=40, gamma=0.2,
                        steps_per_epoch=steps_per_epoch)

    mesh = make_mesh() if settings.multi_device and len(jax.devices()) > 1 \
        else None

    workspace = os.path.join(settings.env.workspace_dir, "dbsr",
                             "default_synthetic")
    trainer = Trainer(net, actor, tx, loaders, cfg, workspace,
                      net_name="dbsr_synthetic",
                      tensorboard_dir=os.path.join(
                          settings.env.tensorboard_dir, "dbsr",
                          "default_synthetic"),
                      mesh=mesh, print_interval=settings.print_interval,
                      description=settings.description)
    trainer.train(100, load_latest=True, fail_safe=True)
