"""AlignLite aligner pretraining on exact synthetic-burst flow labels.

The reference never trains its flow net — it downloads FlyingChairs-
pretrained PWC weights and freezes them inside DBSR
(``models/dbsr/dbsrnet.py:59-60``, ``install.sh:95-99``). That download
is unreproducible here, and from-scratch PWC on this regime converges
to the zero-flow baseline (round-3 probes; see
``models/align_lite.py``'s module docstring). This config pretrains the
purpose-built ``AlignLiteNet`` on the synthesis pipeline's exact dense
flow-to-base labels instead — the burst distribution DBSR will see
(noisy packed RAW, |translation| <= 24 HR px, |rotation| <= 1 deg) —
then ``dbsr/default_synthetic`` auto-detects the checkpoint, grafts it
into ``encoder/alignment_net`` and trains with the aligner frozen
(reference protocol, ``dbsrnet.py:44``).

Success gate: validation ``Stat/epe`` decisively below the zero-flow
baseline (2.30 packed px on this regime); AlignLite reaches sub-pixel
EPE within the first few epochs.
"""

import os

import jax

from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.models.align_lite import BurstAlignLite
from dbsr_tpu.training.actors import make_lite_flow_actor
from dbsr_tpu.training.state import make_optimizer
from dbsr_tpu.training.trainer import Trainer


def run(settings):
    settings.description = (
        "AlignLite aligner pretraining on exact synthetic burst flow "
        "labels (EPE loss; replaces the reference's pretrained-PWC "
        "download with a trainable-here aligner)")
    settings.batch_size = getattr(settings, "batch_size", 16)
    settings.multi_device = getattr(settings, "multi_device", True)
    settings.print_interval = getattr(settings, "print_interval", 100)
    epochs = getattr(settings, "epochs", 15)
    steps_per_epoch = getattr(settings, "steps_per_epoch", 1000)

    cfg = BurstConfig(
        burst_size=8, crop_sz=(384, 384), downsample_factor=4,
        border_crop=24, max_translation=24.0, max_rotation=1.0,
        random_ccm=True, random_gains=True, smoothstep=True, gamma=True,
        add_noise=True,
        fused_resample=getattr(settings, "fused_resample", True))
    settings.burst_cfg = cfg

    from dbsr_tpu.configs.dbsr.default_synthetic import make_data
    loaders, prepare_fn, cast_uint8 = make_data(
        settings, cfg, steps_per_epoch, val_batches=50, val_interval=5)

    net = BurstAlignLite()
    actor = make_lite_flow_actor(net)
    tx = make_optimizer(base_lr=getattr(settings, "base_lr", 2e-4),
                        step_size_epochs=6, gamma=0.3,
                        steps_per_epoch=steps_per_epoch)

    from dbsr_tpu.parallel.mesh import make_mesh
    mesh = make_mesh() if settings.multi_device and len(jax.devices()) > 1 \
        else None

    workspace = os.path.join(settings.env.workspace_dir, "align_lite",
                             "pretrain_synthetic")
    trainer = Trainer(net, actor, tx, loaders, cfg, workspace,
                      net_name="align_lite",
                      tensorboard_dir=os.path.join(
                          settings.env.tensorboard_dir, "align_lite",
                          "pretrain_synthetic")
                      if settings.env.tensorboard_dir else None,
                      mesh=mesh, print_interval=settings.print_interval,
                      description=settings.description,
                      prepare_fn=prepare_fn, cast_uint8_inputs=cast_uint8)
    trainer.train(epochs, load_latest=True, fail_safe=True)
