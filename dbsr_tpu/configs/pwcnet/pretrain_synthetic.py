"""PWC-Net pretraining on the synthesis pipeline's exact flow labels.

The reference never trains its flow net — it downloads pretrained PWC
weights and freezes them inside DBSR (``models/dbsr/dbsrnet.py:59-60``,
``install.sh:95-99``). This config replaces that download for zero-egress
environments: the on-device burst synthesis emits exact dense flow-to-base
labels for free (``data/synthetic.py:single2lrburst``), so the aligner can
be pretrained on precisely the burst distribution DBSR will see (noisy
packed RAW, |translation| <= 24 HR px, |rotation| <= 1 deg), then frozen —
matching the reference's training protocol (frozen aligner,
``dbsrnet.py:44``).

Data: Zurich crops when staged, otherwise on-device procedural dead-leaves
imagery (``data/procedural.py``). ~35 ms/step at B=16 on v5e; the default
15 epochs x 1000 steps take ~10 min of chip time.

After this run, ``dbsr/default_synthetic`` auto-detects the checkpoint,
grafts it into ``encoder/alignment_net`` and trains with the aligner
frozen.
"""

import os

import jax

from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.models.pwcnet import BurstFlowNet
from dbsr_tpu.training.actors import make_flow_actor
from dbsr_tpu.training.state import make_optimizer
from dbsr_tpu.training.trainer import Trainer


def run(settings):
    settings.description = (
        "PWC-Net pretraining on exact synthetic burst flow labels "
        "(EPE loss; replaces the reference's pretrained-weight download)")
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

    net = BurstFlowNet()
    actor = make_flow_actor(net)
    # 2e-4: PWC's original 1e-4 linearly scaled for B=16 vs its B=8
    tx = make_optimizer(base_lr=getattr(settings, "base_lr", 2e-4),
                        step_size_epochs=6, gamma=0.3,
                        steps_per_epoch=steps_per_epoch)

    from dbsr_tpu.parallel.mesh import make_mesh
    mesh = make_mesh() if settings.multi_device and len(jax.devices()) > 1 \
        else None

    workspace = os.path.join(settings.env.workspace_dir, "pwcnet",
                             "pretrain_synthetic")
    trainer = Trainer(net, actor, tx, loaders, cfg, workspace,
                      net_name="pwcnet_synth",
                      tensorboard_dir=os.path.join(
                          settings.env.tensorboard_dir, "pwcnet",
                          "pretrain_synthetic")
                      if settings.env.tensorboard_dir else None,
                      mesh=mesh, print_interval=settings.print_interval,
                      description=settings.description,
                      prepare_fn=prepare_fn, cast_uint8_inputs=cast_uint8)
    trainer.train(epochs, load_latest=True, fail_safe=True)
