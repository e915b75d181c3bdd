"""Fine-tune DBSR on real BurstSR bursts with aligned supervision.

Mirrors reference ``train_settings/dbsr/default_realworld.py:27-84``:
restore the synthetic-trained model, train on BurstSR 56-px crops (bursts
of 8, batch 12) for 40 epochs with Adam 1e-5 + StepLR(15, 0.2), loss =
10 x masked L1 after SpatialColorAlignment of the prediction to the DSLR
ground truth; validation on the val split every 4 epochs.
"""

import os
from functools import partial

import jax
import numpy as np

from dbsr_tpu.data.burstsr import (BurstSRDataset, BurstSRProcessing,
                                   IndexedBurstSampler, RandomBurstSampler)
from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.evaluation.burstsr import _alignment_apply_from
from dbsr_tpu.models.sca import make_sca
from dbsr_tpu.parallel.mesh import make_mesh
from dbsr_tpu.training.actors import make_realworld_actor
from dbsr_tpu.training.checkpoint import load_network, resolve_checkpoint
from dbsr_tpu.training.state import make_optimizer, TrainState
from dbsr_tpu.training.trainer import LoaderSpec, Trainer


class BurstBatcher:
    """Stack burst samples from a sampler into batched dict arrays."""

    def __init__(self, sampler, batch_size):
        self.sampler = sampler
        self.batch_size = batch_size
        self._idx = 0

    def __len__(self):
        return max(1, len(self.sampler) // self.batch_size)

    def next_batch(self):
        samples = []
        for _ in range(self.batch_size):
            samples.append(self.sampler[self._idx % len(self.sampler)])
            self._idx += 1
        return {
            "burst": np.stack([s["burst"] for s in samples]),
            "frame_gt": np.stack([s["frame_gt"] for s in samples]),
        }


def run(settings):
    settings.description = (
        "Fine-tune DBSR on real-world BurstSR bursts with spatial-color-"
        "aligned supervision (TPU-native)")
    settings.batch_size = getattr(settings, "batch_size", 12)
    settings.crop_sz = getattr(settings, "crop_sz", 56)
    settings.burst_sz = getattr(settings, "burst_sz", 8)
    steps_per_epoch = getattr(settings, "steps_per_epoch", 300)
    epochs = getattr(settings, "epochs", 40)

    # restore the synthetic-trained model (architecture from checkpoint)
    syn_dir = os.path.join(settings.env.workspace_dir, "dbsr",
                           "default_synthetic")
    ckpt_path = resolve_checkpoint(syn_dir, "dbsr_synthetic")
    if ckpt_path is None:
        raise FileNotFoundError(
            f"train dbsr/default_synthetic first (no checkpoint in {syn_dir})")
    net, pretrained_params, _ = load_network(ckpt_path)

    train_ds = BurstSRDataset(settings.env.burstsr_dir, split="train")
    val_ds = BurstSRDataset(settings.env.burstsr_dir, split="val")

    proc_train = BurstSRProcessing(crop_sz=settings.crop_sz,
                                   substract_black_level=True,
                                   random_flip=True)
    proc_val = BurstSRProcessing(crop_sz=settings.crop_sz,
                                 substract_black_level=True,
                                 random_flip=False, random_crop=False)

    train_batcher = BurstBatcher(
        RandomBurstSampler(train_ds, burst_size=settings.burst_sz,
                           samples_per_epoch=settings.batch_size * steps_per_epoch,
                           processing=proc_train),
        settings.batch_size)
    val_batcher = BurstBatcher(
        IndexedBurstSampler(val_ds, burst_size=settings.burst_sz,
                            processing=proc_val),
        settings.batch_size)

    loaders = [
        LoaderSpec("train", train_batcher, training=True),
        LoaderSpec("val", val_batcher, training=False, epoch_interval=4),
    ]

    # sr_factor: SR scale relative to the mosaiced LR (4 for real BurstSR;
    # overridable so fixture-scale tests can drive this config end-to-end)
    sr_factor = getattr(settings, "sr_factor", 4)
    sca = make_sca(_alignment_apply_from(pretrained_params),
                   sr_factor=sr_factor)
    actor = make_realworld_actor(net, sca, loss_weight=10.0)

    tx = make_optimizer(base_lr=1e-5, step_size_epochs=15, gamma=0.2,
                        steps_per_epoch=steps_per_epoch)

    mesh = make_mesh() if getattr(settings, "multi_device", True) and \
        len(jax.devices()) > 1 else None

    cfg = BurstConfig(burst_size=settings.burst_sz,
                      crop_sz=(settings.crop_sz * 2 * sr_factor,
                               settings.crop_sz * 2 * sr_factor),
                      downsample_factor=4, border_crop=0)
    workspace = os.path.join(settings.env.workspace_dir, "dbsr",
                             "default_realworld")
    trainer = Trainer(
        net, actor, tx, loaders, cfg, workspace,
        net_name="dbsr_realworld",
        tensorboard_dir=os.path.join(settings.env.tensorboard_dir, "dbsr",
                                     "default_realworld"),
        mesh=mesh, print_interval=getattr(settings, "print_interval", 50),
        description=settings.description,
        prepare_fn=lambda key, batch: batch,
        init_burst_shape=(1, settings.burst_sz, settings.crop_sz,
                          settings.crop_sz, 4))

    # warm-start from the synthetic checkpoint when no realworld ckpt exists
    if resolve_checkpoint(workspace, "dbsr_realworld") is None:
        state = trainer.init_state()
        state = state.replace(params=pretrained_params)
        from dbsr_tpu.training.checkpoint import save_checkpoint
        trainer.epoch = 0
        save_checkpoint(workspace, "dbsr_realworld", 0, state, net=net)

    trainer.train(epochs, load_latest=True, fail_safe=True)
