"""Smoke config: tiny DBSR on procedurally generated images, 2 short
epochs. No datasets required — used to verify the full training stack
(CLI -> config -> trainer -> jitted step -> checkpoint/resume) end to end
on any backend.

Run: ``python run_training.py dbsr smoke_tiny``
"""

import os

import numpy as np

from dbsr_tpu.data.pipeline import CropBatcher, RandomImageSampler
from dbsr_tpu.data.synthetic import BurstConfig
from dbsr_tpu.models.dbsr import dbsrnet_tiny
from dbsr_tpu.training.actors import make_synthetic_actor
from dbsr_tpu.training.state import make_optimizer
from dbsr_tpu.training.trainer import LoaderSpec, Trainer


class ProceduralImages:
    """Random smooth images (no disk IO)."""

    def __init__(self, n=8, hw=(96, 112), seed=0):
        rng = np.random.RandomState(seed)
        self.images = []
        for _ in range(n):
            low = rng.rand(hw[0] // 8, hw[1] // 8, 3)
            img = np.kron(low, np.ones((8, 8, 1)))
            self.images.append((img * 255).astype(np.uint8))

    def get_num_images(self):
        return len(self.images)

    def get_image(self, i, info=None):
        return self.images[i], {}


def run(settings):
    settings.description = "Tiny smoke-test training run"
    batch_size = getattr(settings, "batch_size", None) or 2

    cfg = BurstConfig(burst_size=3, crop_sz=(32, 32), downsample_factor=2,
                      border_crop=4, max_translation=3.0, max_rotation=0.5)
    net = dbsrnet_tiny(upsample_factor=4)
    actor = make_synthetic_actor(net, boundary_ignore=4)
    tx = make_optimizer(1e-3, 40, 0.2, steps_per_epoch=4)

    batcher = CropBatcher(
        RandomImageSampler([ProceduralImages()], [1.0],
                           samples_per_epoch=batch_size * 4),
        batch_size, cfg.pre_crop_sz)

    workspace = os.path.join(settings.env.workspace_dir, "dbsr", "smoke_tiny")
    trainer = Trainer(net, actor, tx, [LoaderSpec("train", batcher)], cfg,
                      workspace, net_name="smoke", print_interval=2,
                      description=settings.description)
    trainer.train(2, load_latest=True, fail_safe=True)
