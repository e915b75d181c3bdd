"""Actors: loss + stats functions binding a network to its objective.

Functional re-design of reference ``actors/{base_actor,dbsr_actors}.py``:
an actor is a pure function ``(params, batch, key) -> (loss, stats)`` built
from a flax module and objective config, jit/grad-friendly (no module
state).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from dbsr_tpu.ops import metrics


def make_synthetic_actor(net, loss_weight: float = 1.0,
                         boundary_ignore: int = 40,
                         metric: str = "l1") -> Callable:
    """DBSRSyntheticActor equivalent (reference ``dbsr_actors.py:19-47``):
    pred = net(burst); loss = w * PixelWiseError(pred, gt); stats include
    per-sample-mean PSNR."""

    def actor(params, batch) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        pred, _ = net.apply(params, batch["burst"])
        gt = batch["frame_gt"]
        loss_rgb = metrics.pixel_error(pred, gt, metric,
                                       boundary_ignore=boundary_ignore)
        loss = loss_weight * loss_rgb
        psnr = metrics.psnr(pred, gt, boundary_ignore=boundary_ignore)
        stats = {"Loss/total": loss, "Loss/rgb": loss_rgb,
                 "Stat/psnr": psnr}
        return loss, stats

    return actor


def make_realworld_actor(net, sca_apply: Callable, loss_weight: float = 10.0,
                         boundary_ignore: Optional[int] = None,
                         metric: str = "l1") -> Callable:
    """DBSRRealWorldActor equivalent (reference ``dbsr_actors.py:50-95``):
    spatially+color-align the prediction to the DSLR GT before the masked
    pixel loss and PSNR. ``sca_apply(pred, gt, burst) -> (pred_warped,
    valid)`` is the spatial-color alignment (see
    ``dbsr_tpu/models/sca.py``)."""

    def actor(params, batch) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        pred, _ = net.apply(params, batch["burst"])
        gt = batch["frame_gt"]
        pred_warped, valid = sca_apply(pred, gt, batch["burst"])
        loss_rgb = metrics.pixel_error(pred_warped, gt, metric,
                                       boundary_ignore=boundary_ignore,
                                       valid=valid)
        loss = loss_weight * loss_rgb
        psnr = metrics.psnr(pred_warped, gt,
                            boundary_ignore=boundary_ignore, valid=valid)
        stats = {"Loss/total": loss, "Loss/rgb": loss_rgb,
                 "Stat/psnr": psnr}
        return loss, stats

    return actor
