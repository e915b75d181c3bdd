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


def pack_flow_to(flow: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Pool dense LR-grid flow ``[B, N, h, w, 2]`` down to ``hw`` (the
    packed-RAW grid): block-average the vectors and rescale displacements
    into units of the coarser grid's pixels."""
    B, N, h, w, _ = flow.shape
    r = h // hw[0]
    assert h == hw[0] * r and w == hw[1] * r, (flow.shape, hw)
    return flow.reshape(B, N, hw[0], r, hw[1], r, 2).mean((3, 5)) / r


def make_flow_actor(net, eps: float = 1e-3) -> Callable:
    """EPE supervision of a flow net on the synthesis pipeline's exact
    dense flow labels (PWC pretraining — see ``models/pwcnet.BurstFlowNet``).

    Convention: synthesis emits ``flow`` such that
    ``lr_0(p) ~= lr_i(p - flow_i(p))`` (``data/synthetic.py:179``); the
    aligner's contract is ``warp(oth, f) ~= ref`` i.e.
    ``ref(p) ~= oth(p + f(p))`` — so the supervision target is the
    NEGATED synthesis flow, pooled to the packed grid (verified
    numerically in ``tests/test_flow_pretrain.py``).
    """

    def actor(params, batch) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        pred = net.apply(params, batch["burst"])       # [B, N-1, h, w, 2]
        gt = pack_flow_to(-batch["flow"][:, 1:], pred.shape[2:4])
        d = pred - gt
        epe = jnp.sqrt((d * d).sum(-1) + eps * eps)
        loss = epe.mean()
        stats = {"Loss/total": loss, "Stat/epe": epe.mean(),
                 "Stat/acc_0.5px": (epe < 0.5).mean()}
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
