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


# Multi-scale supervision weights, coarse decoders first (PWC-Net's
# training loss, arXiv:1709.02371 sec. 4: alpha = 0.32/0.08/0.02/0.01/0.005
# for flow6..flow2). Final-flow-only supervision measurably stalls: the
# coarse decoders see no usable gradient through 5 stacked refinement
# stages and the net collapses to a constant (observed: EPE pinned at the
# mean GT norm for 3k steps).
_PWC_LEVEL_WEIGHTS = {6: 0.32, 5: 0.08, 4: 0.02, 3: 0.01, 2: 0.005}


def make_flow_actor(net, eps: float = 1e-3,
                    multiscale: bool = True) -> Callable:
    """EPE supervision of a flow net on the synthesis pipeline's exact
    dense flow labels (PWC pretraining — see ``models/pwcnet.BurstFlowNet``).

    Convention: synthesis emits ``flow`` such that
    ``lr_0(p) ~= lr_i(p - flow_i(p))`` (``data/synthetic.py:179``); the
    aligner's contract is ``warp(oth, f) ~= ref`` i.e.
    ``ref(p) ~= oth(p + f(p))`` — so the supervision target is the
    NEGATED synthesis flow, pooled to the packed grid (verified
    numerically in ``tests/test_flow_pretrain.py``).

    With ``multiscale=True`` (default, required for from-scratch
    convergence) every decoder level's raw flow is supervised against the
    block-averaged target in the shared raw unit (1/20 of
    preprocessed-full-res px — the same convention the backwarp scale
    table 20/2^L encodes).
    """

    def actor(params, batch) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if multiscale:
            pred, aux = net.apply(params, batch["burst"],
                                  return_pyramid=True)
        else:
            pred = net.apply(params, batch["burst"])   # [B, N-1, h, w, 2]
        h, w = pred.shape[2:4]
        gt = pack_flow_to(-batch["flow"][:, 1:], (h, w))
        d = pred - gt
        epe = jnp.sqrt((d * d).sum(-1) + eps * eps)

        if multiscale:
            from dbsr_tpu.ops.interp import resize_bilinear

            Hp, Wp = aux["preprocessed_hw"]
            # packed-grid px -> raw units (1/20 preprocessed px), x then y
            unit = jnp.array([Wp / w, Hp / h], jnp.float32) / 20.0
            gt_raw = (gt * unit).reshape((-1, h, w, 2))
            loss = jnp.float32(0.0)
            for lvl, f in aux["pyramid"].items():
                lh, lw = f.shape[-3], f.shape[-2]
                tgt = resize_bilinear(gt_raw, (lh, lw))
                fd = f.astype(jnp.float32).reshape(-1, lh, lw, 2) - tgt
                l_epe = jnp.sqrt((fd * fd).sum(-1) + eps * eps).mean()
                loss = loss + _PWC_LEVEL_WEIGHTS[lvl] * l_epe
        else:
            loss = epe.mean()

        stats = {"Loss/total": loss, "Stat/epe": epe.mean(),
                 "Stat/acc_0.5px": (epe < 0.5).mean()}
        return loss, stats

    return actor


# AlignLite multi-scale weights: every level has its own correlation
# (direct gradient signal), so fine-first emphasis is safe — unlike PWC,
# where the coarse decoders must be weighted up (_PWC_LEVEL_WEIGHTS).
_LITE_LEVEL_WEIGHTS = {0: 1.0, 1: 0.5, 2: 0.25}


def make_lite_flow_actor(net, eps: float = 1e-3,
                         multiscale: bool = True) -> Callable:
    """EPE supervision of ``models.align_lite.BurstAlignLite`` on the
    synthesis pipeline's exact dense flow labels.

    Same target convention as ``make_flow_actor`` (the NEGATED synthesis
    flow pooled to the packed grid); units are simpler: every AlignLite
    pyramid level predicts flow in its own grid's px, so the level-l
    target is just ``pack_flow_to`` of the packed-grid target."""

    def actor(params, batch) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        if multiscale:
            pred, aux = net.apply(params, batch["burst"],
                                  return_pyramid=True)
        else:
            pred = net.apply(params, batch["burst"])  # [B, N-1, h, w, 2]
        h, w = pred.shape[2:4]
        gt = pack_flow_to(-batch["flow"][:, 1:], (h, w))
        d = pred.astype(jnp.float32) - gt
        epe = jnp.sqrt((d * d).sum(-1) + eps * eps)

        if multiscale:
            loss = jnp.float32(0.0)
            for lvl, f in aux["pyramid"].items():
                lh, lw = f.shape[-3], f.shape[-2]
                # pyramid flows carry a flattened [B*(N-1)] lead dim
                tgt = pack_flow_to(gt, (lh, lw)).reshape(-1, lh, lw, 2)
                fd = f.astype(jnp.float32).reshape(-1, lh, lw, 2) - tgt
                l_epe = jnp.sqrt((fd * fd).sum(-1) + eps * eps).mean()
                loss = loss + _LITE_LEVEL_WEIGHTS[lvl] * l_epe
        else:
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
