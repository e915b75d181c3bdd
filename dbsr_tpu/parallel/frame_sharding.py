"""Burst-frame-axis sharding — the sequence-parallel analog for bursts.

The reference has no sequence parallelism (SURVEY.md section 2.5); its
nearest analog is the burst-frame axis N, which it only flattens into the
batch (`models/dbsr/encoders.py:57,66`) and reduces over in fusion
(`models/dbsr/merging.py:117-124`). When scaling burst length (N >> 14),
per-frame encoder work is embarrassingly parallel over a ``frame`` mesh
axis, and the only cross-frame computation — the fusion softmax-sum —
decomposes into an all-reduce of per-shard (max, exp-sum, weighted-sum)
statistics, exactly a one-step ring/Ulysses-style reduction over ICI.

This module provides that decomposed fusion as shard_map-ready collective
code. It is an extension beyond reference parity (which needs only data
parallelism) and is exercised on the virtual CPU mesh in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_softmax_fusion(feats: jax.Array, logits: jax.Array,
                           axis_name: str) -> jax.Array:
    """Numerically-stable softmax-weighted sum over a SHARDED frame axis.

    Inside ``shard_map`` over mesh axis ``axis_name``: ``feats`` / ``logits``
    are the local frame shards ``[B, n_local, H, W, C]``. Computes
    ``sum_i softmax_i(logits) * feats`` over the GLOBAL frame axis using
    psum of (max, normalizer, weighted-sum) — three collectives, no
    materialized all-gather of frames.
    """
    # global max over all frames for stability
    local_max = logits.max(axis=1, keepdims=True)
    global_max = jax.lax.pmax(local_max, axis_name)

    ex = jnp.exp(logits - global_max)
    local_norm = ex.sum(axis=1, keepdims=True)
    local_wsum = (feats * ex).sum(axis=1, keepdims=True)

    norm = jax.lax.psum(local_norm, axis_name)
    wsum = jax.lax.psum(local_wsum, axis_name)
    return (wsum / norm)[:, 0]


def make_frame_sharded_fusion(mesh: Mesh, axis_name: str = "frame"):
    """Build a jitted fusion fn over frame-sharded inputs.

    ``fn(feats [B, N, H, W, C], logits [B, N, H, W, C]) -> [B, H, W, C]``
    with N sharded over ``axis_name``; result replicated.
    """
    spec_in = P(None, axis_name)
    spec_out = P()

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=(spec_in, spec_in),
             out_specs=spec_out)
    def fused(feats, logits):
        return sharded_softmax_fusion(feats, logits, axis_name)

    return fused


def masked_sharded_softmax_fusion(feats: jax.Array, logits: jax.Array,
                                  mask: jax.Array,
                                  axis_name: str) -> jax.Array:
    """``sharded_softmax_fusion`` with a per-local-frame validity mask.

    ``mask`` broadcasts against ``logits`` (e.g. ``[1, n_local, 1, 1, 1]``);
    invalid frames contribute zero weight. Used by the model-level
    frame-sharded path where the base frame is replicated on every shard
    (counted once, on shard 0) and the frame axis may be padded.
    """
    neg = jnp.asarray(-jnp.inf, logits.dtype)
    masked_logits = jnp.where(mask > 0, logits, neg)
    local_max = masked_logits.max(axis=1, keepdims=True)
    global_max = jax.lax.pmax(local_max, axis_name)

    ex = jnp.exp(logits - global_max) * mask.astype(logits.dtype)
    norm = jax.lax.psum(ex.sum(axis=1, keepdims=True), axis_name)
    wsum = jax.lax.psum((feats * ex).sum(axis=1, keepdims=True), axis_name)
    return (wsum / norm)[:, 0]


def dbsr_apply_frame_sharded(net, params, burst: jax.Array, mesh: Mesh,
                             axis_name: str = "frame",
                             data_axis: str | None = None) -> jax.Array:
    """Run a ``DBSRNet`` forward with the burst-frame axis sharded over a
    mesh axis — the sequence-parallel analog for long bursts (N >> 14).

    With ``data_axis`` set, the batch axis is additionally sharded over
    that mesh axis (2-D data x frame parallelism): every collective in
    the fusion reduces over ``axis_name`` only, so data shards stay
    independent — the standard DP x SP layout.

    Each shard receives the replicated reference frame plus its slice of
    the other frames, runs the per-frame encoder + PWC alignment and the
    merge's weight predictor locally, and the only cross-frame computation
    — the fusion softmax-sum (reference ``merging.py:117-124``) — is
    computed with psum collectives over ``axis_name``
    (``masked_sharded_softmax_fusion``). The decoder runs replicated on the
    fused map. Numerically equal to the dense ``net.apply`` (same params):
    the base frame is counted exactly once (shard 0) and frames padded up
    to a multiple of the shard count are masked out of the fusion.

    ``burst``: ``[B, N, h, w, 4]`` packed RAW. Returns ``pred`` only (the
    aux dict stays shard-local). Requires ``use_base_frame=True`` (the
    mean-base variant would need a cross-shard mean) and ``softmax=True``.
    """
    from dbsr_tpu.models.dbsr import (AlignedEncoder, PixShuffleDecoder,
                                      WeightedSumMerge)

    assert net.use_base_frame and net.softmax, (
        "frame sharding requires use_base_frame=True and softmax=True")
    n_shards = mesh.shape[axis_name]
    B, N = burst.shape[0], burst.shape[1]
    n_oth = N - 1
    k = -(-n_oth // n_shards)  # ceil: local others per shard
    pad = k * n_shards - n_oth

    ref = burst[:, :1]
    oth = burst[:, 1:]
    if pad:
        oth = jnp.concatenate(
            [oth, jnp.zeros((B, pad) + oth.shape[2:], oth.dtype)], axis=1)

    enc_mod = AlignedEncoder(net.enc_init_dim, net.enc_num_res_blocks,
                             net.enc_out_dim, net.activation,
                             net.train_alignment, net.dtype, net.flow_net)
    merge_mod = WeightedSumMerge(
        net.enc_out_dim, net.weight_pred_proj_dim, net.offset_feat_dim,
        net.num_offset_feat_extractor_res, net.num_weight_predictor_res,
        net.use_offset, net.offset_modulo, net.softmax, net.use_base_frame,
        net.ref_offset_noise, net.activation, net.dtype)
    dec_mod = PixShuffleDecoder(
        net.dec_init_conv_dim, net.dec_num_pre_res_blocks,
        net.dec_post_conv_dim, net.dec_num_post_res_blocks,
        net.upsample_factor, net.icnrinit, net.gauss_blur_sd, net.gauss_ksz,
        net.activation, net.final_activation, net.dtype,
        net.fused_s2d_decoder)
    p = params["params"]
    p_enc = {"params": p["encoder"]}
    p_mrg = {"params": p["merging"]}
    p_dec = {"params": p["decoder"]}

    def shard_fn(p_enc, p_mrg, p_dec, ref, oth_local):
        local_burst = jnp.concatenate([ref, oth_local], axis=1)
        enc = enc_mod.apply(p_enc, local_burst)
        ml = merge_mod.apply(p_mrg, enc, return_logits=True)
        all_feat, logits = ml["all_feat"], ml["logits"]

        # validity over local frames [base, k others]: the base frame is
        # counted on shard 0 only; padded others are masked everywhere
        sidx = jax.lax.axis_index(axis_name)
        oth_idx = sidx * k + jnp.arange(k)
        valid = jnp.concatenate([(sidx == 0)[None], oth_idx < n_oth])
        mask = valid.reshape(1, 1 + k, 1, 1, 1)

        fused = masked_sharded_softmax_fusion(all_feat, logits, mask,
                                              axis_name)
        pred = dec_mod.apply(p_dec, fused)
        return pred.astype(jnp.float32)

    bspec = P(data_axis) if data_axis else P()
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), bspec, P(data_axis, axis_name)),
        out_specs=bspec)
    return fn(p_enc, p_mrg, p_dec, ref, oth)
