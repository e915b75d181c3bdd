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
    from jax.experimental.shard_map import shard_map

    spec_in = P(None, axis_name)
    spec_out = P()

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(spec_in, spec_in),
             out_specs=spec_out)
    def fused(feats, logits):
        return sharded_softmax_fusion(feats, logits, axis_name)

    return fused
