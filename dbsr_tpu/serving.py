"""Production serving entry: load a checkpoint into an AOT-compiled,
fixed-shape burst-SR predictor.

The reference has no serving story (eval scripts re-jit per run); for TPU
deployment the costs to control are (a) the multi-minute first-call jit
compile and (b) shape polymorphism silently triggering recompiles in a
serving process. ``load_predictor`` pins the serving configuration
(batch, burst size, frame geometry, compute dtype, kernel fast paths),
lowers and compiles AHEAD of the first request, and returns a predictor
that pads partial batches to the compiled shape instead of recompiling.

Usage::

    pred = load_predictor("ws/dbsr/default_synthetic/dbsr_synthetic_ep0100.ckpt",
                          batch_size=8)
    rgb = pred(burst_u16 / 2**14)     # [<=8, 14, 48, 48, 4] -> [n, 384, 384, 3]

Multi-chip serving shards the batch over a data mesh
(``mesh=make_mesh()``); XLA partitions the compiled program once.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from dbsr_tpu.training.checkpoint import load_network


class Predictor:
    """AOT-compiled fixed-shape burst-SR predictor (see module doc)."""

    def __init__(self, net, params, batch_size: int, burst_size: int,
                 burst_hw, mesh=None):
        self.batch_size = batch_size
        self.in_shape = (batch_size, burst_size) + tuple(burst_hw) + (4,)

        def forward(params, burst):
            pred, _ = net.apply(params, burst)
            return jnp.clip(pred, 0.0, 1.0)

        fn = jax.jit(forward)
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            if batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by the mesh "
                    f"'data' axis ({mesh.shape['data']} devices)")
            param_sharding = NamedSharding(mesh, P())
            self._batch_sharding = NamedSharding(mesh, P("data"))
            fn = jax.jit(
                forward,
                in_shardings=(param_sharding, self._batch_sharding),
                out_shardings=self._batch_sharding)
            # AOT executables require inputs already placed at the compiled
            # shardings; params come in as host (numpy) arrays from
            # load_network.
            params = jax.device_put(params, param_sharding)
        t0 = time.time()
        self._compiled = fn.lower(
            jax.eval_shape(lambda: params),
            jax.ShapeDtypeStruct(self.in_shape, jnp.float32)).compile()
        self.compile_seconds = time.time() - t0
        self._params = params
        cost = self._compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        self.flops_per_batch = cost.get("flops") if isinstance(cost, dict) \
            else None

    def __call__(self, burst) -> np.ndarray:
        """``[n <= batch_size, N, h, w, 4]`` float RAW burst ->
        ``[n, H, W, 3]`` linear RGB. Partial batches are padded to the
        compiled shape (no recompile)."""
        burst = np.asarray(burst, np.float32)
        if burst.ndim == 4:
            burst = burst[None]
        n = burst.shape[0]
        if n > self.batch_size:
            raise ValueError(f"batch {n} > compiled batch {self.batch_size}")
        if burst.shape[1:] != self.in_shape[1:]:
            raise ValueError(
                f"expected frame shape {self.in_shape[1:]}, got "
                f"{burst.shape[1:]}")
        if n < self.batch_size:
            pad = np.zeros((self.batch_size - n,) + burst.shape[1:],
                           np.float32)
            burst = np.concatenate([burst, pad], axis=0)
        if self._batch_sharding is not None:
            arr = jax.device_put(burst, self._batch_sharding)
        else:
            arr = jnp.asarray(burst)
        out = self._compiled(self._params, arr)
        return np.asarray(out)[:n]


def load_predictor(checkpoint_path: str, batch_size: int = 8,
                   burst_size: int = 14, burst_hw=(48, 48),
                   dtype=jnp.bfloat16, fused_s2d: bool = True,
                   mesh=None, **net_overrides) -> Predictor:
    """Rebuild the network from a checkpoint and AOT-compile it at the
    serving configuration (bf16 compute + fused s2d decoder by default —
    the measured-fastest serving path, PERF.md)."""
    overrides = dict(dtype=dtype, fused_s2d_decoder=fused_s2d)
    overrides.update(net_overrides)
    net, params, _ = load_network(checkpoint_path, **overrides)
    return Predictor(net, params, batch_size, burst_size, burst_hw,
                     mesh=mesh)
