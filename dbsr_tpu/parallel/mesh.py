"""Device mesh + sharding policy (the framework's "comm backend").

The reference's entire parallelism is single-process ``nn.DataParallel``
over local GPUs (`admin/multigpu.py:4-14`). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis: the batch is sharded over
devices, params are replicated, and XLA inserts the gradient all-reduce
(psum) over ICI. No transport code — sharding policy only. Multi-host
extends this by calling ``jax.distributed.initialize`` before mesh
construction (same policy code).

An optional ``frame`` axis is reserved for burst-frame sharding (the
sequence-parallel analog — SURVEY.md section 2.5): the fusion softmax-sum
can be computed with an all-reduce of per-shard (max, weighted sum,
normalizer) over this axis. Not required for parity.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices (default: all).

    With one axis name the mesh is 1-D (pure data parallel). ``shape``
    reshapes the devices for multi-axis meshes, e.g.
    ``make_mesh(8, ("data", "frame"), (4, 2))``.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    arr = np.array(devs)
    if shape is not None:
        arr = arr.reshape(shape)
    elif len(axis_names) > 1:
        raise ValueError("multi-axis mesh requires an explicit shape")
    return Mesh(arr, axis_names=axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a host batch pytree with the batch dim sharded."""
    return jax.device_put(tree, data_sharding(mesh, axis))
