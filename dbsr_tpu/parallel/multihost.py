"""Multi-host (multi-process) initialization and data feeding over DCN.

The reference's parallelism ceiling is single-node ``nn.DataParallel``
(`admin/multigpu.py:8-14`). On TPU pods, scaling past one host means one
JAX process per host, connected by ``jax.distributed.initialize``; the
mesh/sharding policy (``dbsr_tpu/parallel/mesh.py``) is unchanged — XLA
routes gradient all-reduces over ICI within a slice and DCN across slices.

This module provides the glue the policy code needs:

* ``maybe_initialize_distributed()`` — env-gated
  ``jax.distributed.initialize`` (no-op single-process by default, so the
  same entry point works from a laptop to a pod).
* ``global_batch_from_local(...)`` — assemble a globally-sharded batch
  from each process's local shard (the host only ever materializes its own
  slice of the batch).
* ``process_local_batch_slice(...)`` — which slice of the global batch
  this process should feed.

Launch recipe (one command per host):

    DBSR_TPU_DIST=1 \
    JAX_COORDINATOR_ADDRESS=host0:8476 \
    JAX_NUM_PROCESSES=4 JAX_PROCESS_ID=$i \
    python run_training.py dbsr default_synthetic

On Cloud TPU VMs the three JAX_* variables are auto-detected and
``DBSR_TPU_DIST=1`` alone suffices.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_requested() -> bool:
    return os.environ.get("DBSR_TPU_DIST", "0") not in ("", "0", "false")


def maybe_initialize_distributed(
        coordinator_address: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None) -> bool:
    """Call ``jax.distributed.initialize`` iff multi-process is requested.

    Returns True when distributed mode is active. Explicit args override
    the JAX_* env vars; with neither present, JAX auto-detects on Cloud
    TPU. Must run before first device use.
    """
    if not (distributed_requested() or coordinator_address):
        return False
    kwargs = {}
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["JAX_COORDINATOR_ADDRESS"])
    if num_processes is not None or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes if num_processes is not None
            else os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def process_local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """(start, size) of this process's slice of the global batch.

    The global batch is split evenly over processes in process-id order
    (matching ``make_array_from_process_local_data`` addressable-shard
    order for a 1-D data mesh laid out over processes).
    """
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count {n}")
    per = global_batch // n
    return jax.process_index() * per, per


def global_batch_from_local(mesh: Mesh, local_tree,
                            axis: str = "data"):
    """Assemble a globally-sharded batch from process-local shards.

    ``local_tree``: pytree of host arrays holding THIS process's slice
    (leading dim = global_batch / process_count). Returns a pytree of
    global ``jax.Array`` s sharded over ``axis``. Single-process this is
    equivalent to ``shard_batch`` (the local data IS the global batch).
    """
    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        global_shape = (x.shape[0] * jax.process_count(),) + tuple(
            x.shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(one, local_tree)
