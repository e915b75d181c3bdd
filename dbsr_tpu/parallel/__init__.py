"""Mesh construction and sharding policy."""

from dbsr_tpu.parallel.mesh import (make_mesh, data_sharding,
                                    replicated_sharding, shard_batch)
