"""Distributed backend: mesh construction, process init, sharding helpers.

First-class build component (SURVEY.md §2.3, §5.8): the reference has
no distributed story; here DP-over-ICI is the supported axis. ICI
collectives are emitted by XLA from sharding annotations (pjit); DCN
multi-host init goes through jax.distributed.
"""

from partseg_tpu.dist.mesh import (
    init_distributed,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]
