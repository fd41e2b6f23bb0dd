"""Device mesh + sharding helpers (DP over ICI).

Design (SURVEY.md §2.3): 1-D mesh ("data",) over all chips. Gradients
are averaged by XLA-inserted collectives when jit differentiates a
mean over the sharded batch with replicated params — no hand-written
psum. Multi-host: call init_distributed() first (jax.distributed), then
make_mesh() spans all processes' devices; Grain shards the data per
host (SURVEY.md §3.5).

The mesh is shape-agnostic: works for 1 device (tests/dev), 8 fake CPU
devices (CI), or a v5e-8 slice unchanged.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator: str | None = None) -> None:
    """Multi-host process-group init (DCN). No-op for single-process runs."""
    if jax.process_count() > 1 or coordinator is not None:
        jax.distributed.initialize(coordinator_address=coordinator)


def make_mesh(devices: Any | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs.reshape(-1), (axis,))


def make_spatial_mesh(space_shards: int, devices: Any | None = None) -> Mesh:
    """2-D ("data", "space") mesh for spatially-sharded training
    (parallel/spatial_train.py): image rows shard over the FASTEST
    ("space") axis so halo ppermutes ride neighboring ICI links."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size % space_shards:
        raise ValueError(
            f"{devs.size} devices not divisible by space_shards={space_shards}"
        )
    return Mesh(devs.reshape(-1, space_shards), (DATA_AXIS, "space"))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Device_put a host batch pytree with the leading dim sharded."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def create_replicated(fn: Any, mesh: Mesh) -> Any:
    """Compute `fn()` under jit with the outputs replicated over `mesh`.

    The multihost-safe way to build TrainStates / PRNG keys: device_put
    of host data cannot target non-addressable devices, but a nullary
    jit computation runs SPMD on every host and yields proper global
    arrays (works for typed PRNG keys too). Single-process it is just a
    jitted init."""
    return jax.jit(fn, out_shardings=replicated_sharding(mesh))()
