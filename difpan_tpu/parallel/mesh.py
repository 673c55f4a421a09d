"""Device mesh + sharding helpers.

The reference has no working parallelism (its DataParallel wrapper is
commented out, `diffusion_engine.py:199-201`); here data-parallel train and
batch-sharded sampling are first-class: a 1-D `data` mesh axis, batches
sharded along it, params/EMA replicated. XLA inserts the gradient
all-reduce over ICI — no hand-written collectives needed at this level.

For workloads whose single image exceeds HBM (e.g. 1000x1000 Harvard
full-res), see `difpan_tpu.parallel.spatial` for H-axis sharding with halo
exchange.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data",
              devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            import warnings
            warnings.warn(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devs)} available — building a {len(devs)}-device "
                "mesh", stacklevel=2)
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch pytree into its sharded device layout."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
