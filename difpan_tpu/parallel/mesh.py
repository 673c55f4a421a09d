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
              devices=None, *, strict: bool = True) -> Mesh:
    """1-D mesh over `n_devices` (default: all).

    With fewer devices than requested, raise (default) — downstream code
    (H-divisibility checks, per-shard memory budgets) is sized for the
    requested mesh, so silently shrinking would mask real config errors.
    Pass strict=False to get the old warn-and-shrink behavior.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            msg = (f"make_mesh: requested {n_devices} devices but only "
                   f"{len(devs)} available")
            if strict:
                raise ValueError(
                    msg + " (pass strict=False to shrink to what exists, or "
                    "set XLA_FLAGS=--xla_force_host_platform_device_count="
                    f"{n_devices} for a virtual CPU mesh)")
            import warnings
            warnings.warn(msg + f" — building a {len(devs)}-device mesh",
                          stacklevel=2)
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_mesh_2d(n_data: int, n_space: int,
                 axis_names=("data", "space"),
                 devices=None, *, strict: bool = True) -> Mesh:
    """2-D (data x space) mesh: batch shards over `data`, image rows over
    `space` — so an 8-chip pod can serve a batch of beyond-HBM images
    (dp x sp composed on one mesh, VERDICT r2 item 3).

    Device order is row-major: the `space` axis is innermost, so the
    halo-exchange `ppermute`s of the H-sharded UNet ride neighboring ICI
    links while the gradient/batch collectives span the outer axis.
    """
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_space
    if len(devs) < need:
        msg = (f"make_mesh_2d: requested {n_data}x{n_space}={need} devices "
               f"but only {len(devs)} available")
        if strict:
            raise ValueError(msg)
        # shrink the DATA axis to what exists (the space axis sizes the
        # H-sharding the caller budgeted for, so it must not change)
        n_data = len(devs) // n_space
        if n_data < 1:
            raise ValueError(msg + f" — cannot even fit one {n_space}-wide "
                                   "space row")
        import warnings
        warnings.warn(msg + f" — shrinking to {n_data}x{n_space}",
                      stacklevel=2)
        need = n_data * n_space
    devs = devs[:need]
    return Mesh(np.array(devs).reshape(n_data, n_space), tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch pytree into its sharded device layout."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
