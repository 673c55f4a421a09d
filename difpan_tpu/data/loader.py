"""Batch iteration + device prefetch + condition packing.

Replaces the reference's torch DataLoader loop (`diffusion_engine.py:218-228`)
with a TPU-friendly pipeline:

  * `batch_iterator` — shuffled epoch-looping host batching (static batch
    size: remainder batches are dropped in training mode so every step has
    one compiled shape; eval keeps remainders, padding if requested);
  * `device_prefetch` — double-buffered `jax.device_put`, so host gather of
    batch N+1 overlaps device compute of batch N;
  * `pack_cond` — cond = [lms, pan, bilinear_resize(wavelets)] on device
    (`diffusion_engine.py:221-228`), fused by XLA into the first UNet convs.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batch_iterator(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = None,
    drop_remainder: bool = False,
) -> Iterator[Tuple[np.ndarray, ...]]:
    """Yield tuples of stacked NHWC numpy batches from a dataset exposing
    `__len__` and `batch(idx, rng)`. epochs=None loops forever."""
    rng = np.random.default_rng(seed)
    n = len(dataset)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = (n - n % batch_size) if drop_remainder else n
        for start in range(0, stop, batch_size):
            idx = order[start:start + batch_size]
            yield dataset.batch(idx, rng)
        epoch += 1


def device_prefetch(iterator: Iterable, size: int = 2,
                    sharding=None) -> Iterator:
    """Double-buffered transfer: keep `size` batches in flight on device.

    With a `sharding`, batches are placed directly into their sharded
    layout (per-device slices go straight over PCIe/ICI, no host gather).
    """
    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def pack_cond(lms: jnp.ndarray, pan: jnp.ndarray,
              wavelets: jnp.ndarray) -> jnp.ndarray:
    """cond = concat[lms, pan, resize(wavelets -> lms size)] on the channel
    axis (NHWC), matching `diffusion_engine.py:221-228` (bilinear,
    align_corners=False, no antialias)."""
    b, h, w, _ = lms.shape
    wav = jax.image.resize(
        wavelets, (b, h, w, wavelets.shape[-1]), method="bilinear",
        antialias=False)
    return jnp.concatenate([lms, pan, wav], axis=-1)
