"""Pallas TPU kernels for the FWM linear cross-attention core.

After the reference's per-axis softmaxes (`models/sr3_dwt.py:545-546`), FWM
computes a per-head d x d context = k^T v over all pixels, then projects q
through it (`:553-567`). These are two skinny matmuls with a tiny
intermediate — ideal for a tiled Pallas pipeline: the context accumulates in
VMEM across pixel tiles (one HBM read of k, v), then q streams through once.

Public entry: `fwm_linear_attention(q, k, v, nheads)` on NHWC tensors,
numerically matching the jnp einsum pair to float tolerance (see tests;
`interpret=True` runs on CPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _ctx_kernel(k_ref, v_ref, ctx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        ctx_ref[...] = jnp.zeros_like(ctx_ref)

    k = k_ref[0].astype(jnp.float32)   # (T, d)
    v = v_ref[0].astype(jnp.float32)   # (T, d)
    ctx_ref[0] += jax.lax.dot_general(
        k, v, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(ctx_ref.dtype)


def _proj_kernel(q_ref, ctx_ref, o_ref):
    q = q_ref[0].astype(jnp.float32)     # (T, d)
    ctx = ctx_ref[0].astype(jnp.float32)  # (d, d)
    o_ref[0] = jnp.dot(q, ctx,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _spec(block_shape, index_map, interpret):
    if _HAS_PLTPU and not interpret:
        return pl.BlockSpec(block_shape, index_map,
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec(block_shape, index_map)


def fwm_linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         nheads: int, *, tile: int = 2048,
                         interpret: bool = None) -> jnp.ndarray:
    """q, k, v: (B, H, W, nheads*d) AFTER the per-axis softmaxes and q
    scaling. Returns (B, H, W, nheads*d) = einsum pair
    context=sum_hw k*v ; out = q @ context, per head.
    interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, hh, ww, c = q.shape
    d = c // nheads
    hw = hh * ww
    tile = min(tile, hw)
    while hw % tile != 0:
        tile //= 2
    n_tiles = hw // tile

    def to_bh(t):
        return rearrange(t, "b H W (h d) -> (b h) (H W) d", h=nheads)

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    bh = b * nheads

    ctx = pl.pallas_call(
        _ctx_kernel,
        grid=(bh, n_tiles),
        in_specs=[
            _spec((1, tile, d), lambda i, j: (i, j, 0), interpret),
            _spec((1, tile, d), lambda i, j: (i, j, 0), interpret),
        ],
        out_specs=_spec((1, d, d), lambda i, j: (i, 0, 0), interpret),
        out_shape=jax.ShapeDtypeStruct((bh, d, d), jnp.float32),
        interpret=interpret,
    )(kf, vf)

    out = pl.pallas_call(
        _proj_kernel,
        grid=(bh, n_tiles),
        in_specs=[
            _spec((1, tile, d), lambda i, j: (i, j, 0), interpret),
            _spec((1, d, d), lambda i, j: (i, 0, 0), interpret),
        ],
        out_specs=_spec((1, tile, d), lambda i, j: (i, j, 0), interpret),
        out_shape=jax.ShapeDtypeStruct((bh, hw, d), q.dtype),
        interpret=interpret,
    )(qf, ctx)

    return rearrange(out, "(b h) (H W) d -> b H W (h d)", b=b, H=hh)
