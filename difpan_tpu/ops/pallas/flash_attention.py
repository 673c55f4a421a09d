"""Pallas TPU kernel: VMEM-resident softmax attention for large token
counts.

At 512px inputs the model's mid-stage self-attention runs over 4096 tokens;
the XLA path materializes the (HW x HW) score matrix in HBM (bf16: ~1.6 GB
at batch 6) and reads it back through softmax and the AV matmul — measured
at ~21% of the whole UNet forward (see PERF.md). Per (batch, head) the
problem is tiny (K, V: 4096 x 16), so one kernel invocation can hold K, V
and a query block's full score rows in VMEM: scores never touch HBM, and
softmax rows are complete (no online rescaling needed — unlike true
flash-attention this shape fits the whole key axis at once).

Numerics: scores and softmax in f32 (the XLA path computes them in the
activation dtype), output cast back; row-max subtraction for stability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is only importable on TPU-enabled builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)          # (bq, d)
    k = k_ref[0].astype(jnp.float32)          # (n, d)
    v = v_ref[0].astype(jnp.float32)          # (n, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # (bq, n)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p, v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, *, block_q: int = 256,
                    interpret: bool = None) -> jnp.ndarray:
    """q, k, v: (B, N, H, D) (token-major, heads on axis 2 — the
    SelfAttention layout). Softmax over the full key axis. Returns the same
    layout. N must be a multiple of block_q."""
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, n, h, d = q.shape
    assert n % block_q == 0, (n, block_q)

    def to_bh(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    mem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None

    def spec(block_shape, index_map):
        if mem is None:
            return pl.BlockSpec(block_shape, index_map)
        return pl.BlockSpec(block_shape, index_map, memory_space=mem)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h, n // block_q),
        in_specs=[
            spec((1, block_q, d), lambda i, j: (i, j, 0)),
            spec((1, n, d), lambda i, j: (i, 0, 0)),
            spec((1, n, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=spec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
