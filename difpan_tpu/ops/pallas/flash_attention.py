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


# -- fp8 variant -------------------------------------------------------------

E4M3_MAX = 448.0  # largest finite float8_e4m3fn magnitude


def _quant_e4m3_bh(t: jnp.ndarray):
    """Per-(batch*head) symmetric amax quantization of a (bh, n, d) tensor
    to e4m3. Returns (fp8 values, f32 scale (bh, 1)) with t ~ fp8 * scale."""
    amax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=(1, 2),
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / E4M3_MAX
    q = (t.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale[:, :, 0]


def _fp8_attn_kernel(q_ref, k_ref, v_ref, sq_ref, sk_ref, sv_ref, o_ref, *,
                     scale: float):
    # Q/K/V arrive as e4m3 (half the HBM bytes of bf16); dequantization is
    # deferred: the dots run on the raw fp8 codes (converted in-register)
    # and the per-(b,h) scales fold into one scalar multiply per matmul —
    # on fp8-native MXUs (v6e+) the conversion disappears entirely.
    q = q_ref[0].astype(jnp.float32)          # (bq, d) fp8 codes
    k = k_ref[0].astype(jnp.float32)          # (n, d)
    v = v_ref[0].astype(jnp.float32)          # (n, d)
    # scales ride along unblocked ((bh, 1) whole-array SMEM); pick this
    # (batch*head) program's scalar by grid index
    i = pl.program_id(0)
    s_fold = scale * sq_ref[i, 0] * sk_ref[i, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * s_fold     # (bq, n)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) * sv_ref[i, 0]
    o_ref[0] = o.astype(o_ref.dtype)


def fp8_flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: float, *, block_q: int = 256,
                        interpret: bool = None) -> jnp.ndarray:
    """fp8 (e4m3) VMEM-resident attention: same contract as
    `flash_attention` ((B, N, H, D) in/out, full-row softmax), but Q/K/V
    are amax-quantized per (batch, head) to e4m3 before the kernel — HBM
    traffic for the three operand streams halves vs bf16, and softmax/
    accumulation stay f32 inside VMEM. Output is returned in the input
    dtype; quantization error is bounded by e4m3's 3 mantissa bits
    (~2^-4 relative per element, averaged down by the softmax reduction —
    see tests/test_fp8.py and PERF.md for measured deltas).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    b, n, h, d = q.shape
    assert n % block_q == 0, (n, block_q)

    def to_bh(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    qh, sq = _quant_e4m3_bh(to_bh(q))
    kh, sk = _quant_e4m3_bh(to_bh(k))
    vh, sv = _quant_e4m3_bh(to_bh(v))
    mem = pltpu.VMEM if (_HAS_PLTPU and not interpret) else None

    def spec(block_shape, index_map):
        if mem is None:
            return pl.BlockSpec(block_shape, index_map)
        return pl.BlockSpec(block_shape, index_map, memory_space=mem)

    def sspec():
        # per-(b,h) scale scalars ride along whole-array (block == array
        # shape satisfies Mosaic's tiling check) in SMEM; the kernel
        # indexes them by program_id
        if mem is None:
            return pl.BlockSpec((b * h, 1), lambda i, j: (0, 0))
        return pl.BlockSpec((b * h, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_fp8_attn_kernel, scale=scale),
        grid=(b * h, n // block_q),
        in_specs=[
            spec((1, block_q, d), lambda i, j: (i, j, 0)),
            spec((1, n, d), lambda i, j: (i, 0, 0)),
            spec((1, n, d), lambda i, j: (i, 0, 0)),
            sspec(),
            sspec(),
            sspec(),
        ],
        out_specs=spec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=interpret,
    )(qh, kh, vh, sq, sk, sv)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
