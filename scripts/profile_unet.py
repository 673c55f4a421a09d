#!/usr/bin/env python
"""Perf diagnosis: per-op-class timing of the flagship UNet on the current
backend. Separates fixed dispatch overhead from compute scaling."""
import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from difpan_tpu.models import UNetSR3DWT


def timed(f, *args, iters=3):
    out = f(*args)
    jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready")
        else a, out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = f(*args)
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a, out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dtype", default="bf16")
    args = p.parse_args()

    print("backend:", jax.default_backend(), jax.devices())
    c, pc = 8, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
        attn_res=(8,), res_blocks=3, dropout=0.2, image_size=64,
        self_condition=True)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key}, jnp.zeros((1, 64, 64, c)), jnp.array([0]),
        jnp.zeros((1, 64, 64, 2 * c + 4 * pc)), train=False)["params"]
    params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)

    b, s = args.batch, args.size
    x = jax.random.normal(key, (b, s, s, c), dtype)
    t = jnp.full((b,), 10)
    cond = jax.random.normal(key, (b, s, s, 2 * c + 4 * pc), dtype)

    fwd = jax.jit(lambda p, x, t, cond: model.apply(
        {"params": p}, x, t, cond, train=False))
    # cost analysis
    lowered = fwd.lower(params, x, t, cond)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if ca:
        flops = ca.get("flops", 0)
        bytes_ac = ca.get("bytes accessed", 0)
        print(f"XLA cost: {flops/1e9:.1f} GFLOP, {bytes_ac/1e9:.2f} GB "
              f"accessed")
    dt = timed(lambda: compiled(params, x, t, cond), iters=5)
    print(f"UNet fwd {b}x{s}: {dt*1e3:.1f} ms "
          f"({flops/dt/1e12:.2f} TFLOP/s effective, "
          f"{bytes_ac/dt/1e9:.0f} GB/s)")

    # dispatch overhead: trivial jitted op
    triv = jax.jit(lambda a: a + 1)
    dt0 = timed(lambda: triv(x), iters=10)
    print(f"trivial dispatch: {dt0*1e3:.2f} ms")


if __name__ == "__main__":
    main()
