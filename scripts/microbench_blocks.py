#!/usr/bin/env python
"""Micro-benchmark UNet block types at bench shapes on the real backend.
Each op is repeated K times inside one lax.scan (output feeds input) so the
remote runtime cannot memoize and dispatch overhead amortizes."""
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from difpan_tpu.models.common import Block, ResnetBlock, SelfAttention
from difpan_tpu.models.sr3_dwt import CondInjection, FastAttnCondInjection

K = 30
B = 4
DT = jnp.bfloat16


def scan_time(name, module, xshape, extra=None, project=None):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, xshape, DT)
    args = (x,) + (extra if extra else ())
    params = module.init({"params": key}, *args)

    def body(carry, _):
        out = module.apply(params, carry, *(extra if extra else ()))
        if project is not None:
            out = project(out, carry)
        return out.astype(DT), None

    f = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=K)[0])
    out = f(x)
    jax.block_until_ready(out)
    ts = []
    for i in range(2):
        x2 = jax.random.normal(jax.random.PRNGKey(i + 1), xshape, DT)
        t0 = time.perf_counter()
        jax.block_until_ready(f(x2))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)/K*1e3:7.2f} ms/op")


class TimeEmbWrap(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        t = jnp.zeros((x.shape[0], 32), x.dtype)
        return ResnetBlock(self.dim, dropout=0.0, norm_groups=1,
                           name="rb")(x, t, train=False)


class CondWrap(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x, cond):
        return CondInjection(hidden_dim=self.dim_out, groups=1,
                             name="ci")(x, cond)


class FwmWrap(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x, cond):
        return FastAttnCondInjection(
            qkv_dim=x.shape[-1], dim_out=self.dim_out, groups=1,
            name="fwm")(x, cond, train=False)


class ConvOnly(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.feats, (3, 3), padding=((1, 1), (1, 1)),
                       name="c")(x)


def main():
    print("backend:", jax.default_backend())
    cond9 = jax.random.normal(jax.random.PRNGKey(9), (B, 256, 256, 9), DT)
    cond11 = jax.random.normal(jax.random.PRNGKey(9), (B, 256, 256, 11), DT)

    scan_time("conv3x3 32->32 @256", ConvOnly(32), (B, 256, 256, 32))
    scan_time("conv3x3 128->128 @64", ConvOnly(128), (B, 64, 64, 128))
    scan_time("Block(GN1+swish+conv) 32 @256", Block(32, groups=1),
              (B, 256, 256, 32))
    scan_time("ResnetBlock 32 @256", TimeEmbWrap(32), (B, 256, 256, 32))
    scan_time("ResnetBlock 128 @64", TimeEmbWrap(128), (B, 64, 64, 128))
    scan_time("CSM CondInjection 32 @256", CondWrap(32),
              (B, 256, 256, 32), extra=(cond9,))
    scan_time("FWM FastAttn 64->32 @256", FwmWrap(32),
              (B, 256, 256, 64), extra=(cond11,),
              project=lambda out, c: jnp.concatenate([out, out], -1))
    scan_time("SelfAttention 128 @32", SelfAttention(n_head=8, norm_groups=1),
              (B, 32, 32, 128))


if __name__ == "__main__":
    main()
