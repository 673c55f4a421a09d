"""Misc utilities mirroring `/root/reference/utils/misc.py`."""

from __future__ import annotations

import os
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def norm(x):
    """[0,1] -> [-1,1] (`diffusion_engine.py:33-35`)."""
    return x * 2 - 1


def unorm(x):
    """[-1,1] -> [0,1] (`diffusion_engine.py:38-40`)."""
    return (x + 1) / 2


def norm_data_range(x):
    """Min/max normalize to [-1, 1] (`utils/misc.py:62-75`)."""
    x = x - x.min()
    x = x / x.max()
    return 2 * x - 1


def unnorm_data_range(x):
    """[-1, 1] -> [0, 1] (`utils/misc.py:78-87`)."""
    return (x + 1) / 2


def model_froze(params):
    """Freeze a params pytree (stop_gradient on every leaf) — the JAX
    equivalent of `utils/misc.model_froze` (`:39-42`)."""
    return jax.tree_util.tree_map(jax.lax.stop_gradient, params)


def grad_clip(grads, mode: str = "value", value: float = None):
    """Clip a gradient pytree by value or global norm (`utils/misc.py:25-36`).
    The train engine uses optax.clip_by_global_norm inside the optimizer
    chain; this standalone version serves custom loops."""
    assert mode in ("value", "norm")
    if mode == "norm":
        gnorm = jnp.sqrt(sum(
            jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads)))
        scale = jnp.minimum(1.0, value / (gnorm + 1e-12))
        return jax.tree_util.tree_map(lambda g: g * scale, grads)
    return jax.tree_util.tree_map(
        lambda g: jnp.clip(g, -value, value), grads)


def dict_to_str(d) -> str:
    """`utils/misc.py:45-52`."""
    items = list(d.items())
    return ", ".join(
        f"{k}: {float(v) if hasattr(v, 'item') or isinstance(v, (int, float)) else v}"
        for k, v in items)


def to_numpy(*args):
    return [np.asarray(jax.device_get(a)) for a in args]


def list_tensor2_list_list(list_tensor: Sequence, n: int,
                           mode: str = "time") -> List[list]:
    """Regroup a flat fm list by timestep chunk or by size stride
    (`utils/misc.py:136-161`)."""
    num = len(list_tensor)
    assert num % n == 0
    if mode == "time":
        return [list(list_tensor[i * n:(i + 1) * n]) for i in range(num // n)]
    elif mode == "size":
        return [list(list_tensor[i::n]) for i in range(n)]
    raise NotImplementedError(f"mode {mode} is not supported")


def concat_dif_timesteps_tensor(tensor_list, n: int, out_size):
    """`utils/misc.py:165-176`: group by size, concat channels, resize to
    out_size (bilinear align_corners=True like the reference), concat all.
    NHWC."""
    groups = list_tensor2_list_list(tensor_list, n, mode="size")
    ts = []
    for g in groups:
        t = jnp.concatenate(g, axis=-1)
        b, h, w, c = t.shape
        # align_corners=True == jax.image 'linear' with scale translation...
        # torch align_corners=True maps corner pixels exactly; jax.image
        # does half-pixel. Emulate align_corners via explicit coordinates.
        t = _resize_align_corners(t, out_size, out_size)
        ts.append(t)
    return jnp.concatenate(ts, axis=-1)


def _resize_align_corners(x, out_h, out_w):
    """Bilinear resize with align_corners=True semantics (corner-anchored
    sample grid), NHWC."""
    b, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g00 = x[:, y0][:, :, x0]
    g01 = x[:, y0][:, :, x1]
    g10 = x[:, y1][:, :, x0]
    g11 = x[:, y1][:, :, x1]
    return ((1 - wy) * ((1 - wx) * g00 + wx * g01)
            + wy * ((1 - wx) * g10 + wx * g11))


def path_legal_checker(path: str, is_file: bool = True) -> str:
    """`utils/misc.py:193-201`."""
    d = os.path.dirname(path) if is_file else path
    if d and not os.path.exists(d):
        os.makedirs(d, exist_ok=True)
    return path


def compute_iters(size: int, bs: int, drop_last: bool = False) -> int:
    """`utils/misc.py:204-208`."""
    fp_iters = size / bs
    int_iter = int(np.ceil(fp_iters))
    last = int((fp_iters - int_iter) > 0.0) if not drop_last else 0
    return int_iter + last
