"""Orbax checkpointing of the full TrainState (params + optimizer + EMA +
step).

This is a capability upgrade over the reference, which `torch.save`s bare
weight state_dicts every 5k iters and cannot resume optimizer/EMA state
(`diffusion_engine.py:333-341`, SURVEY §5). Layout:

    <dir>/<step>/   — one orbax StandardCheckpointer save per step
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from ..train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(jax.device_get(state.step))
    path = os.path.join(ckpt_dir, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [int(d) for d in os.listdir(ckpt_dir) if d.isdigit()]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: TrainState,
                       step: Optional[int] = None) -> TrainState:
    ckpt_dir = os.path.abspath(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(ckpt_dir, str(step))
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, jax.device_get(target))
        restored = ckptr.restore(path, abstract)
    return restored


def save_params(path: str, params: Any) -> str:
    """Save bare params (the reference's weights-only protocol analog)."""
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), jax.device_get(params), force=True)
    return path


def restore_params(path: str, target: Any) -> Any:
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, jax.device_get(target))
        return ckptr.restore(os.path.abspath(path), abstract)
