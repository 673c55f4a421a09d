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

from typing import TYPE_CHECKING

import jax
import orbax.checkpoint as ocp

if TYPE_CHECKING:  # type-only; avoids a circular import with train.engine
    from ..train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: "TrainState") -> str:
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


def restore_checkpoint(ckpt_dir: str, target: "TrainState",
                       step: Optional[int] = None) -> "TrainState":
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


def merge_params_by_shape(target: Any, source: Any, verbose: bool = False
                          ) -> Any:
    """Partial/fuzzy weight loading: copy every source leaf whose path AND
    shape match the target; keep the target leaf otherwise. The functional
    analog of the reference `model_load`'s shape-match fallback
    (`utils/misc.py:89-133`), for warm-starting models whose heads/widths
    changed."""
    import jax.tree_util as jtu

    src_flat = {jtu.keystr(p): v
                for p, v in jtu.tree_leaves_with_path(source)}

    def merge(path, tgt_leaf):
        key = jtu.keystr(path)
        src = src_flat.get(key)
        if src is not None and getattr(src, "shape", None) == tgt_leaf.shape:
            return src
        if verbose and src is not None:
            print(f"shape mismatch, keeping target: {key} "
                  f"{getattr(src, 'shape', None)} vs {tgt_leaf.shape}")
        return tgt_leaf

    return jtu.tree_map_with_path(merge, target)


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


def restore_for_model(ckpt_dir: str, model, *, tx=None, image_size: int = 64
                      ) -> "TrainState":
    """Restore a full TrainState for a `UNetSR3DWT`-family model from an
    orbax dir, building the template (init params + optimizer tree) from
    the model's own attributes — the one-stop loader the eval/study/parity
    scripts and CLI share instead of hand-rolling dummy-shape init.

    `tx` defaults to the engine's standard optimizer (`make_optimizer()`);
    pass the real one if the checkpoint was trained with different
    hyperparameters AND you intend to keep training (for eval-only use the
    default is fine — only tree structure matters for restore).
    """
    import jax.numpy as jnp

    from ..train.state import create_train_state, make_optimizer

    tx = tx or make_optimizer()
    c = model.lms_channel
    cond_ch = 2 * c + 4 * model.pan_channel
    p0 = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, image_size, image_size, c)), jnp.array([0]),
        jnp.zeros((1, image_size, image_size, cond_ch)),
        train=False)["params"]
    return restore_checkpoint(os.path.abspath(ckpt_dir),
                              create_train_state(p0, tx))
