"""Training state: params + AdamW/MultiStepLR optimizer + EMA, as one pytree.

Optimizer parity with the engine (`diffusion_engine.py:205-209,237`):
AdamW(lr=1e-4, weight_decay=1e-4), MultiStepLR([100k, 200k, 350k], gamma=0.2),
global grad-norm clip 0.003. EMA parity with `utils/optim_utils.py:43-58`:
plain copy until `start_iter` (20k), then `ema = decay*ema + (1-decay)*p`
with decay 0.995.

Unlike the reference (which checkpoints bare weights only,
`diffusion_engine.py:333-341`), the whole TrainState round-trips through
orbax so training resumes exactly (see utils.checkpoints).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray          # scalar int32
    params: Any
    opt_state: Any
    ema_params: Any


def make_optimizer(
    lr: float = 1e-4,
    weight_decay: float = 1e-4,
    milestones: Sequence[int] = (100_000, 200_000, 350_000),
    gamma: float = 0.2,
    grad_clip_norm: float = 0.003,
) -> optax.GradientTransformation:
    schedule = optax.piecewise_constant_schedule(
        init_value=lr,
        boundaries_and_scales={int(m): gamma for m in milestones})
    return optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8,
                    weight_decay=weight_decay),
    )


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree_util.tree_map(jnp.copy, params),
    )


def ema_update(params, ema_params, step, *, decay: float = 0.995,
               start_iter: int = 20_000):
    """Reference semantics: copy-through until start_iter, then decay mix
    (`optim_utils.py:43-58`). Branch-free (lax.select on the scalar step)
    so it stays inside the compiled train step."""
    mix = jnp.where(step > start_iter, decay, 0.0).astype(jnp.float32)

    def leaf(p, e):
        return e * mix + p * (1.0 - mix)

    return jax.tree_util.tree_map(leaf, params, ema_params)
