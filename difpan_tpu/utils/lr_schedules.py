"""LR schedules as optax-compatible step->lr functions, mirroring
`/root/reference/utils/lr_scheduler.py` (WarmupCosine, WarmupLinear,
MultiStepConstant) plus the engine's MultiStepLR.

In JAX the schedule is a pure function consumed by the optimizer chain, not
a stateful object stepping an optimizer — `StepsAll` is therefore
unnecessary; compose schedules with `optax.join_schedules` instead.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_cosine_schedule(base_lr: float, warmup_steps: int,
                           t_total: int) -> optax.Schedule:
    """`lr_scheduler.py:5-42` (linear warmup then cosine decay to 0)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(
            math.pi * (step - warmup_steps) / max(t_total - warmup_steps, 1)))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def warmup_linear_schedule(base_lr: float, warmup_steps: int, t_total: int,
                           only_warmup: bool = False) -> optax.Schedule:
    """`lr_scheduler.py:45-83`."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        if only_warmup:
            lin = jnp.full_like(warm, base_lr)
        else:
            lin = (base_lr * (t_total - step)
                   / max(t_total - warmup_steps, 1))
        return jnp.where(step < warmup_steps, warm, lin)

    return schedule


def multistep_constant_schedule(epoch_ms: Sequence[int],
                                lr_ms: Sequence[float]) -> optax.Schedule:
    """`lr_scheduler.py:86-109`: piecewise-constant lrs at given steps."""
    assert len(epoch_ms) == len(lr_ms)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        lr = jnp.asarray(lr_ms[0], jnp.float32)
        for boundary, val in zip(epoch_ms[1:], lr_ms[1:]):
            lr = jnp.where(step >= boundary, val, lr)
        return lr

    return schedule


def multistep_lr(base_lr: float, milestones: Sequence[int],
                 gamma: float) -> optax.Schedule:
    """torch MultiStepLR — the engine's schedule
    (`diffusion_engine.py:207-209`)."""
    return optax.piecewise_constant_schedule(
        init_value=base_lr,
        boundaries_and_scales={int(m): gamma for m in milestones})
