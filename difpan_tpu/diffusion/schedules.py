"""Noise schedules for Gaussian diffusion, as immutable pytrees.

Behavior parity with the reference implementation
(`/root/reference/diffusion/diffusion_ddpm_pan.py:17-57` for beta schedules,
`:199-276` for the derived buffers, `:529-592` for DDIM respacing), but
functional: building and respacing return NEW `Schedule` values instead of
mutating registered buffers in place.

All derivations happen in float64 numpy at trace/setup time; the resulting
tables are small ([T]-shaped) float32 device constants that `lax.scan` sampling
loops index with dynamic slices, so everything stays on-device and
XLA-friendly (static shapes, no data-dependent control flow).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np


def _warmup_beta(linear_start: float, linear_end: float, n_timestep: int,
                 warmup_frac: float) -> np.ndarray:
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64)
    return betas


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """All 7 beta schedules of the reference (`diffusion_ddpm_pan.py:26-57`).

    Returns float64 numpy betas of shape [n_timestep]. The engine uses
    ``cosine`` with s=8e-3 (`diffusion_engine.py:193-195`).
    """
    if schedule == "quad":
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5,
                            n_timestep, dtype=np.float64) ** 2
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep,
                            dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = (np.arange(n_timestep + 1, dtype=np.float64) / n_timestep
                     + cosine_s)
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, None, 0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


class Schedule(NamedTuple):
    """Derived diffusion coefficient tables (float32, shape [T]).

    Mirrors the ~15 buffers the reference registers
    (`diffusion_ddpm_pan.py:227-276`), held as an immutable pytree so that
    respacing can produce a new value instead of mutating state.
    """
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray
    # Upper bound for learned-variance interpolation (= log betas, the
    # improved-DDPM choice). The reference reads a buffer of this name
    # (`diffusion_ddpm_pan.py:407`) but never registers it (its pred_var
    # path is guarded off by an assert at `:184`); we register the
    # standard value so the path actually works.
    posterior_log_variance_max: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def schedule_from_betas(
    betas: Union[np.ndarray, Sequence[float]],
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> Schedule:
    """Derive the full coefficient table set from betas.

    Math parity with `diffusion_ddpm_pan.py:217-276` (float64 derivation,
    float32 storage).
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod))

    def f32(x):
        return jnp.asarray(np.asarray(x, dtype=np.float32))

    return Schedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas)
            / (1.0 - alphas_cumprod)),
        p2_loss_weight=f32(
            (p2_loss_weight_k + alphas_cumprod / (1 - alphas_cumprod))
            ** -p2_loss_weight_gamma),
        posterior_log_variance_max=f32(np.log(betas)),
    )


def cosine_schedule(n_timestep: int, cosine_s: float = 8e-3,
                    **p2_kwargs) -> Schedule:
    """The engine's schedule: cosine betas (`diffusion_engine.py:193-195`)."""
    return schedule_from_betas(
        make_beta_schedule("cosine", n_timestep, cosine_s=cosine_s),
        **p2_kwargs)


def space_timesteps(num_timesteps: int,
                    section_counts: Union[str, Sequence[int]]) -> set:
    """Select a subset of the original timesteps to keep.

    Parity with `diffusion_ddpm_pan.py:529-581` including the "ddimN"
    fixed-stride special case.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer"
                " stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


def respace(
    schedule: Schedule,
    section_counts: Union[str, Sequence[int]],
    p2_loss_weight_gamma: float = 0.0,
    p2_loss_weight_k: float = 1.0,
) -> Tuple[Schedule, np.ndarray]:
    """Functional replacement for the reference's in-place respacing.

    The reference (`diffusion_ddpm_pan.py:583-592`) mutates its registered
    buffers; we return a NEW `Schedule` plus the `timestep_map` (original-index
    of each kept step). Note the reference computes the new betas from its
    float32 `alphas_cumprod` buffer, so we match that precision exactly.

    Sampling parity note: the reference feeds the *respaced* index (0..T'-1)
    to the denoiser, not the mapped original timestep (its `timestep_map` is
    computed but unused) — callers of our samplers do the same by default.
    """
    use_timesteps = space_timesteps(schedule.num_timesteps, section_counts)
    acp = np.asarray(schedule.alphas_cumprod)  # float32, matching reference
    last_alpha_cumprod = np.float32(1.0)
    new_betas = []
    timestep_map = []
    for i, alpha_cumprod in enumerate(acp):
        if i in use_timesteps:
            new_betas.append(float(
                np.float32(1) - alpha_cumprod / last_alpha_cumprod))
            last_alpha_cumprod = alpha_cumprod
            timestep_map.append(i)
    new_schedule = schedule_from_betas(
        np.array(new_betas), p2_loss_weight_gamma, p2_loss_weight_k)
    return new_schedule, np.array(timestep_map, dtype=np.int32)
