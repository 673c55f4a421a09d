"""`GaussianDiffusion` — a thin object facade over the functional core, for
users coming from the reference API (`diffusion_ddpm_pan.py:143-778`).

The reference is a stateful nn.Module whose schedule buffers mutate on
respacing; this facade holds only immutable config + Schedule values and a
denoiser apply function, and dispatches to the pure functions in
`difpan_tpu.diffusion.gaussian`. `forward(x, mode=...)` mirrors the
reference's string dispatch (`:768-778`).
"""

from __future__ import annotations

from typing import Callable

from . import gaussian
from .schedules import Schedule, respace


class GaussianDiffusion:
    def __init__(
        self,
        model_fn: Callable,
        schedule: Schedule,
        *,
        channels: int,
        pred_mode: str = "x_start",
        loss_type: str = "l1",
        clamp_range=(0.0, 1.0),
        clamp_type: str = "abs",
        self_condition: bool = True,
        p2_loss_weight_gamma: float = 0.0,
        p2_loss_weight_k: float = 1.0,
        pred_var: bool = False,
    ):
        self.cfg = gaussian.DiffusionConfig(
            channels=channels, pred_mode=pred_mode, loss_type=loss_type,
            clamp_range=tuple(clamp_range) if clamp_range else None,
            clamp_type=clamp_type, self_condition=self_condition,
            p2_loss_weight_gamma=p2_loss_weight_gamma,
            p2_loss_weight_k=p2_loss_weight_k, pred_var=pred_var)
        self.schedule = schedule
        self.model_fn = model_fn

    @property
    def num_timesteps(self) -> int:
        return self.schedule.num_timesteps

    def q_sample(self, x_start, t, noise):
        return gaussian.q_sample(self.schedule, x_start, t, noise)

    def p_losses(self, key, x_start, cond=None, **kw):
        return gaussian.p_losses(self.cfg, self.schedule, self.model_fn,
                                 key, x_start, cond, **kw)

    def p_sample_loop(self, key, cond, *, continous: bool = False, **kw):
        if continous:
            return gaussian.p_sample_loop_trajectory(
                self.cfg, self.schedule, self.model_fn, key, cond, **kw)
        return gaussian.p_sample_loop(self.cfg, self.schedule, self.model_fn,
                                      key, cond, **kw)

    def ddim_sample_loop(self, key, cond, section_counts: str = "ddim300",
                         eta: float = 0.0, **kw):
        """Functional respacing: derives a NEW schedule instead of mutating
        buffers like the reference (`:624-666`)."""
        sched_re, _ = respace(self.schedule, section_counts)
        return gaussian.ddim_sample_loop(
            self.cfg, sched_re, self.model_fn, key, cond, eta=eta, **kw)

    def interpolate(self, key, x1, x2, cond, t=None, lam: float = 0.5):
        return gaussian.interpolate(self.cfg, self.schedule, self.model_fn,
                                    key, x1, x2, cond, t=t, lam=lam)

    def forward(self, key, x, mode: str = "train", **kwargs):
        """String dispatch like the reference forward (`:768-778`):
        mode='train' -> (loss, recon); 'ddpm_sample'/'ddim_sample' -> sr."""
        if mode == "train":
            return self.p_losses(key, x, **kwargs)
        elif mode == "ddpm_sample":
            return self.p_sample_loop(key, x, **kwargs)
        elif mode == "ddim_sample":
            return self.ddim_sample_loop(key, x, **kwargs)
        raise NotImplementedError("mode should be train or sample")

    __call__ = forward
