from .schedules import (
    Schedule,
    make_beta_schedule,
    schedule_from_betas,
    cosine_schedule,
    space_timesteps,
    respace,
)
from .gaussian import (
    DiffusionConfig,
    q_sample,
    predict_start_from_noise,
    predict_noise_from_start,
    predict_v_from_start,
    predict_start_from_v,
    q_posterior,
    p_losses,
    p_sample_loop,
    p_sample_loop_trajectory,
    interpolate,
    ddim_sample_loop,
)
from .facade import GaussianDiffusion
