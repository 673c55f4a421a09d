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
    p_mean_variance,
    p_sample_loop,
    p_sample_loop_trajectory,
    interpolate,
    ddim_step,
    ddim_sample_loop,
    noise_like,
    normal_kl,
    approx_standard_normal_cdf,
    discretized_gaussian_log_likelihood,
)
from .facade import GaussianDiffusion
