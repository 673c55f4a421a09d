"""Gaussian diffusion process as pure JAX functions (NHWC).

Behavior parity with the reference `GaussianDiffusion`
(`/root/reference/diffusion/diffusion_ddpm_pan.py:143-778`) but stateless and
TPU-first:

  * every coefficient lookup is a gather into a [T] float32 table
    (`Schedule`), so the whole train step / sampling chain compiles to one
    XLA program;
  * sampling loops are `lax.scan`s — no per-step host round-trip (the
    reference runs a Python loop with tqdm per step);
  * the stochastic self-conditioning forward is a `lax.cond`, matching the
    reference's batch-level coin flip (`diffusion_ddpm_pan.py:700-714`).

Reference quirks reproduced intentionally (documented for parity):
  * DDIM sampling runs with clip_denoised=False (`:595-604` default, call
    site `:653-665` never overrides), so the "+lms clamp" trick (`:391-399`)
    only applies to the DDPM path.
  * In both sampling loops the self-conditioning input degenerates to the
    current noisy image (the DDIM loop never updates `pred_x_start`, `:628`;
    the DDPM loop carries the previous *sample*, `:475,:502`, which equals the
    current x) — so samplers here always pass x as self_cond.
  * After respacing, the denoiser receives the respaced index 0..T'-1, not
    the original timestep (the reference's timestep_map is unused).
  * `pred_v` training computes recon_x0 from the *true* v (`:733-735`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .schedules import Schedule

NAT = 1.0 / math.log(2)  # nats->bits factor (`diffusion_ddpm_pan.py:141`)

# Model protocol: closed over params. key may be None in eval.
#   model_fn(x, t, cond, self_cond, key) -> prediction   (all NHWC)
ModelFn = Callable[..., jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Static configuration (mirrors reference ctor args,
    `diffusion_ddpm_pan.py:144-187`; engine values at
    `diffusion_engine.py:183-196`)."""
    channels: int
    pred_mode: str = "x_start"          # noise | x_start | pred_v
    loss_type: str = "l1"               # l1 | l2 | l1ssim
    clamp_range: Optional[Tuple[float, float]] = (0.0, 1.0)
    clamp_type: str = "abs"             # abs | dynamic
    self_condition: bool = True
    p2_loss_weight_gamma: float = 0.0
    p2_loss_weight_k: float = 1.0
    dynamic_thresholding_ratio: float = 0.8
    thresholding_max_val: float = 1.0
    # Learned-variance (improved-DDPM) head: the model outputs 2*channels,
    # [prediction, raw_var_frac] on the channel axis. The reference carries
    # this flag (`models/sr3_dwt.py:50`, chunking at
    # `diffusion_ddpm_pan.py:366-367,405-414,739-757`) but asserts it off
    # (`:184`) and never registers `posterior_log_variance_max`; here the
    # path works (see Schedule.posterior_log_variance_max).
    pred_var: bool = False

    def __post_init__(self):
        assert self.pred_mode in ("noise", "x_start", "pred_v")
        assert self.loss_type in ("l1", "l2", "l1ssim")
        assert self.clamp_type in ("abs", "dynamic")


def _extract(table: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather per-sample coefficients and broadcast over H, W, C (NHWC)."""
    return table[t][:, None, None, None]


def noise_like(key: jax.Array, shape, dtype=jnp.float32,
               repeat: bool = False) -> jnp.ndarray:
    """Gaussian noise; `repeat=True` draws ONE sample's noise and broadcasts
    it across the batch (`diffusion_ddpm_pan.py:79-88`)."""
    if repeat:
        n = jax.random.normal(key, (1,) + tuple(shape[1:]), dtype)
        return jnp.broadcast_to(n, shape)
    return jax.random.normal(key, shape, dtype)


def _meanflat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch axes (`diffusion_ddpm_pan.py:104-105`)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians (`diffusion_ddpm_pan.py:91-101`)."""
    return 0.5 * (
        -1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    """Tanh-based CDF approximation (`diffusion_ddpm_pan.py:108-111`)."""
    return 0.5 * (
        1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def _safe_log(x, eps=1e-15):
    return jnp.log(jnp.maximum(x, eps))


def discretized_gaussian_log_likelihood(x, *, means, log_scales,
                                        thres: float = 0.999):
    """Log-likelihood of `x` under a Gaussian discretized to 1/255 bins
    (`diffusion_ddpm_pan.py:118-140`)."""
    assert x.shape == means.shape == log_scales.shape
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = _safe_log(cdf_plus)
    log_one_minus_cdf_min = _safe_log(1.0 - cdf_min)
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -thres, log_cdf_plus,
        jnp.where(x > thres, log_one_minus_cdf_min, _safe_log(cdf_delta)))


def q_sample(sched: Schedule, x_start: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion x_t ~ q(x_t|x_0)  (`diffusion_ddpm_pan.py:668-681`)."""
    return (_extract(sched.sqrt_alphas_cumprod, t) * x_start
            + _extract(sched.sqrt_one_minus_alphas_cumprod, t) * noise)


def predict_start_from_noise(sched, x_t, t, noise):
    return (_extract(sched.sqrt_recip_alphas_cumprod, t) * x_t
            - _extract(sched.sqrt_recipm1_alphas_cumprod, t) * noise)


def predict_noise_from_start(sched, x_t, t, x0_pred):
    return ((_extract(sched.sqrt_recip_alphas_cumprod, t) * x_t - x0_pred)
            / _extract(sched.sqrt_recipm1_alphas_cumprod, t))


def predict_v_from_start(sched, x_start, t, noise):
    return (_extract(sched.sqrt_alphas_cumprod, t) * noise
            - _extract(sched.sqrt_one_minus_alphas_cumprod, t) * x_start)


def predict_start_from_v(sched, x_t, t, v):
    return (_extract(sched.sqrt_alphas_cumprod, t) * x_t
            - _extract(sched.sqrt_one_minus_alphas_cumprod, t) * v)


def q_posterior(sched, x_start, x_t, t):
    """Posterior q(x_{t-1}|x_t, x_0)  (`diffusion_ddpm_pan.py:316-325`)."""
    mean = (_extract(sched.posterior_mean_coef1, t) * x_start
            + _extract(sched.posterior_mean_coef2, t) * x_t)
    var = _extract(sched.posterior_variance, t)
    log_var = _extract(sched.posterior_log_variance_clipped, t)
    return mean, var, log_var


def _prediction_to_x0(cfg: DiffusionConfig, sched: Schedule, x_t, t, model_out):
    if cfg.pred_mode == "noise":
        return predict_start_from_noise(sched, x_t, t, model_out)
    elif cfg.pred_mode == "x_start":
        return model_out
    else:  # pred_v
        return predict_start_from_v(sched, x_t, t, model_out)


def dynamic_thresholding(cfg: DiffusionConfig, x0: jnp.ndarray) -> jnp.ndarray:
    """Imagen-style dynamic thresholding (`diffusion_ddpm_pan.py:328-344`),
    including the reference's clamp-to-[0, s] quirk for [0,1]-ranged data."""
    b = x0.shape[0]
    flat = jnp.abs(x0).reshape(b, -1)
    s = jnp.quantile(flat, cfg.dynamic_thresholding_ratio, axis=1)
    s = jnp.maximum(s, cfg.thresholding_max_val)[:, None, None, None]
    return jnp.clip(x0, 0.0, s) / s


def _clip_x0(cfg: DiffusionConfig, x0, cond):
    """The '+lms shift, clamp, shift back' trick
    (`diffusion_ddpm_pan.py:391-399`). cond's first `channels` channels are
    lms (NHWC: last axis)."""
    lms = cond[..., : cfg.channels]
    x0 = x0 + lms
    if cfg.clamp_type == "abs":
        x0 = jnp.clip(x0, cfg.clamp_range[0], cfg.clamp_range[1])
    else:
        x0 = dynamic_thresholding(cfg, x0)
    return x0 - lms


def _loss_fn(cfg: DiffusionConfig, target, pred):
    if cfg.loss_type == "l1":
        return jnp.mean(jnp.abs(target - pred))
    elif cfg.loss_type == "l2":
        return jnp.mean((target - pred) ** 2)
    else:  # l1ssim — NHWC hybrid L1 + 0.1*(1-SSIM), see utils.losses
        from ..utils.losses import hybrid_l1_ssim
        return hybrid_l1_ssim(pred, target)


def p_losses(
    cfg: DiffusionConfig,
    sched: Schedule,
    model_fn: ModelFn,
    key: jax.Array,
    x_start: jnp.ndarray,
    cond: Optional[jnp.ndarray] = None,
    *,
    noise: Optional[jnp.ndarray] = None,
    t: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training loss (`diffusion_ddpm_pan.py:692-766`). Returns (loss, recon_x0).

    The self-conditioning coin flip is batch-level (one flip per step, p=0.5)
    exactly like the reference's `random.random() < 0.5`.
    """
    b = x_start.shape[0]
    key_t, key_noise, key_coin, key_m1, key_m2 = jax.random.split(key, 5)
    if t is None:
        t = jax.random.randint(key_t, (b,), 0, sched.num_timesteps)
    if noise is None:
        noise = jax.random.normal(key_noise, x_start.shape, x_start.dtype)
    x_noisy = q_sample(sched, x_start, t, noise)

    def _mean_part(out):
        return jnp.split(out, 2, axis=-1)[0] if cfg.pred_var else out

    if cfg.self_condition:
        coin = jax.random.bernoulli(key_coin)

        def with_self_cond(_):
            # no-grad estimate of x0 with self_cond defaulting to x_noisy
            out = _mean_part(model_fn(x_noisy, t, cond, x_noisy, key_m1))
            return jax.lax.stop_gradient(
                _prediction_to_x0(cfg, sched, x_noisy, t, out))

        self_cond_input = jax.lax.cond(
            coin, with_self_cond, lambda _: x_noisy, operand=None)
    else:
        self_cond_input = x_noisy  # model default(self_cond, x) semantics

    model_predict_full = model_fn(x_noisy, t, cond, self_cond_input, key_m2)
    model_predict = _mean_part(model_predict_full)

    if cfg.pred_mode == "noise":
        recon_x0 = predict_start_from_noise(sched, x_noisy, t, model_predict)
        loss = _loss_fn(cfg, noise, model_predict)
    elif cfg.pred_mode == "x_start":
        recon_x0 = model_predict
        loss = _loss_fn(cfg, x_start, model_predict)
    else:  # pred_v — recon from TRUE v, reference quirk (:733-735)
        v = predict_v_from_start(sched, x_start, t, noise)
        recon_x0 = predict_start_from_v(sched, x_noisy, t, v)
        loss = _loss_fn(cfg, v, model_predict)

    # Learned-variance VLB term (`diffusion_ddpm_pan.py:739-766`). Faithful
    # to the reference text: the KL is computed but does NOT enter the loss
    # (only the decoder NLL does, weighted 1e-4); the model mean is detached
    # so only the variance head trains from this term. Deviations needed to
    # make the (reference-asserted-off) path runnable: the model output is
    # split before the main loss (the reference compares the 2C output
    # against the C-channel target, a shape error), and the decoder NLL is
    # batch-averaged so the loss stays scalar (the reference returns a [b]
    # vector, which `loss.backward()` would reject).
    if cfg.pred_var:
        true_mean, _, true_log_var = q_posterior(sched, x_start, x_noisy, t)
        model_mean, _, model_log_var, _ = p_mean_variance(
            cfg, sched, model_fn, x_noisy, t, cond, self_cond_input,
            clip_denoised=True, model_out=model_predict_full)
        model_mean = jax.lax.stop_gradient(model_mean)
        kl = _meanflat(normal_kl(true_mean, true_log_var,
                                 model_mean, model_log_var)) * NAT
        del kl  # computed-but-unused, exactly like the reference (:749-752)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=model_mean, log_scales=0.5 * model_log_var)
        decoder_nll = jnp.mean(_meanflat(decoder_nll)) * NAT
    else:
        decoder_nll = 0.0

    # p2 reweighting (`:762-764`): scalar loss broadcast against [b] weights.
    loss = jnp.mean(loss * sched.p2_loss_weight[t]) + decoder_nll * 1e-4
    return loss, recon_x0


def p_mean_variance(cfg, sched, model_fn, x, t, cond, self_cond,
                    clip_denoised: bool, *, model_out=None):
    """p(x_{t-1}|x_t) parameters  (`diffusion_ddpm_pan.py:346-415`).

    With `cfg.pred_var` the model output is [prediction, raw_frac] on the
    channel axis; the variance is the sigmoid-interpolated log-variance
    between the clipped posterior minimum and log-beta maximum
    (`diffusion_ddpm_pan.py:405-414`).
    """
    if model_out is None:
        model_out = model_fn(x, t, cond, self_cond, None)
    pred_var_raw = None
    if cfg.pred_var:
        model_out, pred_var_raw = jnp.split(model_out, 2, axis=-1)
    x_recon = _prediction_to_x0(cfg, sched, x, t, model_out)
    if clip_denoised:
        x_recon = _clip_x0(cfg, x_recon, cond)
    mean, var, log_var = q_posterior(sched, x_recon, x, t)
    if cfg.pred_var:
        min_log = log_var
        max_log = _extract(sched.posterior_log_variance_max, t)
        frac = jax.nn.sigmoid(pred_var_raw)
        log_var = frac * max_log + (1 - frac) * min_log
        var = jnp.exp(log_var)
    return mean, var, log_var, x_recon


def _aux_zeros(model_fn: ModelFn, x, t, cond):
    """Zero-initialized pytree matching the aux structure a
    `(prediction, aux)`-returning model emits."""
    shapes = jax.eval_shape(
        lambda a, tt, c, s: model_fn(a, tt, c, s, None)[1], x, t, cond, x)
    return jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def _aux_accumulate(aux_sum, aux, t_scalar, aux_ts):
    """aux_sum += aux, gated to `aux_ts` timesteps when given — the scan
    equivalent of the reference's `saved_times` fm capture
    (`models/unet_model_google.py:395-433`)."""
    if aux_ts is None:
        return jax.tree_util.tree_map(lambda s, a: s + a, aux_sum, aux)
    hit = jnp.any(t_scalar == aux_ts)
    return jax.tree_util.tree_map(
        lambda s, a: s + jnp.where(hit, a, jnp.zeros_like(a)), aux_sum, aux)


def p_sample_loop(
    cfg: DiffusionConfig,
    sched: Schedule,
    model_fn: ModelFn,
    key: jax.Array,
    cond: jnp.ndarray,
    *,
    clip_denoised: Optional[bool] = None,
    repeat_noise: bool = False,
    has_aux: bool = False,
    aux_times: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """Ancestral DDPM sampling (`diffusion_ddpm_pan.py:445-507`) as one
    `lax.scan` — T model evals, fully on device.

    `has_aux=True` expects `model_fn` to return `(prediction, aux_pytree)`
    and makes the loop return `(img, aux_sum)`, where `aux_sum` sums the aux
    over the model evals at `aux_times` (default: all steps) — the hook-free
    equivalent of `get_interm_fm` sampling
    (`diffusion_ddpm_pan.py:353-358,445-498`), matching
    `DPMSolver(has_aux=True)` semantics.
    """
    if clip_denoised is None:
        clip_denoised = cfg.clamp_range is not None
    b, h, w, _ = cond.shape
    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, (b, h, w, cfg.channels))
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    aux_ts = (None if aux_times is None
              else jnp.asarray(list(aux_times), dtype=ts.dtype))

    def step(carry, t_scalar):
        img, key, aux_sum = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        # self_cond == current noisy image in the reference loop (see module
        # docstring), so pass img.
        if has_aux:
            out, aux = model_fn(img, t, cond, img, None)
            aux_sum = _aux_accumulate(aux_sum, aux, t_scalar, aux_ts)
        else:
            out = model_fn(img, t, cond, img, None)
        mean, _, log_var, _ = p_mean_variance(
            cfg, sched, None, img, t, cond, img, clip_denoised,
            model_out=out)
        noise = noise_like(nkey, img.shape, img.dtype, repeat_noise)
        nonzero = (t_scalar != 0).astype(img.dtype)
        img = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return (img, key, aux_sum), None

    aux0 = (_aux_zeros(model_fn, img, jnp.zeros((b,), jnp.int32), cond)
            if has_aux else ())
    (img, _, aux_sum), _ = _scan_flat_img(step, img, key, aux0, ts)
    return (img, aux_sum) if has_aux else img


def _scan_flat_img(step, img, key, aux0, ts):
    """Run a `(img, key, aux)`-carry sampling scan with the image carry held
    FLATTENED to (B, H*W*C).

    On TPU the (8, 128)-tiled layout XLA picks for a 4-D NHWC scan carry
    can place batch in the minor tile dim (measured: f32[12,512,512,8]
    laid out {0,3,2,1} pads batch 12 -> 128, a 10.7x HBM expansion); a
    (B, N) carry tiles exactly in N and pads only B -> next multiple of 8.
    The reshape is value-preserving, so the scan is bit-identical; the 4-D
    view inside the body is a transient."""
    shape = img.shape

    def flat_step(carry, t_scalar):
        img_flat, key, aux_sum = carry
        (img, key, aux_sum), y = step(
            (img_flat.reshape(shape), key, aux_sum), t_scalar)
        return (img.reshape(shape[0], -1), key, aux_sum), y

    (img_flat, key, aux_sum), ys = jax.lax.scan(
        flat_step, (img.reshape(shape[0], -1), key, aux0), ts)
    return (img_flat.reshape(shape), key, aux_sum), ys


def p_sample_loop_trajectory(
    cfg: DiffusionConfig,
    sched: Schedule,
    model_fn: ModelFn,
    key: jax.Array,
    cond: jnp.ndarray,
    *,
    clip_denoised: Optional[bool] = None,
    repeat_noise: bool = False,
) -> jnp.ndarray:
    """DDPM sampling returning every intermediate sample, stacked on a new
    leading axis [T, B, H, W, C] — the jit-friendly equivalent of the
    reference's `continous=True` concat (`diffusion_ddpm_pan.py:472-505`,
    which keeps every `num_timesteps // 10`-th frame; slice the result for
    that)."""
    if clip_denoised is None:
        clip_denoised = cfg.clamp_range is not None
    b, h, w, _ = cond.shape
    key, init_key = jax.random.split(key)
    img = jax.random.normal(init_key, (b, h, w, cfg.channels))
    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)

    def step(carry, t_scalar):
        img, key = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        mean, _, log_var, _ = p_mean_variance(
            cfg, sched, model_fn, img, t, cond, img, clip_denoised)
        noise = noise_like(nkey, img.shape, img.dtype, repeat_noise)
        nonzero = (t_scalar != 0).astype(img.dtype)
        img = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return (img, key), img

    (_, _), traj = jax.lax.scan(step, (img, key), ts)
    return traj


def interpolate(
    cfg: DiffusionConfig,
    sched: Schedule,
    model_fn: ModelFn,
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    cond: jnp.ndarray,
    *,
    t: Optional[int] = None,
    lam: float = 0.5,
) -> jnp.ndarray:
    """Diffuse two images to time t, mix, and denoise back
    (`diffusion_ddpm_pan.py:509-527`)."""
    assert x1.shape == x2.shape
    t = sched.num_timesteps - 1 if t is None else t
    b = x1.shape[0]
    key, k1, k2 = jax.random.split(key, 3)
    tb = jnp.full((b,), t, dtype=jnp.int32)
    xt1 = q_sample(sched, x1, tb, jax.random.normal(k1, x1.shape, x1.dtype))
    xt2 = q_sample(sched, x2, tb, jax.random.normal(k2, x2.shape, x2.dtype))
    img = (1 - lam) * xt1 + lam * xt2
    ts = jnp.arange(t - 1, -1, -1)
    clip_denoised = cfg.clamp_range is not None

    def step(carry, t_scalar):
        img, key = carry
        key, nkey = jax.random.split(key)
        tt = jnp.full((b,), t_scalar, dtype=jnp.int32)
        mean, _, log_var, _ = p_mean_variance(
            cfg, sched, model_fn, img, tt, cond, img, clip_denoised)
        noise = jax.random.normal(nkey, img.shape, img.dtype)
        nonzero = (t_scalar != 0).astype(img.dtype)
        img = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return (img, key), None

    (img, _), _ = jax.lax.scan(step, (img, key), ts)
    return img


def ddim_step(cfg, sched, model_fn, x, t, cond, key, *, eta: float = 0.0,
              clip_denoised: bool = False, repeat_noise: bool = False,
              model_out=None):
    """One DDIM update (`diffusion_ddpm_pan.py:594-621`)."""
    _, _, _, pred_x0 = p_mean_variance(
        cfg, sched, model_fn, x, t, cond, x, clip_denoised,
        model_out=model_out)
    eps = predict_noise_from_start(sched, x, t, pred_x0)
    acp = _extract(sched.alphas_cumprod, t)
    acp_prev = _extract(sched.alphas_cumprod_prev, t)
    sigma = (eta * jnp.sqrt((1 - acp_prev) / (1 - acp))
             * jnp.sqrt(1 - acp / acp_prev))
    mean_pred = (pred_x0 * jnp.sqrt(acp_prev)
                 + jnp.sqrt(1 - acp_prev - sigma ** 2) * eps)
    noise = noise_like(key, x.shape, x.dtype, repeat_noise)
    nonzero = (t != 0).astype(x.dtype)[:, None, None, None]
    return mean_pred + nonzero * sigma * noise


def ddim_sample_loop(
    cfg: DiffusionConfig,
    sched_respaced: Schedule,
    model_fn: ModelFn,
    key: jax.Array,
    cond: jnp.ndarray,
    *,
    eta: float = 0.0,
    clip_denoised: bool = False,
    repeat_noise: bool = False,
    has_aux: bool = False,
    aux_times: Optional[Sequence[int]] = None,
    init_noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """DDIM sampling over an already-respaced schedule
    (`diffusion_ddpm_pan.py:624-666`) as one `lax.scan`.

    `sched_respaced` must come from `schedules.respace` — the denoiser sees the
    respaced indices 0..T'-1, matching the reference. `clip_denoised=False`
    matches the reference eval path exactly.

    `has_aux`/`aux_times`: see `p_sample_loop` — returns `(img, aux_sum)`.
    `init_noise`: explicit x_T (for cross-framework deterministic parity).
    """
    b, h, w, _ = cond.shape
    key, init_key = jax.random.split(key)
    img = (init_noise if init_noise is not None
           else jax.random.normal(init_key, (b, h, w, cfg.channels)))
    ts = jnp.arange(sched_respaced.num_timesteps - 1, -1, -1)
    aux_ts = (None if aux_times is None
              else jnp.asarray(list(aux_times), dtype=ts.dtype))

    def step(carry, t_scalar):
        img, key, aux_sum = carry
        key, nkey = jax.random.split(key)
        t = jnp.full((b,), t_scalar, dtype=jnp.int32)
        if has_aux:
            out, aux = model_fn(img, t, cond, img, None)
            aux_sum = _aux_accumulate(aux_sum, aux, t_scalar, aux_ts)
        else:
            out = model_fn(img, t, cond, img, None)
        img = ddim_step(cfg, sched_respaced, None, img, t, cond, nkey,
                        eta=eta, clip_denoised=clip_denoised,
                        repeat_noise=repeat_noise, model_out=out)
        return (img, key, aux_sum), None

    aux0 = (_aux_zeros(model_fn, img, jnp.zeros((b,), jnp.int32), cond)
            if has_aux else ())
    (img, _, aux_sum), _ = _scan_flat_img(step, img, key, aux0, ts)
    return (img, aux_sum) if has_aux else img
