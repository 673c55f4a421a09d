"""Train/valid engine — the TPU-native `engine_google`
(`/root/reference/diffusion_engine.py:52-348`).

Differences by design (TPU-first):
  * one jitted, donated train step: q_sample + self-cond `lax.cond` + UNet
    fwd/bwd + AdamW + EMA all fuse into a single device program;
  * batches are sharded over the mesh's `data` axis, params replicated —
    XLA all-reduces grads over ICI (the reference is single-GPU);
  * loss logging reads the device scalar only every `log_every` steps (the
    reference syncs every iteration, `diffusion_engine.py:244-248`);
  * validation = batch-sharded jitted DDIM-25 with the EMA params
    (`diffusion_engine.py:296`), metrics on host;
  * checkpoints carry params+opt+EMA+step (orbax), not bare weights.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import (PanDataset, HISRDataSets, batch_iterator, device_prefetch,
                    get_dataset_spec, pack_cond)
from ..diffusion import (DiffusionConfig, ddim_sample_loop,
                         make_beta_schedule, p_losses, respace,
                         schedule_from_betas)
from ..models import UNetSR3DWT
from ..parallel import batch_sharding, make_mesh, replicated_sharding
from ..train.state import (TrainState, create_train_state, ema_update,
                           make_optimizer)
from ..utils.checkpoints import save_checkpoint
from ..utils.logging import TensorboardLogger


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Engine defaults mirror `diffusion_engine.py:52-76,183-209`."""
    dataset_name: str = "wv3"
    image_n_channel: int = 8
    pan_channel: int = 1
    image_size: int = 64
    schedule_type: str = "cosine"
    n_steps: int = 3_000
    max_iterations: int = 400_000
    batch_size: int = 128
    lr_d: float = 1e-4
    weight_decay: float = 1e-4
    grad_clip_norm: float = 0.003
    ema_decay: float = 0.995
    ema_start_iter: int = 20_000
    self_condition: bool = True
    pred_mode: str = "x_start"
    loss_type: str = "l1"
    valid_every: int = 5_000
    log_every: int = 50
    valid_batch_size: int = 16
    valid_section_counts: str = "ddim25"
    seed: int = 0
    compute_dtype: str = "float32"   # 'bfloat16' runs the UNet on the MXU
                                     # in bf16 with f32 master params; the
                                     # diffusion math and loss stay f32
    remat: bool = False              # jax.checkpoint the UNet forward:
                                     # recompute activations in backward,
                                     # trading ~1/3 more FLOPs for O(depth)
                                     # less HBM -> bigger batches per chip
    inner_channel: int = 32
    norm_groups: int = 1
    channel_mults: Tuple[int, ...] = (1, 2, 2, 4)
    attn_res: Tuple[int, ...] = (8,)
    res_blocks: int = 3
    dropout: float = 0.2
    pred_var: bool = False           # learned-variance head: the UNet emits
                                     # 2*C channels, see DiffusionConfig
    show_recon: bool = False         # save recon grids every `recon_every`
                                     # iters (`diffusion_engine.py:250-270`)
    recon_every: int = 1_000
    save_valid_images: bool = True   # valid-sample grids + TB images
                                     # (`diffusion_engine.py:303-320`)
    steps_per_call: int = 1          # chain K train steps into ONE jitted
                                     # lax.scan dispatch (device_data only).
                                     # The axon tunnel charges a fixed
                                     # per-dispatch cost; at 64px/b128 that
                                     # is ~15-25% of the step, so K=50
                                     # amortizes it to noise. Loss sequence
                                     # and final params are bit-identical
                                     # to K=1 (same per-step rng stream) —
                                     # tested in test_train.py. Must divide
                                     # valid_every; show_recon falls back
                                     # to per-step dispatch
    device_data: bool = False        # keep the FULL train set resident on
                                     # device and gather each batch there
                                     # from a (B,) int32 index array — the
                                     # host sends ~0.5 KB/step instead of
                                     # ~40 MB of batch data. Needs the set
                                     # to fit in HBM (WV3-scale: ~1.3 GB)
                                     # and aug-free batches (pure indexing)
    device_aug_prob: float = 0.0     # device_data-only: per-sample random
                                     # H/V flip augmentation applied ON
                                     # DEVICE inside the jitted gather —
                                     # the device-resident equivalent of
                                     # PanDataset.batch's host flips (same
                                     # semantics: one shared flip decision
                                     # per sample across every tensor,
                                     # wavelet planes flipped as stored).
                                     # Fuses into the gather as elementwise
                                     # selects: ~free on TPU. Beyond
                                     # reference (which trains aug-free,
                                     # `diffusion_engine.py:151`) — counters
                                     # memorization of finite synthetic
                                     # pools (RUN.md round-4 note)
    device_aug_wavelet_signs: bool = False
                                     # sign-correct the wavelet cond under
                                     # device flips (ops.wavelet.
                                     # wavelet_flip_signs) so the augmented
                                     # cond is the exact DWT of the flipped
                                     # image. Off by default = reference
                                     # parity (the reference flips wavelet
                                     # planes as stored, sign-inconsistent)
    ckpt_dir: str = "./weights"
    run_dir: str = "./runs"
    samples_dir: str = "./samples"


def build_model(cfg: TrainConfig) -> UNetSR3DWT:
    """The engine's UNet (`diffusion_engine.py:121-133`). With `pred_var`
    the output head is doubled to [prediction, raw_var_frac] (the reference
    leaves doubling `out_channel` to the caller, `models/sr3_dwt.py:50`)."""
    out_mult = 2 if cfg.pred_var else 1
    return UNetSR3DWT(
        in_channel=cfg.image_n_channel,
        out_channel=cfg.image_n_channel * out_mult,
        lms_channel=cfg.image_n_channel, pan_channel=cfg.pan_channel,
        inner_channel=cfg.inner_channel, norm_groups=cfg.norm_groups,
        channel_mults=cfg.channel_mults, attn_res=cfg.attn_res,
        res_blocks=cfg.res_blocks, dropout=cfg.dropout,
        image_size=cfg.image_size, self_condition=cfg.self_condition,
        pred_var=cfg.pred_var)


def build_diffusion(cfg: TrainConfig):
    dcfg = DiffusionConfig(
        channels=cfg.image_n_channel, pred_mode=cfg.pred_mode,
        loss_type=cfg.loss_type, clamp_range=(0.0, 1.0),
        self_condition=cfg.self_condition, pred_var=cfg.pred_var)
    sched = schedule_from_betas(
        make_beta_schedule(cfg.schedule_type, cfg.n_steps, cosine_s=8e-3))
    return dcfg, sched


def _dtype_casts(cfg: TrainConfig):
    if cfg.compute_dtype == "bfloat16":
        def cast_in(t):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, t)
        return cast_in, lambda a: a.astype(jnp.float32)
    return (lambda t: t), (lambda a: a)


def device_augment(batch, key, prob, wavelet_signs=None):
    """Per-sample random H/V flips applied on device inside the jitted
    gather (TrainConfig.device_aug_prob). Semantics match
    PanDataset.batch's host flips (`pan_dataset.py:191-203` parity
    tensors): NHWC, one shared flip decision per sample across every
    tensor of the batch tuple, flips_h reverses W (axis 2), flips_v
    reverses H (axis 1); wavelet planes flip as stored, exactly as the
    host path does. Elementwise selects — fuses into the gather, ~free
    on TPU.

    `wavelet_signs=(sign_h, sign_v)` (see `ops.wavelet.wavelet_flip_signs`)
    additionally negates the detail planes of the LAST batch tensor (the
    packed wavelet cond) so the augmented cond IS the DWT of the augmented
    image — the reference's own flips skip this and feed a sign-
    inconsistent cond; opt in via TrainConfig.device_aug_wavelet_signs."""
    kh, kv = jax.random.split(key)
    b = batch[0].shape[0]
    fh = jax.random.uniform(kh, (b,)) < prob
    fv = jax.random.uniform(kv, (b,)) < prob

    def flip(a, sign_h=None, sign_v=None):
        mh = fh.reshape((b,) + (1,) * (a.ndim - 1))
        mv = fv.reshape((b,) + (1,) * (a.ndim - 1))
        ah = jnp.flip(a, axis=2)
        if sign_h is not None:
            ah = ah * sign_h
        a = jnp.where(mh, ah, a)
        av = jnp.flip(a, axis=1)
        if sign_v is not None:
            av = av * sign_v
        return jnp.where(mv, av, a)

    if wavelet_signs is None:
        return tuple(flip(a) for a in batch)
    sh, sv = (jnp.asarray(s, batch[-1].dtype) for s in wavelet_signs)
    return tuple(flip(a) for a in batch[:-1]) + (flip(batch[-1], sh, sv),)


def rotate_pool(data, chunk, start):
    """Overwrite `chunk` (tuple of (m, ...) arrays) into the device-resident
    pool `data` (tuple of (n, ...) arrays, m <= n) at sample offset `start`
    along axis 0 — the in-place refresh step of the epochless data stream
    (see train()'s refresh_fn). Jitted with the pool donated, so the update
    reuses the pool's HBM buffers."""
    return tuple(jax.lax.dynamic_update_slice(
        d, c, (start,) + (0,) * (d.ndim - 1))
        for d, c in zip(data, chunk))


def make_train_step(cfg: TrainConfig, model, dcfg, sched, tx,
                    with_recon: bool = False):
    """Returns the pure train step (state, batch, key) -> (state, loss)
    — or (state, loss, recon_x0) with `with_recon` (the reference's
    recon-grid artifact input, `diffusion_engine.py:231,250-270`).

    batch = (pan, lms, gt, wavelets), NHWC, sharded on the batch axis.
    """
    cast_in, cast_out = _dtype_casts(cfg)

    def train_step(state: TrainState, batch, key):
        pan, lms, gt, wavelets = batch
        cond = pack_cond(lms, pan, wavelets)
        res = gt - lms  # residual diffusion target (`diffusion_engine.py:231`)

        def loss_fn(params):
            lp = cast_in(params)
            # hoist the loop-invariant cond features: p_losses may run the
            # UNet twice (self-cond coin), both on the same cond — compute
            # the cond tree once, with gradients flowing through the cache
            cache = model.apply({"params": lp}, None, None, cast_in(cond),
                                cond_only=True)

            def apply_fn(p, ca, x, t, sc, k):
                return model.apply({"params": p}, x, t, None, sc, train=True,
                                   rngs={"dropout": k}, cond_cache=ca)

            if cfg.remat:
                apply_fn = jax.checkpoint(apply_fn,
                                          static_argnums=())  # full remat

            def model_fn(x, t, c, sc, k):
                out = apply_fn(lp, cache, cast_in(x), t, cast_in(sc), k)
                return cast_out(out)
            loss, recon = p_losses(dcfg, sched, model_fn, key, res, cond)
            return loss, recon

        (loss, recon), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(params, state.ema_params, state.step,
                         decay=cfg.ema_decay, start_iter=cfg.ema_start_iter)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema)
        if with_recon:
            return new_state, loss, recon
        return new_state, loss

    return train_step


def make_sample_fn(cfg: TrainConfig, model, dcfg, sched,
                   section_counts: Optional[str] = None):
    """Jittable DDIM sampler over the EMA params: (params, key, batch) ->
    sr in [0,1]. Matches the eval protocol `sr=(sample+lms).clip(0,1)`
    (`diffusion_engine.py:296-298`)."""
    sc = section_counts or cfg.valid_section_counts
    sched_re, _ = respace(sched, sc)
    cast_in, cast_out = _dtype_casts(cfg)

    def sample_fn(params, key, pan, lms, wavelets):
        cond = pack_cond(lms, pan, wavelets)
        lp = cast_in(params)
        # the cond features are identical for all T' scan steps — compute
        # them once outside the sampling scan (bit-identical numerics)
        cache = model.apply({"params": lp}, None, None, cast_in(cond),
                            cond_only=True)

        def model_fn(x, t, c, s_c, k):
            out = model.apply({"params": lp}, cast_in(x), t, None,
                              cast_in(s_c), train=False, cond_cache=cache)
            return cast_out(out)

        sample = ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
        return jnp.clip(sample + lms, 0.0, 1.0)

    return sample_fn


def make_x0_fn(cfg: TrainConfig, model, sched):
    """Jittable one-shot posterior-mean probe over the EMA params: ONE
    forward pass at t=T-1 from pure noise (NFE=1) -> sr in [0,1].

    Scores the model's conditional-MEAN estimate, which is what
    distortion metrics (SAM/ERGAS/PSNR) actually reward; the iterative
    protocol number can degrade as the model learns the conditional
    SPREAD (see X0_STUDY.md — three rounds misread that trajectory).
    Logged alongside the protocol metrics at every validation as x0_*.
    """
    cast_in, cast_out = _dtype_casts(cfg)
    T = int(sched.betas.shape[0])
    sig_T = float(np.sqrt(1.0 - np.asarray(sched.alphas_cumprod)[T - 1]))

    def x0_fn(params, key, pan, lms, wavelets):
        cond = pack_cond(lms, pan, wavelets)
        lp = cast_in(params)
        xt = jax.random.normal(key, lms.shape) * sig_T
        t = jnp.full((lms.shape[0],), T - 1, jnp.int32)
        out = model.apply({"params": lp}, cast_in(xt), t, cast_in(cond),
                          cast_in(jnp.zeros_like(xt)), train=False)
        return jnp.clip(cast_out(out) + lms, 0.0, 1.0)

    return x0_fn


def train(
    train_data,
    valid_data,
    cfg: TrainConfig = TrainConfig(),
    *,
    mesh=None,
    logger=None,
    restore_state: Optional[TrainState] = None,
    max_iterations: Optional[int] = None,
    on_valid: Optional[Callable] = None,
    refresh_fn: Optional[Callable] = None,
    should_stop: Optional[Callable] = None,
    pause_check: Optional[Callable] = None,
):
    """Run the training loop. `train_data`/`valid_data` are dataset objects
    (PanDataset / HISRDataSets) or dict-like h5 contents.

    `refresh_fn` (device_data only) makes the stream epochless: a
    non-blocking poll returning either None or a fresh chunk — a tuple of
    host arrays shaped like `train_data.batch(...)` with m samples,
    m <= n_train. Polled once per dispatch; each fresh chunk overwrites m
    samples of the device-resident buffer in place (donated
    dynamic_update_slice at a rotating offset), so a background generator
    continuously replaces the pool and no scene is revisited thousands of
    times (the failure mode of training the reference's 400k schedule on
    a fixed synthetic set).

    `should_stop(step)` is checked after each validation+checkpoint; return
    True to end the run cleanly (used for proactive self-restart when the
    tunnel client's pinned-host-memory leak approaches the host RAM limit).

    `pause_check()` is polled every dispatch (~each steps_per_call chunk);
    return True to checkpoint IMMEDIATELY — off the valid_every boundary —
    and end the run. Wired to SIGTERM by scripts/train_real.py so a
    cooperative PAUSE (bench.py borrowing the chip) costs ~0 iterations
    instead of rolling back to the last validation checkpoint (a mid-
    segment kill previously lost up to valid_every-1 steps).

    Returns the final TrainState.
    """
    from ..metrics import AnalysisPanAcc

    spec = get_dataset_spec(cfg.dataset_name)
    if not isinstance(train_data, (PanDataset, HISRDataSets)):
        if spec.family == "pan":
            train_data = PanDataset(train_data, norm_range=False,
                                    division=spec.division, wavelets=True)
            valid_data = PanDataset(valid_data, norm_range=False,
                                    division=spec.division, wavelets=True)
        else:
            train_data = HISRDataSets(train_data, wavelets=True)
            valid_data = HISRDataSets(valid_data, wavelets=True)

    logger = logger or TensorboardLogger("pandiff", base_dir=cfg.run_dir)
    logger.print(f"dataset: {cfg.dataset_name}, division: {spec.division}")

    mesh = mesh or make_mesh()
    data_sh = batch_sharding(mesh)
    repl_sh = replicated_sharding(mesh)

    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(cfg.lr_d, cfg.weight_decay,
                        grad_clip_norm=cfg.grad_clip_norm)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    if restore_state is None:
        dummy_x = jnp.zeros((1, cfg.image_size, cfg.image_size,
                             cfg.image_n_channel))
        dummy_cond = jnp.zeros(
            (1, cfg.image_size, cfg.image_size,
             2 * cfg.image_n_channel + 4 * cfg.pan_channel))
        params = model.init({"params": init_key}, dummy_x, jnp.array([0]),
                            dummy_cond, train=False)["params"]
        state = create_train_state(params, tx)
    else:
        state = restore_state
    state = jax.device_put(state, repl_sh)

    step_out_sh = ((repl_sh, repl_sh, data_sh) if cfg.show_recon
                   else (repl_sh, repl_sh))
    inner_step = make_train_step(cfg, model, dcfg, sched, tx,
                                 with_recon=cfg.show_recon)
    if cfg.device_aug_prob > 0 and not cfg.device_data:
        raise ValueError("device_aug_prob needs device_data=True (host "
                         "batches augment via PanDataset aug_prob instead)")

    wavelet_signs = None
    if cfg.device_aug_wavelet_signs:
        from ..ops.wavelet import wavelet_flip_signs
        order = "pan" if spec.family == "pan" else "hisr"
        wavelet_signs = wavelet_flip_signs(cfg.image_n_channel,
                                           cfg.pan_channel, order=order)

    def _device_augment(batch, key):
        return device_augment(batch, key, cfg.device_aug_prob,
                              wavelet_signs=wavelet_signs)

    if cfg.device_data:
        # device-resident data: jit takes (state, full_dataset, idx, key)
        # and gathers the batch on device — only the index array crosses
        # the host boundary each step
        def gather_step(state, data_all, idx, key):
            batch = tuple(a[idx] for a in data_all)
            if cfg.device_aug_prob > 0:          # static gate (traced once)
                key, ak = jax.random.split(key)
                batch = _device_augment(batch, ak)
            return inner_step(state, batch, key)

        train_step = jax.jit(
            gather_step,
            in_shardings=(repl_sh, (repl_sh,) * 4, data_sh, repl_sh),
            out_shardings=step_out_sh,
            donate_argnums=(0,))
    else:
        train_step = jax.jit(
            inner_step,
            in_shardings=(repl_sh, data_sh, repl_sh),
            out_shardings=step_out_sh,
            # donate the state only. The batch tuple's lms/gt DO match the
            # recon output's (B,H,W,C) shape and could alias it, but
            # donation is per-argument: donating the tuple also marks
            # pan/wavelets (never aliasable) donated, which re-triggers
            # the "donated buffers not usable" warning this line exists to
            # avoid. Cost: one extra (B,H,W,C) buffer live during
            # show_recon steps (~50 MB at b128/64px/8ch) — accepted.
            donate_argnums=(0,))
    use_scan = (cfg.device_data and cfg.steps_per_call > 1
                and not cfg.show_recon)
    if use_scan:
        K = cfg.steps_per_call
        if cfg.valid_every % K:
            raise ValueError(
                f"steps_per_call={K} must divide valid_every="
                f"{cfg.valid_every} so validation lands on call boundaries")
        from jax.sharding import NamedSharding, PartitionSpec as _P
        idx_sh = NamedSharding(mesh, _P(None, "data"))     # (K, B) indices

        def chain_steps(state, data_all, idx_kb, keys_k):
            def body(st, xs):
                idx, k = xs
                batch = tuple(a[idx] for a in data_all)
                if cfg.device_aug_prob > 0:      # static gate (traced once)
                    k, ak = jax.random.split(k)
                    batch = _device_augment(batch, ak)
                st, loss = inner_step(st, batch, k)
                return st, loss
            return jax.lax.scan(body, state, (idx_kb, keys_k))

        chain_step = jax.jit(
            chain_steps,
            in_shardings=(repl_sh, (repl_sh,) * 4, idx_sh, repl_sh),
            out_shardings=(repl_sh, repl_sh),
            donate_argnums=(0,))
    sample_fn = jax.jit(
        make_sample_fn(cfg, model, dcfg, sched),
        in_shardings=(repl_sh, repl_sh, data_sh, data_sh, data_sh),
        out_shardings=data_sh)
    x0_fn = jax.jit(
        make_x0_fn(cfg, model, sched),
        in_shardings=(repl_sh, repl_sh, data_sh, data_sh, data_sh),
        out_shardings=data_sh)

    max_iters = (max_iterations if max_iterations is not None
                 else cfg.max_iterations)
    if cfg.device_data:
        if getattr(train_data, "aug_prob", 0.0):
            raise ValueError(
                "device_data gathers batches by pure indexing — host-side "
                "flip augmentation (aug_prob > 0) would be silently "
                "dropped; use TrainConfig.device_aug_prob (on-device "
                "flips) instead")
        # one-time full-set transfer; batches gather on device by index
        full = train_data.batch(np.arange(len(train_data)))
        data_all = tuple(jax.device_put(jnp.asarray(a), repl_sh)
                         for a in full)
        del full

        rotate = None
        if refresh_fn is not None:
            n_arrays = len(data_all)
            # donate the buffer: the fresh chunk lands in place, no second
            # full-set copy lives in HBM
            rotate = jax.jit(
                rotate_pool, donate_argnums=(0,),
                in_shardings=((repl_sh,) * n_arrays, (repl_sh,) * n_arrays,
                              repl_sh),
                out_shardings=(repl_sh,) * n_arrays)
            rotate_off = 0
            n_pool = int(data_all[0].shape[0])

        def poll_refresh(data_all):
            nonlocal rotate_off
            chunk = refresh_fn()
            if chunk is None:
                return data_all, False
            m = int(chunk[0].shape[0])
            start = rotate_off if rotate_off + m <= n_pool else 0
            rotate_off = (start + m) % n_pool
            chunk_dev = tuple(jnp.asarray(np.asarray(c), d.dtype)
                              for c, d in zip(chunk, data_all))
            return rotate(data_all, chunk_dev,
                          jnp.asarray(start, jnp.int32)), True

        def _index_iter():
            # same permutation stream as batch_iterator(shuffle=True,
            # drop_remainder=True)
            rng = np.random.default_rng(cfg.seed)
            n = len(train_data)
            while True:
                order = rng.permutation(n)
                stop = n - n % cfg.batch_size
                for start in range(0, stop, cfg.batch_size):
                    yield order[start:start + cfg.batch_size]

        it = (jnp.asarray(ix, jnp.int32) for ix in _index_iter())
    else:
        it = device_prefetch(
            batch_iterator(train_data, cfg.batch_size, seed=cfg.seed,
                           drop_remainder=True),
            sharding=data_sh)

    # host-side iteration counter: reading state.step from the device every
    # iteration would block on the previous step and defeat async dispatch
    step = int(jax.device_get(state.step))
    log_state = {"t0": time.time(), "last": step}

    def log_loss(i, loss_val):
        now = time.time()
        rate = (i - log_state["last"]) / max(now - log_state["t0"], 1e-9)
        log_state["t0"], log_state["last"] = now, i
        logger.print(f"[iter {i}/{max_iters}] loss {loss_val:.6f} "
                     f"({rate:.2f} it/s)")
        logger.log_scalar("denoised_loss", loss_val, i)

    streamed = 0
    start_step = step
    while step < max_iters:
        if pause_check is not None and pause_check():
            if step > start_step:
                save_checkpoint(cfg.ckpt_dir, state)
            logger.print(f"[train] pause_check at iter {step} — "
                         "checkpoint saved, ending run cleanly")
            break
        if cfg.device_data and refresh_fn is not None:
            # non-blocking: rotates a fresh generator chunk into the
            # device buffer when one is ready (epochless stream)
            data_all, fresh = poll_refresh(data_all)
            if fresh:
                streamed += 1
                if streamed % 10 == 1:
                    logger.print(f"[stream] chunk {streamed} rotated in "
                                 f"at iter {step}")
        # K-step chunks when aligned and a full chunk fits; otherwise
        # (show_recon, chunk tail, unaligned resume step) one step at a time
        if use_scan and step % K == 0 and step + K <= max_iters:
            idxs, keys_k = [], []
            for _ in range(K):
                key, sk = jax.random.split(key)
                keys_k.append(sk)
                idxs.append(next(it))
            state, losses = chain_step(state, data_all, jnp.stack(idxs),
                                       jnp.stack(keys_k))
            base, step = step, step + K
            if base // cfg.log_every != step // cfg.log_every:
                lv = np.asarray(jax.device_get(losses))
                for i in range(base + 1, step + 1):
                    if i % cfg.log_every == 0:
                        log_loss(i, float(lv[i - base - 1]))
        else:
            try:
                batch = next(it)
            except StopIteration:   # finite iterator: end of data ends train
                break
            key, step_key = jax.random.split(key)
            args = ((state, data_all, batch, step_key) if cfg.device_data
                    else (state, batch, step_key))
            if cfg.show_recon:
                state, loss, recon = train_step(*args)
            else:
                state, loss = train_step(*args)
            step += 1

            if cfg.show_recon and step % cfg.recon_every == 0:
                # recon grid artifact (`diffusion_engine.py:250-270`): the
                # predicted residual, clipped — first 64 samples, 8 per row
                from .eval import make_rgb_grid, save_grid_png
                grid = make_rgb_grid(np.asarray(jax.device_get(recon))[:64],
                                     spec.rgb_channels, nrow=8)
                save_grid_png(grid, os.path.join(
                    cfg.samples_dir, "recon_x", f"iter_{step}.png"))

            if step % cfg.log_every == 0:
                log_loss(step, float(jax.device_get(loss)))

        if step % cfg.valid_every == 0:
            analysis = AnalysisPanAcc(ergas_ratio=spec.ergas_ratio)
            analysis_x0 = AnalysisPanAcc(ergas_ratio=spec.ergas_ratio)
            last_gt = last_sr = None
            for vbatch in batch_iterator(valid_data, cfg.valid_batch_size,
                                         epochs=1, shuffle=False):
                pan, lms, gt, wavelets = vbatch
                n_real = pan.shape[0]
                if n_real < cfg.valid_batch_size:
                    # pad the remainder batch to the compiled shape
                    # (the reference validates every sample, drop_last=False)
                    def _pad(a):
                        reps = cfg.valid_batch_size - n_real
                        return np.concatenate(
                            [a, np.repeat(a[-1:], reps, axis=0)], axis=0)
                    pan, lms, wavelets = map(_pad, (pan, lms, wavelets))
                key, vkey = jax.random.split(key)
                dpan, dlms, dwav = (jnp.asarray(pan), jnp.asarray(lms),
                                    jnp.asarray(wavelets))
                sr = sample_fn(state.ema_params, vkey, dpan, dlms, dwav)
                # one-shot posterior-mean metrics ride along (NFE=1 — the
                # marginal cost is 1/25th of the protocol pass above)
                sr0 = x0_fn(state.ema_params, vkey, dpan, dlms, dwav)
                last_sr = np.asarray(jax.device_get(sr))[:n_real]
                last_gt = np.asarray(gt)
                analysis(last_gt, last_sr)
                analysis_x0(last_gt, np.asarray(jax.device_get(sr0))[:n_real])
            if cfg.save_valid_images and last_sr is not None:
                # [hr grid | sr grid] side by side, PNG + TB image
                # (`diffusion_engine.py:303-320`)
                from .eval import make_rgb_grid, save_grid_png
                grid = np.concatenate(
                    [make_rgb_grid(last_gt, spec.rgb_channels, nrow=4),
                     make_rgb_grid(last_sr, spec.rgb_channels, nrow=4)],
                    axis=1)
                save_grid_png(grid, os.path.join(
                    cfg.samples_dir, "valid_samples", f"iter_{step}.png"))
                if hasattr(logger, "log_image"):
                    logger.log_image("valid_sample", grid, step)
            logger.print("---diffusion result---")
            logger.print(analysis.print_str())
            acc = dict(analysis.acc_ave)
            acc.update({f"x0_{k}": v for k, v in analysis_x0.acc_ave.items()})
            logger.log_scalars("diffusion_perf", acc, step)
            # metrics record BEFORE the checkpoint save: a kill between the
            # two can strand a checkpoint without its valid.jsonl line but
            # never the reverse (ADVICE r4: ckpt 9000 existed while
            # valid.jsonl jumped 8000->10000)
            if on_valid is not None:
                on_valid(step, state, acc)
            save_checkpoint(cfg.ckpt_dir, state)
            logger.print("save model")
            if should_stop is not None and should_stop(step):
                logger.print(f"[train] should_stop at iter {step} — "
                             "ending run cleanly (checkpoint saved)")
                break

    return state
