"""Whole-UNet spatial parallelism: the full UNetSR3-DWT eval forward on
H-sharded slabs under `shard_map`.

`parallel/spatial.py` provides the primitives (halo-exchange convs,
global-stat GroupNorm, psum'd CSM) and a stage-level encoder; this module
lifts them to the COMPLETE model — encoder, gathered mid attention, FWM
decoder with cross-shard softmax/context, up/downsampling, final head — so
a single image whose activations exceed one chip's HBM runs sharded over
the mesh with no tiling approximation (SURVEY §5 'long-context / spatial';
reference workload: 1000x1000 Harvard full-res,
`/root/reference/diffusion_engine.py:373-377`).

It executes the SAME parameter tree as `UNetSR3DWT` (eval mode,
self_cond=None), verified against the unsharded forward in
`tests/test_spatial.py`. Cross-shard pieces:

  * 3x3 convs — 1-row halo exchange over ICI (`ppermute`);
  * GroupNorm(1) — global moments via `psum`;
  * FWM q softmax (over global H) — `pmax`/`psum` normalization;
  * FWM context matrix (sum over all pixels) — local partial + `psum`;
  * self-attention (8x8-res feature maps) — local queries against
    `all_gather`'d K/V: each device holds 1/n of the score matrix;
  * nearest-2x upsample / stride-2 downsample — shard-local by
    construction (even slab heights).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..models.common import NoiseLevelMLP, resize_bilinear
from .spatial import (sharded_block, sharded_cond_injection,
                      sharded_conv3x3, sharded_fwm_injection,
                      sharded_groupnorm, sharded_resnet_block)


def _conv1x1(p, x):
    return (jnp.einsum("bhwi,io->bhwo", x, p["conv"]["kernel"][0, 0])
            + p["conv"]["bias"])


def _gn(p, x, axis_name, groups):
    return sharded_groupnorm(x, p["scale"], p["bias"], groups, axis_name)


def _self_attention(p, x, axis_name, groups, nheads=8):
    """Self-attention on an H-slab: queries stay LOCAL (this shard's rows),
    only K/V are all_gathered — each device computes 1/n of the score
    matrix and attention output (rows are complete, so numerics match the
    dense softmax). Peak score memory per device is (local_tokens x
    global_tokens), not the full HW x HW."""
    b, hs, w, c = x.shape
    head_dim = c // nheads
    xn = _gn(p["norm"], x, axis_name, groups)
    qkv = jnp.einsum("bhwi,io->bhwo", xn, p["qkv"]["conv"]["kernel"][0, 0])
    qkv = qkv.reshape(b, hs * w, nheads, 3 * head_dim)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # K/V must span the global map; gathering the (b, hs, w, 2c) halves is
    # cheap at the deep stages where attention runs
    k = jax.lax.all_gather(k.reshape(b, hs, w, nheads * head_dim),
                           axis_name, axis=1, tiled=True)
    v = jax.lax.all_gather(v.reshape(b, hs, w, nheads * head_dim),
                           axis_name, axis=1, tiled=True)
    hw_full = k.shape[1] * w
    k = k.reshape(b, hw_full, nheads, head_dim)
    v = v.reshape(b, hw_full, nheads, head_dim)
    attn = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(c)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(b, hs, w, c)
    out = _conv1x1(p["out"], out)
    return out + x


def _upsample_nearest2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def make_sharded_unet_forward(model, mesh, axis_name: str = "data",
                              jit: bool = True):
    """Build the H-sharded eval forward for a `UNetSR3DWT` instance.

    Returns `fn(params, x, t, cond)` (jitted unless `jit=False`, e.g. for
    embedding in an outer scan): x (B, H, W, C) NHWC, t (B,), cond
    (B, H, W, 2C+4P). H must divide by the mesh size into even slabs.
    Matches `model.apply(..., train=False, self_cond=None)` to fp tolerance
    — which is also the sampler contract: the DDPM/DDIM loops always pass
    the current x as self_cond (`diffusion/gaussian.py` module note), the
    model's fold-path default.
    """
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    num_mults = len(model.channel_mults)
    groups = model.norm_groups
    res_blocks = model.res_blocks

    # static per-stage walk (mirrors UNetSR3DWT.__call__)
    now_res = model.image_size
    enc_attn, dec_attn = [], []
    for ind in range(num_mults):
        enc_attn.append(now_res in model.attn_res)
        if ind != num_mults - 1:
            now_res //= 2
    for ind in reversed(range(num_mults)):
        dec_attn.append(now_res in model.attn_res)
        if ind >= 1:
            now_res *= 2
    dec_attn = list(reversed(dec_attn))  # index by stage ind

    enc_cond_dim = model.lms_channel + model.pan_channel
    dec_cond_dim = model.lms_channel + model.pan_channel * 3

    noise_mlp = NoiseLevelMLP(model.inner_channel)

    def t_embedding(p, t):
        return noise_mlp.apply({"params": p}, t)

    def body(params, x, t_emb, cond_enc_pyr, cond_dec_pyr,
             enc_cache=None, dec_cache=None, self_cond=None, drop_key=None):
        enc_it = iter(enc_cache) if enc_cache is not None else None
        dec_it = iter(dec_cache) if dec_cache is not None else None
        # train-mode stochasticity, two streams:
        #  * elementwise dropout — masks fold BOTH mesh coordinates
        #    (independent per slab is fine, elements are iid);
        #  * FWM FFN DropPath — a per-SAMPLE mask, so its key folds the
        #    batch coordinate ONLY: every H-shard of one sample must agree
        #    on whether the branch is dropped.
        el_key = dp_key = None
        if drop_key is not None:
            el_key = jax.random.fold_in(
                drop_key, jax.lax.axis_index(axis_name))
            dp_key = jax.random.fold_in(drop_key, 0x5eed)
            if batch_axis is not None:
                bidx = jax.lax.axis_index(batch_axis)
                el_key = jax.random.fold_in(el_key, bidx)
                dp_key = jax.random.fold_in(dp_key, bidx)
        blk_counter = [0]
        fwm_counter = [0]

        def drop_kw():
            if el_key is None:
                return {}
            k = jax.random.fold_in(el_key, blk_counter[0])
            blk_counter[0] += 1
            return {"dropout": model.dropout, "key": k}

        def fwm_kw():
            # decoder blocks hardcode DropPath 0.2 on the FWM FFN
            # (`models/sr3_dwt.py` ResnetBlocWithAttn decoder path)
            if dp_key is None:
                return {}
            k = jax.random.fold_in(dp_key, fwm_counter[0])
            fwm_counter[0] += 1
            return {"drop_path": 0.2, "drop_path_key": k}

        kh = params["head_conv"]["conv"]["kernel"]
        # run in the params' compute dtype (bf16 service/train configs):
        # cast activations at the boundary like flax's promote_dtype does
        # inside its modules — the raw-kernel convs here require matching
        # dtypes
        pdt = kh.dtype
        x = x.astype(pdt)
        if self_cond is not None:
            self_cond = self_cond.astype(pdt)
        if cond_enc_pyr is not None:
            cond_enc_pyr = tuple(c.astype(pdt) for c in cond_enc_pyr)
        if cond_dec_pyr is not None:
            cond_dec_pyr = tuple(c.astype(pdt) for c in cond_dec_pyr)
        c_in = x.shape[-1]
        if model.self_condition and self_cond is None:
            # eval/sampler contract: self_cond defaults to x -> fold the
            # two kernel halves into one conv
            kh = kh[:, :, :c_in] + kh[:, :, c_in:]
        elif model.self_condition:
            # concat order matches the unsharded models ([self_cond, x],
            # `models/sr3_dwt.py:531`) — the head-conv kernel halves are
            # position-sensitive
            x = jnp.concatenate([self_cond, x], axis=-1)
        x = sharded_conv3x3(x, kh, axis_name,
                            bias=params["head_conv"]["conv"]["bias"])

        feats = [x]
        lvl = 0
        for ind in range(num_mults):
            for blk in range(res_blocks):
                p = params[f"down_{ind}_{blk}"]
                x = sharded_cond_injection(
                    p["cond_inj"], x,
                    None if enc_it is not None else cond_enc_pyr[lvl],
                    axis_name, groups,
                    cached=(next(enc_it) if enc_it is not None
                            else None))
                x = sharded_resnet_block(p["res_block"], x, t_emb, axis_name,
                                  groups, **drop_kw())
                if enc_attn[ind]:
                    x = _self_attention(p["attn"], x, axis_name, groups)
                feats.append(x)
            if ind != num_mults - 1:
                dp = params[f"downsample_{ind}"]
                x = sharded_conv3x3(x, dp["conv"]["conv"]["kernel"],
                                    axis_name,
                                    bias=dp["conv"]["conv"]["bias"],
                                    stride=2)
                feats.append(x)
                lvl += 1

        x = sharded_resnet_block(params["mid_0"]["res_block"], x, t_emb, axis_name,
                          groups, **drop_kw())
        x = _self_attention(params["mid_0"]["attn"], x, axis_name, groups)
        x = sharded_resnet_block(params["mid_1"]["res_block"], x, t_emb, axis_name,
                          groups, **drop_kw())

        for ind in reversed(range(num_mults)):
            for blk in range(res_blocks + 1):
                p = params[f"up_{ind}_{blk}"]
                x = jnp.concatenate([x, feats.pop()], axis=-1)
                x = sharded_fwm_injection(
                    p["cond_inj"], x,
                    None if dec_it is not None else cond_dec_pyr[lvl],
                    axis_name, groups,
                    cached=(next(dec_it) if dec_it is not None
                            else None), **fwm_kw())
                x = sharded_resnet_block(p["res_block"], x, t_emb, axis_name,
                                  groups, **drop_kw())
                if dec_attn[ind]:
                    x = _self_attention(p["attn"], x, axis_name, groups)
            if ind >= 1:
                up = params[f"upsample_{ind}"]
                x = _upsample_nearest2(x)
                x = sharded_conv3x3(x, up["conv"]["conv"]["kernel"],
                                    axis_name,
                                    bias=up["conv"]["conv"]["bias"])
                lvl -= 1

        return sharded_block(params["final_conv"], x, axis_name,
                             groups)

    def cond_cache_body(params, cond_enc_pyr, cond_dec_pyr):
        """The loop-invariant cond features, computed once per sample:
        per-encoder-block (scale, shift) H-slabs and per-decoder-block
        (replicated, psum'd) FWM context matrices."""
        pdt = params["head_conv"]["conv"]["kernel"].dtype
        cond_enc_pyr = tuple(c.astype(pdt) for c in cond_enc_pyr)
        cond_dec_pyr = tuple(c.astype(pdt) for c in cond_dec_pyr)
        enc, dec = [], []
        lvl = 0
        for ind in range(num_mults):
            for blk in range(res_blocks):
                p = params[f"down_{ind}_{blk}"]
                enc.append(sharded_cond_injection(
                    p["cond_inj"], None, cond_enc_pyr[lvl], axis_name,
                    groups, cond_only=True))
            if ind != num_mults - 1:
                lvl += 1
        for ind in reversed(range(num_mults)):
            for blk in range(res_blocks + 1):
                p = params[f"up_{ind}_{blk}"]
                dec.append(sharded_fwm_injection(
                    p["cond_inj"], None, cond_dec_pyr[lvl], axis_name,
                    groups, cond_only=True))
            if ind >= 1:
                lvl -= 1
        return tuple(enc), tuple(dec)

    # dp x sp composition: any mesh axis other than `axis_name` shards the
    # batch dim (e.g. a ("data", "space") mesh from make_mesh_2d — batch
    # over `data`, image rows over `space`). The collectives inside `body`
    # name only `axis_name`, so halo/psum/gather stay within each data row.
    other_axes = [a for a in mesh.axis_names if a != axis_name]
    batch_axis = other_axes[0] if other_axes else None
    spat = P(batch_axis, axis_name, None, None)
    repl = P()                       # params: replicated over the full mesh
    bsp = P(batch_axis)              # batch-sharded, otherwise replicated
    sharded_body = shard_map(
        body, mesh=mesh,
        in_specs=(repl, spat, bsp, (spat,) * num_mults, (spat,) * num_mults),
        out_specs=spat)
    # cached variant: pyramids already folded into the caches
    sharded_body_cached = shard_map(
        lambda pr, x, te, ec, dc: body(pr, x, te, None, None, ec, dc),
        mesh=mesh,
        in_specs=(repl, spat, bsp, spat, bsp),
        out_specs=spat)
    sharded_cond_cache = shard_map(
        cond_cache_body, mesh=mesh,
        in_specs=(repl, (spat,) * num_mults, (spat,) * num_mults),
        out_specs=(spat, bsp))
    # train-mode variant: explicit self_cond slab (p_losses passes the
    # stop-gradient x0 estimate, not x) + dropout key; cond features are
    # computed inline so gradients flow through the CSM/FWM branches
    sharded_body_train = shard_map(
        lambda pr, x, sc, te, dk, ep, dp: body(pr, x, te, ep, dp,
                                               self_cond=sc, drop_key=dk),
        mesh=mesh,
        in_specs=(repl, spat, spat, bsp, repl,
                  (spat,) * num_mults, (spat,) * num_mults),
        out_specs=spat)
    # deterministic train variant (no dropout/DropPath): explicit
    # self_cond, gradients through the cond branches — for exact parity
    # checks and evaluation of the train graph
    sharded_body_train_det = shard_map(
        lambda pr, x, sc, te, ep, dp: body(pr, x, te, ep, dp,
                                           self_cond=sc),
        mesh=mesh,
        in_specs=(repl, spat, spat, bsp,
                  (spat,) * num_mults, (spat,) * num_mults),
        out_specs=spat)

    space_size = (mesh.shape[axis_name] if axis_name in mesh.shape
                  else mesh.size)

    def check_h(h):
        # H must split into equal slabs that stay even through every
        # stride-2 stage; fail fast with the actual requirement instead of
        # an obscure shape mismatch deep in the decoder. Images that don't
        # satisfy it (e.g. 1000px on 8 devices) are handled by the
        # samplers' auto-pad (pad_to_shardable) or `spatial.tiled_sample`.
        need = space_size * 2 ** (num_mults - 1)
        if h % need != 0:
            raise ValueError(
                f"H={h} must be divisible by mesh['{axis_name}'] * "
                f"2^(num_stages-1) = {space_size} * "
                f"{2 ** (num_mults - 1)} = {need} for H-sharded execution "
                "(the sharded samplers auto-pad; for the raw forward pad "
                "the input yourself)")

    def fn(params, x, t, cond):
        check_h(x.shape[1])
        t_emb = t_embedding(params["noise_level_mlp"], t)
        enc_pyr, dec_pyr = pyramids(cond)
        return sharded_body(params, x, t_emb, enc_pyr, dec_pyr)

    def pyramids(cond):
        cond_enc = cond[..., :enc_cond_dim]
        cond_dec = cond[..., -dec_cond_dim:]
        h0, w0 = cond.shape[1], cond.shape[2]
        enc_pyr, dec_pyr = [], []
        for l in range(num_mults):
            hl, wl = h0 // (2 ** l), w0 // (2 ** l)
            enc_pyr.append(cond_enc if hl == h0
                           else resize_bilinear(cond_enc, hl, wl))
            dec_pyr.append(cond_dec if hl == h0
                           else resize_bilinear(cond_dec, hl, wl))
        return tuple(enc_pyr), tuple(dec_pyr)

    fn.pyramids = pyramids
    fn.cond_cache = sharded_cond_cache
    fn.body_cached = sharded_body_cached
    fn.body_train = sharded_body_train
    fn.body_train_det = sharded_body_train_det
    fn.t_embedding = t_embedding
    fn.check_h = check_h
    fn.need_h = space_size * 2 ** (num_mults - 1)
    fn.need_w = 2 ** (num_mults - 1)
    fn.batch_axis = batch_axis
    fn.batch_size_mult = (mesh.shape[batch_axis]
                          if batch_axis is not None else 1)
    fn.mesh = mesh
    fn.spat_spec = spat              # (batch, space, None, None) placement
    return jax.jit(fn) if jit else fn


def _pad_for_sharding(inner, pan, lms, wavelets):
    """Edge-pad (B, H, W) so the exact H-sharded path accepts arbitrary
    sizes (e.g. 1000x1000 Harvard full-res on 8 devices -> pad H to 1024):
    B to a multiple of the mesh's batch axis (repeat last sample), H to
    `mesh[space] * 2^(stages-1)` and W to `2^(stages-1)` (edge replicate;
    wavelets are half-res so their pads are halved — H and W must be even,
    the Haar DWT's own requirement). Returns padded arrays + the original
    (b, h, w) to crop the result back to.
    """
    b, h, w = lms.shape[:3]
    if h % 2 or w % 2:
        raise ValueError(f"H and W must be even (DWT input), got {h}x{w}")
    pb = -b % inner.batch_size_mult
    ph = -h % inner.need_h
    pw = -w % inner.need_w
    # wavelets live at half resolution, padded by ph//2 — an odd pad (only
    # possible with an odd need_h, e.g. a single-stage config) would
    # truncate, leaving the padded wavelets no longer exactly half the
    # padded H. Round up by one more multiple: x + ph stays divisible and
    # ph becomes even (odd need_h flips parity). (ADVICE r3)
    if ph % 2:
        ph += inner.need_h
    if pw % 2:
        pw += inner.need_w

    # keep the pad ON the mesh: without explicit placements the SPMD
    # partitioner resolves the shape-changing pad/concat by fully
    # rematerializing (replicating) the tensor before resharding — a
    # full-tensor all-gather per sample on a real pod (VERDICT r3 item 6).
    # The edge rows/cols being replicated are tiny (one row broadcast), so
    # they get explicit space-replicated specs; each concat result is then
    # constrained back to the forward's (batch, space) placement, which the
    # partitioner implements as shard-local pads + neighbor exchange.
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = inner.mesh
    b_ax, s_ax = inner.spat_spec[0], inner.spat_spec[1]
    spat_sh = NamedSharding(mesh, inner.spat_spec)
    csrt = jax.lax.with_sharding_constraint

    def pad(a, ph_, pw_):
        if pb:
            last = csrt(a[-1:], NamedSharding(mesh, P(None, s_ax)))
            a = jnp.concatenate(
                [a, jnp.broadcast_to(last, (pb,) + a.shape[1:])], axis=0)
            a = csrt(a, spat_sh)
        if ph_:
            row = csrt(a[:, -1:], NamedSharding(mesh, P(b_ax)))
            rows = jnp.broadcast_to(
                row, (a.shape[0], ph_) + a.shape[2:])
            a = jnp.concatenate([a, csrt(rows, NamedSharding(mesh, P(b_ax)))],
                                axis=1)
            a = csrt(a, spat_sh)
        if pw_:
            col = csrt(a[:, :, -1:], spat_sh)
            cols = jnp.broadcast_to(
                col, a.shape[:2] + (pw_, a.shape[3]))
            a = jnp.concatenate([a, csrt(cols, spat_sh)], axis=2)
            a = csrt(a, spat_sh)
        return a

    return (pad(pan, ph, pw), pad(lms, ph, pw),
            pad(wavelets, ph // 2, pw // 2), (b, h, w))


def make_sharded_sampler(model, mesh, dcfg, sched_respaced,
                         axis_name: str = "data"):
    """End-to-end H-sharded DDIM sampling: the whole respaced chain is one
    jitted program whose denoiser is the shard_map'd UNet — a single
    beyond-HBM image samples across the mesh with no tiling approximation
    (the exact-math alternative to `spatial.tiled_sample`).

    Returns `sample(params, key, pan, lms, wavelets) -> sr in [0,1]`
    (eval protocol: `sr = clip(sample + lms, 0, 1)`). Arbitrary (even)
    H/W/batch are accepted: inputs are edge-padded to the mesh-divisible
    shape and the result cropped back (the reference's 1000x1000 Harvard
    workload, `/root/reference/diffusion_engine.py:373-377`, pads to 1024
    on an 8-way space axis).
    """
    from ..data.loader import pack_cond
    from ..diffusion import ddim_sample_loop

    inner = make_sharded_unet_forward(model, mesh, axis_name, jit=False)

    def sample(params, key, pan, lms, wavelets):
        pan, lms, wavelets, (b0, h0, w0) = _pad_for_sharding(
            inner, pan, lms, wavelets)
        cond = pack_cond(lms, pan, wavelets)
        # loop-invariant cond features (CSM scale/shift slabs, FWM context
        # matrices incl. their psums) hoisted OUT of the sampling scan —
        # the sharded analog of the model's cond_only/cond_cache contract
        enc_pyr, dec_pyr = inner.pyramids(cond)
        enc_cache, dec_cache = inner.cond_cache(params, enc_pyr, dec_pyr)

        def model_fn(x, t, c, sc, k):
            # sc == x in the DDIM loop — the sharded forward's built-in
            # self-cond fold is exactly that case
            t_emb = inner.t_embedding(params["noise_level_mlp"], t)
            return inner.body_cached(params, x, t_emb, enc_cache, dec_cache)

        s = ddim_sample_loop(dcfg, sched_respaced, model_fn, key, cond)
        return jnp.clip(s + lms, 0.0, 1.0)[:b0, :h0, :w0]

    return jax.jit(sample)


def make_sharded_dpm_sampler(model, mesh, betas, *, steps: int = 20,
                             order: int = 2, axis_name: str = "data",
                             clamp_range=(0.0, 1.0),
                             skip_type: str = "time_uniform",
                             denoise_to_zero: bool = False):
    """H-sharded DPM-Solver++ sampling — the fast-sampler counterpart of
    `make_sharded_sampler`: the multistep solver scan drives the
    shard_map'd UNet (cond features hoisted once per sample), so a single
    beyond-HBM image gets the reduced-NFE sampler too.

    Returns `sample(params, key, pan, lms, wavelets) -> sr in [0,1]`.
    Arbitrary (even) H/W/batch are accepted via the same edge-pad + crop as
    `make_sharded_sampler`.
    """
    from ..data.loader import pack_cond
    from ..solvers import DPMSolver, NoiseScheduleVP, model_wrapper

    inner = make_sharded_unet_forward(model, mesh, axis_name, jit=False)
    ns = NoiseScheduleVP("discrete", betas=betas)

    def sample(params, key, pan, lms, wavelets):
        pan, lms, wavelets, (b0, h0, w0) = _pad_for_sharding(
            inner, pan, lms, wavelets)
        cond = pack_cond(lms, pan, wavelets)
        enc_pyr, dec_pyr = inner.pyramids(cond)
        enc_cache, dec_cache = inner.cond_cache(params, enc_pyr, dec_pyr)

        def x0_model(xx, t_input):
            t_emb = inner.t_embedding(params["noise_level_mlp"], t_input)
            out = inner.body_cached(params, xx, t_emb, enc_cache, dec_cache)
            if getattr(model, "pred_var", False):
                # learned-variance head: the solver consumes the mean half
                out = jnp.split(out, 2, axis=-1)[0]
            return out

        model_fn = model_wrapper(x0_model, ns, model_type="x_start")
        # clamp to the ENGINE protocol's data range by default
        # (`diffusion_engine.py:191` clamp_range=(0,1); the reference's own
        # DPM path clamps (-1,1) only because pansharpen_model.py:237 runs
        # in [-1,1] data — NFE_STUDY.md round 4 measures the (0,1) clamp
        # ~9% better SAM on protocol checkpoints)
        solver = DPMSolver(
            model_fn, ns, algorithm_type="dpmsolver++",
            correcting_x0_fn=lambda x0, t: jnp.clip(x0, *clamp_range))
        xT = jax.random.normal(key, lms.shape)
        s = solver.sample(xT, steps=steps, order=order, method="multistep",
                          skip_type=skip_type,
                          denoise_to_zero=denoise_to_zero)
        return jnp.clip(s + lms, 0.0, 1.0)[:b0, :h0, :w0]

    return jax.jit(sample)


def make_sharded_x0_sampler(model, mesh, sched, *, axis_name: str = "data"):
    """H-sharded one-shot posterior-mean mode (NFE=1): ONE shard_map'd UNet
    forward at t=T-1 from pure noise — the beyond-HBM counterpart of
    `train.eval`'s `sampler="x0"` (X0_STUDY.md), so a full-res image whose
    single forward pass exceeds one chip's HBM still gets the
    posterior-mean serving mode. At NFE=1 there is nothing for the cond
    cache to amortize, so the deterministic explicit-self-cond body runs
    the cond branches inline — numerics match the unsharded
    `model.apply(..., self_cond=0, train=False)` exactly.

    `sched` is the TRAIN-length schedule (its size fixes both the t=T-1
    time-embedding convention the weights were trained with and sigma_T).
    Returns `sample(params, key, pan, lms, wavelets) -> sr in [0,1]` with
    the same edge-pad + crop contract as the other sharded samplers.
    """
    from ..data.loader import pack_cond

    inner = make_sharded_unet_forward(model, mesh, axis_name, jit=False)
    T = int(sched.betas.shape[0])
    sig_T = jnp.sqrt(1.0 - sched.alphas_cumprod[T - 1])

    def sample(params, key, pan, lms, wavelets):
        pan, lms, wavelets, (b0, h0, w0) = _pad_for_sharding(
            inner, pan, lms, wavelets)
        cond = pack_cond(lms, pan, wavelets)
        enc_pyr, dec_pyr = inner.pyramids(cond)
        t = jnp.full((lms.shape[0],), T - 1, jnp.int32)
        t_emb = inner.t_embedding(params["noise_level_mlp"], t)
        xt = jax.random.normal(key, lms.shape) * sig_T
        out = inner.body_train_det(params, xt, jnp.zeros_like(xt), t_emb,
                                   enc_pyr, dec_pyr)
        if getattr(model, "pred_var", False):
            out = jnp.split(out, 2, axis=-1)[0]
        return jnp.clip(out + lms, 0.0, 1.0)[:b0, :h0, :w0]

    return jax.jit(sample)


def make_sharded_train_forward(model, mesh, axis_name: str = "space"):
    """Train-mode H-sharded UNet forward: dropout active (per-shard
    decorrelated masks), explicit self_cond input (p_losses' stop-gradient
    x0 estimate), cond features computed inline so gradients flow through
    the CSM/FWM injection branches.

    Returns `fn(params, x, t, cond, self_cond, key)` (unjitted — embed in
    a train step). This lifts spatial parallelism from sampling to
    TRAINING: beyond-HBM images can be trained on directly (the reference
    trains at 64px only, `/root/reference/diffusion_engine.py:183-209`, so
    this is capability beyond it).
    """
    inner = make_sharded_unet_forward(model, mesh, axis_name, jit=False)

    def fn(params, x, t, cond, self_cond, key):
        inner.check_h(x.shape[1])
        t_emb = inner.t_embedding(params["noise_level_mlp"], t)
        enc_pyr, dec_pyr = inner.pyramids(cond)
        if key is None:  # deterministic: no dropout/DropPath
            return inner.body_train_det(params, x, self_cond, t_emb,
                                        enc_pyr, dec_pyr)
        return inner.body_train(params, x, self_cond, t_emb, key,
                                enc_pyr, dec_pyr)

    fn.inner = inner
    return fn


def make_sharded_train_step(cfg, model, dcfg, sched, tx, mesh,
                            axis_name: str = "space", *,
                            stochastic: bool = True):
    """H-sharded training step: `p_losses` (q_sample + self-cond coin +
    loss) at the jit level driving the shard_map'd train-mode UNet forward
    — grads/optimizer/EMA identical to the dp step in `train/engine.py`
    (`make_train_step`), but each image's rows live across the mesh so a
    single training example may exceed one chip's HBM. On a 2-D
    ("data", "space") mesh the batch shards over `data` at the same time.

    Returns `(state, batch, key) -> (state, loss)`, to be wrapped in
    `jax.jit` (donate state).

    `stochastic=False` disables dropout AND the FWM DropPath (the
    unsharded decoder hardcodes DropPath 0.2 in train mode, so exact
    loss-parity checks against an unsharded step need both sides
    deterministic — per-shard RNG streams cannot reproduce flax's global
    mask order bit-for-bit).
    """
    import optax

    from ..data.loader import pack_cond
    from ..diffusion import p_losses
    from ..train.engine import _dtype_casts
    from ..train.state import TrainState, ema_update

    fwd = make_sharded_train_forward(model, mesh, axis_name)
    cast_in, cast_out = _dtype_casts(cfg)

    def train_step(state, batch, key):
        pan, lms, gt, wavelets = batch
        cond = pack_cond(lms, pan, wavelets)
        res = gt - lms

        def loss_fn(params):
            # engine parity: bf16 compute params/activations, f32 masters
            # and diffusion math (`make_train_step`'s _dtype_casts pattern)
            lp = cast_in(params)
            ccond = cast_in(cond)

            def model_fn(x, t, c, sc, k):
                out = fwd(lp, cast_in(x), t, ccond, cast_in(sc),
                          k if stochastic else None)
                return cast_out(out)

            loss, recon = p_losses(dcfg, sched, model_fn, key, res, cond)
            return loss, recon

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(params, state.ema_params, state.step,
                         decay=cfg.ema_decay, start_iter=cfg.ema_start_iter)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema), loss

    return train_step
