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
  * self-attention (8x8-res feature maps) — `all_gather` rows, dense
    attention, slice own slab back (tiny at this depth);
  * nearest-2x upsample / stride-2 downsample — shard-local by
    construction (even slab heights).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from ..models.common import resize_bilinear, swish
from .spatial import (halo_exchange_h, sharded_conv3x3, sharded_groupnorm,
                      sharded_softmax_h)


def _conv1x1(p, x):
    return (jnp.einsum("bhwi,io->bhwo", x, p["conv"]["kernel"][0, 0])
            + p["conv"]["bias"])


def _conv3(p, x, axis_name, stride=1, groups=1):
    k = p["conv"]["kernel"]
    b = p["conv"].get("bias")
    return sharded_conv3x3(x, k, axis_name, bias=b, stride=stride,
                           feature_group_count=groups)


def _gn(p, x, axis_name, groups):
    return sharded_groupnorm(x, p["scale"], p["bias"], groups, axis_name)


def _block(p, x, axis_name, groups):
    h = _gn(p["norm"], x, axis_name, groups)
    return _conv3(p["conv"], swish(h), axis_name)


def _resnet_block(p, x, t_emb, axis_name, groups):
    h = _block(p["block1"], x, axis_name, groups)
    film = (t_emb @ p["noise_func"]["noise_func"]["dense"]["kernel"]
            + p["noise_func"]["noise_func"]["dense"]["bias"])
    h = h + film[:, None, None, :]
    h = _block(p["block2"], h, axis_name, groups)
    if "res_conv" in p:
        x = _conv1x1(p["res_conv"], x)
    return h + x


def _csm_injection(p, x, cond, axis_name, groups):
    h = sharded_conv3x3(cond, p["body_conv1"]["conv"]["kernel"], axis_name)
    h = _gn(p["body_norm"], h, axis_name, groups)
    h = jax.nn.silu(h)
    h = (jnp.einsum("bhwi,io->bhwo", h, p["body_conv2"]["kernel"][0, 0])
         + p["body_conv2"]["bias"])
    scale, shift = jnp.split(h, 2, axis=-1)
    x = _conv1x1(p["x_conv"], x)
    return x * (1 + scale) + shift


def _fwm_injection(p, x, cond, axis_name, groups, nheads=8):
    """FastAttnCondInjection on H-slabs (`models/sr3_dwt.py` FWM):
    q softmax over GLOBAL H, k softmax over (local) W, c x c context summed
    over all pixels via psum."""
    fea_dim = x.shape[-1]
    xn = _gn(p["prenorm_x"], x, axis_name, groups)

    q = _conv3(p["q_dw"], xn, axis_name, groups=fea_dim)
    q = _conv1x1(p["q_pw"], q)
    q = sharded_softmax_h(q, axis_name)

    kv = _conv3(p["kv_dw"], cond, axis_name, groups=cond.shape[-1])
    kv = _conv1x1(p["kv_pw"], kv)
    k, v = jnp.split(kv, 2, axis=-1)
    k = jax.nn.softmax(k, axis=2)  # W axis is local

    qkv_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(qkv_dim // nheads)
    b, hs, w, _ = q.shape

    def heads(t):
        return t.reshape(b, hs * w, nheads, qkv_dim // nheads) \
                .transpose(0, 2, 3, 1)  # (b, h, d, local_pixels)

    qh, kh, vh = heads(q * scale), heads(k), heads(v)
    context = jnp.einsum("bhdn,bhen->bhde", kh, vh)
    context = jax.lax.psum(context, axis_name)  # sum over ALL pixels
    out = jnp.einsum("bhde,bhdn->bhen", context, qh)
    out = out.transpose(0, 3, 1, 2).reshape(b, hs, w, qkv_dim)

    attn_out = _conv1x1(p["attn_out"], out)
    if "attn_res" in p:
        attn_out = attn_out + _conv1x1(p["attn_res"], xn)
    else:
        attn_out = attn_out + xn

    ffn = _conv3(p["ffn_conv1"], attn_out, axis_name)
    ffn = jax.nn.silu(ffn)
    ffn = _conv3(p["ffn_conv2"], ffn, axis_name)
    ffn = _conv1x1(p["ffn_conv3"], ffn)
    return ffn + attn_out


def _self_attention(p, x, axis_name, groups, nheads=8):
    """Gather the (small, deep-stage) feature map, run dense attention,
    slice this shard's rows back."""
    b, hs, w, c = x.shape
    head_dim = c // nheads
    xn = _gn(p["norm"], x, axis_name, groups)
    full = jax.lax.all_gather(xn, axis_name, axis=1, tiled=True)
    hw = full.shape[1] * w
    qkv = jnp.einsum("bhwi,io->bhwo", full, p["qkv"]["conv"]["kernel"][0, 0])
    qkv = qkv.reshape(b, hw, nheads, 3 * head_dim)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    attn = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(c)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bnqk,bknd->bqnd", attn, v).reshape(
        b, full.shape[1], w, c)
    idx = jax.lax.axis_index(axis_name)
    out = jax.lax.dynamic_slice_in_dim(out, idx * hs, hs, axis=1)
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

    def t_embedding(p, t):
        dim = model.inner_channel
        count = dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        enc = (t.astype(jnp.float32)[:, None]
               * jnp.exp(-math.log(1e4) * step[None, :]))
        h = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)
        h = h @ p["lin1"]["dense"]["kernel"] + p["lin1"]["dense"]["bias"]
        h = swish(h)
        return h @ p["lin2"]["dense"]["kernel"] + p["lin2"]["dense"]["bias"]

    def body(params, x, t_emb, cond_enc_pyr, cond_dec_pyr):
        # head conv with the self-cond fold (self_cond defaults to x)
        kh = params["head_conv"]["conv"]["kernel"]
        c_in = x.shape[-1]
        if model.self_condition:
            kh = kh[:, :, :c_in] + kh[:, :, c_in:]
        x = sharded_conv3x3(x, kh, axis_name,
                            bias=params["head_conv"]["conv"]["bias"])

        feats = [x]
        lvl = 0
        for ind in range(num_mults):
            for blk in range(res_blocks):
                p = params[f"down_{ind}_{blk}"]
                x = _csm_injection(p["cond_inj"], x, cond_enc_pyr[lvl],
                                   axis_name, groups)
                x = _resnet_block(p["res_block"], x, t_emb, axis_name,
                                  groups)
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

        x = _resnet_block(params["mid_0"]["res_block"], x, t_emb, axis_name,
                          groups)
        x = _self_attention(params["mid_0"]["attn"], x, axis_name, groups)
        x = _resnet_block(params["mid_1"]["res_block"], x, t_emb, axis_name,
                          groups)

        for ind in reversed(range(num_mults)):
            for blk in range(res_blocks + 1):
                p = params[f"up_{ind}_{blk}"]
                x = jnp.concatenate([x, feats.pop()], axis=-1)
                x = _fwm_injection(p["cond_inj"], x, cond_dec_pyr[lvl],
                                   axis_name, groups)
                x = _resnet_block(p["res_block"], x, t_emb, axis_name,
                                  groups)
                if dec_attn[ind]:
                    x = _self_attention(p["attn"], x, axis_name, groups)
            if ind >= 1:
                up = params[f"upsample_{ind}"]
                x = _upsample_nearest2(x)
                x = sharded_conv3x3(x, up["conv"]["conv"]["kernel"],
                                    axis_name,
                                    bias=up["conv"]["conv"]["bias"])
                lvl -= 1

        return _block(params["final_conv"], x, axis_name, groups)

    spat = P(None, axis_name, None, None)
    sharded_body = shard_map(
        body, mesh=mesh,
        in_specs=(P(), spat, P(), (spat,) * num_mults, (spat,) * num_mults),
        out_specs=spat)

    def fn(params, x, t, cond):
        t_emb = t_embedding(params["noise_level_mlp"], t)
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
        return sharded_body(params, x, t_emb, tuple(enc_pyr), tuple(dec_pyr))

    return jax.jit(fn) if jit else fn


def make_sharded_sampler(model, mesh, dcfg, sched_respaced,
                         axis_name: str = "data"):
    """End-to-end H-sharded DDIM sampling: the whole respaced chain is one
    jitted program whose denoiser is the shard_map'd UNet — a single
    beyond-HBM image samples across the mesh with no tiling approximation
    (the exact-math alternative to `spatial.tiled_sample`).

    Returns `sample(params, key, pan, lms, wavelets) -> sr in [0,1]`
    (eval protocol: `sr = clip(sample + lms, 0, 1)`).
    """
    from ..data.loader import pack_cond
    from ..diffusion import ddim_sample_loop

    inner = make_sharded_unet_forward(model, mesh, axis_name, jit=False)

    def sample(params, key, pan, lms, wavelets):
        cond = pack_cond(lms, pan, wavelets)

        def model_fn(x, t, c, sc, k):
            # sc == x in the DDIM loop — the sharded forward's built-in
            # self-cond fold is exactly that case
            return inner(params, x, t, cond)

        s = ddim_sample_loop(dcfg, sched_respaced, model_fn, key, cond)
        return jnp.clip(s + lms, 0.0, 1.0)

    return jax.jit(sample)
