"""Spatial parallelism: H-axis sharding with halo exchange, and
overlap-tile evaluation for full-resolution images.

The reference handles large full-res eval (512x512 WV3, 1000x1000 Harvard,
`diffusion_engine.py:373-377`) by simply running the fully-convolutional
UNet at that size on one GPU. On TPU two complementary mechanisms:

  * `halo_exchange_h` / `sharded_conv3x3` — building blocks for H-sharded
    convolution inside `shard_map`: each device holds an H-slab, 3x3 convs
    exchange 1-row halos with mesh neighbours over ICI (`jax.lax.ppermute`),
    global edges stay zero-padded. This is the kernel-level primitive for
    models whose single activation exceeds HBM.
  * `tiled_sample` — the production path for huge images: split into
    overlapping tiles (overlap covering the receptive-field margin), run the
    (batch-sharded) sampler on all tiles, and feather-blend. Arbitrary image
    sizes with one compiled tile shape.
"""

from __future__ import annotations

from typing import Callable, Optional


import jax
import jax.numpy as jnp
import numpy as np

from ..models.common import swish as _swish


def halo_exchange_h(x: jnp.ndarray, axis_name: str,
                    halo: int = 1) -> jnp.ndarray:
    """Pad an H-slab (B, Hs, W, C) with `halo` rows from mesh neighbours.

    First/last shards get zero rows at the global boundary (torch zero-pad
    conv semantics). Must be called inside shard_map/pmap over `axis_name`.
    """
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)
    # send bottom rows to the next device (they become its top halo)
    top_halo = jax.lax.ppermute(
        x[:, -halo:], axis_name,
        perm=[(i, (i + 1) % n) for i in range(n)])
    bot_halo = jax.lax.ppermute(
        x[:, :halo], axis_name,
        perm=[(i, (i - 1) % n) for i in range(n)])
    top_halo = jnp.where(idx == 0, jnp.zeros_like(top_halo), top_halo)
    bot_halo = jnp.where(idx == n - 1, jnp.zeros_like(bot_halo), bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def sharded_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray, axis_name: str,
                    bias: Optional[jnp.ndarray] = None,
                    stride: int = 1,
                    feature_group_count: int = 1) -> jnp.ndarray:
    """3x3 conv on an H-sharded NHWC slab: halo exchange + valid-H conv.

    Matches a global conv with padding=1: W is padded locally, H padding
    comes from the neighbour halos (zeros at global edges). For stride 2 the
    global H must be even and slabs equal-sized."""
    xh = halo_exchange_h(x, axis_name, halo=1)
    return jax.lax.conv_general_dilated(
        xh, kernel, window_strides=(stride, stride),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    ) + (bias if bias is not None else 0.0)


def sharded_softmax_h(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Softmax along the GLOBAL H axis (axis 1) of an H-sharded slab:
    cross-shard max (`pmax`) and normalizer (`psum`), local exp."""
    # the max shift is purely for numerical stability (softmax is shift
    # invariant) — stop_gradient it, both because its cotangent is zero
    # anyway (jax.nn.softmax does the same) and because pmax has no
    # differentiation rule (train-mode sharded forward)
    m = jax.lax.pmax(
        jnp.max(jax.lax.stop_gradient(x), axis=1, keepdims=True), axis_name)
    e = jnp.exp(x - m)
    s = jax.lax.psum(jnp.sum(e, axis=1, keepdims=True), axis_name)
    return e / s


def sharded_groupnorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      groups: int, axis_name: str,
                      eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over an H-sharded NHWC slab with GLOBAL statistics.

    GroupNorm(1) (the engine config) normalizes over the whole (H, W, C)
    extent, so an H-sharded forward must reduce its moments across shards:
    local sum / sum-of-squares -> `psum` over the mesh axis -> normalize
    locally. Bit-compatible with `nn.GroupNorm` up to fp reassociation.
    """
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups)
    s = jnp.sum(xg, axis=(1, 2, 4), keepdims=True)
    ss = jnp.sum(xg * xg, axis=(1, 2, 4), keepdims=True)
    s = jax.lax.psum(s, axis_name)
    ss = jax.lax.psum(ss, axis_name)
    n = h * w * (c // groups) * jax.lax.axis_size(axis_name)
    mean = s / n
    # clamp like flax GroupNorm: E[x^2] - mean^2 can cancel below 0 in fp
    var = jnp.maximum(ss / n - mean * mean, 0.0)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    return xn.reshape(b, h, w, c) * scale + bias


def sharded_block(p, x, axis_name: str, groups: int = 1, *,
                  dropout: float = 0.0, key=None) -> jnp.ndarray:
    """`models/common.py:Block` (GN -> Swish -> (Dropout) -> conv3x3) on an
    H-slab. `p` is the flax param subtree of a Block. Dropout (train mode)
    applies when `dropout > 0` and `key` is given; the caller is expected
    to have folded the shard's axis_index into `key` so masks are
    independent across slabs (flax semantics: keep-prob scaling)."""
    h = sharded_groupnorm(x, p["norm"]["scale"], p["norm"]["bias"], groups,
                          axis_name)
    h = _swish(h)
    if dropout > 0.0 and key is not None:
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(key, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    return sharded_conv3x3(h, p["conv"]["conv"]["kernel"], axis_name,
                           bias=p["conv"]["conv"]["bias"])


def sharded_resnet_block(p, x, t_emb, axis_name: str, groups: int = 1, *,
                         dropout: float = 0.0, key=None) -> jnp.ndarray:
    """`models/common.py:ResnetBlock` on an H-slab: two Blocks + time-FiLM
    add + skip conv. `p` is the param subtree of a ResnetBlock. Dropout
    sits in block2 only, mirroring the unsharded module."""
    h = sharded_block(p["block1"], x, axis_name, groups)
    film = (t_emb @ p["noise_func"]["noise_func"]["dense"]["kernel"]
            + p["noise_func"]["noise_func"]["dense"]["bias"])
    # t_emb may ride in f32 (sinusoidal features) while h is bf16; a raw
    # add would promote h to f32 and poison downstream raw-kernel convs
    # (flax modules promote internally, these hand-rolled kernels don't)
    h = h + film[:, None, None, :].astype(h.dtype)
    h = sharded_block(p["block2"], h, axis_name, groups,
                      dropout=dropout, key=key)
    if "res_conv" in p:
        x = jnp.einsum("bhwi,io->bhwo", x,
                       p["res_conv"]["conv"]["kernel"][0, 0]) \
            + p["res_conv"]["conv"]["bias"]
    return h + x


def _conv1x1_p(p, x):
    return (jnp.einsum("bhwi,io->bhwo", x, p["conv"]["kernel"][0, 0])
            + p["conv"]["bias"])


def sharded_cond_injection(p, x, cond, axis_name: str, groups: int = 1, *,
                           cached=None, cond_only: bool = False):
    """CSM `CondInjection` on an H-slab (cond pre-resized to x's res and
    H-sharded the same way). `p` is the param subtree of a CondInjection.

    Like the model's `cond_only`/`cached` contract: the whole (scale, shift)
    branch depends only on cond, so samplers compute it once outside the
    scan (`cond_only=True`) and pass it back per step (`cached=`)."""
    if cached is not None:
        scale, shift = cached
    else:
        h = sharded_conv3x3(cond, p["body_conv1"]["conv"]["kernel"],
                            axis_name)
        h = sharded_groupnorm(h, p["body_norm"]["scale"],
                              p["body_norm"]["bias"], groups, axis_name)
        h = jax.nn.silu(h)
        h = (jnp.einsum("bhwi,io->bhwo", h, p["body_conv2"]["kernel"][0, 0])
             + p["body_conv2"]["bias"])
        scale, shift = jnp.split(h, 2, axis=-1)
    if cond_only:
        return (scale, shift)
    x = _conv1x1_p(p["x_conv"], x)
    return x * (1 + scale) + shift


def sharded_fwm_injection(p, x, cond, axis_name: str, groups: int = 1,
                          nheads: int = 8, *, cached=None,
                          cond_only: bool = False,
                          drop_path: float = 0.0, drop_path_key=None):
    """FastAttnCondInjection (FWM) on H-slabs (`models/sr3_dwt.py`):
    q softmax over GLOBAL H (`sharded_softmax_h`), k softmax over the local
    W axis, c x c context summed over ALL pixels via psum.

    The k/v branch and the context depend only on cond: `cond_only=True`
    returns the (replicated, psum'd) context matrix, `cached=` consumes it.

    Train mode: `drop_path` + `drop_path_key` enable the FFN stochastic
    depth (DropPath 0.2 in the unsharded decoder blocks). The mask is
    per-SAMPLE, so the caller must pass a key that is identical on every
    H-shard of the same sample (fold the batch axis index only, never the
    space axis) — otherwise different slabs of one image would drop
    differently.
    """
    import math as _math

    if cached is not None:
        context = cached
        qkv_dim = context.shape[1] * context.shape[2]
    else:
        kv = sharded_conv3x3(cond, p["kv_dw"]["conv"]["kernel"], axis_name,
                             feature_group_count=cond.shape[-1])
        kv = _conv1x1_p(p["kv_pw"], kv)
        k, v = jnp.split(kv, 2, axis=-1)
        k = jax.nn.softmax(k, axis=2)  # W axis is local
        qkv_dim = k.shape[-1]
        d = qkv_dim // nheads
        b, hs, w, _ = k.shape

        def heads(t):
            return t.reshape(b, hs * w, nheads, d).transpose(0, 2, 3, 1)

        context = jnp.einsum("bhdn,bhen->bhde", heads(k), heads(v))
        context = jax.lax.psum(context, axis_name)  # sum over ALL pixels
    if cond_only:
        return context

    fea_dim = x.shape[-1]
    xn = sharded_groupnorm(x, p["prenorm_x"]["scale"], p["prenorm_x"]["bias"],
                           groups, axis_name)
    q = sharded_conv3x3(xn, p["q_dw"]["conv"]["kernel"], axis_name,
                        feature_group_count=fea_dim)
    q = _conv1x1_p(p["q_pw"], q)
    q = sharded_softmax_h(q, axis_name)

    d = qkv_dim // nheads
    scale = 1.0 / _math.sqrt(d)
    b, hs, w, _ = q.shape
    qh = (q * scale).reshape(b, hs * w, nheads, d).transpose(0, 2, 3, 1)
    out = jnp.einsum("bhde,bhdn->bhen", context, qh)
    out = out.transpose(0, 3, 1, 2).reshape(b, hs, w, qkv_dim)

    attn_out = _conv1x1_p(p["attn_out"], out)
    if "attn_res" in p:
        attn_out = attn_out + _conv1x1_p(p["attn_res"], xn)
    else:
        attn_out = attn_out + xn

    ffn = sharded_conv3x3(attn_out, p["ffn_conv1"]["conv"]["kernel"],
                          axis_name)
    ffn = jax.nn.silu(ffn)
    ffn = sharded_conv3x3(ffn, p["ffn_conv2"]["conv"]["kernel"], axis_name)
    ffn = _conv1x1_p(p["ffn_conv3"], ffn)
    if drop_path > 0.0 and drop_path_key is not None:
        keep = 1.0 - drop_path
        mask = jax.random.bernoulli(drop_path_key, keep,
                                    (ffn.shape[0], 1, 1, 1))
        ffn = ffn * mask.astype(ffn.dtype) / keep
    return ffn + attn_out


def sharded_downsample(p, x, axis_name: str) -> jnp.ndarray:
    """Strided-2 3x3 conv on an H-slab (`models/common.py:Downsample`).
    Requires an even per-shard H so output rows land on shard boundaries."""
    assert x.shape[1] % 2 == 0, "per-shard H must be even for stride 2"
    return sharded_conv3x3(x, p["conv"]["conv"]["kernel"], axis_name,
                           bias=p["conv"]["conv"]["bias"], stride=2)


def sharded_encoder_stage(block_params, downsample_params, x, t_emb, cond,
                          axis_name: str, groups: int = 1) -> jnp.ndarray:
    """One full UNetSR3-DWT encoder stage on H-sharded slabs under
    `shard_map`: N x (CSM CondInjection + ResnetBlock) then Downsample —
    the stage-level lift of the halo-exchange conv primitive, for single
    images whose activations exceed one chip's HBM
    (SURVEY §5 'long-context / spatial'; e.g. 1000x1000 Harvard full-res,
    `diffusion_engine.py:373-377`).

    `block_params`: list of ResnetBlocWithAttn param subtrees (encoder
    layout: {cond_inj, res_block}); `downsample_params`: Downsample subtree
    or None; `cond` pre-resized to x's resolution, sharded like x; `t_emb`
    replicated [B, emb].
    """
    for p in block_params:
        x = sharded_cond_injection(p["cond_inj"], x, cond, axis_name, groups)
        x = sharded_resnet_block(p["res_block"], x, t_emb, axis_name, groups)
    if downsample_params is not None:
        x = sharded_downsample(downsample_params, x, axis_name)
    return x


def _feather_window(tile: int, overlap: int) -> np.ndarray:
    """1-D blending weights: ramp up/down over the overlap region."""
    w = np.ones(tile, dtype=np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap, dtype=np.float32) + 1) / (overlap + 1)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def tiled_sample(
    sample_fn: Callable[[jax.Array, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                        jnp.ndarray],
    key: jax.Array,
    pan: np.ndarray,
    lms: np.ndarray,
    wavelets: np.ndarray,
    *,
    tile: int = 256,
    overlap: int = 32,
    tile_batch: int = 8,
) -> np.ndarray:
    """Sample an arbitrarily large image by overlapping tiles.

    sample_fn(key, pan_t, lms_t, wav_t) -> sr_t operates on
    (B, tile, tile, .) NHWC batches (e.g. the jitted DDIM/DPM sampler) —
    one compiled shape regardless of the source image size. wavelets are at
    half resolution of lms. Returns the feather-blended full image (NHWC,
    same leading batch as inputs)."""
    b, H, W, _ = lms.shape
    assert tile % 2 == 0 and overlap % 2 == 0
    step = tile - overlap
    hs = sorted({min(h, H - tile) for h in range(0, H - tile + step, step)})
    ws = sorted({min(w, W - tile) for w in range(0, W - tile + step, step)})
    assert min(hs) >= 0 and min(ws) >= 0, "image smaller than tile"

    win = _feather_window(tile, overlap)
    win2d = np.outer(win, win)[None, :, :, None]

    out = np.zeros_like(np.asarray(lms))
    norm = np.zeros((1, H, W, 1), dtype=np.float32)

    # gather all tiles, run in tile_batch-sized chunks
    coords = [(h, w) for h in hs for w in ws]
    tiles_pan, tiles_lms, tiles_wav = [], [], []
    for (h, w) in coords:
        tiles_pan.append(pan[:, h:h + tile, w:w + tile])
        tiles_lms.append(lms[:, h:h + tile, w:w + tile])
        tiles_wav.append(
            wavelets[:, h // 2:(h + tile) // 2, w // 2:(w + tile) // 2])
    tp = np.concatenate(tiles_pan, axis=0)
    tl = np.concatenate(tiles_lms, axis=0)
    tw = np.concatenate(tiles_wav, axis=0)

    n_tiles = tp.shape[0]
    results = []
    for start in range(0, n_tiles, tile_batch):
        end = min(start + tile_batch, n_tiles)
        # pad to static tile_batch
        def pad(a):
            if end - start == tile_batch:
                return a[start:end]
            reps = tile_batch - (end - start)
            return np.concatenate(
                [a[start:end], np.repeat(a[end - 1:end], reps, 0)], axis=0)
        key, k = jax.random.split(key)
        sr = np.asarray(jax.device_get(sample_fn(
            k, jnp.asarray(pad(tp)), jnp.asarray(pad(tl)),
            jnp.asarray(pad(tw)))))[: end - start]
        results.append(sr)
    sr_tiles = np.concatenate(results, axis=0)

    for i, (h, w) in enumerate(coords):
        for bi in range(b):
            out[bi, h:h + tile, w:w + tile] += sr_tiles[i * b + bi] * win2d[0]
        norm[0, h:h + tile, w:w + tile] += win2d[0]
    return out / np.maximum(norm, 1e-8)
