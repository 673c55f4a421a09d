"""UNetSR3-DWT — the flagship denoiser with disentangled modulations.

TPU-native (NHWC, flax.linen) re-design of the reference model
`/root/reference/models/sr3_dwt.py:30-219` (blocks `:222-673`):

  * encoder ResBlocks get the coarse condition slice ``cond[..., :C_lms+C_pan]``
    = [lms, pan] injected FiLM-style (**CSM**, reference `:376-396`);
  * decoder ResBlocks get the wavelet slice ``cond[..., -(C_lms+3*C_pan):]``
    = [lms_LL, pan_H, pan_D, pan_V] injected via linear cross-attention
    (**FWM**, reference `:493-577`);
  * full self-attention only at the `attn_res` (8x8) feature maps;
  * self-conditioning concatenates an x0 estimate onto the input (`:171-174`).

Parity details preserved: GroupNorm(1), zero-init of the CSM's last conv
(`:386-387`), q softmax over H / k softmax over W in the linear attention
(`:545-546`), scale 1/sqrt(qkv_dim/nheads), DropPath 0.2 on the FWM FFN,
bilinear (align_corners=False) resize of cond to each stage.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from .common import (
    Block, Conv, ConvParams, Downsample, DropPath, NoiseLevelMLP,
    ResnetBlock, SelfAttention, Upsample, apply_conv, base2fourier_features,
    resize_bilinear,
)


class CondInjection(nn.Module):
    """CSM: conv3x3 -> GN -> SiLU -> zero-init conv1x1 -> (scale, shift)
    FiLM injection (`models/sr3_dwt.py:376-396`).

    The whole branch producing (scale, shift) depends ONLY on `cond`. During
    sampling `cond` is constant across every NFE step, so the branch is
    loop-invariant in the sampler's `lax.scan`; `cond_only=True` computes
    just the (scale, shift) cache and `cached=` consumes it, hoisting the
    branch out of the scan (XLA does not do cross-iteration code motion).
    """
    hidden_dim: int
    groups: int = 32

    @nn.compact
    def __call__(self, x, cond, *, cached=None, cond_only: bool = False):
        if cached is not None:
            scale, shift = cached
        else:
            h = Conv(self.hidden_dim * 4, 3, use_bias=False,
                     name="body_conv1")(cond)
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name="body_norm")(h)
            h = nn.silu(h)
            h = nn.Conv(self.hidden_dim * 2, (1, 1), use_bias=True,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros, name="body_conv2")(h)
            scale, shift = jnp.split(h, 2, axis=-1)
        if cond_only:
            return (scale, shift)
        x = Conv(self.hidden_dim, 1, name="x_conv")(x)
        return x * (1 + scale) + shift


class FastAttnCondInjection(nn.Module):
    """FWM: linear cross-attention from the wavelet condition
    (`models/sr3_dwt.py:493-577`).

    q from x (depthwise3x3 + 1x1), k/v from cond; q softmax over the H axis,
    k softmax over the W axis (reference quirk — softmax is applied BEFORE
    flattening spatial dims, `:545-546`); c x c context matrix => cost linear
    in pixels, MXU-friendly (two small matmuls per head).
    """
    qkv_dim: int
    dim_out: int
    groups: int = 32
    nheads: int = 8
    drop_path_prob: float = 0.2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, cond, *, train: bool = False, cached=None,
                 cond_only: bool = False):
        """`cond_only=True` returns the c x c context matrix — the entire
        k/v branch (kv convs, k softmax, k.v^T) depends only on `cond` and
        is loop-invariant during sampling; `cached=` consumes it so the scan
        body only computes the q branch and the context.q product."""
        if cached is None:
            kv = Conv(cond.shape[-1], 3, use_bias=False,
                      feature_group_count=cond.shape[-1], name="kv_dw")(cond)
            kv = Conv(self.qkv_dim * 2, 1, name="kv_pw")(kv)
            k, v = jnp.split(kv, 2, axis=-1)
            # NHWC: W is axis 2 (reference softmaxes NCHW dim -1)
            k = jax.nn.softmax(k, axis=2)
        if cond_only:
            k = rearrange(k, "b H W (h d) -> b h d (H W)", h=self.nheads)
            v = rearrange(v, "b H W (h d) -> b h d (H W)", h=self.nheads)
            return jnp.einsum("bhdn,bhen->bhde", k, v)

        fea_dim = x.shape[-1]
        assert fea_dim % self.nheads == 0
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="prenorm_x")(x)

        q = Conv(fea_dim, 3, use_bias=False, feature_group_count=fea_dim,
                 name="q_dw")(x)
        q = Conv(self.qkv_dim, 1, name="q_pw")(q)
        # H is axis 1 (reference softmaxes NCHW dim -2)
        q = jax.nn.softmax(q, axis=1)

        scale = 1.0 / math.sqrt(self.qkv_dim // self.nheads)
        if cached is not None:
            context = cached
            q = rearrange(q, "b H W (h d) -> b h d (H W)",
                          h=self.nheads) * scale
            out = jnp.einsum("bhde,bhdn->bhen", context, q)
            out = rearrange(out, "b h d (H W) -> b H W (h d)", H=x.shape[1])
        elif self.use_pallas:
            from ..ops.pallas import fwm_linear_attention
            out = fwm_linear_attention(q * scale, k, v, self.nheads)
        else:
            q = rearrange(q, "b H W (h d) -> b h d (H W)",
                          h=self.nheads) * scale
            k = rearrange(k, "b H W (h d) -> b h d (H W)", h=self.nheads)
            v = rearrange(v, "b H W (h d) -> b h d (H W)", h=self.nheads)
            context = jnp.einsum("bhdn,bhen->bhde", k, v)
            out = jnp.einsum("bhde,bhdn->bhen", context, q)
            out = rearrange(out, "b h d (H W) -> b H W (h d)", H=x.shape[1])

        attn_out = Conv(self.dim_out, 1, name="attn_out")(out)
        if fea_dim != self.dim_out:
            attn_out = attn_out + Conv(self.dim_out, 1, name="attn_res")(x)
        else:
            attn_out = attn_out + x

        ffn = Conv(self.dim_out * 2, 3, use_bias=False, name="ffn_conv1")(
            attn_out)
        ffn = nn.silu(ffn)
        # ffn_conv2 (3x3, no bias) and ffn_conv3 (1x1) have no nonlinearity
        # between them, so compose their kernels at trace time and run ONE
        # conv — identical math, one fewer dispatched op per decoder block.
        k2, _ = ConvParams(self.dim_out, 3, use_bias=False,
                           name="ffn_conv2")(ffn.shape[-1])
        k3, b3 = ConvParams(self.dim_out, 1, name="ffn_conv3")(self.dim_out)
        kc = jnp.einsum("hwim,mo->hwio", k2, k3[0, 0])
        ffn = apply_conv(ffn, kc, b3)
        ffn = DropPath(self.drop_path_prob, name="ffn_drop_path")(
            ffn, train=train)
        return ffn + attn_out


class FreqCondInjection(nn.Module):
    """FFT amplitude/phase cross-attention variant
    (`models/sr3_dwt.py:399-490`) — present in the reference but unused by
    the engine config; kept for capability parity."""
    qkv_dim: int
    dim_out: int
    groups: int = 32
    nheads: int = 8
    drop_path_prob: float = 0.2

    def _attn_op(self, q, k, v):
        scale = 1.0 / math.sqrt(self.qkv_dim // self.nheads)
        b, h, xf, yf = q.shape[0], self.nheads, q.shape[1], q.shape[2]
        q, k, v = (rearrange(t, "b X Y (h c) -> b h c (X Y)", h=h)
                   for t in (q, k, v))
        sim = jnp.einsum("bhcm,bhcn->bhmn", q, k) * scale
        sim = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhmn,bhcn->bhcm", sim, v)
        return rearrange(out, "b h c (X Y) -> b X Y (h c)", X=xf, Y=yf)

    @nn.compact
    def __call__(self, x, cond, *, train: bool = False):
        fea_dim = x.shape[-1]
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="prenorm_x")(x)
        q = Conv(fea_dim, 3, use_bias=False, feature_group_count=fea_dim,
                 name="q_dw")(x)
        q = Conv(self.qkv_dim, 1, name="q_pw")(q)
        kv = Conv(cond.shape[-1], 3, use_bias=False,
                  feature_group_count=cond.shape[-1], name="kv_dw")(cond)
        kv = Conv(self.qkv_dim * 2, 1, name="kv_pw")(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        def l2norm(t):
            return t / jnp.sqrt(
                jnp.sum(t ** 2, axis=-1, keepdims=True) + 1e-12)

        q, k, v = l2norm(q), l2norm(k), l2norm(v)
        # rfft over spatial dims (NHWC axes 1, 2)
        qf = jnp.fft.rfft2(q, axes=(1, 2), norm="ortho")
        kf = jnp.fft.rfft2(k, axes=(1, 2), norm="ortho")
        vf = jnp.fft.rfft2(v, axes=(1, 2), norm="ortho")

        amp = self._attn_op(jnp.abs(qf), jnp.abs(kf), jnp.abs(vf))
        phase = self._attn_op(jnp.angle(qf), jnp.angle(kf), jnp.angle(vf))
        outf = amp * jnp.exp(1j * phase)
        out = jnp.fft.irfft2(outf, s=(x.shape[1], x.shape[2]), axes=(1, 2),
                             norm="ortho")

        attn_out = Conv(self.dim_out, 1, name="attn_out")(out)
        if fea_dim != self.dim_out:
            attn_out = attn_out + Conv(self.dim_out, 1, name="attn_res")(x)
        else:
            attn_out = attn_out + x
        ffn = Conv(self.dim_out * 2, 3, use_bias=False, name="ffn_conv1")(
            attn_out)
        ffn = nn.silu(ffn)
        ffn = Conv(self.dim_out, 3, use_bias=False, name="ffn_conv2")(ffn)
        ffn = Conv(self.dim_out, 1, name="ffn_conv3")(ffn)
        ffn = DropPath(self.drop_path_prob, name="ffn_drop_path")(
            ffn, train=train)
        return ffn + attn_out


class FastFreqCondInjection(nn.Module):
    """Linear attention computed in rFFT space
    (`/root/reference/models/sr3.py:483-567`) — unused by the engine config;
    kept for capability parity. q/k softmax over spatial axes, rfft2, c x c
    complex context, irfft2 back."""
    qkv_dim: int
    dim_out: int
    groups: int = 32
    nheads: int = 8
    drop_path_prob: float = 0.2

    @nn.compact
    def __call__(self, x, cond, *, train: bool = False):
        fea_dim = x.shape[-1]
        assert fea_dim % self.nheads == 0
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         name="prenorm_x")(x)
        q = Conv(fea_dim, 3, use_bias=False, feature_group_count=fea_dim,
                 name="q_dw")(x)
        q = Conv(self.qkv_dim, 1, name="q_pw")(q)
        kv = Conv(cond.shape[-1], 3, use_bias=False,
                  feature_group_count=cond.shape[-1], name="kv_dw")(cond)
        kv = Conv(self.qkv_dim * 2, 1, name="kv_pw")(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        q = jax.nn.softmax(q, axis=1)
        k = jax.nn.softmax(k, axis=2)

        qf = jnp.fft.rfft2(q, axes=(1, 2), norm="ortho")
        kf = jnp.fft.rfft2(k, axes=(1, 2), norm="ortho")
        vf = jnp.fft.rfft2(v, axes=(1, 2), norm="ortho")

        scale = 1.0 / math.sqrt(self.qkv_dim // self.nheads)
        xf, yf = qf.shape[1], qf.shape[2]
        qf, kf, vf = (rearrange(t, "b X Y (h d) -> b h d (X Y)",
                                h=self.nheads) for t in (qf, kf, vf))
        qf = qf * scale
        context = jnp.einsum("bhdn,bhen->bhde", kf, vf)
        outf = jnp.einsum("bhde,bhdn->bhen", context, qf)
        outf = rearrange(outf, "b h d (X Y) -> b X Y (h d)", X=xf, Y=yf)
        out = jnp.fft.irfft2(outf, s=(x.shape[1], x.shape[2]), axes=(1, 2),
                             norm="ortho")

        attn_out = Conv(self.dim_out, 1, name="attn_out")(out)
        if fea_dim != self.dim_out:
            attn_out = attn_out + Conv(self.dim_out, 1, name="attn_res")(x)
        else:
            attn_out = attn_out + x
        ffn = Conv(self.dim_out * 2, 3, use_bias=False, name="ffn_conv1")(
            attn_out)
        ffn = nn.silu(ffn)
        ffn = Conv(self.dim_out, 3, use_bias=False, name="ffn_conv2")(ffn)
        ffn = Conv(self.dim_out, 1, name="ffn_conv3")(ffn)
        ffn = DropPath(self.drop_path_prob, name="ffn_drop_path")(
            ffn, train=train)
        return ffn + attn_out


class WrappedCondInj(nn.Module):
    """Parallel CSM + FWM injection fused by a 1x1 conv
    (`models/sr3_dwt.py:580-611`) — present in the reference but unused by
    the engine config; kept for capability parity."""
    qkv_dim: int
    dim_out: int
    groups: int = 32
    nheads: int = 8
    ffn_drop_path: float = 0.2

    @nn.compact
    def __call__(self, x, cond, *, train: bool = False):
        rgb_out = CondInjection(hidden_dim=self.dim_out, groups=self.groups,
                                name="rgb_cond_inj")(x, cond)
        fft_out = FastAttnCondInjection(
            qkv_dim=self.qkv_dim, dim_out=self.dim_out, groups=self.groups,
            nheads=self.nheads, drop_path_prob=self.ffn_drop_path,
            name="fft_cond_inj")(x, cond, train=train)
        fuse = jnp.concatenate([rgb_out, fft_out], axis=-1)
        return Conv(self.dim_out, 1, name="to_out")(fuse)


class ResnetBlocWithAttn(nn.Module):
    """Cond injection (CSM encoder / FWM decoder) + ResnetBlock + optional
    self-attention (`models/sr3_dwt.py:614-673`)."""
    dim_out: int
    cond_dim: Optional[int] = None
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    encoder: bool = True
    use_pallas: bool = False
    fp8_attn: bool = False
    fp8_conv: bool = False   # e4m3 3x3 convs in the ResnetBlock

    @nn.compact
    def __call__(self, x, time_emb, cond=None, *, train: bool = False,
                 cond_cached=None, cond_only: bool = False,
                 x_channels: Optional[int] = None,
                 time_only: bool = False, time_cached=None):
        """`cond_only=True`: compute and return only this block's
        loop-invariant cond features ((scale, shift) for CSM, the context
        matrix for FWM); `x` may be None, FWM needs `x_channels` (the entry
        channel count) to size its kv projection. `cond_cached=` consumes a
        previously returned entry, skipping the cond branch.

        `time_only=True` returns the inner ResnetBlock's time-projection
        (kernel, bias) so the UNet can batch all blocks' projections into one
        matmul; `time_cached=` consumes the precomputed slice."""
        if time_only:
            return ResnetBlock(self.dim_out, dropout=self.dropout,
                               norm_groups=self.norm_groups,
                               use_pallas=self.use_pallas, name="res_block")(
                None, time_emb, time_only=True)
        if self.cond_dim is not None:
            # resize only if the caller didn't pre-resize (the UNet hoists
            # one resize per resolution out of the 52 per-block resizes the
            # reference does — identical math, resize is deterministic)
            if cond is None:
                c = None
            elif not cond_only and cond.shape[1:3] != x.shape[1:3]:
                c = resize_bilinear(cond, x.shape[1], x.shape[2])
            else:
                c = cond
            if self.encoder:
                inj = CondInjection(hidden_dim=self.dim_out,
                                    groups=self.norm_groups, name="cond_inj")
                if cond_only:
                    return inj(None, c, cond_only=True)
                x = inj(x, c, cached=cond_cached)
            else:
                inj = FastAttnCondInjection(
                    qkv_dim=(x_channels if cond_only else x.shape[-1]),
                    dim_out=self.dim_out,
                    groups=self.norm_groups, nheads=8, drop_path_prob=0.2,
                    use_pallas=self.use_pallas, name="cond_inj")
                if cond_only:
                    return inj(None, c, cond_only=True)
                x = inj(x, c, train=train, cached=cond_cached)
        elif cond_only:
            return None
        x = ResnetBlock(self.dim_out, dropout=self.dropout,
                        norm_groups=self.norm_groups,
                        use_pallas=self.use_pallas,
                        fp8_conv=self.fp8_conv, name="res_block")(
            x, time_emb, train=train, time_cached=time_cached)
        if self.with_attn:
            x = SelfAttention(n_head=8, norm_groups=self.norm_groups,
                              fp8=self.fp8_attn, name="attn")(x)
        return x


class UNetSR3DWT(nn.Module):
    """The engine's model config (`diffusion_engine.py:121-133`):
    inner_channel=32, norm_groups=1, channel_mults=(1,2,2,4), attn_res=(8,),
    res_blocks=3, dropout=0.2, self_condition=True.

    cond layout (NHWC last axis): [lms(C), pan(P), lms_LL(C), pan_H(P),
    pan_D(P), pan_V(P)]; encoder slice = first C+P channels, decoder slice =
    last C+3P channels (`models/sr3_dwt.py:196-198,212-215`).
    """
    in_channel: int = 8
    out_channel: int = 3
    inner_channel: int = 32
    lms_channel: int = 8
    pan_channel: int = 1
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_noise_level_emb: bool = True
    image_size: int = 128
    self_condition: bool = False
    fourier_features: bool = False
    fourier_min: int = 7
    fourier_max: int = 8
    fourier_step: int = 1
    pred_var: bool = False
    use_pallas: bool = False
    fp8_attn: bool = False   # e4m3 Q/K/V in the flash-attention path
    fp8_conv: bool = False   # e4m3 3x3 convs in every ResnetBlock (the
                             # model's FLOP bulk) — 2x MXU rate on v6e+,
                             # identical param tree, ~2% quantization
                             # error (ops/fp8_conv.py; PERF.md)

    @nn.compact
    def __call__(self, x, time, cond=None, self_cond=None, *,
                 train: bool = False, cond_cache=None,
                 cond_only: bool = False,
                 cache_max_res: Optional[int] = None):
        """`cond_only=True` (x/time may be None): compute and return the
        pytree of loop-invariant cond features — every CSM (scale, shift)
        and every FWM context matrix. During sampling these are constant
        across all NFE steps, so computing them once OUTSIDE the sampler's
        `lax.scan` and passing them back via `cond_cache=` removes the whole
        cond-processing tree (~40% of the ops) from every step. Numerics are
        identical; tests assert bit-equality.

        `cache_max_res=` (cond_only mode): encoder blocks at resolutions
        ABOVE this get a `None` cache entry instead of their (scale, shift)
        pair — trade recompute-in-scan for HBM headroom at large tiles.
        Consuming a partial cache requires passing `cond=` to the forward
        as well (the evicted blocks read it); decoder FWM entries are c x c
        context matrices (tiny) and are always cached.
        """
        enc_cond_dim = self.lms_channel + self.pan_channel
        dec_cond_dim = self.lms_channel + self.pan_channel * 3
        cond_enc = cond[..., :enc_cond_dim] if cond is not None else None
        cond_dec = cond[..., -dec_cond_dim:] if cond is not None else None

        num_mults = len(self.channel_mults)

        # hoisted cond pyramid: one bilinear resize per UNet resolution
        # instead of one per block (reference: `models/sr3_dwt.py:661-663`)
        cond_pyr = {}
        if cond is not None:
            h0, w0 = cond.shape[1], cond.shape[2]
            for lvl in range(num_mults):
                hl, wl = h0 // (2 ** lvl), w0 // (2 ** lvl)
                cond_pyr[hl] = (
                    cond_enc if hl == cond_enc.shape[1]
                    else resize_bilinear(cond_enc, hl, wl),
                    cond_dec if hl == cond_dec.shape[1]
                    else resize_bilinear(cond_dec, hl, wl),
                )

        # ---- static stage walk (resolutions, skip channels) -------------
        # enc_specs: (ind, blk, channel_mult, use_attn)
        # dec_specs: (ind, blk, channel_mult, use_attn, in_channels)
        enc_specs, dec_specs = [], []
        now_res = self.image_size
        feat_channels_sim = [self.inner_channel]
        pre_channel = self.inner_channel
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for blk in range(self.res_blocks):
                enc_specs.append((ind, blk, channel_mult, use_attn))
                feat_channels_sim.append(channel_mult)
                pre_channel = channel_mult
            if not is_last:
                feat_channels_sim.append(pre_channel)
                now_res //= 2
        mid_channel = pre_channel
        fc = list(feat_channels_sim)
        cur = pre_channel
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for blk in range(self.res_blocks + 1):
                dec_specs.append(
                    (ind, blk, channel_mult, use_attn, cur + fc.pop()))
                cur = channel_mult
            if not is_last:
                now_res *= 2

        # one module instance per block, shared by the cond_only / batched-
        # time / forward passes (flax module sharing keeps one param scope)
        enc_mods = {
            (ind, blk): ResnetBlocWithAttn(
                dim_out=cm, cond_dim=enc_cond_dim,
                norm_groups=self.norm_groups, dropout=self.dropout,
                with_attn=ua, encoder=True, use_pallas=self.use_pallas,
                fp8_conv=self.fp8_conv,
                fp8_attn=self.fp8_attn, name=f"down_{ind}_{blk}")
            for (ind, blk, cm, ua) in enc_specs}
        dec_mods = {
            (ind, blk): ResnetBlocWithAttn(
                dim_out=cm, cond_dim=dec_cond_dim,
                norm_groups=self.norm_groups, dropout=self.dropout,
                with_attn=ua, encoder=False, use_pallas=self.use_pallas,
                fp8_conv=self.fp8_conv,
                fp8_attn=self.fp8_attn, name=f"up_{ind}_{blk}")
            for (ind, blk, cm, ua, _) in dec_specs}
        mid0 = ResnetBlocWithAttn(
            dim_out=mid_channel, norm_groups=self.norm_groups,
            dropout=self.dropout, with_attn=True,
            use_pallas=self.use_pallas, fp8_attn=self.fp8_attn,
            fp8_conv=self.fp8_conv,
            name="mid_0")
        mid1 = ResnetBlocWithAttn(
            dim_out=mid_channel, norm_groups=self.norm_groups,
            dropout=self.dropout, with_attn=False,
            use_pallas=self.use_pallas, fp8_conv=self.fp8_conv,
            name="mid_1")

        if cond_only:
            assert cond is not None
            h0 = cond.shape[1]
            cache = {"enc": [], "dec": []}
            div = 1
            for (ind, blk, cm, _ua) in enc_specs:
                if cache_max_res is not None and h0 // div > cache_max_res:
                    # cond-cache eviction for HBM headroom at large tiles:
                    # a full-res CSM (scale, shift) pair is B*H*W*C twice
                    # per block (e.g. 512px b12: 6 x 1 GB padded, held live
                    # across the whole sampling scan); a None entry makes
                    # the forward recompute this block's cond branch
                    # in-scan from `cond` instead (numerics identical,
                    # ~8% extra FLOPs/NFE at 512px)
                    cache["enc"].append(None)
                else:
                    cache["enc"].append(enc_mods[(ind, blk)](
                        None, None, cond_pyr[h0 // div][0], cond_only=True))
                if blk == self.res_blocks - 1 and ind != num_mults - 1:
                    div *= 2
            for (ind, blk, cm, _ua, in_ch) in dec_specs:
                cache["dec"].append(dec_mods[(ind, blk)](
                    None, None, cond_pyr[h0 // div][1], cond_only=True,
                    x_channels=in_ch))
                if blk == self.res_blocks and ind != 0:
                    div //= 2
            return cache

        fold_self = (self.self_condition and self_cond is None
                     and not self.fourier_features)
        if self.self_condition and not fold_self:
            if self_cond is None:
                self_cond = x
            x = jnp.concatenate([self_cond, x], axis=-1)
        if self.fourier_features:
            x = jnp.concatenate(
                [x, base2fourier_features(x, self.fourier_min,
                                          self.fourier_max,
                                          self.fourier_step)], axis=-1)

        t = (NoiseLevelMLP(self.inner_channel, name="noise_level_mlp")(time)
             if self.with_noise_level_emb else None)

        # ---- batched time projections -----------------------------------
        # every ResnetBlock projects the SAME t embedding through its own
        # small dense; concatenate all kernels and run ONE matmul per step
        # (~30 dispatched ops -> 1), then hand each block its slice.
        time_slices = {"enc": iter(()), "mid": iter(()), "dec": iter(())}
        if t is not None:
            kbs, labels = [], []
            for (ind, blk, _cm, _ua) in enc_specs:
                kbs.append(enc_mods[(ind, blk)](None, t, time_only=True))
                labels.append("enc")
            for mod in (mid0, mid1):
                kbs.append(mod(None, t, time_only=True))
                labels.append("mid")
            for (ind, blk, _cm, _ua, _ic) in dec_specs:
                kbs.append(dec_mods[(ind, blk)](None, t, time_only=True))
                labels.append("dec")
            kmat = jnp.concatenate([k for k, _ in kbs], axis=1)
            bvec = jnp.concatenate([b for _, b in kbs], axis=0)
            proj = t @ kmat.astype(t.dtype) + bvec.astype(t.dtype)
            grouped = {"enc": [], "mid": [], "dec": []}
            off = 0
            for (k, _), lab in zip(kbs, labels):
                grouped[lab].append(proj[:, off:off + k.shape[1]])
                off += k.shape[1]
            time_slices = {g: iter(v) for g, v in grouped.items()}

        # --- encoder ---------------------------------------------------
        # self_cond defaults to x itself (`models/sr3_dwt.py:171-174`), so
        # when no estimate is provided conv(concat([x, x])) == conv with the
        # kernel input-halves summed — skips the concat and halves the head
        # conv's FLOPs (bit-identical up to float reassociation)
        head_in = x.shape[-1] * (2 if fold_self else 1)
        kh, bh = ConvParams(self.inner_channel, 3, name="head_conv")(head_in)
        if fold_self:
            kh = kh[:, :, :x.shape[-1]] + kh[:, :, x.shape[-1]:]
        x = apply_conv(x, kh, bh)

        enc_cache = (iter(cond_cache["enc"]) if cond_cache is not None
                     else None)
        dec_cache = (iter(cond_cache["dec"]) if cond_cache is not None
                     else None)

        feats = [x]
        for (ind, blk, channel_mult, _ua) in enc_specs:
            x = enc_mods[(ind, blk)](
                x, t, cond_pyr[x.shape[1]][0] if cond is not None else None,
                train=train,
                cond_cached=(next(enc_cache) if enc_cache is not None
                             else None),
                time_cached=next(time_slices["enc"], None))
            feats.append(x)
            if blk == self.res_blocks - 1 and ind != num_mults - 1:
                x = Downsample(channel_mult, name=f"downsample_{ind}")(x)
                feats.append(x)

        # --- middle -----------------------------------------------------
        x = mid0(x, t, train=train,
                 time_cached=next(time_slices["mid"], None))
        x = mid1(x, t, train=train,
                 time_cached=next(time_slices["mid"], None))

        # --- decoder ----------------------------------------------------
        for (ind, blk, channel_mult, _ua, _ic) in dec_specs:
            skip = feats.pop()
            x = dec_mods[(ind, blk)](
                jnp.concatenate([x, skip], axis=-1), t,
                cond_pyr[x.shape[1]][1] if cond is not None else None,
                train=train,
                cond_cached=(next(dec_cache) if dec_cache is not None
                             else None),
                time_cached=next(time_slices["dec"], None))
            if blk == self.res_blocks and ind != 0:
                x = Upsample(channel_mult, name=f"upsample_{ind}")(x)

        return Block(self.out_channel, groups=self.norm_groups,
                     use_pallas=self.use_pallas,
                     name="final_conv")(x, train=train)
