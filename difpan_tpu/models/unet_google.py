"""Concat-conditioning UNet ("google" variant) with feature-map capture.

TPU-native re-design of `/root/reference/models/unet_model_google.py:211-433`:

  * condition is concatenated onto the input (`:338-344`), optionally with an
    `AttentiveGuide` multiplicative guidance per encoder stage (`:62-69,
    :352-360`);
  * self-conditioning default is ZEROS here (`:334`), unlike the SR3 variants;
  * the reference captures decoder (Upsample) feature maps through forward
    hooks + mutable flags (`:72-81, :389-433`, paired with
    `utils/model_hook.py`); the idiomatic-JAX equivalent is a pure
    ``capture_fms=True`` argument that returns the feature maps as an
    auxiliary output pytree — no hooks, no mutation, jit-friendly.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import (
    Block, Conv, Dense, Downsample, SelfAttention, Upsample, swish,
)


class TimeEmbedding(nn.Module):
    """Sinusoidal embedding (`unet_model_google.py:40-54`)."""
    dim: int

    @nn.compact
    def __call__(self, t):
        inv_freq = jnp.exp(
            jnp.arange(0, self.dim, 2, dtype=jnp.float32)
            * (-math.log(10000) / self.dim))
        sin_in = t.astype(jnp.float32)[:, None] * inv_freq[None, :]
        return jnp.concatenate([jnp.sin(sin_in), jnp.cos(sin_in)], axis=-1)


class TimeMLP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t):
        h = TimeEmbedding(self.dim, name="emb")(t)
        h = Dense(self.dim * 4, name="lin1")(h)
        h = swish(h)
        h = Dense(self.dim, name="lin2")(h)
        return h


class LayerNorm2d(nn.Module):
    """Channel LayerNorm on NHWC (torch applies LN over the channel axis of
    a permuted BCHW tensor, `unet_model_google.py:21-34` — NHWC is the
    natural layout here)."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=1e-5, name="ln")(x)


class AttentiveGuide(nn.Module):
    """x' = LN(x) * LN(g) * x  (`unet_model_google.py:62-69`)."""

    @nn.compact
    def __call__(self, x, g):
        return (LayerNorm2d(name="norm1")(x) * LayerNorm2d(name="norm2")(g)
                * x)


class GoogleResnetBlock(nn.Module):
    """ResnetBlock with Swish->Linear time MLP and optional attentive
    guidance (`unet_model_google.py:112-142`)."""
    dim_out: int
    dropout: float = 0.0
    norm_groups: int = 32
    attn_guide: bool = False

    @nn.compact
    def __call__(self, x, time_emb, guidance=None, *, train: bool = False):
        h = Block(self.dim_out, groups=self.norm_groups, name="block1")(
            x, train=train)
        if time_emb is not None:
            h = h + Dense(self.dim_out, name="mlp")(
                swish(time_emb))[:, None, None, :]
        if guidance is not None and self.attn_guide:
            h = AttentiveGuide(name="atten_guide")(h, guidance)
        h = Block(self.dim_out, groups=self.norm_groups,
                  dropout=self.dropout, name="block2")(h, train=train)
        if x.shape[-1] != self.dim_out:
            x = Conv(self.dim_out, 1, name="res_conv")(x)
        return h + x


class GoogleResnetBlocWithAttn(nn.Module):
    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    attn_guide: bool = False

    @nn.compact
    def __call__(self, x, time_emb, guidance=None, *, train: bool = False):
        x = GoogleResnetBlock(
            self.dim_out, dropout=self.dropout, norm_groups=self.norm_groups,
            attn_guide=self.attn_guide, name="res_block")(
            x, time_emb, guidance, train=train)
        if self.with_attn:
            x = SelfAttention(n_head=8, norm_groups=self.norm_groups,
                              name="attn")(x)
        return x


class UNetGoogle(nn.Module):
    """`unet_model_google.py:211-377`. ``cond`` may be a tensor (concat) or a
    (concat_tensor, guidance_list) tuple; ``capture_fms=True`` additionally
    returns the decoder Upsample outputs (hook-free fm capture)."""
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_time_emb: bool = True
    image_size: int = 128
    self_condition: bool = False

    @nn.compact
    def __call__(self, x, time, cond=None, self_cond=None, *,
                 train: bool = False, capture_fms: bool = False):
        if self.self_condition:
            if self_cond is None:
                self_cond = jnp.zeros_like(x)  # quirk: zeros, not x (:334)
            x = jnp.concatenate([self_cond, x], axis=-1)

        guidance = None
        if cond is not None:
            if isinstance(cond, (tuple, list)) and len(cond) == 2:
                x = jnp.concatenate([cond[0], x], axis=-1)
                guidance = cond[1]
            else:
                x = jnp.concatenate([cond, x], axis=-1)

        t = (TimeMLP(self.inner_channel, name="time_mlp")(time)
             if self.with_time_emb else None)

        num_mults = len(self.channel_mults)
        now_res = self.image_size

        x = Conv(self.inner_channel, 3, name="head_conv")(x)
        feats = [x]
        pre_channel = self.inner_channel
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            gs = guidance[ind] if guidance is not None else None
            for blk in range(self.res_blocks):
                x = GoogleResnetBlocWithAttn(
                    dim_out=channel_mult, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=use_attn,
                    attn_guide=True, name=f"down_{ind}_{blk}")(
                    x, t, gs, train=train)
                feats.append(x)
                pre_channel = channel_mult
            if not is_last:
                x = Downsample(pre_channel, name=f"downsample_{ind}")(x)
                feats.append(x)
                now_res //= 2

        x = GoogleResnetBlocWithAttn(
            dim_out=pre_channel, norm_groups=self.norm_groups,
            dropout=self.dropout, with_attn=True, name="mid_0")(
            x, t, train=train)
        x = GoogleResnetBlocWithAttn(
            dim_out=pre_channel, norm_groups=self.norm_groups,
            dropout=self.dropout, with_attn=False, name="mid_1")(
            x, t, train=train)

        captured = []
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for blk in range(self.res_blocks + 1):
                skip = feats.pop()
                x = GoogleResnetBlocWithAttn(
                    dim_out=channel_mult, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=use_attn,
                    name=f"up_{ind}_{blk}")(
                    jnp.concatenate([x, skip], axis=-1), t, train=train)
            if not is_last:
                x = Upsample(channel_mult, name=f"upsample_{ind}")(x)
                captured.append(x)
                now_res *= 2

        out = Block(self.out_channel, groups=self.norm_groups,
                    name="final_conv")(x, train=train)
        if capture_fms:
            return out, captured
        return out
