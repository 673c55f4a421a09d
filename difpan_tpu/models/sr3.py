"""Plain UNetSR3 — single condition channel set, CSM-only injection in the
encoder, no conditioning in the decoder.

TPU-native re-design of `/root/reference/models/sr3.py:30-207`; shares all
blocks with the DWT variant (`.sr3_dwt` / `.common`).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import (
    Block, Conv, Downsample, NoiseLevelMLP, Upsample, base2fourier_features,
)
from .sr3_dwt import ResnetBlocWithAttn


class UNetSR3(nn.Module):
    """Reference defaults (`models/sr3.py:31-50`). cond is injected whole
    (``cond_channel`` channels) into every encoder ResBlock; decoder blocks
    are unconditioned (`models/sr3.py:185-203`)."""
    in_channel: int = 8
    out_channel: int = 3
    inner_channel: int = 32
    cond_channel: int = 8
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

    @nn.compact
    def __call__(self, x, time, cond=None, self_cond=None, *,
                 train: bool = False):
        if self.self_condition:
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

        num_mults = len(self.channel_mults)
        now_res = self.image_size

        x = Conv(self.inner_channel, 3, name="head_conv")(x)
        feats = [x]
        pre_channel = self.inner_channel
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for blk in range(self.res_blocks):
                x = ResnetBlocWithAttn(
                    dim_out=channel_mult, cond_dim=self.cond_channel,
                    norm_groups=self.norm_groups, dropout=self.dropout,
                    with_attn=use_attn, encoder=True,
                    name=f"down_{ind}_{blk}")(x, t, cond, train=train)
                feats.append(x)
                pre_channel = channel_mult
            if not is_last:
                x = Downsample(pre_channel, name=f"downsample_{ind}")(x)
                feats.append(x)
                now_res //= 2

        x = ResnetBlocWithAttn(
            dim_out=pre_channel, norm_groups=self.norm_groups,
            dropout=self.dropout, with_attn=True, name="mid_0")(
            x, t, train=train)
        x = ResnetBlocWithAttn(
            dim_out=pre_channel, norm_groups=self.norm_groups,
            dropout=self.dropout, with_attn=False, name="mid_1")(
            x, t, train=train)

        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in self.attn_res
            channel_mult = self.inner_channel * self.channel_mults[ind]
            for blk in range(self.res_blocks + 1):
                skip = feats.pop()
                x = ResnetBlocWithAttn(
                    dim_out=channel_mult, norm_groups=self.norm_groups,
                    dropout=self.dropout, with_attn=use_attn,
                    name=f"up_{ind}_{blk}")(
                    jnp.concatenate([x, skip], axis=-1), t, train=train)
            if not is_last:
                x = Upsample(channel_mult, name=f"upsample_{ind}")(x)
                now_res *= 2

        return Block(self.out_channel, groups=self.norm_groups,
                     name="final_conv")(x, train=train)
