"""Shared UNet building blocks (flax.linen, NHWC).

Re-designed TPU-first from the reference blocks in
`/root/reference/models/sr3_dwt.py:222-360` — everything is channel-last so
convs/matmuls tile cleanly onto the MXU, and initialization matches PyTorch's
defaults (kaiming-uniform, a=sqrt(5)) so training dynamics are comparable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# Initializers matching torch defaults (uniform(-1/sqrt(fan_in), +...)).
# ---------------------------------------------------------------------------

def torch_kernel_init(key, shape, dtype=jnp.float32):
    """Conv kernel (kh, kw, in, out) or Dense kernel (in, out)."""
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """3x3/1x1 conv with torch-style explicit padding and init.

    Explicit ((1,1),(1,1)) padding (not XLA 'SAME') so strided convs sample
    the same positions as torch's Conv2d(padding=1).
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    feature_group_count: int = 1
    # e4m3-quantized operands via 9 shifted fp8 GEMMs (ops/fp8_conv.py):
    # identical param tree, ~2% relative quantization error, 2x MXU rate
    # on fp8-native TPUs (v6e+); upcast (no speedup) elsewhere. Opt-in.
    fp8: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        pad = (self.kernel_size - 1) // 2
        fan_in = (self.kernel_size ** 2) * (in_ch // self.feature_group_count)
        if self.fp8 and self.feature_group_count == 1:
            from ..ops.fp8_conv import fp8_conv

            class _P(nn.Module):
                """Same param names/shapes/init as nn.Conv(name='conv')."""
                @nn.compact
                def __call__(s):
                    kernel = s.param(
                        "kernel", torch_kernel_init,
                        (self.kernel_size, self.kernel_size, in_ch,
                         self.features))
                    bias = (s.param("bias", torch_bias_init(fan_in),
                                    (self.features,))
                            if self.use_bias else None)
                    return kernel, bias

            kernel, bias = _P(name="conv")()
            return fp8_conv(x, kernel, bias, stride=self.stride)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            name="conv",
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(
            features=self.features, use_bias=self.use_bias,
            kernel_init=torch_kernel_init, bias_init=torch_bias_init(fan_in),
            name="dense")(x)


class _ConvParamsInner(nn.Module):
    """Declares conv kernel/bias params under the standard `conv` child so
    the param-tree layout stays identical to `Conv` (checkpoint converters
    keep working) while the caller applies the conv manually — used to fuse
    adjacent convs by composing their kernels at trace time."""
    features: int
    kernel_size: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_ch: int):
        fan_in = (self.kernel_size ** 2) * in_ch
        kernel = self.param(
            "kernel", torch_kernel_init,
            (self.kernel_size, self.kernel_size, in_ch, self.features))
        bias = (self.param("bias", torch_bias_init(fan_in), (self.features,))
                if self.use_bias else None)
        return kernel, bias


class ConvParams(nn.Module):
    """Param-only stand-in for `Conv`: same tree layout (`<name>/conv/...`),
    returns (kernel, bias) instead of applying."""
    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_ch: int):
        return _ConvParamsInner(self.features, self.kernel_size,
                                self.use_bias, name="conv")(in_ch)


class _DenseParamsInner(nn.Module):
    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", torch_kernel_init,
                            (in_dim, self.features))
        bias = (self.param("bias", torch_bias_init(in_dim), (self.features,))
                if self.use_bias else None)
        return kernel, bias


class DenseParams(nn.Module):
    """Param-only stand-in for `Dense`: same tree layout
    (`<name>/dense/...`), returns (kernel, bias)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        return _DenseParamsInner(self.features, self.use_bias,
                                 name="dense")(in_dim)


def apply_conv(x, kernel, bias=None, stride: int = 1):
    """Apply an NHWC conv from raw (kh, kw, in, out) weights with the same
    explicit torch-style padding as `Conv`."""
    pad = (kernel.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def swish(x):
    return x * jax.nn.sigmoid(x)


def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) equivalent
    (half-pixel centers, no antialias) — used to bring `cond` to each UNet
    stage's resolution (`models/sr3_dwt.py:661-663`)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, h, w, c), method="bilinear",
                            antialias=False)


def resize_nearest(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c),
                            method="nearest")


class PositionalEncoding(nn.Module):
    """WaveGrad-style noise-level encoding (`models/sr3_dwt.py:223-238`)."""
    dim: int

    @nn.compact
    def __call__(self, noise_level):
        count = self.dim // 2
        step = jnp.arange(count, dtype=jnp.float32) / count
        enc = (noise_level.astype(jnp.float32)[:, None]
               * jnp.exp(-math.log(1e4) * step[None, :]))
        return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class NoiseLevelMLP(nn.Module):
    """PositionalEncoding -> Linear(4x) -> Swish -> Linear
    (`models/sr3_dwt.py:58-64`)."""
    dim: int

    @nn.compact
    def __call__(self, t):
        h = PositionalEncoding(self.dim, name="pos_enc")(t)
        h = Dense(self.dim * 4, name="lin1")(h)
        h = swish(h)
        h = Dense(self.dim, name="lin2")(h)
        return h


class FeatureWiseAffine(nn.Module):
    """Add (or FiLM) the time embedding into a feature map
    (`models/sr3_dwt.py:241-258`).

    `params_only=True` returns the projection's (kernel, bias) so the parent
    UNet can batch every block's time projection into ONE matmul per step
    (the embeddings are identical across blocks); `cached=` consumes the
    parent's precomputed (b, out) slice. Param-tree layout is unchanged.
    """
    out_channels: int
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x, noise_embed, *, params_only: bool = False,
                 cached=None):
        mult = 2 if self.use_affine_level else 1
        k, b = DenseParams(self.out_channels * mult, name="noise_func")(
            noise_embed.shape[-1])
        if params_only:
            return k, b
        if cached is not None:
            h = cached
        else:
            h = noise_embed @ k.astype(noise_embed.dtype) \
                + b.astype(noise_embed.dtype)
        h = h[:, None, None, :]
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1 + gamma) * x + beta
        return x + h


class _GNParams(nn.Module):
    """Creates GroupNorm-compatible scale/bias params (same tree layout as
    nn.GroupNorm) for use with the fused Pallas kernel."""
    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class Block(nn.Module):
    """GroupNorm -> Swish -> (Dropout) -> Conv3x3 (`models/sr3_dwt.py:288-300`).

    use_pallas=True (valid only with groups=1) fuses GN+Swish into one
    VMEM-resident Pallas pass; param layout is unchanged.
    """
    dim_out: int
    groups: int = 32
    dropout: float = 0.0
    use_pallas: bool = False
    fp8_conv: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.use_pallas and self.groups == 1:
            from ..ops.pallas import fused_groupnorm_swish
            scale, bias = _GNParams(x.shape[-1], name="norm")()
            h = fused_groupnorm_swish(x, scale, bias)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name="norm")(x)
            h = swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train,
                           name="drop")(h)
        return Conv(self.dim_out, 3, fp8=self.fp8_conv, name="conv")(h)


class ResnetBlock(nn.Module):
    """Two Blocks + time-embedding injection + skip conv
    (`models/sr3_dwt.py:303-327`)."""
    dim_out: int
    dropout: float = 0.0
    use_affine_level: bool = False
    norm_groups: int = 32
    use_pallas: bool = False
    fp8_conv: bool = False   # e4m3 3x3 convs in both Blocks (the model's
                             # FLOP bulk); the 1x1 res_conv stays full-prec

    @nn.compact
    def __call__(self, x, time_emb, *, train: bool = False,
                 time_only: bool = False, time_cached=None):
        fwa = FeatureWiseAffine(self.dim_out, self.use_affine_level,
                                name="noise_func")
        if time_only:
            return fwa(None, time_emb, params_only=True)
        h = Block(self.dim_out, groups=self.norm_groups,
                  use_pallas=self.use_pallas, fp8_conv=self.fp8_conv,
                  name="block1")(x, train=train)
        h = fwa(h, time_emb, cached=time_cached)
        h = Block(self.dim_out, groups=self.norm_groups,
                  dropout=self.dropout, use_pallas=self.use_pallas,
                  fp8_conv=self.fp8_conv, name="block2")(h, train=train)
        if x.shape[-1] != self.dim_out:
            x = Conv(self.dim_out, 1, name="res_conv")(x)
        return h + x


class SelfAttention(nn.Module):
    """Full HW x HW self-attention; only ever instantiated at 8x8 feature
    maps in this model family (`models/sr3_dwt.py:330-360`).

    Parity note: scores are scaled by 1/sqrt(total_channels), not
    1/sqrt(head_dim), matching the reference.
    """
    n_head: int = 1
    norm_groups: int = 32
    # token count above which the full (HW x HW) score matrix (GBs of HBM at
    # 64x64 feature maps / 512px inputs) is avoided: on TPU a Pallas kernel
    # keeps each query block's score rows VMEM-resident (~20% of the whole
    # UNet forward saved at 512px, see PERF.md); elsewhere a lax.scan over
    # query chunks bounds peak memory at O(HW * chunk). Both keep softmax
    # rows complete.
    chunk_tokens: int = 512
    # e4m3-quantized Q/K/V in the flash path: halves the operand HBM
    # traffic (and runs the dots at fp8 rate on fp8-native MXUs); softmax
    # and accumulation stay f32 in VMEM. Opt-in — see PERF.md for the
    # measured numerics/throughput trade.
    fp8: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        head_dim = c // self.n_head
        norm = nn.GroupNorm(num_groups=self.norm_groups, epsilon=1e-5,
                            name="norm")(x)
        qkv = Conv(c * 3, 1, use_bias=False, name="qkv")(norm)
        qkv = qkv.reshape(b, h * w, self.n_head, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # (b, hw, n_head, head_dim)
        tokens = h * w
        flash_ok = (tokens > self.chunk_tokens and tokens % 256 == 0
                    and jax.default_backend() in ("tpu", "axon"))
        if self.fp8 and not flash_ok:
            # fp8 only exists in the Pallas flash path; anywhere else the
            # flag would silently measure the plain path (ADVICE r3)
            import warnings
            warnings.warn(
                f"SelfAttention(fp8=True) has no effect here (tokens="
                f"{tokens}, backend={jax.default_backend()}): the fp8 "
                "path needs the TPU flash-attention gate (tokens > "
                f"{self.chunk_tokens}, tokens % 256 == 0) — running the "
                "non-fp8 path", stacklevel=2)
        if flash_ok:
            from ..ops.pallas import flash_attention, fp8_flash_attention
            attn_fn = fp8_flash_attention if self.fp8 else flash_attention
            out = attn_fn(q, k, v, 1.0 / math.sqrt(c))
            out = out.reshape(b, h, w, c)
        elif tokens > self.chunk_tokens and tokens % self.chunk_tokens == 0:
            n_ch = tokens // self.chunk_tokens
            qs = q.reshape(b, n_ch, self.chunk_tokens, self.n_head,
                           head_dim).transpose(1, 0, 2, 3, 4)

            def chunk(_, qi):
                a = jnp.einsum("bqnd,bknd->bnqk", qi, k) / math.sqrt(c)
                a = jax.nn.softmax(a, axis=-1)
                return None, jnp.einsum("bnqk,bknd->bqnd", a, v)

            _, outs = jax.lax.scan(chunk, None, qs)
            out = outs.transpose(1, 0, 2, 3, 4).reshape(b, h, w, c)
        else:
            attn = jnp.einsum("bqnd,bknd->bnqk", q, k) / math.sqrt(c)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bnqk,bknd->bqnd", attn, v)
            out = out.reshape(b, h, w, c)
        out = Conv(c, 1, name="out")(out)
        return out + x


class Downsample(nn.Module):
    """Strided 3x3 conv (`models/sr3_dwt.py:276-282`)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        return Conv(self.dim, 3, stride=2, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + conv3x3 (`models/sr3_dwt.py:266-273`)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        return Conv(self.dim, 3, name="conv")(resize_nearest(x, 2))


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics: keep-prob
    scaling, mask on the batch axis)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng("dropout")
        mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, 1, 1))
        return x * mask.astype(x.dtype) / keep


def base2fourier_features(x: jnp.ndarray, freq_start=7, freq_stop=8,
                          step=1) -> jnp.ndarray:
    """Optional fourier input features (`models/sr3_dwt.py:14-27`), NHWC."""
    freqs = list(range(freq_start, freq_stop, step))
    w = jnp.asarray([2.0 ** f * 2 * math.pi for f in freqs], dtype=x.dtype)
    # channel-interleave like torch repeat_interleave on the channel axis
    h = jnp.repeat(x, len(freqs), axis=-1)
    w_full = jnp.tile(w, x.shape[-1])
    h = h * w_full[None, None, None, :]
    return jnp.concatenate([jnp.sin(h), jnp.cos(h)], axis=-1)
