"""Pallas kernels in interpreter mode (CPU): numerics vs the reference jnp
formulations."""
import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from difpan_tpu.ops.pallas import fused_groupnorm_swish, fwm_linear_attention


def test_fused_gn_swish_matches_flax():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

    gn = nn.GroupNorm(num_groups=1, epsilon=1e-5)
    ref_vars = {"params": {"scale": scale, "bias": bias}}
    ref = gn.apply(ref_vars, x)
    ref = ref * jax.nn.sigmoid(ref)

    out = fused_groupnorm_swish(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fwm_linear_attention_matches_einsum():
    rng = np.random.default_rng(1)
    b, h, w, heads, d = 2, 8, 16, 4, 8
    c = heads * d
    q = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))

    qf = rearrange(q, "b H W (h d) -> b h d (H W)", h=heads)
    kf = rearrange(k, "b H W (h d) -> b h d (H W)", h=heads)
    vf = rearrange(v, "b H W (h d) -> b h d (H W)", h=heads)
    context = jnp.einsum("bhdn,bhen->bhde", kf, vf)
    ref = jnp.einsum("bhde,bhdn->bhen", context, qf)
    ref = rearrange(ref, "b h d (H W) -> b H W (h d)", H=h)

    out = fwm_linear_attention(q, k, v, heads, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-5)


def test_fwm_linear_attention_uneven_tile():
    """tile larger than HW or not dividing it gets adjusted internally."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 4, 6, 8)).astype(np.float32))
    out = fwm_linear_attention(q, q, q, 2, tile=4096, interpret=True)
    assert out.shape == (1, 4, 6, 8)


def test_unet_pallas_path_matches_xla():
    """Full UNetSR3DWT with use_pallas=True (interpret mode on CPU) matches
    the XLA path, with identical parameter trees."""
    from difpan_tpu.models import UNetSR3DWT

    def build(use_pallas):
        return UNetSR3DWT(
            in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
            inner_channel=8, norm_groups=1, channel_mults=(1, 2),
            attn_res=(16,), res_blocks=1, dropout=0.0, image_size=32,
            self_condition=True, use_pallas=use_pallas)

    x = jnp.ones((1, 32, 32, 4)) * 0.3
    cond = jnp.ones((1, 32, 32, 12)) * 0.1
    t = jnp.array([5])
    net_ref = build(False)
    net_pl = build(True)
    params = net_ref.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                          train=False)["params"]
    params_pl = net_pl.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                            train=False)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_pl))
    y_ref = net_ref.apply({"params": params}, x, t, cond, train=False)
    y_pl = net_pl.apply({"params": params}, x, t, cond, train=False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=5e-5)


def test_flash_attention_matches_full_softmax():
    """VMEM-resident attention kernel (interpret mode off-TPU) vs the plain
    full-score softmax at a large token count."""
    from difpan_tpu.ops.pallas import flash_attention

    b, n, h, d = 2, 512, 4, 8
    c = h * d
    key = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(kk, (b, n, h, d))
               for kk in jax.random.split(key, 3))
    scale = 1.0 / np.sqrt(c)
    ref_s = jnp.einsum("bqnd,bknd->bnqk", q, k) * scale
    ref = jnp.einsum("bnqk,bknd->bqnd", jax.nn.softmax(ref_s, axis=-1), v)
    out = flash_attention(q, k, v, scale, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_self_attention_chunked_matches_full():
    """SelfAttention's large-token scan path == the one-shot softmax path
    (same params, chunk threshold forced low)."""
    from difpan_tpu.models.common import SelfAttention

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 16))
    full = SelfAttention(n_head=8, norm_groups=1, chunk_tokens=4096)
    chunked = SelfAttention(n_head=8, norm_groups=1, chunk_tokens=256)
    params = full.init({"params": jax.random.PRNGKey(2)}, x)["params"]
    y_full = full.apply({"params": params}, x)
    y_chunk = chunked.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_chunk), np.asarray(y_full),
                               atol=2e-5, rtol=2e-5)
