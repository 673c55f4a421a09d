"""fp8 (e4m3) flash-attention numerics (`ops/pallas/flash_attention.py`):
quantized Q/K/V with f32 softmax/accumulation vs the dense reference.
Runs the kernel in interpret mode on CPU; the same code path compiles via
Mosaic on TPU (PERF.md records on-device numbers)."""
import jax
import jax.numpy as jnp
import numpy as np

from difpan_tpu.ops.pallas import flash_attention, fp8_flash_attention


def _dense_attention(q, k, v, scale):
    s = jnp.einsum("bqnd,bknd->bnqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    return jnp.einsum("bnqk,bknd->bqnd", p, v.astype(jnp.float32)
                      ).astype(q.dtype)


def _qkv(b=1, n=512, h=4, d=16, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(kk, (b, n, h, d), dtype) for kk in ks)


def test_fp8_attention_close_to_dense():
    q, k, v = _qkv()
    scale = 1.0 / np.sqrt(64)
    ref = _dense_attention(q, k, v, scale)
    out = fp8_flash_attention(q, k, v, scale, interpret=True)
    # e4m3 has 3 mantissa bits (~6% per-element worst case); softmax
    # averaging brings the output error well under that
    err = np.abs(np.asarray(out) - np.asarray(ref))
    denom = np.abs(np.asarray(ref)) + 1e-3
    assert np.median(err / denom) < 0.05, np.median(err / denom)
    assert np.max(err) < 0.35, np.max(err)


def test_fp8_attention_tracks_f32_flash():
    q, k, v = _qkv(seed=3)
    scale = 1.0 / np.sqrt(64)
    a = flash_attention(q, k, v, scale, interpret=True)
    b_ = fp8_flash_attention(q, k, v, scale, interpret=True)
    # correlation between the fp8 and full-precision outputs stays ~1
    aa, bb = np.asarray(a).ravel(), np.asarray(b_).ravel()
    corr = np.corrcoef(aa, bb)[0, 1]
    assert corr > 0.999, corr


def test_fp8_attention_bf16_inputs():
    q, k, v = _qkv(seed=5, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(64)
    out = fp8_flash_attention(q, k, v, scale, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _dense_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), scale)
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert np.max(err) < 0.5, np.max(err)


def test_fp8_model_flag_runs():
    """UNetSR3DWT(fp8_attn=True) shares the param tree with the default
    model (quantization is activation-side, no new params) — CPU falls
    back to interpret mode inside the kernel gate."""
    from difpan_tpu.models import UNetSR3DWT

    c, pc = 4, 1
    kw = dict(in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
              inner_channel=8, norm_groups=1, channel_mults=(1, 2),
              attn_res=(8,), res_blocks=1, dropout=0.0, image_size=16,
              self_condition=True)
    m0 = UNetSR3DWT(**kw)
    m8 = UNetSR3DWT(**kw, fp8_attn=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, c))
    t = jnp.array([3])
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2 * c
                                                     + 4 * pc))
    p0 = m0.init({"params": jax.random.PRNGKey(2)}, x, t, cond,
                 train=False)["params"]
    ref = m0.apply({"params": p0}, x, t, cond, train=False)
    import pytest
    with pytest.warns(UserWarning, match="fp8.*no effect"):
        # on CPU the flash gate is closed: the flag warns and falls back
        out = m8.apply({"params": p0}, x, t, cond, train=False)
    # 16x16 = 256 tokens <= chunk threshold -> same dense path, identical
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fp8_flag_warns_when_flash_gate_not_taken():
    """ADVICE r3: SelfAttention(fp8=True) must not silently no-op — on a
    non-TPU backend (or off-granularity token counts) it warns once that
    the plain path is running."""
    import warnings

    import jax
    from difpan_tpu.models.common import SelfAttention

    attn = SelfAttention(n_head=2, norm_groups=1, fp8=True)
    x = jnp.ones((1, 8, 8, 8))  # 64 tokens: far below the flash gate
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        params = attn.init({"params": jax.random.PRNGKey(0)}, x)
        attn.apply(params, x)
    msgs = [str(x.message) for x in w]
    assert any("fp8" in m and "no effect" in m for m in msgs), msgs


# --- fp8 conv (round 4, VERDICT r3 item 9) ----------------------------------

def test_fp8_conv_matches_f32_conv():
    """9-shifted-GEMM e4m3 conv vs lax.conv f32, stride 1 and 2, with
    bias: relative error within the e4m3 quantization budget."""
    from difpan_tpu.ops import fp8_conv
    rng = np.random.default_rng(0)
    for stride in (1, 2):
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(3, 3, 8, 12)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(12,)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        out = fp8_conv(x, k, b, stride=stride)
        assert out.shape == ref.shape
        rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
        assert rel < 0.05, (stride, rel)


def test_fp8_conv_1x1_and_bf16():
    from difpan_tpu.ops import fp8_conv
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 6)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 1, 6, 4)), jnp.float32)
    out = fp8_conv(x, k)
    assert out.dtype == jnp.bfloat16 and out.shape == (1, 8, 8, 4)
    ref = jnp.einsum("bhwi,io->bhwo", x.astype(jnp.float32), k[0, 0])
    rel = float(jnp.linalg.norm(out.astype(jnp.float32) - ref)
                / jnp.linalg.norm(ref))
    assert rel < 0.05, rel


def test_fp8_conv_model_flag_shares_params_and_tracks_reference():
    """UNetSR3DWT(fp8_conv=True) runs the SAME param tree as the default
    model (quantization is operand-side, no new params) and its forward
    stays highly correlated with the full-precision one."""
    from difpan_tpu.models import UNetSR3DWT

    c, pc = 4, 1
    kw = dict(in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
              inner_channel=8, norm_groups=1, channel_mults=(1, 2),
              attn_res=(8,), res_blocks=1, dropout=0.0, image_size=16,
              self_condition=True)
    m0 = UNetSR3DWT(**kw)
    m8 = UNetSR3DWT(**kw, fp8_conv=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, c))
    t = jnp.array([3])
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (1, 16, 16, 2 * c + 4 * pc))
    p0 = m0.init({"params": jax.random.PRNGKey(2)}, x, t, cond,
                 train=False)["params"]
    p8 = m8.init({"params": jax.random.PRNGKey(2)}, x, t, cond,
                 train=False)["params"]
    # identical tree: same paths, same shapes, same values (same init rng)
    l0 = jax.tree_util.tree_leaves_with_path(p0)
    l8 = jax.tree_util.tree_leaves_with_path(p8)
    assert [p for p, _ in l0] == [p for p, _ in l8]
    for (_, a), (_, b) in zip(l0, l8):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ref = np.asarray(m0.apply({"params": p0}, x, t, cond, train=False))
    out = np.asarray(m8.apply({"params": p0}, x, t, cond, train=False))
    corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
    assert corr > 0.99, corr
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.2, rel
