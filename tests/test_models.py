"""Model tests: param-count parity with the reference, shape checks,
train-mode stochastic layers, and a seeded-forward regression golden."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difpan_tpu.models import UNetSR3, UNetSR3DWT, UNetGoogle


def _engine_dwt(c=4, p=1):
    """Engine config (`diffusion_engine.py:121-133`)."""
    return UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=p,
        inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
        attn_res=(8,), res_blocks=3, dropout=0.2, image_size=64,
        self_condition=True)


def _count(params):
    return sum(int(np.prod(v.shape)) for v in jax.tree_util.tree_leaves(params))


def test_sr3_dwt_param_count_matches_reference():
    """Reference torch model has 10,250,324 params for the 4-band engine
    config (measured once from /root/reference/models/sr3_dwt.py)."""
    net = _engine_dwt()
    x = jnp.zeros((1, 64, 64, 4))
    cond = jnp.zeros((1, 64, 64, 12))
    params = net.init({"params": jax.random.PRNGKey(0)}, x, jnp.array([0]),
                      cond, train=False)["params"]
    assert _count(params) == 10_250_324


def test_sr3_dwt_seeded_forward_regression():
    """Regression golden from a fixed-seed init (values captured at first
    implementation, which was itself verified to 3e-6 against the torch
    reference via weight conversion)."""
    net = _engine_dwt()
    x = jnp.transpose(jnp.asarray(
        np.linspace(-1, 1, 2 * 4 * 64 * 64, dtype=np.float32)
        .reshape(2, 4, 64, 64)), (0, 2, 3, 1))
    cond = jnp.transpose(jnp.asarray(
        np.linspace(0, 1, 2 * 12 * 64 * 64, dtype=np.float32)
        .reshape(2, 12, 64, 64)), (0, 2, 3, 1))
    t = jnp.array([7, 321])
    params = net.init({"params": jax.random.PRNGKey(42)}, x, t, cond,
                      train=False)["params"]
    y = np.asarray(net.apply({"params": params}, x, t, cond, train=False))
    assert y.shape == (2, 64, 64, 4)
    np.testing.assert_allclose(
        y.ravel()[[0, 999, 4321, 16383, 20000, 32767]],
        [-0.12196513, 0.26933077, 0.4435131, 0.243057, 0.27103198,
         0.42895156], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(y.mean(), 0.2869092, rtol=1e-4)


def test_sr3_dwt_train_mode_stochastic():
    """dropout + DropPath active in train mode; different rng -> different
    output; eval deterministic."""
    net = _engine_dwt()
    x = jnp.ones((2, 16, 16, 4)) * 0.1
    cond = jnp.ones((2, 16, 16, 12)) * 0.2
    t = jnp.array([3, 5])
    small = UNetSR3DWT(
        in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2),
        attn_res=(8,), res_blocks=1, dropout=0.2, image_size=16,
        self_condition=True)
    params = small.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                        train=False)["params"]
    y1 = small.apply({"params": params}, x, t, cond, train=True,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = small.apply({"params": params}, x, t, cond, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    e1 = small.apply({"params": params}, x, t, cond, train=False)
    e2 = small.apply({"params": params}, x, t, cond, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_sr3_plain_shapes():
    net = UNetSR3(
        in_channel=4, out_channel=4, cond_channel=5, inner_channel=8,
        norm_groups=1, channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
        dropout=0.0, image_size=16, self_condition=True)
    x = jnp.zeros((2, 16, 16, 4))
    cond = jnp.zeros((2, 16, 16, 5))
    t = jnp.array([0, 1])
    params = net.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                      train=False)["params"]
    y = net.apply({"params": params}, x, t, cond, train=False)
    assert y.shape == (2, 16, 16, 4)


def test_unet_google_capture_fms():
    net = UNetGoogle(
        in_channel=4 + 5, out_channel=4, inner_channel=8, norm_groups=1,
        channel_mults=(1, 2, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_size=32, self_condition=False)
    x = jnp.zeros((2, 32, 32, 4))
    cond = jnp.zeros((2, 32, 32, 5))
    t = jnp.array([0, 1])
    params = net.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                      train=False)["params"]
    y, fms = net.apply({"params": params}, x, t, cond, train=False,
                       capture_fms=True)
    assert y.shape == (2, 32, 32, 4)
    # 3 stages -> 2 upsamples captured at 16 and 32
    assert len(fms) == 2
    assert fms[0].shape[1] == 16 and fms[1].shape[1] == 32


def test_self_cond_none_equals_x():
    """default(self_cond, x) semantics: passing None must equal passing x.

    None takes the folded head-conv path (kernel input-halves summed instead
    of concat([x, x])) — identical math up to float reassociation, so the
    comparison is allclose at float tolerance rather than bit-equal."""
    net = UNetSR3DWT(
        in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=16, self_condition=True)
    x = jnp.ones((1, 16, 16, 4)) * 0.3
    cond = jnp.ones((1, 16, 16, 12)) * 0.1
    t = jnp.array([9])
    params = net.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                      train=False)["params"]
    y_none = net.apply({"params": params}, x, t, cond, None, train=False)
    y_x = net.apply({"params": params}, x, t, cond, x, train=False)
    np.testing.assert_allclose(np.asarray(y_none), np.asarray(y_x),
                               atol=2e-6, rtol=2e-5)


def test_cond_injection_variants():
    """FreqCondInjection / FastFreqCondInjection / WrappedCondInj (present in
    the reference but unused by the engine) run and keep shapes."""
    from difpan_tpu.models.sr3_dwt import (FastFreqCondInjection,
                                           FreqCondInjection, WrappedCondInj)
    x = jnp.linspace(-1, 1, 2 * 16 * 16 * 16).reshape(2, 16, 16, 16)
    cond = jnp.linspace(0, 1, 2 * 16 * 16 * 5).reshape(2, 16, 16, 5)
    for cls in (FreqCondInjection, FastFreqCondInjection):
        mod = cls(qkv_dim=16, dim_out=8, groups=1, nheads=4)
        params = mod.init({"params": jax.random.PRNGKey(0)}, x, cond,
                          train=False)
        y = mod.apply(params, x, cond, train=False)
        assert y.shape == (2, 16, 16, 8)
        assert np.all(np.isfinite(np.asarray(y)))
    mod = WrappedCondInj(qkv_dim=16, dim_out=8, groups=1, nheads=4)
    params = mod.init({"params": jax.random.PRNGKey(0)}, x, cond,
                      train=False)
    y = mod.apply(params, x, cond, train=False)
    assert y.shape == (2, 16, 16, 8)


def test_cond_cache_bit_identical():
    """The hoisted cond-feature cache (`cond_only=True` + `cond_cache=`)
    must reproduce the plain forward bit-for-bit — it is the same math,
    computed once instead of per scan step."""
    net = UNetSR3DWT(
        in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=2, dropout=0.0, image_size=16, self_condition=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 12))
    t = jnp.array([3, 11])
    params = net.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                      train=False)["params"]
    ref = net.apply({"params": params}, x, t, cond, train=False)
    cache = net.apply({"params": params}, None, None, cond, cond_only=True)
    assert len(cache["enc"]) == 4 and len(cache["dec"]) == 6
    out = net.apply({"params": params}, x, t, None, cond_cache=cache,
                    train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_cond_cache_eviction_bit_identical():
    """`cache_max_res=` (HBM headroom for large tiles): evicted full-res
    entries are None and the forward recomputes them in-scan from `cond` —
    the result must stay bit-identical to the fully-cached forward."""
    net = UNetSR3DWT(
        in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=2, dropout=0.0, image_size=16, self_condition=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 12))
    t = jnp.array([3, 11])
    params = net.init({"params": jax.random.PRNGKey(0)}, x, t, cond,
                      train=False)["params"]
    full = net.apply({"params": params}, None, None, cond, cond_only=True)
    part = net.apply({"params": params}, None, None, cond, cond_only=True,
                     cache_max_res=8)
    # stage-0 (16px) entries evicted, stage-1 (8px) kept; dec always cached
    assert [e is None for e in part["enc"]] == [True, True, False, False]
    assert all(e is not None for e in part["dec"])
    ref = net.apply({"params": params}, x, t, None, cond_cache=full,
                    train=False)
    out = net.apply({"params": params}, x, t, cond, cond_cache=part,
                    train=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
