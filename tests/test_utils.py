"""Tests for misc utils, lr schedules, logging, and the CLI plumbing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difpan_tpu.utils.lr_schedules import (multistep_constant_schedule,
                                           multistep_lr,
                                           warmup_cosine_schedule,
                                           warmup_linear_schedule)
from difpan_tpu.utils.misc import (compute_iters, concat_dif_timesteps_tensor,
                                   dict_to_str, grad_clip,
                                   list_tensor2_list_list, norm,
                                   norm_data_range, unnorm_data_range, unorm)


def test_norm_unorm_roundtrip():
    x = jnp.linspace(0, 1, 10)
    np.testing.assert_allclose(np.asarray(unorm(norm(x))), np.asarray(x),
                               atol=1e-7)
    y = jnp.linspace(0.2, 0.9, 10)
    n = norm_data_range(y)
    assert float(n.min()) == -1.0 and float(n.max()) == 1.0
    np.testing.assert_allclose(float(unnorm_data_range(n).min()), 0.0,
                               atol=1e-7)


def test_grad_clip():
    g = {"a": jnp.array([3.0, 4.0])}  # norm 5
    clipped = grad_clip(g, mode="norm", value=1.0)
    np.testing.assert_allclose(
        np.asarray(clipped["a"]), [0.6, 0.8], rtol=1e-5)
    clipped = grad_clip(g, mode="value", value=3.5)
    np.testing.assert_allclose(np.asarray(clipped["a"]), [3.0, 3.5])


def test_list_regroup():
    xs = list(range(6))
    assert list_tensor2_list_list(xs, 3, "time") == [[0, 1, 2], [3, 4, 5]]
    assert list_tensor2_list_list(xs, 3, "size") == [[0, 3], [1, 4], [2, 5]]


def test_concat_dif_timesteps():
    a = jnp.ones((1, 8, 8, 2))
    b = jnp.ones((1, 4, 4, 3))
    out = concat_dif_timesteps_tensor([a, b, a, b], 2, 8)
    assert out.shape == (1, 8, 8, 2 * 2 + 3 * 2)


def test_compute_iters():
    assert compute_iters(10, 4, drop_last=True) == 3
    assert compute_iters(12, 4) == 3


def test_dict_to_str():
    s = dict_to_str({"SAM": 1.5, "CC": 0.9})
    assert "SAM: 1.5" in s and "CC: 0.9" in s


def test_schedules():
    sc = warmup_cosine_schedule(1.0, 10, 100)
    assert float(sc(5)) == pytest.approx(0.5)
    assert float(sc(10)) == pytest.approx(1.0)
    assert float(sc(100)) == pytest.approx(0.0, abs=1e-6)

    sl = warmup_linear_schedule(1.0, 10, 110)
    assert float(sl(5)) == pytest.approx(0.5)
    assert float(sl(60)) == pytest.approx(0.5)

    sm = multistep_constant_schedule([0, 10, 50], [1e-3, 1e-4, 1e-5])
    assert float(sm(5)) == pytest.approx(1e-3)
    assert float(sm(20)) == pytest.approx(1e-4)
    assert float(sm(60)) == pytest.approx(1e-5)

    ml = multistep_lr(1.0, [10, 20], 0.1)
    assert float(ml(5)) == pytest.approx(1.0)
    assert float(ml(15)) == pytest.approx(0.1)
    assert float(ml(25)) == pytest.approx(0.01, rel=1e-5)


def test_cli_help_and_parser():
    from difpan_tpu.cli import main
    with pytest.raises(SystemExit) as e:
        main(["--help"])
    assert e.value.code == 0
    with pytest.raises(SystemExit):
        main(["train"])  # missing required args


def test_logging(tmp_path):
    from difpan_tpu.utils.logging import TensorboardLogger
    lg = TensorboardLogger("t", base_dir=str(tmp_path))
    lg.print("hello")
    lg.log_scalar("a", 1.0, 1)
    lg.log_scalars("b", {"x": 1.0}, 1)
    lg.close()
    import os
    assert any("log.txt" in fs for _, _, f in os.walk(tmp_path) for fs in f)


def test_torch_convert_roundtrip():
    """flax -> torch-layout -> flax must be an exact identity (hermetic:
    no torch or reference needed)."""
    import jax.numpy as jnp
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.utils.torch_convert import (
        convert_sr3_dwt_state_dict, convert_to_reference_state_dict)

    net = UNetSR3DWT(
        in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2),
        attn_res=(8,), res_blocks=1, dropout=0.2, image_size=16,
        self_condition=True)
    params = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16, 16, 4)),
        jnp.array([0]), jnp.zeros((1, 16, 16, 12)), train=False)["params"]
    sd = convert_to_reference_state_dict(params, channel_mults=(1, 2),
                                         res_blocks=1)
    back = convert_sr3_dwt_state_dict(sd, channel_mults=(1, 2), res_blocks=1)
    flat_a = {jax.tree_util.keystr(p): np.asarray(v) for p, v
              in jax.tree_util.tree_leaves_with_path(params)}
    flat_b = {jax.tree_util.keystr(p): np.asarray(v) for p, v
              in jax.tree_util.tree_leaves_with_path(back)}
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k])
    # torch-side naming sanity
    assert "downs.0.weight" in sd and "final_conv.block.3.bias" in sd
    assert any(k.startswith("ups.") and "cond_inj.q.0" in k for k in sd)


def test_merge_params_by_shape():
    import jax.numpy as jnp
    from difpan_tpu.utils.checkpoints import merge_params_by_shape
    target = {"a": {"w": jnp.zeros((3, 3)), "b": jnp.zeros(3)},
              "head": {"w": jnp.zeros((3, 5))}}
    source = {"a": {"w": jnp.ones((3, 3)), "b": jnp.ones(4)},   # b mismatched
              "head": {"w": jnp.ones((3, 7))}}                   # mismatched
    merged = merge_params_by_shape(target, source)
    np.testing.assert_allclose(np.asarray(merged["a"]["w"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["a"]["b"]), 0.0)
    np.testing.assert_allclose(np.asarray(merged["head"]["w"]), 0.0)
