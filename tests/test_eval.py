"""Eval engine tests: full protocol on synthetic data, .mat + PNG export."""
import os

import jax
import numpy as np

from difpan_tpu.data import make_synthetic_pan_h5
from difpan_tpu.models import UNetSR3DWT
from difpan_tpu.train.eval import evaluate


def _tiny_model(c=4, p=1):
    return UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=p,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(16,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)


def _params(model, c=4, size=32):
    import jax.numpy as jnp
    return model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, size, size, c)),
        jnp.array([0]), jnp.zeros((1, size, size, 2 * c + 4)),
        train=False)["params"]


def test_evaluate_reduced_res(tmp_path):
    d = make_synthetic_pan_h5(n=5, channels=4, size=32, division=1023.0)
    model = _tiny_model()
    params = _params(model)
    mat = str(tmp_path / "out.mat")
    png_dir = str(tmp_path / "pngs")
    metrics = evaluate(
        d, params, "gf2", n_steps=10, section_counts="ddim5", batch_size=4,
        save_mat_path=mat, save_png_dir=png_dir, model=model,
        logger=type("L", (), {"print": staticmethod(lambda *a: None)})())
    assert set(metrics) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}
    assert all(np.isfinite(v) for v in metrics.values())

    from scipy.io import loadmat
    m = loadmat(mat)
    assert m["sr"].shape == (5, 4, 32, 32)  # NCHW like the reference export
    assert m["gt"].shape == (5, 4, 32, 32)
    assert m["sr"].max() <= 1023.0 + 1e-3
    assert os.path.exists(os.path.join(png_dir, "test_part_0.png"))


def test_evaluate_dpm_grid_sampler(tmp_path):
    """--sampler dpm-grid: the round-4 reduced-NFE preset runs through
    the full eval harness (grid steps + final denoise on the protocol
    schedule) and differs from the DDIM protocol trajectory."""
    d = make_synthetic_pan_h5(n=4, channels=4, size=32, division=1023.0)
    model = _tiny_model()
    params = _params(model)
    m_grid = evaluate(d, params, "gf2", n_steps=10, sampler="dpm-grid",
                      nfe=4, batch_size=4, model=model)
    assert set(m_grid) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}
    assert all(np.isfinite(v) for v in m_grid.values())
    m_ddim = evaluate(d, params, "gf2", n_steps=10,
                      section_counts="ddim5", batch_size=4, model=model)
    assert any(abs(m_grid[k] - m_ddim[k]) > 1e-9 for k in m_grid)


def test_evaluate_full_res(tmp_path):
    d = make_synthetic_pan_h5(n=3, channels=4, size=32, full_res=True)
    model = _tiny_model()
    params = _params(model)
    mat = str(tmp_path / "full.mat")
    metrics = evaluate(
        d, params, "gf2", full_res=True, n_steps=10, section_counts="ddim5",
        batch_size=4, save_mat_path=mat, model=model,
        logger=type("L", (), {"print": staticmethod(lambda *a: None)})())
    assert metrics == {}  # NonAnalysisPanAcc
    from scipy.io import loadmat
    m = loadmat(mat)
    assert "gt" not in m
    assert m["sr"].shape == (3, 4, 32, 32)


def test_evaluate_full_res_tiled(tmp_path):
    """Overlap-tile path: full-res image larger than the tile size."""
    d = make_synthetic_pan_h5(n=2, channels=4, size=64, full_res=True)
    model = _tiny_model()
    params = _params(model)
    metrics = evaluate(
        d, params, "gf2", full_res=True, n_steps=10, section_counts="ddim5",
        batch_size=4, model=model, tile=32, tile_overlap=16,
        logger=type("L", (), {"print": staticmethod(lambda *a: None)})())
    assert metrics == {}


def test_evaluate_hisr_family(tmp_path):
    """MHIF family through the eval engine (rgb plays pan, 3-channel)."""
    from difpan_tpu.data import make_synthetic_hisr_h5
    from difpan_tpu.models import UNetSR3DWT
    d = make_synthetic_hisr_h5(n=2, bands=8, size=32)
    # small 8-band stand-in for CAVE-like data; use a custom model+spec via
    # the cave registry entry but overridden model
    model = UNetSR3DWT(
        in_channel=8, out_channel=8, lms_channel=8, pan_channel=3,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(16,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    import jax.numpy as jnp
    params = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 8)),
        jnp.array([0]), jnp.zeros((1, 32, 32, 2 * 8 + 4 * 3)),
        train=False)["params"]
    from difpan_tpu.data import HISRDataSets
    ds = HISRDataSets(d, wavelets=True)
    metrics = evaluate(
        ds, params, "cave", n_steps=10, section_counts="ddim5",
        batch_size=2, model=model,
        logger=type("L", (), {"print": staticmethod(lambda *a: None)})())
    assert set(metrics) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}


def test_evaluate_mesh_sharded_matches_single_device():
    """Batch-sharded eval over the 8-device mesh produces identical metrics
    to the single-device run (VERDICT item 5)."""
    from difpan_tpu.parallel import make_mesh
    d = make_synthetic_pan_h5(n=10, channels=4, size=32, division=1023.0)
    model = _tiny_model()
    params = _params(model)
    null = type("L", (), {"print": staticmethod(lambda *a: None)})()
    m1 = evaluate(d, params, "gf2", n_steps=10, section_counts="ddim5",
                  batch_size=8, model=model, logger=null, seed=7)
    m2 = evaluate(d, params, "gf2", n_steps=10, section_counts="ddim5",
                  batch_size=8, model=model, logger=null, seed=7,
                  mesh=make_mesh(8))
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=2e-4, err_msg=k)


def test_evaluate_spatial_shard_rejects_cond_evict_res():
    """The H-sharded eval path partitions its own cond cache; passing
    cond_evict_res alongside it must raise instead of being silently
    ignored (which would blow the caller's HBM budget without warning)."""
    import pytest

    from difpan_tpu.parallel import make_mesh
    d = make_synthetic_pan_h5(n=2, channels=4, size=32, division=1023.0)
    model = _tiny_model()
    params = _params(model)
    null = type("L", (), {"print": staticmethod(lambda *a: None)})()
    with pytest.raises(ValueError, match="cond_evict_res"):
        evaluate(d, params, "gf2", n_steps=10, section_counts="ddim5",
                 batch_size=2, model=model, logger=null,
                 mesh=make_mesh(8, axis_name="space"),
                 spatial_axis="space", cond_evict_res=128)


def test_evaluate_pred_var_model():
    """A learned-variance (2C-output) checkpoint evaluates end-to-end: the
    eval engine must build the doubled head and split [prediction, var]
    during DDIM (regression: the pred-var feature used to dead-end at
    train time with no eval path)."""
    d = make_synthetic_pan_h5(n=4, channels=4, size=32, division=1023.0)
    model = UNetSR3DWT(
        in_channel=4, out_channel=8, lms_channel=4, pan_channel=1,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(16,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True,
        pred_var=True)
    params = _params(model)
    null = type("L", (), {"print": staticmethod(lambda *a: None)})()
    metrics = evaluate(d, params, "gf2", n_steps=10, section_counts="ddim4",
                       batch_size=4, model=model, logger=null,
                       pred_var=True)
    assert set(metrics) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}
    assert all(np.isfinite(v) for v in metrics.values())


def test_evaluate_x0_sampler(tmp_path):
    """sampler='x0' (round-5 posterior-mean mode): NFE=1 — one forward
    pass predicting x0 from pure noise at the schedule's top step. Must
    run through the full harness, produce finite metrics, and equal the
    direct model call (same key) up to the clip: the mode is DEFINED as
    sr=(model(xT, T-1, cond, 0)+lms).clip(0,1)."""
    import jax.numpy as jnp

    from difpan_tpu.data import PanDataset
    from difpan_tpu.data.loader import pack_cond
    from difpan_tpu.diffusion import make_beta_schedule, schedule_from_betas

    d = make_synthetic_pan_h5(n=4, channels=4, size=32, division=1023.0)
    model = _tiny_model()
    params = _params(model)
    m_x0 = evaluate(d, params, "gf2", n_steps=10, sampler="x0",
                    batch_size=4, model=model, seed=3)
    assert set(m_x0) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}
    assert all(np.isfinite(v) for v in m_x0.values())

    # semantic check: reproduce the harness output by hand for batch 0
    import jax

    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True)
    pan, lms, gt, wav = (jnp.asarray(a) for a in ds.batch(np.arange(4)))
    sched = schedule_from_betas(make_beta_schedule("cosine", 10,
                                                   cosine_s=8e-3))
    sig_T = jnp.sqrt(1.0 - sched.alphas_cumprod[-1])
    # evaluate() splits its key per batch; batch 0 gets split(key)[1]
    key = jax.random.split(jax.random.PRNGKey(3))[1]
    xT = jax.random.normal(key, lms.shape) * sig_T
    cond = pack_cond(lms, pan, wav)
    out = model.apply({"params": params}, xT,
                      jnp.full((4,), 9, jnp.int32), cond,
                      jnp.zeros_like(xT), train=False)
    want = jnp.clip(out + lms, 0.0, 1.0)

    from difpan_tpu.metrics import AnalysisPanAcc
    an = AnalysisPanAcc(ergas_ratio=4)
    an(np.asarray(gt), np.asarray(want))
    for k in m_x0:
        assert abs(m_x0[k] - float(an.acc_ave[k])) < 5e-4, (k, m_x0[k])


def test_evaluate_x0_spatial_shard_smoke():
    # sampler="x0" on a spatial mesh is supported via
    # parallel.make_sharded_x0_sampler (numeric match vs unsharded is
    # asserted in tests/test_spatial.py::test_sharded_x0_sampler_matches_
    # unsharded); here: the evaluate() entry point wires it up and
    # produces finite protocol metrics.
    d = make_synthetic_pan_h5(n=2, channels=4, size=32, division=1023.0)
    model = _tiny_model()
    params = _params(model)
    from difpan_tpu.parallel import make_mesh
    mesh = make_mesh(2, axis_name="space")
    m = evaluate(d, params, "gf2", n_steps=10, sampler="x0", batch_size=2,
                 model=model, mesh=mesh, spatial_axis="space", seed=3)
    assert set(m) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}
    assert all(np.isfinite(v) for v in m.values())
