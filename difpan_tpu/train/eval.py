"""Test/eval engine — the TPU-native `test_fn`
(`/root/reference/diffusion_engine.py:351-505`).

Protocol parity: DDIM-25 sampling of a cosine schedule, EMA (or given)
weights, ``sr = (sample + lms).clip(0,1)``, reduced-res metrics via
AnalysisPanAcc (full-res: none), export of ``sr * division`` plus the raw h5
arrays into a .mat file (NCHW, same keys), optional PNG RGB grids.

TPU-first: batches are padded to one static shape and the whole sampling
chain is one jitted program; the eval set can be batch-sharded over a mesh.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import (HISRDataSets, PanDataset, batch_iterator,
                    get_dataset_spec)
from ..diffusion import (DiffusionConfig, make_beta_schedule, respace,
                         schedule_from_betas, ddim_sample_loop)
from ..data.loader import pack_cond
from ..models import UNetSR3DWT
from ..metrics import AnalysisPanAcc, NonAnalysisPanAcc


def build_eval_model(dataset_name: str) -> UNetSR3DWT:
    """Per-dataset model config (`diffusion_engine.py:371-393`)."""
    spec = get_dataset_spec(dataset_name)
    return UNetSR3DWT(
        in_channel=spec.n_channels, out_channel=spec.n_channels,
        lms_channel=spec.n_channels, pan_channel=spec.pan_channels,
        inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
        attn_res=(8,), res_blocks=3, dropout=0.2, image_size=64,
        self_condition=True)


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.repeat(x[-1:], n - x.shape[0], axis=0)
    return np.concatenate([x, pad], axis=0)


def evaluate(
    test_data: Any,
    params: Any,
    dataset_name: str = "gf2",
    *,
    full_res: bool = False,
    n_steps: int = 25,
    section_counts: str = "ddim25",
    batch_size: int = 8,
    division: Optional[float] = None,
    seed: int = 0,
    save_mat_path: Optional[str] = None,
    save_png_dir: Optional[str] = None,
    model: Optional[UNetSR3DWT] = None,
    logger=None,
    tile: Optional[int] = None,
    tile_overlap: int = 32,
    mesh=None,
    spatial_axis: Optional[str] = None,
    pred_var: bool = False,
    cond_evict_res: Optional[int] = None,
    sampler: str = "ddim",
    nfe: Optional[int] = None,
) -> Dict[str, float]:
    """Run the full eval protocol; returns the averaged metric dict
    (empty for full-res). `test_data` is an h5-like dict or a dataset.

    `mesh`: an optional `jax.sharding.Mesh` with a `data` axis — the eval
    batch is sharded across it and params replicated, the same layout as the
    train-loop validation sampler. `batch_size` must divide evenly by the
    mesh size (padded batches keep one static compiled shape). Metrics are
    computed on host from the gathered result, so they are identical to the
    single-device run.

    `spatial_axis`: name of a mesh axis to shard image ROWS over — the
    exact H-sharded UNet path (`parallel/sharded_unet.py`) for single
    images whose activations exceed one chip's HBM (the reference's
    1000x1000 Harvard full-res, `diffusion_engine.py:373-377`). Non-
    divisible sizes are edge-padded and cropped automatically. With a 2-D
    ("data", "space") mesh (`make_mesh_2d`), batch and rows shard
    together (dp x sp).

    `sampler`: "ddim" (the reference protocol) or "dpm-grid" — the round-4
    reduced-NFE preset (DPM-Solver++ o2 on the same cosine T=n_steps
    schedule, grid-aligned steps + final denoise; NFE_STUDY.md group G).
    `nfe` caps the model evals for dpm-grid (default n_steps)."""
    spec = get_dataset_spec(dataset_name)
    division = spec.division if division is None else division
    _print = logger.print if logger is not None else print

    if not isinstance(test_data, (PanDataset, HISRDataSets)):
        raw = test_data
        if spec.family == "pan":
            ds = PanDataset(raw, norm_range=False, division=division,
                            full_res=full_res, wavelets=True)
        else:
            ds = HISRDataSets(raw, wavelets=True)
    else:
        ds = test_data
        raw = None

    model = model or build_eval_model(dataset_name)
    # derive band count from the data itself (the registry spec may describe
    # the full dataset while fixtures/subsets carry fewer bands)
    n_ch = (ds.lms.shape[-1] if hasattr(ds, "lms")
            else ds.hsi_up.shape[-1])
    dcfg = DiffusionConfig(channels=n_ch, pred_mode="x_start",
                           loss_type="l1", clamp_range=(0.0, 1.0),
                           self_condition=True, pred_var=pred_var)
    assert sampler in ("ddim", "dpm-grid", "x0"), sampler
    betas = make_beta_schedule("cosine", n_steps, cosine_s=8e-3)
    sched = schedule_from_betas(betas)
    # the respacing belongs to the ddim protocol path only — building it
    # for dpm-grid would reject (n_steps=10, 'ddim25') style combinations
    # that are never sampled
    sched_re = (respace(sched, section_counts)[0]
                if sampler == "ddim" else None)
    nfe = n_steps if nfe is None else nfe

    def sample(params, key, pan, lms, wavelets):
        cond = pack_cond(lms, pan, wavelets)
        # loop-invariant cond features, hoisted out of the sampling scan;
        # `cond_evict_res` drops full-res entries (recomputed in-scan) to
        # trade FLOPs for HBM headroom on large tiles
        cache = model.apply({"params": params}, None, None, cond,
                            cond_only=True, cache_max_res=cond_evict_res)
        cond_in = cond if cond_evict_res is not None else None

        if sampler == "dpm-grid":
            from ..solvers import DPMSolver, NoiseScheduleVP, model_wrapper
            ns = NoiseScheduleVP("discrete", betas=betas)

            def x0_model(xx, t_input):
                out = model.apply({"params": params}, xx, t_input, cond_in,
                                  train=False, cond_cache=cache)
                if pred_var:
                    out = jnp.split(out, 2, axis=-1)[0]
                return out

            solver = DPMSolver(
                model_wrapper(x0_model, ns, model_type="x_start"), ns,
                algorithm_type="dpmsolver++",
                correcting_x0_fn=lambda x0, t: jnp.clip(
                    x0, *dcfg.clamp_range))
            xT = jax.random.normal(key, lms.shape)
            s = solver.sample(xT, steps=nfe - 1, order=2,
                              method="multistep", skip_type="grid",
                              denoise_to_zero=True)
        elif sampler == "x0":
            # NFE=1 posterior-mean mode (round-5 x0 study,
            # scripts/x0_probe.py): ONE forward pass predicting x0 from
            # pure noise at the schedule's top step — the model's estimate
            # of the conditional mean/median of the residual. On high-
            # conditional-entropy scenes this scores BETTER on distortion
            # metrics (SAM/ERGAS/PSNR) than iterative sampling, at 1/25th
            # the model evals; iterative sampling buys perceptual sharpness
            # (samples from the learned spread), not per-pixel accuracy.
            # Pass n_steps = the TRAIN schedule length so t lands in the
            # weights' time-embedding convention.
            sig_T = jnp.sqrt(1.0 - sched.alphas_cumprod[-1])
            xT = jax.random.normal(key, lms.shape) * sig_T
            t = jnp.full((lms.shape[0],), n_steps - 1, jnp.int32)
            out = model.apply({"params": params}, xT, t, cond_in,
                              jnp.zeros_like(xT), train=False,
                              cond_cache=cache)
            if pred_var:
                out = jnp.split(out, 2, axis=-1)[0]
            s = out
        else:
            def model_fn(x, t, c, sc, k):
                return model.apply({"params": params}, x, t, cond_in, sc,
                                   train=False, cond_cache=cache)

            s = ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
        return jnp.clip(s + lms, 0.0, 1.0)

    if mesh is not None and spatial_axis is not None:
        from ..parallel import make_sharded_sampler
        assert spatial_axis in mesh.axis_names, (
            f"spatial_axis {spatial_axis!r} not in mesh axes "
            f"{mesh.axis_names}")
        if cond_evict_res is not None:
            # the H-sharded sampler hoists its own (sharded) full cond
            # cache; silently ignoring the eviction flag would blow the
            # caller's HBM budget without warning
            raise ValueError(
                "cond_evict_res is not supported on the H-sharded path "
                "(the sharded cond cache is already partitioned over the "
                "mesh); drop --cond-evict-res or the spatial shard")
        if sampler == "x0":
            # one shard_map'd forward at t=T-1 (NFE=1): a full-res image
            # whose single forward exceeds one chip's HBM still gets the
            # posterior-mean mode (X0_STUDY.md)
            from ..parallel import make_sharded_x0_sampler
            sample = make_sharded_x0_sampler(model, mesh, sched,
                                             axis_name=spatial_axis)
        elif sampler == "dpm-grid":
            from ..parallel import make_sharded_dpm_sampler
            sample = make_sharded_dpm_sampler(
                model, mesh, betas, steps=nfe - 1, order=2,
                axis_name=spatial_axis, clamp_range=dcfg.clamp_range,
                skip_type="grid", denoise_to_zero=True)
        else:
            sample = make_sharded_sampler(model, mesh, dcfg, sched_re,
                                          axis_name=spatial_axis)
    elif mesh is not None:
        from ..parallel import batch_sharding, replicated_sharding
        assert batch_size % mesh.size == 0, (
            f"batch_size {batch_size} must be divisible by mesh size "
            f"{mesh.size}")
        data_sh = batch_sharding(mesh)
        repl_sh = replicated_sharding(mesh)
        params = jax.device_put(params, repl_sh)
        sample = jax.jit(
            sample,
            in_shardings=(repl_sh, repl_sh, data_sh, data_sh, data_sh),
            out_shardings=data_sh)
    else:
        sample = jax.jit(sample)

    analysis = (AnalysisPanAcc(ergas_ratio=spec.ergas_ratio)
                if not full_res else NonAnalysisPanAcc())
    key = jax.random.PRNGKey(seed)
    preds = []
    n_batches = -(-len(ds) // batch_size)
    for bi, batch in enumerate(batch_iterator(ds, batch_size, epochs=1,
                                              shuffle=False)):
        if full_res and spec.family == "pan":
            pan, lms, wavelets = batch
            gt = None
        else:
            pan, lms, gt, wavelets = batch
        _print(f"sampling [{bi + 1}/{n_batches}]")
        n_real = pan.shape[0]
        key, k = jax.random.split(key)
        if tile is not None and lms.shape[1] > tile:
            # overlap-tile path for images exceeding one compiled shape /
            # HBM budget (e.g. 1000x1000 Harvard full-res)
            from ..parallel.spatial import tiled_sample
            sr = tiled_sample(
                lambda kk, p_, l_, w_: sample(params, kk, p_, l_, w_),
                k, np.asarray(pan), np.asarray(lms), np.asarray(wavelets),
                tile=tile, overlap=tile_overlap, tile_batch=batch_size)
        else:
            pan_p, lms_p, wav_p = (jnp.asarray(_pad_to(a, batch_size))
                                   for a in (pan, lms, wavelets))
            sr = np.asarray(jax.device_get(sample(params, k, pan_p, lms_p,
                                                  wav_p)))[:n_real]
        analysis(gt, sr) if gt is not None else analysis(None, None)
        if gt is not None:
            _print(analysis.print_str(analysis.last_acc))
        if save_png_dir is not None:
            _save_rgb_grid(sr, spec.rgb_channels,
                           os.path.join(save_png_dir,
                                        f"test_part_{bi}.png"))
        preds.append(np.clip(sr * division, 0, division))

    if save_mat_path is not None and raw is not None:
        from scipy.io import savemat
        # NCHW export, same keys as the reference (`:484-505`)
        d = {k: np.asarray(raw[k]) for k in
             (("gt", "ms", "lms", "pan") if not full_res
              else ("ms", "lms", "pan")) if k in raw}
        d["sr"] = np.transpose(np.concatenate(preds, axis=0), (0, 3, 1, 2))
        os.makedirs(os.path.dirname(os.path.abspath(save_mat_path)),
                    exist_ok=True)
        savemat(save_mat_path, d)
        _print(f"saved {save_mat_path}")

    return dict(analysis.acc_ave)


def make_rgb_grid(imgs_nhwc: np.ndarray, rgb_channels,
                  nrow: int = 4) -> np.ndarray:
    """Tile a batch's selected RGB bands into one [H', W', 3] array — the
    `torchvision.make_grid` analog (`diffusion_engine.py:255,304-305`).

    Channel indices are clamped to the actual band count so registry specs
    for full datasets (e.g. 31-band CAVE) also work on reduced-band subsets.
    """
    n_bands = imgs_nhwc.shape[-1]
    chans = [min(int(c), n_bands - 1) for c in rgb_channels]
    imgs = np.clip(imgs_nhwc[..., chans], 0, 1)
    n = imgs.shape[0]
    ncol = min(nrow, n)
    nr = -(-n // ncol)
    h, w = imgs.shape[1:3]
    grid = np.zeros((nr * h, ncol * w, 3), dtype=np.float32)
    for i, im in enumerate(imgs):
        r, c = divmod(i, ncol)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = im
    return grid


def save_grid_png(grid: np.ndarray, path: str):
    """Save an [H, W, 3] grid as a PNG (`diffusion_engine.py:257-270`)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(max(1, grid.shape[1] // 100),
                                    max(1, grid.shape[0] // 100)))
    ax.imshow(grid)
    ax.set_axis_off()
    fig.savefig(path, dpi=200, bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def _save_rgb_grid(sr_nhwc: np.ndarray, rgb_channels, path: str,
                   nrow: int = 4):
    """PNG grid of the selected RGB bands (`diffusion_engine.py:453-475`)."""
    save_grid_png(make_rgb_grid(sr_nhwc, rgb_channels, nrow), path)
