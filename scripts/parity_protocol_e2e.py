#!/usr/bin/env python
"""End-to-end metric-parity harness (VERDICT item 6).

Protocol: train difpan_tpu for N steps on synthetic WV3-like data, reverse-
convert the EMA weights to the reference layout
(`utils/torch_convert.py:convert_to_reference_state_dict`), then run BOTH
eval protocols on the same synthetic test h5:

  * the PyTorch reference `test_fn` flow (`/root/reference/
    diffusion_engine.py:351-505`): cosine(T) schedule, ddim25 respacing,
    sr = (sample + lms).clip(0,1), AnalysisPanAcc metrics;
  * our `difpan_tpu.train.eval.evaluate` with the same settings.

Two comparisons are reported:
  A. deterministic: both samplers fed the SAME x_T -> per-pixel sample
     delta and per-metric delta (isolates math parity from RNG);
  B. protocol-level: each side draws its own x_T -> metric deltas, put in
     context against our own seed-to-seed spread.

Writes PARITY_E2E.md at the repo root. Run from the repo root (CPU is fine;
the jax side is forced to CPU so both sides share a platform).
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SEED = 11
CHANNELS = 8          # WV3
DIVISION = 2047.0
SIZE = 64
T = 500               # diffusion T at eval (respaced to ddim25)
TRAIN_T = 100
TRAIN_ITERS = 150
BATCH = 8
N_TEST = 8


def log(*a):
    print(*a, flush=True)


def make_data():
    from difpan_tpu.data import make_synthetic_pan_h5
    train = make_synthetic_pan_h5(n=32, channels=CHANNELS, size=SIZE,
                                  division=DIVISION, seed=SEED)
    test = make_synthetic_pan_h5(n=N_TEST, channels=CHANNELS, size=SIZE,
                                 division=DIVISION, seed=SEED + 1)
    return train, test


def train_ours(train_h5):
    from difpan_tpu.data import PanDataset
    from difpan_tpu.train import TrainConfig, create_train_state
    from difpan_tpu.train.engine import (build_diffusion, build_model,
                                         make_train_step)
    from difpan_tpu.train.state import make_optimizer

    cfg = TrainConfig(
        dataset_name="wv3", image_n_channel=CHANNELS, pan_channel=1,
        image_size=SIZE, n_steps=TRAIN_T, batch_size=BATCH, lr_d=1e-3,
        grad_clip_norm=1.0, ema_start_iter=20, ema_decay=0.9)
    ds = PanDataset(train_h5, norm_range=False, division=DIVISION,
                    wavelets=True)
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(cfg.lr_d, cfg.weight_decay,
                        grad_clip_norm=cfg.grad_clip_norm)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, SIZE, SIZE, CHANNELS)), jnp.array([0]),
        jnp.zeros((1, SIZE, SIZE, 2 * CHANNELS + 4)), train=False)["params"]
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, model, dcfg, sched, tx),
                   donate_argnums=(0,))
    rng = np.random.default_rng(SEED)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for it in range(TRAIN_ITERS):
        idx = rng.permutation(len(ds))[:BATCH]
        batch = tuple(jnp.asarray(a) for a in ds.batch(idx))
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        if (it + 1) % 50 == 0:
            log(f"  train iter {it + 1}: loss {float(loss):.4f}")
    log(f"trained {TRAIN_ITERS} iters in {time.time() - t0:.0f}s")
    return jax.device_get(state.ema_params), model


def _install_timm_stub():
    import torch
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tl.DropPath = DropPath
    sys.modules.update({"timm": timm, "timm.models": tm,
                        "timm.models.layers": tl})

    # torchvision isn't installed either; the reference dataset only
    # CONSTRUCTS transforms (aug_prob=0 keeps them unused at eval), so bare
    # constructor shims suffice
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class _Noop:
        def __init__(self, *a, **kw):
            pass

        def __call__(self, *a):
            return a if len(a) > 1 else a[0]

    for name in ("Compose", "RandomHorizontalFlip", "RandomVerticalFlip",
                 "RandomChoice", "Lambda", "RandomApply", "RandomErasing"):
        setattr(tvt, name, _Noop)
    tv.transforms = tvt
    sys.modules.update({"torchvision": tv, "torchvision.transforms": tvt})

    # pywt isn't installed; our ops/wavelet.py haar_dwt2 is an exact
    # pywt.wavedec2(..., 'db1', level=1) equivalent (golden-tested), so the
    # stub delegates to it
    from difpan_tpu.ops.wavelet import haar_dwt2

    pywt = types.ModuleType("pywt")

    def wavedec2(data, wavelet, level=1, axes=(-2, -1)):
        assert wavelet == "db1" and level == 1
        assert tuple(axes) in ((-2, -1), (2, 3))
        ll, (h, v, d) = haar_dwt2(np.asarray(data))
        return [ll, (h, v, d)]

    pywt.wavedec2 = wavedec2
    sys.modules["pywt"] = pywt

    # skimage isn't installed; our metrics/pan_acc.py carries verified
    # skimage-equivalents (same float-input defaults: data_range=2.0,
    # uniform 7x7 window, border crop)
    from difpan_tpu.metrics.pan_acc import psnr_conventional, ssim_skimage

    sk = types.ModuleType("skimage")
    skm = types.ModuleType("skimage.metrics")

    def peak_signal_noise_ratio(image_true, image_test, data_range=None):
        # skimage float-dtype default: range (-1, 1) => data_range 2
        return psnr_conventional(np.asarray(image_true),
                                 np.asarray(image_test),
                                 data_range=data_range or 2.0)

    def structural_similarity(im1, im2, win_size=7, data_range=None,
                              channel_axis=None, **kw):
        return ssim_skimage(np.asarray(im1), np.asarray(im2),
                            win_size=win_size,
                            data_range=data_range or 2.0,
                            channel_axis=channel_axis)

    skm.peak_signal_noise_ratio = peak_signal_noise_ratio
    skm.structural_similarity = structural_similarity
    sk.metrics = skm
    sys.modules.update({"skimage": sk, "skimage.metrics": skm})


def torch_protocol(test_h5, ema_params, init_noise_nchw=None, seed=0):
    """The reference test_fn flow on CPU with the reverse-converted weights.
    Returns (sr_list NCHW in [0,1], metrics dict)."""
    import torch
    _install_timm_stub()
    sys.path.insert(0, "/root/reference")
    from models.sr3_dwt import UNetSR3
    from diffusion.diffusion_ddpm_pan import (GaussianDiffusion,
                                              make_beta_schedule)
    from dataset.pan_dataset import PanDataset as RefPanDataset
    from utils.metric import AnalysisPanAcc
    import torch.nn.functional as F

    from difpan_tpu.utils.torch_convert import convert_to_reference_state_dict

    sd = {k: torch.tensor(np.asarray(v)) for k, v in
          convert_to_reference_state_dict(ema_params).items()}
    net = UNetSR3(in_channel=CHANNELS, out_channel=CHANNELS,
                  lms_channel=CHANNELS, pan_channel=1, inner_channel=32,
                  norm_groups=1, channel_mults=(1, 2, 2, 4), attn_res=(8,),
                  dropout=0.2, image_size=64, self_condition=True)
    missing, unexpected = net.load_state_dict(sd, strict=True), None
    net.eval()
    g = GaussianDiffusion(net, image_size=SIZE, channels=CHANNELS,
                          pred_mode="x_start", loss_type="l1", device="cpu",
                          clamp_range=(0, 1))
    g.set_new_noise_schedule(
        betas=make_beta_schedule("cosine", T, cosine_s=8e-3))

    class _H5:
        def __init__(self, d):
            self._d = {k: np.asarray(v) for k, v in d.items()}

        def __getitem__(self, k):
            return self._d[k]

        def get(self, k, default=None):
            return self._d.get(k, default)

    ds = RefPanDataset(_H5(test_h5), full_res=False, norm_range=False,
                       division=DIVISION, wavelets=True)
    pan, lms, hr, wav = [torch.stack([ds[i][j] for i in range(len(ds))])
                         for j in range(4)]
    cond = torch.cat(
        [lms, pan, F.interpolate(wav, size=lms.shape[-1], mode="bilinear")],
        dim=1)

    torch.manual_seed(seed)
    if init_noise_nchw is not None:
        fixed = torch.tensor(init_noise_nchw)
        orig_randn = torch.randn

        def fake_randn(*shape, **kw):
            if tuple(shape[0] if isinstance(shape[0], (tuple, torch.Size))
                     else shape) == tuple(fixed.shape):
                return fixed.clone()
            return orig_randn(*shape, **kw)

        torch.randn = fake_randn
    try:
        with torch.no_grad():
            sr = g(cond, mode="ddim_sample", section_counts="ddim25")
    finally:
        if init_noise_nchw is not None:
            torch.randn = orig_randn
    sr = (sr + lms).clip(0, 1)
    analysis = AnalysisPanAcc()
    analysis(hr, sr)
    return sr.numpy(), dict(analysis.acc_ave)


def ours_protocol(test_h5, ema_params, model, init_noise_nhwc=None, seed=0):
    """Our evaluate() protocol; optionally with an injected x_T (then the
    sampler is driven directly with the same math evaluate uses)."""
    from difpan_tpu.train.eval import evaluate

    if init_noise_nhwc is None:
        null = type("L", (), {"print": staticmethod(lambda *a: None)})()
        m = evaluate(test_h5, ema_params, "wv3", n_steps=T,
                     section_counts="ddim25", batch_size=N_TEST, model=model,
                     logger=null, seed=seed)
        return None, m

    from difpan_tpu.data import PanDataset, pack_cond
    from difpan_tpu.diffusion import (DiffusionConfig, make_beta_schedule,
                                      respace, schedule_from_betas,
                                      ddim_sample_loop)
    from difpan_tpu.metrics import AnalysisPanAcc
    ds = PanDataset(test_h5, norm_range=False, division=DIVISION,
                    wavelets=True)
    pan, lms, gt, wav = ds.batch(np.arange(len(ds)))
    cond = pack_cond(jnp.asarray(lms), jnp.asarray(pan), jnp.asarray(wav))
    dcfg = DiffusionConfig(channels=CHANNELS, pred_mode="x_start",
                           loss_type="l1", clamp_range=(0.0, 1.0),
                           self_condition=True)
    sched_re, _ = respace(schedule_from_betas(
        make_beta_schedule("cosine", T, cosine_s=8e-3)), "ddim25")
    cache = model.apply({"params": ema_params}, None, None, cond,
                        cond_only=True)

    def model_fn(x, t, c, sc, k):
        return model.apply({"params": ema_params}, x, t, None, sc,
                           train=False, cond_cache=cache)

    s = ddim_sample_loop(dcfg, sched_re, model_fn, jax.random.PRNGKey(seed),
                         cond, init_noise=jnp.asarray(init_noise_nhwc))
    sr = np.clip(np.asarray(s) + lms, 0.0, 1.0)
    analysis = AnalysisPanAcc()
    analysis(gt, sr)
    return np.transpose(sr, (0, 3, 1, 2)), dict(analysis.acc_ave)


def main():
    import argparse
    import pickle
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint dir (e.g. runs/real_train/"
                         "weights): use its EMA params instead of the "
                         "quick 150-iter harness training")
    ap.add_argument("--desc", default=None,
                    help="one-line weight provenance for the report")
    args = ap.parse_args()
    train_h5, test_h5 = make_data()
    cache = os.environ.get("PARITY_E2E_CACHE", "/tmp/parity_e2e_params.pkl")
    provenance = None
    if args.weights:
        from difpan_tpu.train import TrainConfig
        from difpan_tpu.train.engine import build_model
        from difpan_tpu.utils.checkpoints import restore_for_model
        model = build_model(TrainConfig(
            dataset_name="wv3", image_n_channel=CHANNELS, pan_channel=1,
            image_size=SIZE))
        state = restore_for_model(args.weights, model, image_size=SIZE)
        ema_params = jax.device_get(state.ema_params)
        provenance = args.desc or (
            f"orbax checkpoint {args.weights} @ step {int(state.step)} "
            "(EMA params; scripts/train_real.py run)")
        log(f"loaded {provenance}")
    elif cache and os.path.exists(cache):
        log(f"loading trained EMA params from {cache} ...")
        with open(cache, "rb") as f:
            ema_params = pickle.load(f)
        from difpan_tpu.train import TrainConfig
        from difpan_tpu.train.engine import build_model
        model = build_model(TrainConfig(
            dataset_name="wv3", image_n_channel=CHANNELS, pan_channel=1,
            image_size=SIZE, n_steps=TRAIN_T, batch_size=BATCH))
    else:
        log("training difpan_tpu ...")
        ema_params, model = train_ours(train_h5)
        if cache:
            with open(cache, "wb") as f:
                pickle.dump(jax.device_get(ema_params), f)

    xt = np.random.default_rng(99).standard_normal(
        (N_TEST, CHANNELS, SIZE, SIZE)).astype(np.float32)
    xt_nhwc = np.transpose(xt, (0, 2, 3, 1))

    log("A. deterministic (shared x_T) ...")
    sr_t, m_t = torch_protocol(test_h5, ema_params, init_noise_nchw=xt)
    sr_j, m_j = ours_protocol(test_h5, ema_params, model,
                              init_noise_nhwc=xt_nhwc)
    pix = float(np.max(np.abs(sr_t - sr_j)))
    log(f"  max |sr_torch - sr_ours| = {pix:.3e}")

    log("B. protocol-level (independent x_T) ...")
    _, m_t2 = torch_protocol(test_h5, ema_params, seed=1)
    _, m_j2 = ours_protocol(test_h5, ema_params, model, seed=2)
    _, m_j3 = ours_protocol(test_h5, ema_params, model, seed=3)

    lines = [
        "# PARITY_E2E — end-to-end metric parity vs the PyTorch reference",
        "",
        (f"Weights: {provenance}. Protocol: reverse-convert EMA weights "
         if provenance else
         f"Protocol: train difpan_tpu {TRAIN_ITERS} iters (synthetic WV3 "
         f"8-band, {SIZE}x{SIZE}, T={TRAIN_T}), reverse-convert EMA "
         "weights ")
        + "(`utils/torch_convert.py:convert_to_reference_state_dict`), run "
        + f"the reference `test_fn` flow (cosine T={T}, ddim25, "
        + "`sr=(sample+lms).clip(0,1)`, AnalysisPanAcc) and ours "
        + "(`train/eval.py:evaluate`) on the same synthetic test h5.",
        "",
        "## A. Deterministic comparison (shared x_T)",
        "",
        f"max per-pixel |sr_torch − sr_ours| = **{pix:.3e}**",
        "",
        "| metric | torch reference | difpan_tpu | rel. delta |",
        "|---|---|---|---|",
    ]
    for k in m_t:
        rel = abs(m_j[k] - m_t[k]) / (abs(m_t[k]) + 1e-12)
        lines.append(f"| {k} | {m_t[k]:.6f} | {m_j[k]:.6f} | {rel:.2%} |")
    lines += [
        "",
        "## B. Protocol-level comparison (independent x_T draws)",
        "",
        "| metric | torch (seed 1) | ours (seed 2) | ours (seed 3) | "
        "torch-vs-ours delta | our seed spread |",
        "|---|---|---|---|---|---|",
    ]
    for k in m_t2:
        d = abs(m_j2[k] - m_t2[k]) / (abs(m_t2[k]) + 1e-12)
        s = abs(m_j2[k] - m_j3[k]) / (abs(m_j2[k]) + 1e-12)
        lines.append(
            f"| {k} | {m_t2[k]:.6f} | {m_j2[k]:.6f} | {m_j3[k]:.6f} | "
            f"{d:.2%} | {s:.2%} |")
    ergas_rel = abs(m_j[k_e] - m_t[k_e]) / abs(m_t[k_e]) \
        if (k_e := "ERGAS") in m_t else float("nan")
    lines += [
        "",
        f"**ERGAS deterministic delta: {ergas_rel:.3%}** "
        "(BASELINE.md target: within 1%).",
        "",
        "Notes: comparison A isolates framework math (model forward, DDIM "
        "respacing/updates, clip protocol, metric implementations) from "
        "sampler RNG; comparison B shows full-protocol numbers where each "
        "framework draws its own Gaussian x_T, against our own seed-to-seed "
        "spread as the noise floor.",
    ]
    report = "\n".join(lines) + "\n"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_E2E.md")
    with open(out, "w") as f:
        f.write(report)
    log(report)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
