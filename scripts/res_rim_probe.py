"""Discriminate WHY wald-scene quality IMPROVES with resolution
(RES_SWEEP.md's oddity: SAM 6.03@64px -> 4.61@512px for a model trained
at 64px; VERDICT r5 item 9).

Two candidate mechanisms, both predicting ~1/size error dilution:

  R (rim): the Wald degradation chain (MTF Gaussian blur, decimation,
    bicubic re-up — `data/synthetic.py`) and the UNet's zero-padded convs
    both have edge effects of FIXED pixel width, so the high-error border
    rim's area share falls as 1/size (at 64px a 8-px rim is 44% of the
    image; at 512px it is 6%).
  C (content): the scene generator draws a FIXED COUNT of geometric
    overlays per scene (2-6 rectangles, 1-3 one/two-px lines,
    `data/synthetic.py:_structured_scenes`) regardless of size — the
    sharpest, hardest content — while abundance-boundary density is
    size-stationary. Overlay pixel share also falls ~1/size.

Test: one x0 (NFE=1) forward per size on protocol scenes (seed 7, the
RES_SWEEP scene family), then compute plain SAM (numpy acos, NOT the
quirk-exact parity metric — this is a mechanism probe) with border
exclusion r in {1, 8, 16}:
  - if interior-only (r=16) SAM flattens across sizes -> R dominates;
  - if interior SAM still falls with size -> C (content dilution).

Usage: python scripts/res_rim_probe.py [--sizes 64,128,256] [--out f.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plain_sam_deg(gt, sr, rim):
    """Mean spectral angle (degrees) over pixels, excluding a `rim`-px
    border. gt/sr: (H, W, C) in [0, 1]."""
    import numpy as np

    g = gt[rim:-rim, rim:-rim].reshape(-1, gt.shape[-1]).astype(np.float64)
    s = sr[rim:-rim, rim:-rim].reshape(-1, sr.shape[-1]).astype(np.float64)
    num = (g * s).sum(-1)
    den = np.sqrt((g * g).sum(-1) * (s * s).sum(-1)) + 1e-12
    return float(np.degrees(np.arccos(np.clip(num / den, -1, 1))).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="ckpts/cave/ckpt")
    ap.add_argument("--sizes", default="64,128,256")
    ap.add_argument("--rims", default="1,8,16")
    ap.add_argument("--n-scenes", type=int, default=4)
    ap.add_argument("--out", default="runs/res_rim.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np

    from difpan_tpu.data import HISRDataSets
    from difpan_tpu.data.loader import pack_cond
    from difpan_tpu.data.synthetic import make_wald_hisr_h5
    from difpan_tpu.train import TrainConfig
    from difpan_tpu.train.engine import (_dtype_casts, build_diffusion,
                                         build_model)
    from difpan_tpu.train.state import create_train_state, make_optimizer
    from difpan_tpu.utils.checkpoints import restore_checkpoint

    cfg = TrainConfig(dataset_name="cave", image_n_channel=31,
                      pan_channel=3, compute_dtype="bfloat16")
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    cast_in, cast_out = _dtype_casts(cfg)
    c, pc = cfg.image_n_channel, cfg.pan_channel
    p0 = model.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, 64, 64, c)), jnp.array([0]),
                    jnp.zeros((1, 64, 64, 2 * c + 4 * pc)),
                    train=False)["params"]
    template = create_train_state(p0, make_optimizer())
    st = restore_checkpoint(os.path.abspath(args.weights), template)
    params = st.ema_params
    step = int(st.step)
    print(f"[rim] restored EMA @ {step}", flush=True)

    T = int(sched.betas.shape[0])
    sig_T = float(np.sqrt(1.0 - np.asarray(sched.alphas_cumprod)[T - 1]))

    def x0_fwd(params, pan_b, lms_b, wav_b, key):
        cond = pack_cond(jnp.asarray(lms_b), jnp.asarray(pan_b),
                         jnp.asarray(wav_b))
        lp = cast_in(params)
        xt = jax.random.normal(key, lms_b.shape) * sig_T
        t = jnp.full((lms_b.shape[0],), T - 1, jnp.int32)
        out = model.apply({"params": lp}, cast_in(xt), t, cast_in(cond),
                          cast_in(jnp.zeros_like(xt)), train=False)
        return cast_out(out)

    fwd = jax.jit(x0_fwd)

    sizes = [int(s) for s in args.sizes.split(",")]
    rims = [int(r) for r in args.rims.split(",")]
    rows = []
    for size in sizes:
        d = make_wald_hisr_h5(n=args.n_scenes, bands=31, size=size, seed=7)
        ds = HISRDataSets(d, wavelets=True)
        pan, lms, gt, wav = (np.asarray(a) for a in
                             ds.batch(np.arange(args.n_scenes)))
        t0 = time.time()
        x0 = np.asarray(fwd(params, pan, lms, wav,
                            jax.random.PRNGKey(7)), np.float32)
        sr = np.clip(x0 + lms, 0, 1)
        wall = time.time() - t0
        # lms baseline at the same rims: shows how much of the trend is the
        # TASK getting easier vs the model getting relatively better
        row = {"size": size, "wall_s": round(wall, 1)}
        for r in rims:
            row[f"sam_r{r}"] = round(np.mean(
                [plain_sam_deg(gt[i], sr[i], r)
                 for i in range(args.n_scenes)]), 4)
            row[f"sam_lms_r{r}"] = round(np.mean(
                [plain_sam_deg(gt[i], np.clip(lms[i], 0, 1), r)
                 for i in range(args.n_scenes)]), 4)
        rows.append(row)
        print(f"[rim] {row}", flush=True)
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"ckpt_step": step, "n_scenes": args.n_scenes,
                       "rows": rows}, f, indent=1)
    print(f"[rim] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
