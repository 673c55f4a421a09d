#!/usr/bin/env python
"""Reduced-NFE sampling quality study (ROADMAP item 2 / VERDICT r3 item 1).

With trained weights, compare the eval protocol's DDIM-25 (cosine T=25,
identity ddim25 respacing — exactly what train/eval.py, serve and the
reference test_fn run) against DPM-Solver++ multistep at 5/10/15/20 steps
(integrating a cosine T=500 schedule) on a held-out synthetic WV3 test set:
metric quality vs NFE count. The point: how far can serving NFE be cut
before metrics move.

Weights: --weights <orbax dir> (the scripts/train_real.py checkpoint; EMA
params by default) or, absent that, the legacy PARITY_E2E pickle cache
(/tmp/parity_e2e_params.pkl). Runs on whatever backend jax picks.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SEED = 11
CHANNELS = 8
DIVISION = 2047.0
SIZE = 64
T = 500
N_TEST = 8


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="orbax checkpoint dir (e.g. runs/real_train/weights)")
    ap.add_argument("--no-ema", dest="use_ema", action="store_false",
                    default=True)
    ap.add_argument("--desc", default=None,
                    help="one-line weight provenance for the report header")
    args = ap.parse_args()

    from difpan_tpu.data import PanDataset, make_synthetic_pan_h5, pack_cond
    from difpan_tpu.diffusion import (DiffusionConfig, ddim_sample_loop,
                                      make_beta_schedule, respace,
                                      schedule_from_betas)
    from difpan_tpu.metrics import AnalysisPanAcc
    from difpan_tpu.solvers import DPMSolver, NoiseScheduleVP, model_wrapper
    from difpan_tpu.train import TrainConfig
    from difpan_tpu.train.engine import build_model

    model = build_model(TrainConfig(
        dataset_name="wv3", image_n_channel=CHANNELS, pan_channel=1,
        image_size=SIZE))

    if args.weights:
        from difpan_tpu.utils.checkpoints import restore_for_model
        state = restore_for_model(args.weights, model, image_size=SIZE)
        params = state.ema_params if args.use_ema else state.params
        step = int(state.step)
        desc = args.desc or (
            f"orbax checkpoint {args.weights} @ step {step} "
            f"({'EMA' if args.use_ema else 'raw'} params)")
    else:
        cache = os.environ.get("PARITY_E2E_CACHE",
                               "/tmp/parity_e2e_params.pkl")
        with open(cache, "rb") as f:
            params = pickle.load(f)
        desc = args.desc or ("the PARITY_E2E harness checkpoint (150 "
                             "iters, synthetic WV3)")

    test = make_synthetic_pan_h5(n=N_TEST, channels=CHANNELS, size=SIZE,
                                 division=DIVISION, seed=SEED + 1)
    ds = PanDataset(test, norm_range=False, division=DIVISION, wavelets=True)
    pan, lms, gt, wav = ds.batch(np.arange(len(ds)))
    cond = pack_cond(jnp.asarray(lms), jnp.asarray(pan), jnp.asarray(wav))

    betas = make_beta_schedule("cosine", T, cosine_s=8e-3)
    dcfg = DiffusionConfig(channels=CHANNELS, pred_mode="x_start",
                           loss_type="l1", clamp_range=(0.0, 1.0),
                           self_condition=True)

    def metrics_for(sample):
        sr = np.clip(np.asarray(sample) + lms, 0.0, 1.0)
        analysis = AnalysisPanAcc()
        analysis(gt, sr)
        return dict(analysis.acc_ave)

    rows = []

    def cache_fn(p):
        return model.apply({"params": p}, None, None, cond, cond_only=True)

    # protocol baseline: cosine T=25, identity ddim25 respacing — the
    # trajectory the eval protocol actually samples (NOT a T=500 respace)
    sched_re, _ = respace(schedule_from_betas(
        make_beta_schedule("cosine", 25, cosine_s=8e-3)), "ddim25")

    @jax.jit
    def run_ddim(p, key):
        c = cache_fn(p)

        def model_fn(x, t, cc, sc, k):
            return model.apply({"params": p}, x, t, None, sc, train=False,
                               cond_cache=c)

        return ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)

    t0 = time.time()
    s = run_ddim(params, jax.random.PRNGKey(0))
    s.block_until_ready()
    rows.append(("DDIM-25 (protocol, cosine T=25)", 25, metrics_for(s),
                 time.time() - t0))
    print("ddim25 done", flush=True)

    ns = NoiseScheduleVP("discrete", betas=betas)
    for order, steps in [(2, 20), (2, 15), (2, 10), (3, 10), (2, 5)]:
        @jax.jit
        def run_dpm(p, key, steps=steps, order=order):
            c = cache_fn(p)

            def x0_model(xx, t_input):
                return model.apply({"params": p}, xx, t_input, None,
                                   train=False, cond_cache=c)

            model_fn = model_wrapper(x0_model, ns, model_type="x_start")
            solver = DPMSolver(
                model_fn, ns, algorithm_type="dpmsolver++",
                correcting_x0_fn=lambda x0, t: jnp.clip(x0, -1, 1))
            xT = jax.random.normal(key, cond.shape[:3] + (CHANNELS,))
            return solver.sample(xT, steps=steps, order=order,
                                 method="multistep",
                                 skip_type="time_uniform")

        t0 = time.time()
        s = run_dpm(params, jax.random.PRNGKey(0))
        s.block_until_ready()
        rows.append((f"DPM-Solver++ o{order}", steps, metrics_for(s),
                     time.time() - t0))
        print(f"dpm o{order} s{steps} done", flush=True)

    keys = list(rows[0][2].keys())
    lines = [
        "# NFE_STUDY — sampling quality vs NFE (trained weights)",
        "",
        f"Weights: {desc} (synthetic WV3 8-band 64x64, residual x_start "
        "objective). Baseline: the eval protocol's cosine T=25 identity "
        "ddim25 respacing; DPM rows integrate a cosine T=500 schedule. "
        "Held-out synthetic test set, same x_T seed; "
        "`sr=(sample+lms).clip(0,1)`; AnalysisPanAcc metrics.",
        "",
        "| sampler | NFE | " + " | ".join(keys) + " | wall (first run, s) |",
        "|---|---|" + "---|" * (len(keys) + 1),
    ]
    base = rows[0][2]
    for name, nfe, m, wall in rows:
        vals = " | ".join(f"{m[k]:.4f}" for k in keys)
        lines.append(f"| {name} | {nfe} | {vals} | {wall:.1f} |")
    lines += [
        "",
        "Deltas vs the DDIM-25 protocol baseline:",
        "",
        "| sampler | NFE | " + " | ".join(f"d{k}" for k in keys) + " |",
        "|---|---|" + "---|" * len(keys),
    ]
    for name, nfe, m, _ in rows[1:]:
        vals = " | ".join(
            f"{(m[k] - base[k]) / (abs(base[k]) + 1e-12):+.2%}"
            for k in keys)
        lines.append(f"| {name} | {nfe} | {vals} |")
    lines += [
        "",
        "Reading: NFE is the serving-cost axis (sampling throughput scales "
        "~1/NFE). Deltas within the seed-to-seed spread measured in "
        "PARITY_E2E.md (<0.01%) are noise.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "NFE_STUDY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
