#!/usr/bin/env python
"""Offline engine-protocol validation of durable checkpoints.

Replays EXACTLY the train-loop validation block (DDIM-25 on EMA params,
`train/engine.py` make_sample_fn + AnalysisPanAcc) on an arbitrary valid
set — used at the round-5 sensor-regime change to baseline the 50k/70k
checkpoints on the NEW sensor-pinned valid set so the relaunched run's
valid.jsonl rows have a comparable starting point (the in-run rows <= 70k
were computed against the old multi-sensor valid set and are not
comparable across the regime boundary). Reference protocol:
/root/reference/diffusion_engine.py:286-298 (ddim25, EMA weights).

Usage:
  python scripts/eval_ckpt_valid.py --ckpt ckpts/wald/ckpt \
      --steps 50000 70000 --sensor-seed 43 [--cpu] [--out out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/wald/ckpt")
    ap.add_argument("--steps", type=int, nargs="+", default=None,
                    help="checkpoint steps (default: all present)")
    ap.add_argument("--n-valid", type=int, default=64)
    ap.add_argument("--valid-seed", type=int, default=43)
    ap.add_argument("--sensor-seed", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (leave the tunnel chip to the trainer)")
    ap.add_argument("--raw", action="store_true",
                    help="evaluate the RAW params instead of the EMA — "
                         "separates EMA lag from genuine model quality "
                         "during a data-regime transition")
    ap.add_argument("--out", default=None, help="JSON output path")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    # persistent compile cache — the CPU jit of the ddim25 UNet scan takes
    # tens of minutes on this 1-core host; share it with the test suite
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np

    from difpan_tpu.data import PanDataset, get_dataset_spec
    from difpan_tpu.data.loader import batch_iterator
    from difpan_tpu.data.synthetic import make_wald_pan_h5_chunked
    from difpan_tpu.metrics import AnalysisPanAcc
    from difpan_tpu.train import TrainConfig
    from difpan_tpu.train.engine import (build_diffusion, build_model,
                                         make_sample_fn)

    cfg = TrainConfig(dataset_name="wv3", image_n_channel=8, pan_channel=1,
                      compute_dtype="bfloat16",
                      valid_batch_size=min(16, args.n_valid))
    spec = get_dataset_spec(cfg.dataset_name)

    d_valid = make_wald_pan_h5_chunked(
        n=args.n_valid, channels=8, size=64, division=2047.0,
        seed=args.valid_seed, sensor_seed=args.sensor_seed)
    ds = PanDataset(d_valid, norm_range=False, division=spec.division,
                    wavelets=True)

    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    sample_fn = jax.jit(make_sample_fn(cfg, model, dcfg, sched))

    steps = args.steps
    if steps is None:
        steps = sorted(int(d) for d in os.listdir(args.ckpt) if d.isdigit())

    # template once; restore_checkpoint(step=...) selects the exact step
    # (restore_for_model always takes the latest)
    from difpan_tpu.train.state import create_train_state, make_optimizer
    from difpan_tpu.utils.checkpoints import restore_checkpoint
    c = model.lms_channel
    cond_ch = 2 * c + 4 * model.pan_channel
    p0 = model.init({"params": jax.random.PRNGKey(0)},
                    jnp.zeros((1, cfg.image_size, cfg.image_size, c)),
                    jnp.array([0]),
                    jnp.zeros((1, cfg.image_size, cfg.image_size,
                               cond_ch)), train=False)["params"]
    template = create_train_state(p0, make_optimizer())

    results = {}
    for step in steps:
        state = restore_checkpoint(args.ckpt, template, step=step)

        analysis = AnalysisPanAcc(ergas_ratio=spec.ergas_ratio)
        key = jax.random.PRNGKey(1234)
        for vbatch in batch_iterator(ds, cfg.valid_batch_size,
                                     epochs=1, shuffle=False):
            pan, lms, gt, wavelets = vbatch
            n_real = pan.shape[0]
            if n_real < cfg.valid_batch_size:
                def _pad(a):
                    reps = cfg.valid_batch_size - n_real
                    return np.concatenate(
                        [a, np.repeat(a[-1:], reps, axis=0)], axis=0)
                pan, lms, wavelets = map(_pad, (pan, lms, wavelets))
            key, vkey = jax.random.split(key)
            p_eval = state.params if args.raw else state.ema_params
            sr = sample_fn(p_eval, vkey, jnp.asarray(pan),
                           jnp.asarray(lms), jnp.asarray(wavelets))
            analysis(np.asarray(gt),
                     np.asarray(jax.device_get(sr))[:n_real])
        rec = {k: float(v) for k, v in analysis.acc_ave.items()}
        results[str(step)] = rec
        print(f"[eval_ckpt] step {step}: {rec}", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"ckpt": args.ckpt, "n_valid": args.n_valid,
                       "valid_seed": args.valid_seed,
                       "sensor_seed": args.sensor_seed,
                       "protocol": "engine DDIM-25 on EMA params",
                       "results": results}, f, indent=1)
        print(f"[eval_ckpt] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
