#!/usr/bin/env python
"""Headline benchmark: fused megapixels/sec/chip for 20-step DPM-Solver++
sampling on the WV3 pansharpening config (8-band UNetSR3-DWT, 256x256
reduced-res eval tiles) — the BASELINE.md north-star metric.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

vs_baseline is measured against the driver target of 10x the PyTorch
reference's CPU sampling throughput. The reference number was measured once
in this environment (single-core CPU, torch 2.13):
UNetSR3(sr3_dwt engine config) @ 1x8x256x256 takes 3.518 s/forward
=> 256*256/1e6 / (3.518 * 20) = 9.31e-4 MP/s at 20 NFE.
"""

import argparse
import json
import sys
import time

REFERENCE_CPU_MPS = 9.31e-4   # measured: see module docstring
TARGET_MULTIPLier = 10.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=24)  # best of {4,16,24,32}
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--steps", type=int, default=None,
                   help="NFE; default per sampler (dpm: 20, ddim: 25)")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--channels", type=int, default=8)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["f32", "bf16"])
    p.add_argument("--pallas", action="store_true",
                   help="use the fused Pallas GN+Swish / FWM kernels")
    p.add_argument("--fp8-attn", action="store_true",
                   help="e4m3-quantized Q/K/V in the flash-attention path "
                        "(active at >=512px where attention runs on 4096 "
                        "tokens)")
    p.add_argument("--cond-evict-res", type=int, default=None,
                   help="evict cond-cache entries above this resolution "
                        "(recompute in-scan) — HBM headroom for large "
                        "tiles/batches, e.g. --cond-evict-res 256 at 512px")
    p.add_argument("--sampler", default="dpm", choices=["dpm", "ddim"],
                   help="dpm = 20-step DPM-Solver++ (the headline metric); "
                        "ddim = the eval protocol's DDIM (cosine T=NFE, "
                        "identity ddim respacing — exactly what "
                        "train/eval.py, serve and the reference test_fn "
                        "run; --steps NFE, default 25)")
    args = p.parse_args()
    if args.steps is None:
        args.steps = 25 if args.sampler == "ddim" else 20

    import jax
    import jax.numpy as jnp
    import numpy as np

    from difpan_tpu.diffusion import make_beta_schedule
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.solvers import DPMSolver, NoiseScheduleVP, model_wrapper

    c, pc = args.channels, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
        attn_res=(8,), res_blocks=3, dropout=0.2, image_size=64,
        self_condition=True, use_pallas=args.pallas,
        fp8_attn=args.fp8_attn)

    rng = jax.random.PRNGKey(0)
    b, s = args.batch, args.size
    cond_ch = 2 * c + 4 * pc
    x = jax.random.normal(rng, (1, 64, 64, c))
    cond_init = jnp.zeros((1, 64, 64, cond_ch))
    params = model.init({"params": rng}, x, jnp.array([0]), cond_init,
                        train=False)["params"]

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if args.dtype == "bf16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)

    ns = NoiseScheduleVP(
        "discrete", betas=make_beta_schedule("cosine", 500, cosine_s=8e-3))

    cond = jax.random.normal(jax.random.PRNGKey(1), (b, s, s, cond_ch),
                             dtype)

    # with --cond-evict-res the evicted (full-res) cache entries are None
    # and the forward recomputes them from `cond` inside the scan
    cond_in_scan = cond if args.cond_evict_res is not None else None

    def x0_model(xx, t_input, cache):
        # engine parity: the denoiser predicts x_start (residual); model
        # receives the discrete-time input like during DDIM training.
        # The cond features are loop-invariant across the 20 NFE steps and
        # enter via the precomputed cache (hoisted out of the solver scan).
        return model.apply({"params": params}, xx, t_input, cond_in_scan,
                           train=False, cond_cache=cache)

    if args.sampler == "ddim":
        from difpan_tpu.diffusion import (DiffusionConfig, respace,
                                          schedule_from_betas,
                                          ddim_sample_loop)
        # the eval protocol (train/eval.py, serve.py, reference test_fn)
        # builds a cosine T=NFE schedule and respaces it to ddim{NFE} — an
        # identity respacing; bench the same trajectory, not a T=500 respace
        nfe = args.steps
        dcfg = DiffusionConfig(channels=c, pred_mode="x_start",
                               loss_type="l1", clamp_range=(0.0, 1.0),
                               self_condition=True)
        sched_re, _ = respace(schedule_from_betas(
            make_beta_schedule("cosine", nfe, cosine_s=8e-3)), f"ddim{nfe}")

        @jax.jit
        def run(key):
            cache = model.apply({"params": params}, None, None, cond,
                                cond_only=True,
                                cache_max_res=args.cond_evict_res)

            def model_fn(x, t, cc, sc, k):
                out = model.apply({"params": params}, x.astype(dtype), t,
                                  cond_in_scan, sc.astype(dtype),
                                  train=False, cond_cache=cache)
                return out.astype(jnp.float32)

            return ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
    else:
        @jax.jit
        def run(key):
            cache = model.apply({"params": params}, None, None, cond,
                                cond_only=True,
                                cache_max_res=args.cond_evict_res)
            model_fn = model_wrapper(
                lambda xx, tt: x0_model(xx, tt, cache), ns,
                model_type="x_start")
            solver = DPMSolver(
                model_fn, ns, algorithm_type="dpmsolver++",
                correcting_x0_fn=lambda x0, t: jnp.clip(x0, -1, 1))
            xT = jax.random.normal(key, (b, s, s, c), dtype)
            return solver.sample(xT, steps=args.steps, order=2,
                                 method="multistep", skip_type="time_uniform")

    # compile + warmup
    out = run(jax.random.PRNGKey(2))
    out.block_until_ready()

    times = []
    for i in range(args.iters):
        k = jax.random.PRNGKey(3 + i)
        t0 = time.perf_counter()
        run(k).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    mps = b * s * s / 1e6 / dt

    metric = ("wv3_dpmsolver20_sampling_throughput" if args.sampler == "dpm"
              else "wv3_ddim_protocol_sampling_throughput")
    result = {
        "metric": metric,
        "value": round(mps, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / (TARGET_MULTIPLier * REFERENCE_CPU_MPS),
                             4),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
