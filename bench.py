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

# Measured practical compute roof of THIS environment's tunnel chip: a
# scan-chained 4096^3 bf16 matmul sustains 12.8 TFLOP/s (PERF.md round-1
# ceiling table; a real v5e peaks at 197 TFLOP/s bf16 — the tunnel adds
# per-dispatch and virtualization overheads that cap the achievable rate).
# Emitted alongside the MP/s headline so a flat MP/s trend is legible as
# ceiling saturation rather than stagnation (VERDICT r4 item 7).
TUNNEL_CEILING_TFLOPS = 12.8


def _stage(msg):
    """Progress lines go to stderr — stdout stays the ONE JSON line."""
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _probe_backend_once(timeout_s: float) -> tuple:
    """Try jax backend init + one tiny device op in a CHILD process (the
    axon outage modes are either `UNAVAILABLE` at init or an indefinite
    hang — both only killable from outside the process). Returns
    (ok, message)."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "d = jax.devices();"
            "print('PROBE_OK', d[0].platform, flush=True);"
            "x = jnp.ones((128, 128));"
            "(x @ x).block_until_ready()")
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"backend probe hung >{timeout_s:.0f}s"
    if "PROBE_OK" in p.stdout:
        return True, p.stdout.strip()
    tail = (p.stderr or p.stdout).strip().splitlines()
    return False, tail[-1] if tail else f"probe rc={p.returncode}"


def wait_for_backend(attempts: int = 5, base_delay: float = 20.0,
                     probe_timeout: float = 300.0, probe=None) -> None:
    """Retry backend init with exponential backoff (VERDICT r3 item 3: the
    round-3 headline number was zeroed by a transient tunnel outage that a
    single attempt could not ride out). Raises RuntimeError with the last
    probe message after `attempts` failures."""
    probe = probe or _probe_backend_once
    last = "no attempt made"
    for i in range(attempts):
        ok, last = probe(probe_timeout)
        if ok:
            if i:
                _stage(f"backend up after {i + 1} attempts")
            return
        delay = base_delay * (2 ** i)
        _stage(f"backend attempt {i + 1}/{attempts} failed ({last}); "
               f"retrying in {delay:.0f}s")
        time.sleep(delay)
    raise RuntimeError(f"backend unavailable after {attempts} attempts: "
                       f"{last}")


def pause_local_training(wait_s: float = 420.0) -> list:
    """The tunnel chip is exclusive: a live training run (scripts/
    run_400k.sh / run_cave_ext.sh) would wedge the bench at backend init.
    Those drivers honor a cooperative `PAUSE` file in their run dir and
    kill their trainer within ~2 minutes, so drop PAUSE next to every
    live train.pid and wait for the pids to exit. Returns the PAUSE
    paths created (caller removes them in a finally to resume)."""
    import glob
    import os
    paused, live = [], []
    for pidfile in glob.glob("runs/*/train.pid"):
        # drop PAUSE regardless of pid liveness: the pidfile goes stale
        # between restart attempts / while paused, and a driver about to
        # relaunch spins on PAUSE before launching — skipping dead pids
        # leaves that window unprotected (ADVICE r4)
        pause = os.path.join(os.path.dirname(pidfile), "PAUSE")
        open(pause, "w").close()
        paused.append(pause)
        try:
            pid = int(open(pidfile).read().strip())
            os.kill(pid, 0)
            live.append(pid)
            _stage(f"pausing live training (pid {pid}) via {pause}")
        except (ValueError, OSError):
            _stage(f"dropped {pause} (pid dead — guards a relaunch window)")
    deadline = time.time() + wait_s
    for pid in live:
        while time.time() < deadline:
            try:
                os.kill(pid, 0)
            except OSError:
                break
            time.sleep(5)
    if live:
        _stage("training paused; chip free")
    return paused


def resume_local_training(pause_files: list) -> None:
    import os
    for p in pause_files:
        try:
            os.remove(p)
            _stage(f"removed {p} — training resumes")
        except OSError:
            pass


def emit_error(metric: str, err: Exception) -> dict:
    """Persistent failure => still ONE parseable JSON line on stdout."""
    result = {"metric": metric, "value": None, "unit": "MP/s/chip",
              "vs_baseline": None,
              "error": f"{type(err).__name__}: {err}"}
    print(json.dumps(result))
    return result


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
    p.add_argument("--fp8-conv", action="store_true",
                   help="e4m3 3x3 convs in every ResnetBlock (the model's "
                        "FLOP bulk; 2x MXU rate on fp8-native v6e+, "
                        "upcast elsewhere)")
    p.add_argument("--dpm-grid", action="store_true",
                   help="the round-4 serving preset: DPM++ on the protocol "
                        "T=25 schedule, grid-aligned steps + final denoise "
                        "(NFE_STUDY.md group G: beats the DDIM-25 protocol "
                        "at NFE>=5 on the 47.5k checkpoint); NFE = --steps")
    p.add_argument("--cond-evict-res", type=int, default=None,
                   help="evict cond-cache entries above this resolution "
                        "(recompute in-scan) — HBM headroom for large "
                        "tiles/batches, e.g. --cond-evict-res 256 at 512px")
    p.add_argument("--sampler", default="dpm",
                   choices=["dpm", "ddim", "x0"],
                   help="dpm = 20-step DPM-Solver++ (the headline metric); "
                        "ddim = the eval protocol's DDIM (cosine T=NFE, "
                        "identity ddim respacing — exactly what "
                        "train/eval.py, serve and the reference test_fn "
                        "run; --steps NFE, default 25); x0 = the round-5 "
                        "NFE=1 posterior-mean serving mode (X0_STUDY.md) — "
                        "one forward pass, --steps is the schedule length "
                        "(default 3000, the engine's train schedule)")
    p.add_argument("--skip-probe", action="store_true",
                   help="skip the child-process backend probe (CPU runs, "
                        "tests)")
    p.add_argument("--probe-attempts", type=int, default=5)
    p.add_argument("--probe-base-delay", type=float, default=20.0)
    p.add_argument("--probe-timeout", type=float, default=300.0,
                   help="per-probe child timeout; the hang outage mode "
                        "never returns, so this bounds each attempt")
    args = p.parse_args()
    if args.steps is None:
        args.steps = {"ddim": 25, "dpm": 20, "x0": 3000}[args.sampler]

    metric = {"dpm": f"wv3_dpmsolver{args.steps}_sampling_throughput",
              "ddim": "wv3_ddim_protocol_sampling_throughput",
              "x0": "wv3_x0_posterior_mean_throughput"}[args.sampler]
    paused = [] if args.skip_probe else pause_local_training()
    try:
        return _run(args, metric)
    except Exception as e:           # noqa: BLE001 — headline evidence must
        emit_error(metric, e)        # never be a bare traceback
        sys.exit(1)
    finally:
        resume_local_training(paused)


def _run(args, metric):
    if not args.skip_probe:
        _stage("probing backend (child process)")
        wait_for_backend(attempts=args.probe_attempts,
                         base_delay=args.probe_base_delay,
                         probe_timeout=args.probe_timeout)

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
        fp8_attn=args.fp8_attn, fp8_conv=args.fp8_conv)

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

    # --dpm-grid: the round-4 serving preset (NFE_STUDY.md group G) —
    # protocol T=25 schedule, grid-aligned steps, final denoise; NFE
    # (model evals) stays args.steps: steps-1 solver steps + 1 denoise
    ns = NoiseScheduleVP(
        "discrete", betas=make_beta_schedule(
            "cosine", 25 if args.dpm_grid else 500, cosine_s=8e-3))

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

    if args.sampler == "x0":
        # NFE=1 posterior-mean mode (X0_STUDY.md): cond cache + ONE
        # denoiser eval from pure noise at the top schedule step
        from difpan_tpu.diffusion import schedule_from_betas
        sched_full = schedule_from_betas(
            make_beta_schedule("cosine", args.steps, cosine_s=8e-3))
        import numpy as _np
        sig_T = float(_np.sqrt(1.0 - _np.asarray(
            sched_full.alphas_cumprod)[-1]))
        t_top = args.steps - 1

        @jax.jit
        def run(key):
            cache = model.apply({"params": params}, None, None, cond,
                                cond_only=True,
                                cache_max_res=args.cond_evict_res)
            xT = jax.random.normal(key, (b, s, s, c), dtype) * sig_T
            t = jnp.full((b,), t_top, jnp.int32)
            out = model.apply({"params": params}, xT, t, cond_in_scan,
                              jnp.zeros_like(xT), train=False,
                              cond_cache=cache)
            return out.astype(jnp.float32)
    elif args.sampler == "ddim":
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
                # engine-protocol data range (see serve.py / NFE_STUDY.md);
                # clip bounds don't affect throughput
                correcting_x0_fn=lambda x0, t: jnp.clip(x0, 0, 1))
            xT = jax.random.normal(key, (b, s, s, c), dtype)
            if args.dpm_grid:
                return solver.sample(xT, steps=args.steps - 1, order=2,
                                     method="multistep", skip_type="grid",
                                     denoise_to_zero=True)
            return solver.sample(xT, steps=args.steps, order=2,
                                 method="multistep", skip_type="time_uniform")

    # compile + warmup
    _stage(f"compiling {args.sampler} sampler (b{b} {s}px {args.dtype}; "
           "remote compile can take 8-25 min cold)")
    t0 = time.perf_counter()
    out = run(jax.random.PRNGKey(2))
    out.block_until_ready()
    _stage(f"compiled+warm in {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(args.iters):
        k = jax.random.PRNGKey(3 + i)
        t0 = time.perf_counter()
        run(k).block_until_ready()
        times.append(time.perf_counter() - t0)
        _stage(f"iter {i + 1}/{args.iters}: {times[-1]:.3f}s")
    dt = min(times)
    mps = b * s * s / 1e6 / dt

    result = {
        "metric": metric,
        "value": round(mps, 4),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / (TARGET_MULTIPLier * REFERENCE_CPU_MPS),
                             4),
    }
    # honest MFU context: analytic matmul+conv FLOPs of the whole sampled
    # chain (host-side jaxpr walk — no backend dependency) over the best
    # wall time, against the measured tunnel ceiling
    try:
        import os
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts"))
        from flops_count import count_flops
        acc = count_flops(jax.make_jaxpr(run)(jax.random.PRNGKey(2)).jaxpr)
        tfe = (acc["dot"] + acc["conv"]) / dt / 1e12
        result["tflops_effective"] = round(tfe, 3)
        result["tflops_ceiling"] = TUNNEL_CEILING_TFLOPS
        result["frac_of_ceiling"] = round(tfe / TUNNEL_CEILING_TFLOPS, 3)
    except Exception as e:  # noqa: BLE001 — context fields are best-effort
        _stage(f"flop count skipped: {e!r}")
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
