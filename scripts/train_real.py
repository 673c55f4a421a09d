"""Long training run past the EMA start iteration (VERDICT r2 item 1).

Runs the real engine (`difpan_tpu/train/engine.py`) at the reference
training config (`/root/reference/diffusion_engine.py:52-76,183-209`:
batch 128, 64px, cosine T=3000, AdamW 1e-4, EMA decay 0.995 starting at
iteration 20k) on a synthetic WV3-shaped dataset, far enough past the EMA
start that the decay phase actually executes (0.995^6000 ~ 1e-13, i.e. the
EMA fully forgets the pre-20k copy).

Artifacts (all under --out):
  scalars.jsonl   every logged train loss {step, loss, it_per_s}
  valid.jsonl     every validation {step, metrics..., ema_l2, lr}
  weights/        orbax checkpoint (params+opt+EMA+step), saved each valid
  samples/        valid-sample PNG grids from the engine

Auto-resumes from weights/ if a checkpoint exists (the run survives tunnel
hiccups; just relaunch).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/train_real.py \
      --iters 26000 --out runs/real_train
  python scripts/train_real.py --smoke        # tiny CPU sanity check
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=26_000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--n-train", type=int, default=4096)
    ap.add_argument("--n-valid", type=int, default=64)
    ap.add_argument("--valid-every", type=int, default=2500)
    ap.add_argument("--ema-start", type=int, default=20_000)
    ap.add_argument("--steps-per-call", type=int, default=1,
                    help="chain K train steps into one lax.scan dispatch "
                         "(amortizes the tunnel's fixed per-dispatch cost; "
                         "bit-identical to K=1, see engine.py)")
    ap.add_argument("--device-aug", type=float, default=0.0,
                    help="on-device per-sample H/V flip probability "
                         "(TrainConfig.device_aug_prob) — counters "
                         "memorization of a finite synthetic pool; the "
                         "reference itself trains aug-free "
                         "(diffusion_engine.py:151)")
    ap.add_argument("--stream-chunk", type=int, default=0,
                    help="epochless data stream: a background thread "
                         "generates fresh scenes in chunks of this many "
                         "samples and rotates them into the device-resident "
                         "pool (engine refresh_fn). 0 = fixed pool (the "
                         "round-4 regime that overfit: valid SAM degraded "
                         "monotonically while train loss fell). Must divide "
                         "n-train.")
    ap.add_argument("--sensor-seed", type=int, default=None,
                    help="wald data: pin the sensor response (MTF gains + "
                         "pan spectral weights) to this seed for the "
                         "cached pool AND every stream chunk, so the "
                         "stream varies scenes while holding one sensor "
                         "fixed — the reference's one-satellite regime. "
                         "Set it to the valid seed (43) so validation is "
                         "in-distribution. Default None = legacy "
                         "per-chunk sensors (ambiguous spectral mapping)")
    ap.add_argument("--aug-sign-fix", action="store_true",
                    help="sign-correct the wavelet cond under device flips "
                         "(TrainConfig.device_aug_wavelet_signs)")
    ap.add_argument("--rss-restart-gb", type=float, default=80.0,
                    help="end the run cleanly (rc=0, no DONE.json) right "
                         "after a validation+checkpoint once process RSS "
                         "exceeds this — the axon tunnel client pins every "
                         "host->device transfer in host RAM, so a streaming "
                         "run leaks ~4 MB/s and must self-restart before "
                         "the 125 GB host OOM-kills it mid-step")
    ap.add_argument("--data", default="smooth", choices=["smooth", "wald"],
                    help="wald = round-4 structured Wald-protocol scenes "
                         "(edges/textures/materials + MTF degradation) — "
                         "the discriminative benchmark; smooth = the "
                         "round-2/3 band-limited fixture")
    ap.add_argument("--out", default="runs/real_train")
    ap.add_argument("--family", default="wv3", choices=["wv3", "cave"],
                    help="wv3 = 8-band pansharpening (PanDataset); cave = "
                         "31-band hyperspectral MHIF (HISRDataSets) — the "
                         "reference's second model family")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config to sanity-check the harness")
    args = ap.parse_args()

    if args.smoke:
        import jax
        jax.config.update("jax_platforms", "cpu")
        args.iters, args.batch_size = 30, 4
        args.n_train, args.n_valid = 32, 4
        args.valid_every, args.ema_start = 10, 15
        args.out = f"/tmp/train_smoke_{args.family}"

    import jax
    # persistent compile cache (TPU: survives tunnel restarts; CPU smoke:
    # reuses the test suite's cached train-step programs)
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np

    from difpan_tpu.data.synthetic import make_synthetic_pan_h5
    from difpan_tpu.train import TrainConfig, train
    from difpan_tpu.utils.logging import TensorboardLogger

    os.makedirs(args.out, exist_ok=True)
    scalars_path = os.path.join(args.out, "scalars.jsonl")
    valid_path = os.path.join(args.out, "valid.jsonl")

    # fail fast on a dead tunnel BEFORE the ~6-min npz load: the outage
    # mode is UNAVAILABLE at first backend touch (~25 min inside jax init),
    # so probing here makes run_400k.sh's retry loop poll the tunnel at the
    # fastest possible cadence instead of paying data load per attempt
    print(f"[train_real] probing backend "
          f"({len(jax.devices())} device(s) up)", flush=True)

    # generate-or-load: the wald set takes ~75 ms/sample on this 1-core
    # host (~10 min at n=8192), so cache it next to the run — auto-resume
    # relaunches must not pay generation again
    sfx = "" if args.sensor_seed is None else f"_s{args.sensor_seed}"
    cache = os.path.join(args.out, f"data_{args.data}_{args.family}"
                                   f"_{args.n_train}_{args.n_valid}{sfx}.npz")
    if args.family == "cave":
        if args.data == "wald":
            from difpan_tpu.data.synthetic import make_wald_hisr_h5
            gen = lambda n, seed: make_wald_hisr_h5(
                n=n, bands=31, size=64, seed=seed,
                sensor_seed=args.sensor_seed)
        else:
            from difpan_tpu.data.synthetic import make_synthetic_hisr_h5
            gen = lambda n, seed: make_synthetic_hisr_h5(
                n=n, bands=31, size=64, seed=seed)
        n_ch, pan_ch = 31, 3
    else:
        if args.data == "wald":
            from difpan_tpu.data.synthetic import make_wald_pan_h5_chunked
            gen = lambda n, seed: make_wald_pan_h5_chunked(
                n=n, channels=8, size=64, division=2047.0, seed=seed,
                sensor_seed=args.sensor_seed)
        else:
            gen = lambda n, seed: make_synthetic_pan_h5(
                n=n, channels=8, size=64, division=2047.0, seed=seed)
        n_ch, pan_ch = 8, 1
    if os.path.exists(cache):
        print(f"[train_real] loading cached data {cache}", flush=True)
        z = np.load(cache)
        d_train = {k[6:]: z[k] for k in z.files if k.startswith("train_")}
        d_valid = {k[6:]: z[k] for k in z.files if k.startswith("valid_")}
    else:
        print(f"[train_real] generating {args.data} {args.family} data "
              f"(train n={args.n_train}, valid n={args.n_valid})", flush=True)
        d_train, d_valid = gen(args.n_train, 42), gen(args.n_valid, 43)
        np.savez(cache, **{f"train_{k}": v for k, v in d_train.items()},
                 **{f"valid_{k}": v for k, v in d_valid.items()})
        print(f"[train_real] cached data -> {cache}", flush=True)

    if args.stream_chunk and args.n_train % args.stream_chunk:
        raise SystemExit("--stream-chunk must divide --n-train")

    cfg = TrainConfig(
        dataset_name=args.family, image_n_channel=n_ch, pan_channel=pan_ch,
        batch_size=args.batch_size, compute_dtype="bfloat16",
        max_iterations=args.iters, valid_every=args.valid_every,
        ema_start_iter=args.ema_start,
        valid_batch_size=min(16, args.n_valid),
        # device-resident train set: the axon tunnel client pins every
        # host->device transfer in host RAM, so per-step batch transfers
        # leak ~40 MB/iter (a 26k-iter run OOMs the 125 GB host around
        # iter 3k). With device_data only a (B,) index array crosses per
        # step.
        device_data=True,
        device_aug_prob=args.device_aug,
        device_aug_wavelet_signs=args.aug_sign_fix,
        steps_per_call=args.steps_per_call,
        ckpt_dir=os.path.join(args.out, "weights"),
        run_dir=os.path.join(args.out, "runs"),
        samples_dir=os.path.join(args.out, "samples"))

    # self-describing run record (written at START so wall-clock-killed
    # segments still carry their config; VERDICT r3 flagged the CAVE run
    # as "pre-EMA" because the lowered ema_start wasn't stated anywhere)
    run_config = {
        "family": args.family, "data": args.data,
        "iters": args.iters, "batch_size": args.batch_size,
        "n_train": args.n_train, "n_valid": args.n_valid,
        "ema_start_iter": args.ema_start, "ema_decay": cfg.ema_decay,
        "valid_every": args.valid_every,
        "steps_per_call": args.steps_per_call,
        "lr": cfg.lr_d, "lr_milestones": [100_000, 200_000, 350_000],
        "lr_gamma": 0.2, "compute_dtype": cfg.compute_dtype,
        "device_data": cfg.device_data,
        "device_aug_prob": cfg.device_aug_prob,
        "device_aug_wavelet_signs": cfg.device_aug_wavelet_signs,
        "stream_chunk": args.stream_chunk,
        "sensor_seed": args.sensor_seed,
    }
    with open(os.path.join(args.out, "RUN_CONFIG.json"), "w") as f:
        json.dump(run_config, f, indent=1)

    class JsonlLogger(TensorboardLogger):
        """Tee scalars into a JSONL the report generator can read."""
        _t_last = [time.time()]

        def log_scalar(self, tag, value, step):
            super().log_scalar(tag, value, step)
            if tag == "denoised_loss":
                now = time.time()
                dt = now - self._t_last[0]
                self._t_last[0] = now
                rate = cfg.log_every / dt if dt > 0 else 0.0
                with open(scalars_path, "a") as f:
                    f.write(json.dumps({"step": step, "loss": float(value),
                                        "it_per_s": round(rate, 3)}) + "\n")

    def ema_l2(state):
        d2 = sum(float(jnp.sum((p.astype(jnp.float32) - e) ** 2))
                 for p, e in zip(jax.tree_util.tree_leaves(state.params),
                                 jax.tree_util.tree_leaves(state.ema_params)))
        return float(np.sqrt(d2))

    served = [0]   # stream chunks consumed (refresh_fn below increments)

    def rss_gb() -> float:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024 / 1024
        return 0.0

    def on_valid(step, state, acc):
        # host-side mirror of the optax piecewise schedule
        # (state.py make_optimizer: milestones 100k/200k/350k, gamma 0.2)
        lr = cfg.lr_d * 0.2 ** sum(step >= m
                                   for m in (100_000, 200_000, 350_000))
        rec = {"step": int(step), "ema_l2": ema_l2(state), "lr": lr,
               "ema_phase": "decay" if step > cfg.ema_start_iter else "copy"}
        if args.stream_chunk:
            # stream evidence: fresh scenes rotated into the pool since
            # this segment started, and host RSS (the leak should_stop
            # watches) — both visible in the durable valid.jsonl
            rec["stream_chunks"] = served[0]
            rec["rss_gb"] = round(rss_gb(), 1)
        rec.update({k: float(v) for k, v in acc.items()})
        with open(valid_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[train_real] valid@{step}: {rec}", flush=True)

    restore_state = None
    ckpt_dir = os.path.abspath(cfg.ckpt_dir)
    if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
        from difpan_tpu.train.engine import build_model
        from difpan_tpu.train.state import make_optimizer
        from difpan_tpu.utils.checkpoints import restore_for_model
        # the REAL optimizer config: training continues from this state
        restore_state = restore_for_model(
            ckpt_dir, build_model(cfg), image_size=cfg.image_size,
            tx=make_optimizer(cfg.lr_d, cfg.weight_decay,
                              grad_clip_norm=cfg.grad_clip_norm))
        print(f"[train_real] resuming from step "
              f"{int(restore_state.step)}", flush=True)

    refresh_fn = None
    if args.stream_chunk:
        import queue
        import threading

        from difpan_tpu.data import HISRDataSets, PanDataset, get_dataset_spec
        spec = get_dataset_spec(args.family)
        start_step = (int(restore_state.step)
                      if restore_state is not None else 0)
        # seed space disjoint from the cached pool (42*1000+i) and the
        # valid set (43); offset by the resume step so relaunched segments
        # don't replay the chunks the previous segment already streamed
        seed_base = 10_000_000 + start_step
        q: "queue.Queue" = queue.Queue(maxsize=2)

        def _gen_worker():
            seq = 0
            while True:
                try:
                    d = gen(args.stream_chunk, seed_base + seq)
                    if args.family == "cave":
                        ds = HISRDataSets(d, wavelets=True)
                    else:
                        ds = PanDataset(d, norm_range=False,
                                        division=spec.division,
                                        wavelets=True)
                    arrs = tuple(
                        np.asarray(a, np.float32)
                        for a in ds.batch(np.arange(args.stream_chunk)))
                    q.put(arrs)   # blocks at maxsize — bounds host memory
                except Exception as e:     # keep streaming; a dead worker
                    print(f"[stream-gen] chunk {seq} failed: {e!r} — "
                          "continuing", flush=True)
                    time.sleep(5)
                seq += 1

        threading.Thread(target=_gen_worker, daemon=True,
                         name="stream-gen").start()

        def refresh_fn():
            try:
                chunk = q.get_nowait()
            except queue.Empty:
                return None
            served[0] += 1
            return chunk

    def should_stop(step) -> bool:
        r = rss_gb()
        if r > args.rss_restart_gb:
            print(f"[train_real] RSS {r:.1f} GB > {args.rss_restart_gb} GB "
                  f"at iter {step} — clean self-restart (outer loop "
                  "relaunches; resume loses 0 iters)", flush=True)
            return True
        return False

    # graceful pause: SIGTERM (the run_400k/cave_ext drivers' PAUSE kill,
    # bench.py borrowing the chip) sets a flag the engine polls every
    # dispatch — it checkpoints at the CURRENT step and exits cleanly, so a
    # pause costs ~0 iterations instead of rolling back to the last
    # valid_every checkpoint (a mid-segment kill lost up to 4,999 steps).
    # The drivers' SIGKILL-after-grace fallback still covers a hung tunnel.
    import signal
    import threading as _threading
    _pause_evt = _threading.Event()

    def _on_sigterm(signum, frame):
        print("[train_real] SIGTERM — checkpointing at the current step "
              "and exiting cleanly", flush=True)
        _pause_evt.set()

    signal.signal(signal.SIGTERM, _on_sigterm)

    logger = JsonlLogger("real", base_dir=cfg.run_dir)
    t0 = time.time()
    state = train(d_train, d_valid, cfg, logger=logger,
                  restore_state=restore_state, on_valid=on_valid,
                  refresh_fn=refresh_fn, should_stop=should_stop,
                  pause_check=_pause_evt.is_set)
    wall = time.time() - t0
    final_step = int(jax.device_get(state.step))
    print(f"[train_real] done: step={final_step} wall={wall/3600:.2f}h "
          f"ema_l2={ema_l2(state)}", flush=True)
    if final_step >= args.iters:
        # DONE.json only on true completion: a should_stop self-restart or
        # a wall-clock kill is NOT done (ADVICE r4: run_cave_ext.sh no-oped
        # because an old shorter-run DONE.json short-circuited its loop)
        with open(os.path.join(args.out, "DONE.json"), "w") as f:
            json.dump({"final_step": final_step,
                       "wall_h": round(wall / 3600, 3),
                       "ema_l2": ema_l2(state), "config": run_config}, f)


if __name__ == "__main__":
    main()
