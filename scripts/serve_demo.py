#!/usr/bin/env python
"""Serving-path e2e demo at the NFE frontier (VERDICT r4 item 8).

Drives a LIVE `difpan_tpu.serve` HTTP server — real sockets, concurrent
clients, npz payloads — with the durable wald checkpoint, and measures
user-visible latency/throughput for:

  * the protocol sampler (DDIM-25, what the reference's test_fn runs,
    `/root/reference/diffusion_engine.py:286-298,527`), and
  * the NFE-5 grid+denoise preset (NFE_STUDY.md group G — measured
    better than the protocol on every quality metric on the
    discriminative Wald set).

Each config: one SamplerService (micro-batching ON — concurrent
same-shape requests merge into one padded device batch), a /warmup
pre-compile, then `--clients` threads each POSTing `--requests`
sequential /sample calls of batch `--batch-per-req` Wald scenes.
Reported per config: request latency mean/p50/p95, aggregate wall,
throughput in MP/s (output megapixels x channels / wall, the bench.py
convention), and the merged-batch evidence (compiled shapes).

On the TPU tunnel this borrows the chip from live training runs via the
same cooperative PAUSE protocol bench.py uses; --cpu runs anywhere.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_demo.py \
      --weights ckpts/wald/ckpt --size 64 --clients 8 --requests 4
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _percentile(xs, q):
    xs = sorted(xs)
    i = (len(xs) - 1) * q
    lo, hi = int(i), min(int(i) + 1, len(xs) - 1)
    return xs[lo] + (xs[hi] - xs[lo]) * (i - lo)


def run_config(name, svc_kwargs, model, params, data, args):
    import numpy as np

    from difpan_tpu.serve import SamplerService, serve

    svc = SamplerService(params, "wv3", model=model, **svc_kwargs)
    httpd = serve(svc, port=0, block=False, max_body_mb=64.0)
    port = httpd.server_address[1]
    res = {"config": name, **{k: v for k, v in svc_kwargs.items()}}
    try:
        import http.client

        b = args.batch_per_req
        t0 = time.time()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=1200)
        conn.request("GET", f"/warmup?batch={min(b * args.clients, 32)}"
                            f"&h={args.size}&w={args.size}")
        r = conn.getresponse()
        assert r.status == 200, r.read()
        r.read()
        res["warmup_s"] = round(time.time() - t0, 1)
        conn.close()

        lat = []
        errors = []
        lock = threading.Lock()

        def client(ci):
            try:
                c = http.client.HTTPConnection("127.0.0.1", port,
                                               timeout=1200)
                for ri in range(args.requests):
                    idx = (ci * args.requests + ri) % data["pan"].shape[0]
                    pan = data["pan"][idx: idx + b]
                    lms = data["lms"][idx: idx + b]
                    buf = io.BytesIO()
                    np.savez_compressed(buf, pan=pan, lms=lms)
                    t = time.time()
                    c.request("POST", "/sample", body=buf.getvalue())
                    rr = c.getresponse()
                    body = rr.read()
                    dt = time.time() - t
                    if rr.status != 200:
                        raise RuntimeError(f"{rr.status}: {body[:200]}")
                    sr = np.load(io.BytesIO(body))["sr"]
                    assert sr.shape == (b, args.size, args.size, 8), sr.shape
                    with lock:
                        lat.append(dt)
                c.close()
            except Exception as e:  # surface, don't hang the join
                with lock:
                    errors.append(f"client {ci}: {e!r}")

        t0 = time.time()
        threads = [threading.Thread(target=client, args=(ci,))
                   for ci in range(args.clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t0
        if errors:
            res["errors"] = errors
            return res
        n_req = args.clients * args.requests
        mp = n_req * b * args.size * args.size * 8 / 1e6
        res.update(
            n_requests=n_req, batch_per_req=b, size=args.size,
            lat_mean_s=round(sum(lat) / len(lat), 3),
            lat_p50_s=round(_percentile(lat, 0.5), 3),
            lat_p95_s=round(_percentile(lat, 0.95), 3),
            wall_s=round(wall, 2),
            mps=round(mp / wall, 4),
            req_per_s=round(n_req / wall, 3),
            compiled_shapes=[list(s) for s in svc.compiled_shapes()],
        )
    finally:
        httpd.shutdown()
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="ckpts/wald/ckpt")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=4,
                    help="sequential requests per client")
    ap.add_argument("--batch-per-req", type=int, default=1)
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (default: the tunnel TPU, borrowed "
                         "via the cooperative PAUSE protocol)")
    ap.add_argument("--json-out", default="runs/serve_demo.json")
    ap.add_argument("--configs", default=None,
                    help="comma-filter of config names to run (substring "
                         "match), e.g. 'x0,dpm' — remote compiles are "
                         "8-25 min each on the tunnel, so pick what the "
                         "chip-time budget allows")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, "tests", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from difpan_tpu.data.synthetic import make_wald_pan_h5
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.utils.checkpoints import restore_for_model

    pause_files = []
    if not args.cpu:
        from bench import pause_local_training, resume_local_training
        pause_files = pause_local_training()
    try:
        model = UNetSR3DWT(
            in_channel=8, out_channel=8, lms_channel=8, pan_channel=1,
            inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
            attn_res=(8,), res_blocks=3, dropout=0.2, image_size=64,
            self_condition=True)
        state = restore_for_model(args.weights, model)
        params = state.ema_params
        step = int(state.step)
        print(f"[serve_demo] weights {args.weights} @ step {step}",
              flush=True)

        n_scenes = min(args.clients * args.requests, 64)
        d = make_wald_pan_h5(n=n_scenes, channels=8, size=args.size,
                             seed=4242)
        data = {
            "pan": np.transpose(d["pan"], (0, 2, 3, 1)) / 2047.0,
            "lms": np.transpose(d["lms"], (0, 2, 3, 1)) / 2047.0,
        }

        all_configs = [
            ("ddim25_protocol", dict(sampler="ddim", n_steps=25,
                                     section_counts="ddim25")),
            ("dpm_grid_denoise_nfe5", dict(sampler="dpm", n_steps=5)),
            # NFE=1 posterior-mean serving mode (X0_STUDY.md): n_steps =
            # the TRAIN schedule length so t=T-1 lands in the weights'
            # time-embedding convention
            ("x0_nfe1", dict(sampler="x0", n_steps=3000)),
        ]
        want = args.configs.split(",") if args.configs else None
        configs = [(n, kw) for n, kw in all_configs
                   if want is None or any(w in n for w in want)]
        out = {"weights": args.weights, "step": step,
               "platform": jax.devices()[0].platform,
               "device": str(jax.devices()[0]),
               "clients": args.clients, "requests": args.requests,
               "rows": []}
        for name, kw in configs:
            print(f"[serve_demo] config {name} ...", flush=True)
            row = run_config(name, kw, model, params, data, args)
            print(f"[serve_demo] -> {row}", flush=True)
            out["rows"].append(row)
    finally:
        if pause_files:
            resume_local_training(pause_files)

    os.makedirs(os.path.dirname(os.path.join(HERE, args.json_out)),
                exist_ok=True)
    with open(os.path.join(HERE, args.json_out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
