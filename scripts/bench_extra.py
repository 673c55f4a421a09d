"""Non-headline benchmark sweep -> BENCH_EXTRA.json (VERDICT r2 item 9).

The driver snapshot records only bench.py's 256px DPM default; this runs
the same harness over the other configs that PERF.md quotes so regressions
in them are visible round-over-round:

  * 512px DPM-Solver++ (batch 8 — the measured sweet spot)
  * DDIM-25 protocol mode (the eval protocol's trajectory)
  * 512px with the fp8 flash-attention path (e4m3 Q/K/V)

Usage (TPU, ~3 compiles — run in background):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_extra.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # the HEADLINE config first (VERDICT r3 item 3): a builder-side capture
    # of the driver's number exists every round even if the end-of-round
    # driver run hits a tunnel outage
    {"name": "dpm20_256px_b24_HEADLINE", "args": []},
    {"name": "dpm20_512px_b8", "args": ["--size", "512", "--batch", "8"]},
    {"name": "ddim25_protocol_256px_b24", "args": ["--sampler", "ddim"]},
    {"name": "dpm20_512px_b8_fp8attn",
     "args": ["--size", "512", "--batch", "8", "--fp8-attn"]},
    # round-4 e4m3 conv path (PERF.md: expected flat-to-slower on this
    # v5e-rate tunnel, the v6e+ integration point — measured, not assumed)
    {"name": "dpm20_256px_b24_fp8conv", "args": ["--fp8-conv"]},
    # the round-4 quality-cheap serving preset at NFE 5: ~4x the headline
    # throughput at measured-better-than-protocol quality (NFE_STUDY.md G)
    {"name": "dpmgrid5_256px_b24", "args": ["--dpm-grid", "--steps", "5"]},
    # round-5 NFE=1 posterior-mean serving mode (X0_STUDY.md): best
    # distortion metrics of any sampler at 1/25th the protocol's evals
    {"name": "x0_256px_b24", "args": ["--sampler", "x0"]},
    # cond-cache eviction path (b12 OOMs without it — PERF.md round 3)
    {"name": "dpm20_512px_b12_evict256",
     "args": ["--size", "512", "--batch", "12", "--cond-evict-res", "256"]},
]


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="run only configs whose name contains this "
                         "substring; results MERGE into the existing "
                         "BENCH_EXTRA.json instead of replacing it")
    opts = ap.parse_args()

    path = os.path.join(HERE, "BENCH_EXTRA.json")
    results = {}
    if opts.only and os.path.exists(path):
        with open(path) as f:
            results = json.load(f)

    todo = [c for c in CONFIGS
            if not opts.only or opts.only in c["name"]]
    if not todo:
        print(f"[bench_extra] no config matches --only {opts.only!r}")
        return
    for cfg in todo:
        cmd = [sys.executable, os.path.join(HERE, "bench.py")] + cfg["args"]
        print(f"[bench_extra] {cfg['name']}: {' '.join(cmd)}", flush=True)
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=3600, cwd=HERE)
            line = [l for l in out.stdout.strip().splitlines()
                    if l.startswith("{")][-1]
            results[cfg["name"]] = json.loads(line)
        except Exception as e:  # record the failure, keep sweeping
            results[cfg["name"]] = {"error": f"{type(e).__name__}: {e}"}
        print(f"[bench_extra] -> {results[cfg['name']]}", flush=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"[bench_extra] wrote {path}")


if __name__ == "__main__":
    main()
