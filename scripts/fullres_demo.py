"""Full-res Harvard-shaped (1000x1000, 31-band) sampling demo on one chip.

The reference's most demanding eval workload is Harvard full-res: a single
1000x1000 hyperspectral image pushed straight through the sampler
(`/root/reference/diffusion_engine.py:373-377`). This script reproduces it
end-to-end on the trained CAVE-family checkpoint through the CLI-reachable
overlap-tile path (`evaluate(tile=...)`, `parallel/spatial.py::
tiled_sample`) and records metrics + wall time.

The exact (non-approximate) alternatives for this shape are the H-sharded
multi-chip path (`--spatial-shard`, tests/test_spatial.py) and single-chip
whole-image sampling with `--cond-evict-res` (PERF.md round 3); the tiled
run here is the single-chip default a reference user would reach first.

Usage (TPU, ~1 tile-shape compile):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fullres_demo.py \
      --weights runs/real_train_cave/weights --out runs/fullres_demo.json
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
    ap.add_argument("--weights", default="runs/real_train_cave/weights")
    ap.add_argument("--size", type=int, default=1000)
    ap.add_argument("--bands", type=int, default=31)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--tile-overlap", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=8,
                    help="tiles per compiled sampling batch")
    ap.add_argument("--whole-image", action="store_true",
                    help="EXACT single-chip path: sample the full "
                         "1000x1000 image in ONE jitted program (no tile "
                         "approximation) — fits in 15.75 G HBM via "
                         "--cond-evict-res style cache eviction "
                         "(evaluate(cond_evict_res=256)) + the flat scan "
                         "carries (PERF.md round 3)")
    ap.add_argument("--out", default="runs/fullres_demo.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from difpan_tpu.data.synthetic import make_synthetic_hisr_h5
    from difpan_tpu.train.eval import build_eval_model, evaluate
    from difpan_tpu.utils.checkpoints import restore_for_model

    print(f"[fullres] synthesizing harvard-shaped full-res image "
          f"({args.size}x{args.size}, {args.bands} bands)", flush=True)
    raw = make_synthetic_hisr_h5(n=1, bands=args.bands, size=args.size,
                                 seed=7)

    model = build_eval_model("harvard")
    state = restore_for_model(os.path.abspath(args.weights), model)
    params = state.ema_params
    print(f"[fullres] restored EMA params from step "
          f"{int(state.step)}", flush=True)

    t0 = time.time()
    if args.whole_image:
        metrics = evaluate(
            raw, params, "harvard", n_steps=25, section_counts="ddim25",
            batch_size=1, model=model, cond_evict_res=256)
        how = "whole-image (exact, cond_evict_res=256)"
    else:
        metrics = evaluate(
            raw, params, "harvard", n_steps=25, section_counts="ddim25",
            batch_size=args.batch_size, tile=args.tile,
            tile_overlap=args.tile_overlap, model=model)
        how = f"tile={args.tile} overlap={args.tile_overlap}"
    wall = time.time() - t0

    mp = args.size * args.size / 1e6
    rec = {
        "workload": f"harvard-shaped full-res {args.size}x{args.size} "
                    f"x{args.bands} bands, DDIM-25 protocol, {how}",
        "wall_s": round(wall, 1),
        "megapixels": mp,
        "mp_per_s": round(mp / wall, 4),
        "ckpt_step": int(state.step),
        "metrics": {k: round(float(v), 4) for k, v in metrics.items()},
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
