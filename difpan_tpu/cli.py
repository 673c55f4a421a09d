"""Command-line interface.

The reference has no CLI — its entry point is literally executing
`diffusion_engine.py` with hard-coded arguments (`diffusion_engine.py:
508-533`, including "YOUR DATA PATH HERE" placeholders). This provides the
same two operations as real commands:

    python -m difpan_tpu train --train-data train_wv3.h5 --valid-data \
        valid_wv3.h5 --dataset wv3 --n-steps 500 --batch-size 64
    python -m difpan_tpu test --data test_gf2.h5 --dataset gf2 \
        --weights ./weights --n-steps 25
    python -m difpan_tpu bench            # headline throughput benchmark
"""

from __future__ import annotations

import argparse


def _add_train(sub):
    p = sub.add_parser("train", help="train the diffusion model")
    p.add_argument("--train-data", required=True)
    p.add_argument("--valid-data", required=True)
    p.add_argument("--dataset", default="wv3")
    p.add_argument("--n-steps", type=int, default=3000,
                   help="diffusion timesteps (cosine schedule)")
    p.add_argument("--max-iterations", type=int, default=400_000)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", default="./weights")
    p.add_argument("--run-dir", default="./runs")
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint in --ckpt-dir")
    # model/engine knobs (engine defaults if omitted)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--inner-channel", type=int, default=32)
    p.add_argument("--res-blocks", type=int, default=3)
    p.add_argument("--channel-mults", default="1,2,2,4")
    p.add_argument("--valid-every", type=int, default=5000)
    p.add_argument("--valid-batch-size", type=int, default=16)
    p.add_argument("--compute-dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pred-var", action="store_true",
                   help="learned-variance head (2C-channel UNet output)")
    p.add_argument("--show-recon", action="store_true",
                   help="save recon grids every --recon-every iters")
    p.add_argument("--recon-every", type=int, default=1000)
    p.add_argument("--samples-dir", default="./samples")
    return p


def _add_test(sub):
    p = sub.add_parser("test", help="evaluate / export on a test set")
    p.add_argument("--data", required=True)
    p.add_argument("--dataset", default="gf2")
    p.add_argument("--weights", required=True,
                   help="orbax checkpoint dir (difpan) or .pth file "
                        "(reference torch weights, auto-converted)")
    p.add_argument("--n-steps", type=int, default=25,
                   help="schedule length at eval (cosine)")
    p.add_argument("--section-counts", default="ddim25")
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "dpm-grid", "x0"],
                   help="ddim = the reference eval protocol; dpm-grid = "
                        "the round-4 reduced-NFE preset (DPM++ o2, "
                        "grid-aligned steps + final denoise on the same "
                        "cosine schedule — NFE_STUDY.md group G)")
    p.add_argument("--nfe", type=int, default=None,
                   help="model evals for --sampler dpm-grid "
                        "(default: n_steps)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--full-res", action="store_true")
    p.add_argument("--save-mat", default=None)
    p.add_argument("--save-png-dir", default=None)
    p.add_argument("--no-ema", dest="use_ema", action="store_false",
                   default=True, help="serve/eval raw (non-EMA) params")
    p.add_argument("--n-shards", type=int, default=1,
                   help="shard eval batches over this many devices")
    p.add_argument("--spatial-shard", type=int, default=1,
                   help="shard image ROWS over this many devices (exact "
                        "H-sharded UNet, auto-padded — for single images "
                        "beyond one chip's HBM, e.g. 1000x1000 Harvard "
                        "full-res); composes with --n-shards on a 2-D "
                        "data x space mesh")
    p.add_argument("--cond-evict-res", type=int, default=None,
                   help="evict cond-cache entries above this resolution "
                        "(recomputed in-scan) — HBM headroom for large "
                        "tiles, e.g. 256 when sampling 512px+")
    p.add_argument("--tile", type=int, default=None,
                   help="overlap-tile size for huge full-res images "
                        "(feather-blended approximation; prefer "
                        "--spatial-shard for exact math)")
    # model knobs must match the trained checkpoint
    p.add_argument("--inner-channel", type=int, default=32)
    p.add_argument("--res-blocks", type=int, default=3)
    p.add_argument("--channel-mults", default="1,2,2,4")
    p.add_argument("--pred-var", action="store_true",
                   help="checkpoint was trained with the learned-variance "
                        "head (2C-channel UNet output)")
    return p


def _add_bench(sub):
    p = sub.add_parser("bench", help="throughput benchmark")
    return p


def _add_serve(sub):
    p = sub.add_parser(
        "serve", help="persistent sampling service (load once, serve HTTP)")
    p.add_argument("--weights", required=True,
                   help="orbax checkpoint dir (difpan) or .pth file "
                        "(reference torch weights, auto-converted)")
    p.add_argument("--dataset", default="wv3")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--n-steps", type=int, default=25,
                   help="NFE: schedule length for ddim (25 matches the "
                        "`test` command and the reference's shipped eval "
                        "config) or solver steps for dpm (20 is the "
                        "headline preset)")
    p.add_argument("--section-counts", default="ddim25",
                   help="respacing of the ddim schedule; `--sampler ddim "
                        "--n-steps 25 --section-counts K` (K=20/15/10/5) "
                        "is the protocol-exact cheap preset (within ~2.5%% "
                        "of the full protocol down to K=5, NFE_STUDY.md)")
    p.add_argument("--sampler", default="ddim",
                   choices=["ddim", "dpm", "x0"],
                   help="ddim = eval protocol; dpm with n_steps<=25 = "
                        "DPM-Solver++ on the protocol schedule with "
                        "grid-aligned steps + final denoise — measured "
                        "BETTER than the full protocol at NFE 10 "
                        "(NFE_STUDY.md group G)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--no-ema", dest="use_ema", action="store_false",
                   default=True, help="serve raw (non-EMA) params")
    p.add_argument("--inner-channel", type=int, default=32)
    p.add_argument("--res-blocks", type=int, default=3)
    p.add_argument("--channel-mults", default="1,2,2,4")
    p.add_argument("--pred-var", action="store_true",
                   help="checkpoint was trained with the learned-variance "
                        "head (2C-channel UNet output)")
    p.add_argument("--spatial-shard", type=int, default=0,
                   help="serve with the exact H-sharded sampler over this "
                        "many devices (beyond-HBM single images)")
    p.add_argument("--cond-evict-res", type=int, default=None,
                   help="evict cond-cache entries above this resolution "
                        "(recomputed in-scan) — HBM headroom for large "
                        "request shapes")
    return p


def cmd_train(args):
    import h5py

    from .data import get_dataset_spec
    from .train import TrainConfig, train

    spec = get_dataset_spec(args.dataset)
    cfg = TrainConfig(
        dataset_name=args.dataset, image_n_channel=spec.n_channels,
        pan_channel=spec.pan_channels, n_steps=args.n_steps,
        max_iterations=args.max_iterations, batch_size=args.batch_size,
        lr_d=args.lr, seed=args.seed, ckpt_dir=args.ckpt_dir,
        run_dir=args.run_dir, image_size=args.image_size,
        inner_channel=args.inner_channel, res_blocks=args.res_blocks,
        channel_mults=tuple(int(m) for m in args.channel_mults.split(",")),
        valid_every=args.valid_every,
        valid_batch_size=args.valid_batch_size,
        compute_dtype=args.compute_dtype, pred_var=args.pred_var,
        show_recon=args.show_recon, recon_every=args.recon_every,
        samples_dir=args.samples_dir)
    restore_state = None
    if args.resume:
        from .train.engine import build_model
        from .train.state import make_optimizer
        from .utils.checkpoints import restore_for_model
        restore_state = restore_for_model(
            args.ckpt_dir, build_model(cfg), image_size=cfg.image_size,
            tx=make_optimizer(cfg.lr_d, cfg.weight_decay,
                              grad_clip_norm=cfg.grad_clip_norm))
    with h5py.File(args.train_data, "r") as d_train, \
            h5py.File(args.valid_data, "r") as d_valid:
        train(d_train, d_valid, cfg, restore_state=restore_state)


def _build_model_and_params(args, spec):
    """Shared weight-loading for `test` / `serve`: build the model from the
    CLI knobs and load either a difpan orbax checkpoint or a reference
    torch .pth (auto-converted)."""
    import jax
    import jax.numpy as jnp

    from .models import UNetSR3DWT

    mults = tuple(int(m) for m in args.channel_mults.split(","))
    pred_var = getattr(args, "pred_var", False)
    model = UNetSR3DWT(
        in_channel=spec.n_channels,
        out_channel=spec.n_channels * (2 if pred_var else 1),
        lms_channel=spec.n_channels, pan_channel=spec.pan_channels,
        inner_channel=args.inner_channel, norm_groups=1,
        channel_mults=mults, attn_res=(8,), res_blocks=args.res_blocks,
        dropout=0.2, image_size=64, self_condition=True, pred_var=pred_var)
    if args.weights.endswith((".pth", ".pt")):
        from .utils.torch_convert import load_reference_checkpoint
        params = jax.tree_util.tree_map(
            jnp.asarray, load_reference_checkpoint(
                args.weights, channel_mults=mults,
                res_blocks=args.res_blocks))
    else:
        from .utils.checkpoints import restore_for_model
        state = restore_for_model(args.weights, model)
        params = state.ema_params if args.use_ema else state.params
    return model, params


def cmd_test(args):
    import h5py

    from .data import get_dataset_spec
    from .train.eval import evaluate

    spec = get_dataset_spec(args.dataset)
    model, params = _build_model_and_params(args, spec)
    mesh, spatial_axis = None, None
    if args.spatial_shard > 1 and args.n_shards > 1:
        from .parallel import make_mesh_2d
        mesh = make_mesh_2d(args.n_shards, args.spatial_shard)
        spatial_axis = "space"
    elif args.spatial_shard > 1:
        from .parallel import make_mesh
        mesh = make_mesh(args.spatial_shard, axis_name="space")
        spatial_axis = "space"
    elif args.n_shards > 1:
        from .parallel import make_mesh
        mesh = make_mesh(args.n_shards)
    with h5py.File(args.data, "r") as d:
        raw = {k: d[k][:] for k in d.keys()}
    metrics = evaluate(
        raw, params, args.dataset, full_res=args.full_res,
        n_steps=args.n_steps, section_counts=args.section_counts,
        batch_size=args.batch_size, save_mat_path=args.save_mat,
        save_png_dir=args.save_png_dir, model=model, tile=args.tile,
        mesh=mesh, spatial_axis=spatial_axis, pred_var=args.pred_var,
        cond_evict_res=args.cond_evict_res, sampler=args.sampler,
        nfe=args.nfe)
    print(metrics)


def cmd_serve(args):
    from .data import get_dataset_spec
    from .serve import SamplerService, serve

    spec = get_dataset_spec(args.dataset)
    model, params = _build_model_and_params(args, spec)
    service = SamplerService(
        params, args.dataset, model=model, n_steps=args.n_steps,
        section_counts=args.section_counts, sampler=args.sampler,
        dtype=args.dtype, pred_var=args.pred_var,
        space_shards=args.spatial_shard,
        cond_evict_res=args.cond_evict_res)
    print(f"serving {args.dataset} sampler on "
          f"http://{args.host}:{args.port}  (POST /sample, GET /healthz)")
    serve(service, port=args.port, host=args.host)


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="difpan_tpu",
        description="TPU-native diffusion pansharpening framework")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_train(sub)
    _add_test(sub)
    _add_bench(sub)
    _add_serve(sub)
    if argv is None:
        import sys as _sys
        argv = _sys.argv[1:]
    if argv and argv[0] == "bench":
        # forward everything after `bench` to bench.py's own parser
        args = argparse.Namespace(cmd="bench", bench_args=argv[1:])
    else:
        args = parser.parse_args(argv)
    if args.cmd == "train":
        cmd_train(args)
    elif args.cmd == "test":
        cmd_test(args)
    elif args.cmd == "serve":
        cmd_serve(args)
    elif args.cmd == "bench":
        import os
        import runpy
        import sys
        bench_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py")
        sys.argv = [bench_path] + list(args.bench_args)
        runpy.run_path(bench_path, run_name="__main__")


if __name__ == "__main__":
    main()
