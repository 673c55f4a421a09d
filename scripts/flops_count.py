#!/usr/bin/env python
"""Analytic FLOP/byte accounting for the train step (VERDICT r3 item 8).

Traces the REAL jitted train step (value_and_grad + AdamW + EMA) to a
jaxpr — no compile, runs in seconds on CPU — and sums matmul/conv FLOPs
across all sub-jaxprs (scan/cond/pjit/custom_*). Combined with a measured
sec/step this gives achieved FLOP/s vs the tunnel ceiling for PERF.md's
train-step roofline.

Conventions:
  * conv_general_dilated: 2 * out_elems * (kh * kw * cin) FLOPs
  * dot_general: 2 * batch_elems * M * N * K
  * lax.cond branches are counted separately and reported; p_losses'
    self-cond coin runs branch-0 (extra UNet fwd under stop_grad) half
    the time in expectation.
  * bytes: param/optimizer/EMA traffic per step (f32 master) + the
    device-resident batch gather.

Usage:
  python scripts/flops_count.py                 # engine config, b128
  python scripts/flops_count.py --batch 32
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _dot_flops(eqn):
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    dnums = eqn.params["dimension_numbers"]
    (lc, rc), (lb, rb) = dnums
    batch = int(np.prod([lhs.shape[i] for i in lb], dtype=np.int64)) or 1
    k = int(np.prod([lhs.shape[i] for i in lc], dtype=np.int64)) or 1
    m = int(np.prod([d for i, d in enumerate(lhs.shape)
                     if i not in lc and i not in lb], dtype=np.int64)) or 1
    n = int(np.prod([d for i, d in enumerate(rhs.shape)
                     if i not in rc and i not in rb], dtype=np.int64)) or 1
    return 2 * batch * m * n * k


def _conv_flops(eqn):
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dnums = eqn.params["dimension_numbers"]
    # kernel: spatial dims * input feature dim
    k_spatial = int(np.prod([rhs.shape[i] for i in dnums.rhs_spec[2:]],
                            dtype=np.int64))
    cin = rhs.shape[dnums.rhs_spec[1]]
    groups = eqn.params.get("feature_group_count", 1)
    out_elems = int(np.prod(out.shape, dtype=np.int64))
    return 2 * out_elems * k_spatial * cin // max(groups, 1)


def count_flops(jaxpr, mult=1, acc=None, depth=0):
    """Recursively sum FLOPs; scans multiply by length."""
    if acc is None:
        acc = {"dot": 0, "conv": 0, "cond_branches": []}
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            acc["dot"] += mult * _dot_flops(eqn)
        elif prim == "conv_general_dilated":
            acc["conv"] += mult * _conv_flops(eqn)
        elif prim == "scan":
            length = eqn.params["length"]
            count_flops(eqn.params["jaxpr"].jaxpr, mult * length, acc,
                        depth + 1)
        elif prim == "cond":
            # count each branch alone to report the expectation split
            branches = eqn.params["branches"]
            totals = []
            for br in branches:
                sub = {"dot": 0, "conv": 0, "cond_branches": []}
                count_flops(br.jaxpr, 1, sub, depth + 1)
                totals.append(sub["dot"] + sub["conv"])
            acc["cond_branches"].append([mult * t for t in totals])
            # attribute the MAX branch to the main count (upper bound);
            # the caller reports the expectation correction
            mx = int(np.argmax(totals))
            count_flops(branches[mx].jaxpr, mult, acc, depth + 1)
        elif prim in ("jit", "pjit", "closed_call", "custom_jvp_call",
                      "custom_vjp_call", "custom_vjp_call_jaxpr",
                      "remat", "checkpoint", "custom_jvp_call_jaxpr"):
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                count_flops(getattr(inner, "jaxpr", inner), mult, acc,
                            depth + 1)
        elif prim == "while":
            # no data-dependent trip counts in the train step; ignore
            pass
    return acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--channels", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from difpan_tpu.train import TrainConfig
    from difpan_tpu.train.engine import (build_diffusion, build_model,
                                         make_train_step)
    from difpan_tpu.train.state import create_train_state, make_optimizer

    cfg = TrainConfig(dataset_name="wv3", image_n_channel=args.channels,
                      pan_channel=1, image_size=args.size,
                      batch_size=args.batch, compute_dtype="bfloat16")
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(cfg.lr_d, cfg.weight_decay,
                        grad_clip_norm=cfg.grad_clip_norm)
    b, s, c = args.batch, args.size, args.channels
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, s, s, c)), jnp.array([0]),
        jnp.zeros((1, s, s, 2 * c + 4)), train=False)["params"]
    state = create_train_state(params, tx)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(params))

    step_fn = make_train_step(cfg, model, dcfg, sched, tx)
    batch = (jnp.zeros((b, s, s, 1)), jnp.zeros((b, s, s, c)),
             jnp.zeros((b, s, s, c)),
             jnp.zeros((b, s // 2, s // 2, 4)))
    jaxpr = jax.make_jaxpr(step_fn)(state, batch, jax.random.PRNGKey(0))
    acc = count_flops(jaxpr.jaxpr)

    total_max = acc["dot"] + acc["conv"]
    # expectation correction for the self-cond coin: cond branch pairs
    # [with-extra-fwd, without]; expected cost = mean of the two
    corr = 0
    for pair in acc["cond_branches"]:
        if len(pair) == 2 and max(pair) > 0:
            corr += max(pair) - (pair[0] + pair[1]) / 2
    total_exp = total_max - corr

    # per-step HBM traffic for the state pipeline (f32 masters):
    # params read (fwd+bwd bf16 casts read masters once) + grad write/read
    # + adam m,v read+write + param write + EMA read+write
    state_bytes = n_params * 4 * (1 + 2 + 4 + 1 + 2)
    batch_bytes = sum(int(np.prod(a.shape)) for a in batch) * 4

    print(f"config: b{b} {s}px {c}ch, params={n_params:,}")
    print(f"matmul FLOPs/step (max path): {acc['dot']:.3e}")
    print(f"conv   FLOPs/step (max path): {acc['conv']:.3e}")
    print(f"TOTAL  FLOPs/step (max path): {total_max:.3e}")
    print(f"TOTAL  FLOPs/step (E[self-cond coin]): {total_exp:.3e}")
    print(f"state HBM bytes/step (params+grads+adam+ema, f32): "
          f"{state_bytes:.3e}")
    print(f"batch gather bytes/step: {batch_bytes:.3e}")
    for it_s in (6.12, 8.0, 10.0):
        print(f"  @ {it_s:5.2f} it/s: {total_exp * it_s / 1e12:.2f} "
              f"TFLOP/s achieved (E), {state_bytes * it_s / 1e9:.1f} GB/s "
              "state traffic")


if __name__ == "__main__":
    main()
