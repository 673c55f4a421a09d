#!/usr/bin/env python
"""Training-dynamics parity: train the PyTorch reference and difpan_tpu on
the SAME synthetic dataset from the SAME initial weights (converted), same
hyperparameters, and compare loss trajectories.

Stochasticity (timestep/noise draws, self-cond coin, dropout) differs across
frameworks, so curves can't match step-for-step — but their levels and
decay must track closely if the objective/model/optimizer semantics agree.

Run from the repo root. Needs /root/reference mounted (torch side).
"""
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ITERS = 120
BATCH = 8
LR = 1e-3
N_STEPS = 100  # diffusion T
SEED = 5


def make_data():
    from difpan_tpu.data import make_synthetic_pan_h5, PanDataset
    d = make_synthetic_pan_h5(n=32, channels=4, size=64, division=1023.0,
                              seed=SEED)
    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True)
    return ds


def torch_side(ds, init_sd=None):
    import torch
    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.p = drop_prob

        def forward(self, x):
            if not self.training or self.p == 0:
                return x
            keep = 1 - self.p
            mask = torch.empty(x.shape[0], 1, 1, 1).bernoulli_(keep)
            return x * mask / keep

    tl.DropPath = DropPath
    sys.modules.update({"timm": timm, "timm.models": tm,
                        "timm.models.layers": tl})
    sys.path.insert(0, "/root/reference")
    from models.sr3_dwt import UNetSR3
    from diffusion.diffusion_ddpm_pan import (GaussianDiffusion,
                                              make_beta_schedule)

    torch.manual_seed(0)
    net = UNetSR3(in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
                  inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
                  attn_res=(8,), dropout=0.2, image_size=64,
                  self_condition=True)
    sd0 = {k: v.clone() for k, v in net.state_dict().items()}
    g = GaussianDiffusion(net, image_size=64, channels=4,
                          pred_mode="x_start", loss_type="l1", device="cpu",
                          clamp_range=(0, 1))
    g.set_new_noise_schedule(
        betas=make_beta_schedule("cosine", N_STEPS, cosine_s=8e-3))
    opt = torch.optim.AdamW(net.parameters(), lr=LR, weight_decay=1e-4)

    rng = np.random.default_rng(SEED)
    losses = []
    t0 = time.time()
    for it in range(ITERS):
        idx = rng.permutation(len(ds))[:BATCH]
        pan, lms, gt, wav = ds.batch(idx)
        # NHWC -> NCHW torch tensors
        to_t = lambda a: torch.tensor(np.transpose(a, (0, 3, 1, 2)))
        pan_t, lms_t, gt_t, wav_t = map(to_t, (pan, lms, gt, wav))
        import torch.nn.functional as F
        cond = torch.cat([lms_t, pan_t,
                          F.interpolate(wav_t, size=lms_t.shape[-1],
                                        mode="bilinear")], dim=1)
        opt.zero_grad()
        loss, _ = g(gt_t - lms_t, cond=cond)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), 0.003)
        opt.step()
        losses.append(float(loss))
    print(f"torch: {ITERS} iters in {time.time()-t0:.0f}s")
    return sd0, losses


def jax_side(ds, torch_sd):
    import jax
    import jax.numpy as jnp
    from difpan_tpu.train import TrainConfig, create_train_state
    from difpan_tpu.train.engine import (build_diffusion, build_model,
                                         make_train_step)
    from difpan_tpu.train.state import make_optimizer
    from difpan_tpu.utils.torch_convert import convert_sr3_dwt_state_dict

    cfg = TrainConfig(dataset_name="qb", image_n_channel=4, pan_channel=1,
                      image_size=64, n_steps=N_STEPS, batch_size=BATCH,
                      lr_d=LR, grad_clip_norm=0.003, ema_start_iter=10 ** 9)
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(LR, 1e-4, grad_clip_norm=0.003)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_sr3_dwt_state_dict(torch_sd))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, model, dcfg, sched, tx),
                   donate_argnums=(0,))

    rng = np.random.default_rng(SEED)
    key = jax.random.PRNGKey(1)
    losses = []
    t0 = time.time()
    for it in range(ITERS):
        idx = rng.permutation(len(ds))[:BATCH]
        batch = tuple(jnp.asarray(a) for a in ds.batch(idx))
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    print(f"jax: {ITERS} iters in {time.time()-t0:.0f}s")
    return losses


def main():
    ds = make_data()
    sd0, torch_losses = torch_side(ds)
    jax_losses = jax_side(ds, sd0)

    def window(xs, a, b):
        return float(np.mean(xs[a:b]))

    print(f"{'window':>12} {'torch':>10} {'difpan_tpu':>12}")
    for a, b in [(0, 10), (30, 50), (80, 100), (100, 120)]:
        print(f"iters {a:3d}-{b:3d} {window(torch_losses, a, b):10.4f} "
              f"{window(jax_losses, a, b):12.4f}")
    ratio = window(jax_losses, 100, 120) / window(torch_losses, 100, 120)
    print(f"final-window loss ratio (ours/torch): {ratio:.3f}")


if __name__ == "__main__":
    main()
