#!/usr/bin/env python
"""End-to-end DDIM-25 sampling parity: reference torch vs difpan_tpu.

With eta=0 DDIM is deterministic given the initial noise xT, so feeding the
SAME xT and the SAME (converted) weights through both 25-step chains must
produce matching super-resolved outputs — the strongest whole-pipeline
parity check available without trained weights.

Run from repo root; needs /root/reference mounted.
"""
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_STEPS = 100
SECTION = "ddim25"


def main():
    import torch

    timm = types.ModuleType("timm")
    tm = types.ModuleType("timm.models")
    tl = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()

        def forward(self, x):
            return x

    tl.DropPath = DropPath
    sys.modules.update({"timm": timm, "timm.models": tm,
                        "timm.models.layers": tl})
    sys.path.insert(0, "/root/reference")
    from models.sr3_dwt import UNetSR3
    from diffusion.diffusion_ddpm_pan import (GaussianDiffusion,
                                              make_beta_schedule)

    torch.manual_seed(3)
    net = UNetSR3(in_channel=4, out_channel=4, lms_channel=4, pan_channel=1,
                  inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
                  attn_res=(8,), dropout=0.2, image_size=64,
                  self_condition=True).eval()
    sd = net.state_dict()

    g = GaussianDiffusion(net, image_size=64, channels=4,
                          pred_mode="x_start", loss_type="l1", device="cpu",
                          clamp_range=(0, 1))
    g.set_new_noise_schedule(
        betas=make_beta_schedule("cosine", N_STEPS, cosine_s=8e-3))

    rng = np.random.RandomState(9)
    cond_nchw = rng.rand(1, 12, 64, 64).astype(np.float32)
    xT = rng.randn(1, 4, 64, 64).astype(np.float32)

    # reference chain, starting from OUR xT (mirror its loop with eta=0)
    with torch.no_grad():
        use_ts = g.space_timesteps(g.num_timesteps, SECTION)
        g.space_new_betas(use_ts)
        img = torch.tensor(xT)
        cond_t = torch.tensor(cond_nchw)
        for i in reversed(range(len(g.betas))):
            img = g.ddim_sample(
                img, torch.full((1,), i, dtype=torch.long),
                condition_x=cond_t, self_cond=None, eta=0.0)
        ref = img.numpy()

    # our chain from the same xT
    import jax
    import jax.numpy as jnp
    from difpan_tpu.diffusion import (DiffusionConfig, respace,
                                      schedule_from_betas,
                                      make_beta_schedule as mk)
    from difpan_tpu.diffusion.gaussian import ddim_step
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.utils.torch_convert import convert_sr3_dwt_state_dict

    params = jax.tree_util.tree_map(
        jnp.asarray, convert_sr3_dwt_state_dict(sd))
    jnet = UNetSR3DWT(in_channel=4, out_channel=4, lms_channel=4,
                      pan_channel=1, inner_channel=32, norm_groups=1,
                      channel_mults=(1, 2, 2, 4), attn_res=(8,),
                      res_blocks=3, dropout=0.2, image_size=64,
                      self_condition=True)
    base = schedule_from_betas(mk("cosine", N_STEPS, cosine_s=8e-3))
    sched_re, _ = respace(base, SECTION)
    dcfg = DiffusionConfig(channels=4, self_condition=True)

    def model_fn(x, t, c, sc, key):
        return jnet.apply({"params": params}, x, t, c, sc, train=False)

    img_j = jnp.asarray(np.transpose(xT, (0, 2, 3, 1)))
    cond_j = jnp.asarray(np.transpose(cond_nchw, (0, 2, 3, 1)))
    key = jax.random.PRNGKey(0)  # unused: eta=0 => sigma=0

    @jax.jit
    def chain(img, cond):
        def step(carry, t_scalar):
            img = carry
            t = jnp.full((1,), t_scalar, dtype=jnp.int32)
            img = ddim_step(dcfg, sched_re, model_fn, img, t, cond, key,
                            eta=0.0)
            return img, None
        ts = jnp.arange(sched_re.num_timesteps - 1, -1, -1)
        img, _ = jax.lax.scan(step, img, ts)
        return img

    ours = np.transpose(np.asarray(chain(img_j, cond_j)), (0, 3, 1, 2))

    diff = np.abs(ours - ref)
    print(f"DDIM-25 full-chain parity: max|diff|={diff.max():.3e}, "
          f"mean|diff|={diff.mean():.3e}, ref std={ref.std():.3f}")
    assert diff.max() < 5e-3, "sampling chains diverged"
    print("PASS")


if __name__ == "__main__":
    main()
