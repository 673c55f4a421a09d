"""MultiScaleModel (second-stage regressor) tests: fm capture through the
DPM-Solver scan, decoder pyramid shapes, end-to-end output."""
import jax
import jax.numpy as jnp
import numpy as np

from difpan_tpu.diffusion import make_beta_schedule
from difpan_tpu.models import (MultiScaleDecoder, MultiScaleModel, UNetGoogle,
                               generate_diffusion_fms)
from difpan_tpu.solvers import NoiseScheduleVP


def _setup(c=4, size=64):
    unet = UNetGoogle(
        in_channel=2 * c + 1, out_channel=c, inner_channel=32, norm_groups=1,
        channel_mults=(1, 2, 2, 4), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_size=size, self_condition=False)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, size, size, c))
    cond = jnp.zeros((1, size, size, c + 1))
    params = unet.init({"params": key}, x, jnp.array([0]), cond,
                       train=False)["params"]

    def unet_apply(xx, t, cc, capture_fms=False):
        return unet.apply({"params": params}, xx, t, cc, train=False,
                          capture_fms=capture_fms)

    ns = NoiseScheduleVP(
        "discrete", betas=make_beta_schedule("cosine", 100, cosine_s=8e-3))
    return unet_apply, ns


def test_generate_diffusion_fms():
    c, size = 4, 64
    unet_apply, ns = _setup(c, size)
    lms = jnp.full((2, size, size, c), 0.4)
    pan = jnp.full((2, size, size, 1), 0.6)
    sampled, fm_sums = generate_diffusion_fms(
        unet_apply, ns, lms, pan, jax.random.PRNGKey(1), steps=4, order=2)
    assert sampled.shape == (2, size, size, c)
    # 3 upsample stages at 16/32/64 with channels 128/64/64
    assert [f.shape[1] for f in fm_sums] == [16, 32, 64]
    assert [f.shape[-1] for f in fm_sums] == [128, 64, 64]
    # aux accumulated over all 4 NFEs of normalized maps: per-pixel norms
    # sum to ~NFE
    norm0 = np.asarray(jnp.sqrt(jnp.sum(
        (fm_sums[0] / 4) ** 2, axis=-1)))
    assert np.all(norm0 < 1.2)


def test_multiscale_model_end_to_end():
    c, size = 4, 64
    unet_apply, ns = _setup(c, size)
    lms = jnp.full((1, size, size, c), 0.4)
    pan = jnp.full((1, size, size, 1), 0.6)
    sampled, fm_sums = generate_diffusion_fms(
        unet_apply, ns, lms, pan, jax.random.PRNGKey(1), steps=4, order=2)
    msm = MultiScaleModel(MultiScaleDecoder(dims=(32, 64, 128, 64, 64, c)))
    variables = msm.init(jax.random.PRNGKey(2), lms, pan, fm_sums, sampled)
    out = msm.apply(variables, lms, pan, sampled, fm_sums, train=False)
    assert out.shape == (1, size, size, c)
    assert np.all(np.isfinite(np.asarray(out)))
    # train mode updates batch stats
    out2, updated = msm.apply(variables, lms, pan, sampled, fm_sums,
                              train=True, mutable=["batch_stats"])
    assert "batch_stats" in updated
