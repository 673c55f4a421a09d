"""Diffusion-process math parity tests (golden values from the reference,
hardcoded; see test_schedules.py header). All arrays here are NHWC — the
reference is NCHW, so fixtures are built channel-first then transposed to
keep the same element values at the same (b, c, y, x) coordinates."""
import jax
import jax.numpy as jnp
import numpy as np

from difpan_tpu.diffusion import (
    DiffusionConfig, cosine_schedule, respace,
    q_sample, predict_noise_from_start, q_posterior,
    ddim_sample_loop, p_sample_loop, p_losses,
)
from difpan_tpu.diffusion.gaussian import ddim_step


def _nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _fixtures():
    x = (np.arange(2 * 3 * 2 * 2, dtype=np.float32).reshape(2, 3, 2, 2)
         / 47.0 - 0.5)
    noise = np.linspace(-1, 1, 2 * 3 * 2 * 2,
                        dtype=np.float32).reshape(2, 3, 2, 2)
    return _nchw_to_nhwc(x), _nchw_to_nhwc(noise)


def test_q_sample_golden():
    s = cosine_schedule(500)
    x, noise = _fixtures()
    t = jnp.array([3, 499])
    xt = np.asarray(q_sample(s, jnp.array(x), t, jnp.array(noise)))
    # reference flat (NCHW) indices 0, 5, 23 -> (b,c,y,x) coords
    flat = np.transpose(xt, (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat[[0, 5, 23]], [-0.5214752, -0.4057293, 0.9999989], rtol=1e-5)


def test_predict_noise_from_start_golden():
    s = cosine_schedule(500)
    x, noise = _fixtures()
    t = jnp.array([3, 499])
    xt = q_sample(s, jnp.array(x), t, jnp.array(noise))
    eps = np.asarray(predict_noise_from_start(s, xt, t, jnp.array(x)))
    flat = np.transpose(eps, (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat[[0, 5, 23]], [-1.0000011, -0.5652167, 1.0], rtol=1e-4)


def test_q_posterior_golden():
    s = cosine_schedule(500)
    x, noise = _fixtures()
    t = jnp.array([3, 499])
    xt = q_sample(s, jnp.array(x), t, jnp.array(noise))
    mean, _, log_var = q_posterior(s, jnp.array(x), xt, t)
    flat = np.transpose(np.asarray(mean), (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat[[0, 5, 23]], [-0.51476383, -0.401944, 0.03158931], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(log_var).ravel()[[0, 1]],
        [-9.2084713e+00, -1.0102057e-03], rtol=1e-5)


def _fixed_model(x, t, cond, self_cond, key):
    """Mirror of the reference test stub: 0.1*x + 0.01*cond[:, :C]."""
    return 0.1 * x + 0.01 * cond[..., : x.shape[-1]]


def test_ddim_step_golden():
    base = cosine_schedule(500)
    re, _ = respace(base, "ddim25")
    cfg = DiffusionConfig(channels=3, self_condition=False)
    xs = _nchw_to_nhwc(
        np.linspace(-1, 1, 2 * 3 * 4 * 4, dtype=np.float32).reshape(2, 3, 4, 4))
    cond = _nchw_to_nhwc(
        np.linspace(0, 1, 2 * 5 * 4 * 4, dtype=np.float32).reshape(2, 5, 4, 4))
    key = jax.random.PRNGKey(0)

    out = ddim_step(cfg, re, _fixed_model, jnp.array(xs),
                    jnp.array([24, 13]), jnp.array(cond), key, eta=0.0)
    flat = np.transpose(np.asarray(out), (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat[[0, 17, 95]], [-1.0006046, -0.64242667, 0.94975334], rtol=1e-4)

    out0 = ddim_step(cfg, re, _fixed_model, jnp.array(xs),
                     jnp.array([0, 0]), jnp.array(cond), key, eta=0.0)
    flat0 = np.transpose(np.asarray(out0), (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat0[[0, 17, 95]], [-0.1, -0.06314135, 0.10798743], rtol=1e-4)


def test_ddim_sample_loop_shapes_and_determinism():
    base = cosine_schedule(500)
    re, _ = respace(base, "ddim25")
    cfg = DiffusionConfig(channels=3, self_condition=False)
    cond = jnp.ones((2, 8, 8, 7))
    key = jax.random.PRNGKey(1)
    out1 = ddim_sample_loop(cfg, re, _fixed_model, key, cond)
    out2 = ddim_sample_loop(cfg, re, _fixed_model, key, cond)
    assert out1.shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.all(np.isfinite(np.asarray(out1)))


def test_ddim_loop_jits_once():
    base = cosine_schedule(100)
    re, _ = respace(base, "ddim10")
    cfg = DiffusionConfig(channels=2, self_condition=False)
    jitted = jax.jit(lambda k, c: ddim_sample_loop(cfg, re, _fixed_model, k, c))
    out = jitted(jax.random.PRNGKey(0), jnp.ones((1, 4, 4, 5)))
    assert out.shape == (1, 4, 4, 2)


def test_p_sample_loop_runs():
    s = cosine_schedule(20)
    cfg = DiffusionConfig(channels=2, self_condition=False)
    cond = jnp.full((2, 4, 4, 5), 0.5)
    out = p_sample_loop(cfg, s, _fixed_model, jax.random.PRNGKey(0), cond)
    assert out.shape == (2, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_p_losses_runs_and_grads():
    s = cosine_schedule(50)
    cfg = DiffusionConfig(channels=2, self_condition=True)

    def model(w):
        def fn(x, t, cond, self_cond, key):
            return w * x + 0.0 * self_cond
        return fn

    def loss_of_w(w, key):
        x0 = jnp.ones((2, 4, 4, 2)) * 0.3
        cond = jnp.ones((2, 4, 4, 5)) * 0.2
        loss, recon = p_losses(cfg, s, model(w), key, x0, cond)
        return loss

    g = jax.grad(loss_of_w)(jnp.float32(0.5), jax.random.PRNGKey(0))
    assert np.isfinite(float(g))
    # loss decreases toward the x-start target as w -> something reasonable
    l1 = loss_of_w(jnp.float32(0.0), jax.random.PRNGKey(1))
    assert np.isfinite(float(l1))


def test_p_losses_pred_modes():
    s = cosine_schedule(50)
    for mode in ("noise", "x_start", "pred_v"):
        cfg = DiffusionConfig(channels=2, pred_mode=mode, self_condition=False)
        loss, recon = p_losses(
            cfg, s, _fixed_model, jax.random.PRNGKey(2),
            jnp.ones((2, 4, 4, 2)) * 0.1, jnp.ones((2, 4, 4, 5)))
        assert np.isfinite(float(loss))
        assert recon.shape == (2, 4, 4, 2)


def test_trajectory_and_interpolate():
    s = cosine_schedule(10)
    cfg = DiffusionConfig(channels=2, self_condition=False)
    cond = jnp.full((1, 4, 4, 5), 0.5)
    from difpan_tpu.diffusion import p_sample_loop_trajectory, interpolate
    traj = p_sample_loop_trajectory(cfg, s, _fixed_model,
                                    jax.random.PRNGKey(0), cond)
    assert traj.shape == (10, 1, 4, 4, 2)
    x1 = jnp.zeros((1, 4, 4, 2))
    x2 = jnp.ones((1, 4, 4, 2))
    out = interpolate(cfg, s, _fixed_model, jax.random.PRNGKey(1), x1, x2,
                      cond, t=5)
    assert out.shape == (1, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_facade_dispatch():
    from difpan_tpu.diffusion import GaussianDiffusion, cosine_schedule
    g = GaussianDiffusion(_fixed_model, cosine_schedule(100), channels=3,
                          self_condition=False)
    cond = jnp.full((1, 8, 8, 7), 0.3)
    loss, recon = g(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                    mode="train", cond=cond)
    assert np.isfinite(float(loss))
    sr = g(jax.random.PRNGKey(1), cond, mode="ddim_sample",
           section_counts="ddim10")
    assert sr.shape == (1, 8, 8, 3)
    # functional respacing left the base schedule at T=100
    assert g.num_timesteps == 100
    import pytest
    with pytest.raises(NotImplementedError):
        g(jax.random.PRNGKey(2), cond, mode="nope")


def test_ddim_eta_stochastic():
    """eta>0 adds posterior noise; eta=0 is deterministic (reference
    sigma formula, `diffusion_ddpm_pan.py:609-620`)."""
    base = cosine_schedule(100)
    re, _ = respace(base, "ddim10")
    cfg = DiffusionConfig(channels=2, self_condition=False)
    cond = jnp.full((1, 8, 8, 5), 0.4)
    a = ddim_sample_loop(cfg, re, _fixed_model, jax.random.PRNGKey(0), cond,
                         eta=0.5)
    b = ddim_sample_loop(cfg, re, _fixed_model, jax.random.PRNGKey(1), cond,
                         eta=0.5)
    c1 = ddim_sample_loop(cfg, re, _fixed_model, jax.random.PRNGKey(0), cond)
    # deterministic part: eta=0 with different keys gives SAME trajectory
    # except the initial noise -> compare same-key eta0 vs eta0.5 differ
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c1))
    assert np.all(np.isfinite(np.asarray(a)))
