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


# ---- round-2 parity additions: normal_kl / discretized NLL / pred_var /
# ---- repeat_noise / aux fm capture ------------------------------------

from difpan_tpu.diffusion import (  # noqa: E402
    discretized_gaussian_log_likelihood, noise_like, normal_kl)
from difpan_tpu.diffusion.gaussian import _meanflat  # noqa: E402


def test_normal_kl_golden():
    """Golden values from the reference `normal_kl`
    (`diffusion_ddpm_pan.py:91-101`) on the shared fixtures."""
    x, noise = _fixtures()
    x, noise = jnp.array(x), jnp.array(noise)
    kl = normal_kl(x, noise * 0.3, x * 0.5 + 0.1, noise * 0.2 - 0.1)
    flat = np.transpose(np.asarray(kl), (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat[[0, 5, 23]],
        [0.082678884267807, 0.05498576909303665, 0.015719642862677574],
        rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(_meanflat(kl)),
        [0.05464543402194977, 0.020776277408003807], rtol=1e-5)


def test_discretized_gaussian_log_likelihood_golden():
    """Golden values from the reference (`diffusion_ddpm_pan.py:118-140`),
    including both saturation branches and the log-eps clamp."""
    x, noise = _fixtures()
    x, noise = jnp.array(x), jnp.array(noise)
    ll = discretized_gaussian_log_likelihood(
        x * 2.0, means=noise * 0.5, log_scales=x * 0.3 - 1.0)
    flat = np.transpose(np.asarray(ll), (0, 3, 1, 2)).ravel()
    np.testing.assert_allclose(
        flat[[0, 5, 23]],
        [-2.8350253105163574, -5.837928295135498, -5.772924423217773],
        rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(_meanflat(ll)),
        [-5.584113597869873, -5.790411472320557], rtol=1e-5)

    xx = jnp.array([[-1.2, 0.0, 1.2, 0.5]])
    mm = jnp.array([[0.1, -0.2, 0.3, 0.0]])
    ls = jnp.array([[-2.0, -1.0, -0.5, -3.0]])
    ll2 = discretized_gaussian_log_likelihood(xx, means=mm, log_scales=ls)
    np.testing.assert_allclose(
        np.asarray(ll2).ravel(),
        [-34.53877639770508, -4.915438175201416, -2.66015887260437,
         -34.53877639770508], rtol=1e-5)


def test_noise_like_repeat():
    """repeat=True broadcasts one sample's noise over the batch
    (`diffusion_ddpm_pan.py:79-88`)."""
    k = jax.random.PRNGKey(3)
    n = np.asarray(noise_like(k, (4, 2, 2, 3), repeat=True))
    for b in range(1, 4):
        np.testing.assert_array_equal(n[0], n[b])
    n2 = np.asarray(noise_like(k, (4, 2, 2, 3), repeat=False))
    assert not np.array_equal(n2[0], n2[1])


def test_sampling_repeat_noise():
    """With repeat_noise and identical per-sample inputs, every batch
    element follows the same trajectory."""
    s = cosine_schedule(10)
    cfg = DiffusionConfig(channels=2, self_condition=False)
    cond = jnp.full((3, 4, 4, 5), 0.5)
    out = p_sample_loop(cfg, s, _fixed_model, jax.random.PRNGKey(0), cond,
                        repeat_noise=True)
    o = np.asarray(out)
    # the init draw is NOT repeated (reference draws full randn), so compare
    # determinism instead: same key => same result, and the ddim path
    re, _ = respace(cosine_schedule(100), "ddim5")
    d1 = ddim_sample_loop(cfg, re, _fixed_model, jax.random.PRNGKey(1), cond,
                          eta=1.0, repeat_noise=True)
    d2 = ddim_sample_loop(cfg, re, _fixed_model, jax.random.PRNGKey(1), cond,
                          eta=1.0, repeat_noise=False)
    assert o.shape == (3, 4, 4, 2)
    assert np.all(np.isfinite(o))
    # eta>0 makes the injected noise matter: repeat vs fresh must differ
    assert not np.allclose(np.asarray(d1), np.asarray(d2))


def _pred_var_model(x, t, cond, self_cond, key):
    """Deterministic 2C-output model: [prediction, raw_var_frac]."""
    pred = 0.1 * x + 0.05 * cond[..., :2] + 0.0 * self_cond
    raw = 0.2 * x - 0.1
    return jnp.concatenate([pred, raw], axis=-1)


def test_pred_var_p_losses_trains():
    """`DiffusionConfig(pred_var=True)`: finite loss, grads flow to the
    variance head, decoder-NLL term contributes (`:739-766`)."""
    s = cosine_schedule(50)
    cfg = DiffusionConfig(channels=2, self_condition=True, pred_var=True)
    cfg_off = DiffusionConfig(channels=2, self_condition=True)

    def model(w):
        def fn(x, t, cond, self_cond, key):
            out = _pred_var_model(x, t, cond, self_cond, key)
            return jnp.concatenate(
                [out[..., :2], w * out[..., 2:]], axis=-1)
        return fn

    def loss_of_w(w, key):
        x0 = jnp.ones((2, 4, 4, 2)) * 0.3
        cond = jnp.ones((2, 4, 4, 5)) * 0.2
        loss, _ = p_losses(cfg, s, model(w), key, x0, cond)
        return loss

    k = jax.random.PRNGKey(0)
    loss = loss_of_w(jnp.float32(1.0), k)
    assert np.isfinite(float(loss))
    g = jax.grad(loss_of_w)(jnp.float32(1.0), k)
    assert np.isfinite(float(g)) and float(g) != 0.0

    # without pred_var on a C-output model the loss differs by the NLL term
    def plain_fn(x, t, cond, self_cond, key):
        return 0.1 * x + 0.05 * cond[..., :2] + 0.0 * self_cond
    loss_off, _ = p_losses(cfg_off, s, plain_fn, k,
                           jnp.ones((2, 4, 4, 2)) * 0.3,
                           jnp.ones((2, 4, 4, 5)) * 0.2)
    assert float(loss) != float(loss_off)


def test_pred_var_sampling():
    """DDPM + DDIM sampling with a learned-variance model run and stay
    finite; the interpolated log-variance lies in [min_log, max_log]."""
    from difpan_tpu.diffusion import p_mean_variance
    s = cosine_schedule(20)
    cfg = DiffusionConfig(channels=2, self_condition=False, pred_var=True)
    cond = jnp.full((2, 4, 4, 5), 0.5)
    out = p_sample_loop(cfg, s, _pred_var_model, jax.random.PRNGKey(0), cond)
    assert out.shape == (2, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(out)))

    x = jnp.ones((2, 4, 4, 2)) * 0.1
    t = jnp.array([5, 15])
    _, _, log_var, _ = p_mean_variance(
        cfg, s, _pred_var_model, x, t, cond, x, clip_denoised=False)
    min_log = np.asarray(s.posterior_log_variance_clipped)[np.array([5, 15])]
    max_log = np.asarray(s.posterior_log_variance_max)[np.array([5, 15])]
    lv = np.asarray(log_var)
    for i in range(2):
        assert np.all(lv[i] >= min(min_log[i], max_log[i]) - 1e-6)
        assert np.all(lv[i] <= max(min_log[i], max_log[i]) + 1e-6)


def _aux_model(x, t, cond, self_cond, key):
    out = 0.1 * x + 0.0 * self_cond
    fms = [jnp.mean(x, axis=-1, keepdims=True), x * 2.0]
    return out, fms


def test_ddim_loop_aux_capture():
    """`has_aux=True` sums the model's aux pytree across all evals —
    the get_interm_fm equivalent for the DDIM scan
    (`diffusion_ddpm_pan.py:445-498`)."""
    cfg = DiffusionConfig(channels=2, self_condition=False)
    re, _ = respace(cosine_schedule(100), "ddim5")
    cond = jnp.full((2, 4, 4, 5), 0.5)
    img, fms = ddim_sample_loop(cfg, re, _aux_model, jax.random.PRNGKey(0),
                                cond, has_aux=True)
    assert img.shape == (2, 4, 4, 2)
    assert len(fms) == 2
    assert fms[0].shape == (2, 4, 4, 1) and fms[1].shape == (2, 4, 4, 2)
    assert np.all(np.isfinite(np.asarray(fms[1])))
    # plain loop result is identical — aux capture must not perturb sampling
    img_plain = ddim_sample_loop(
        cfg, re, lambda *a: _aux_model(*a)[0], jax.random.PRNGKey(0), cond)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img_plain),
                               rtol=1e-6)


def test_ddpm_loop_aux_times_gating():
    """`aux_times` restricts accumulation to the reference's saved_times
    semantics (`models/unet_model_google.py:402`)."""
    cfg = DiffusionConfig(channels=2, self_condition=False)
    s = cosine_schedule(10)
    cond = jnp.full((1, 4, 4, 5), 0.5)

    def counting_model(x, t, cond, self_cond, key):
        return 0.1 * x + 0.0 * self_cond, jnp.ones(())

    _, n_all = p_sample_loop(cfg, s, counting_model, jax.random.PRNGKey(0),
                             cond, has_aux=True)
    _, n_two = p_sample_loop(cfg, s, counting_model, jax.random.PRNGKey(0),
                             cond, has_aux=True, aux_times=[6, 4])
    assert int(np.asarray(n_all)) == 10
    assert int(np.asarray(n_two)) == 2
