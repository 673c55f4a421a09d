"""DPM-Solver parity tests — goldens from a one-time run of the reference
`solver/dpm_solver.py` with a deterministic toy noise model.

Note: the reference's model_wrapper crashes for model_type x_start/v on 4-D
image tensors (missing dim expansion at `dpm_solver.py:300`); our
implementation fixes this, so those paths are checked by self-consistency
(an x_start model defined from the noise model must sample identically).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difpan_tpu.diffusion import make_beta_schedule
from difpan_tpu.solvers import DPMSolver, NoiseScheduleVP, model_wrapper


def _ns():
    return NoiseScheduleVP(
        "discrete", betas=make_beta_schedule("cosine", 500, cosine_s=8e-3))


def _model(x, t_input, cond=None):
    out = 0.3 * x + 0.1 * jnp.sin(t_input / 100.0).reshape(
        (-1,) + (1,) * (x.ndim - 1))
    if cond is not None:
        out = out + 0.05 * cond[..., : x.shape[-1]]
    return out


def _x0():
    # NHWC with the same element values as the reference's NCHW fixture
    x = np.linspace(-1, 1, 2 * 3 * 4 * 4,
                    dtype=np.float32).reshape(2, 3, 4, 4)
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _pick(out):
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    return out_nchw.ravel()[[0, 17, 95]]


def _run(algo, method, order, steps=10, skip="time_uniform",
         st="dpmsolver", corr=None, mfn=None, x=None):
    ns = _ns()
    solver = DPMSolver(mfn or model_wrapper(_model, ns, model_type="noise"),
                       ns, algorithm_type=algo, correcting_x0_fn=corr)
    return solver.sample(x if x is not None else _x0(), steps=steps,
                         order=order, method=method, skip_type=skip,
                         solver_type=st)


GOLDEN = {
    "ms_o2_pp": ("dpmsolver++", "multistep", 2, 10, "time_uniform",
                 "dpmsolver", [-3136.8093, -1922.9048, 3646.7727]),
    "ms_o2_dpm": ("dpmsolver", "multistep", 2, 10, "time_uniform",
                  "dpmsolver", [-3168.5198, -1942.3317, 3683.706]),
    "ms_o3_pp": ("dpmsolver++", "multistep", 3, 12, "time_uniform",
                 "dpmsolver", [-3043.2893, -1865.5065, 3538.431]),
    "ss_o2_pp": ("dpmsolver++", "singlestep", 2, 12, "time_uniform",
                 "dpmsolver", [-3027.0032, -1855.6013, 3519.0664]),
    "ss_o3_pp": ("dpmsolver++", "singlestep", 3, 12, "time_uniform",
                 "dpmsolver", [-2194.3608, -1345.3182, 2550.2886]),
    "ssf_o2_pp": ("dpmsolver++", "singlestep_fixed", 2, 12, "time_uniform",
                  "dpmsolver", [-3027.0032, -1855.6013, 3519.0664]),
    "lof_s6_o3": ("dpmsolver++", "multistep", 3, 6, "time_uniform",
                  "dpmsolver", [-3618.023, -2217.7947, 4206.7764]),
    "logSNR": ("dpmsolver++", "multistep", 2, 10, "logSNR", "dpmsolver",
               [-369.54007, -227.07275, 426.59967]),
    "quad": ("dpmsolver++", "multistep", 2, 10, "time_quadratic",
             "dpmsolver", [-3743.457, -2294.6846, 4352.617]),
    "taylor_o2": ("dpmsolver++", "multistep", 2, 10, "time_uniform",
                  "taylor", [-3118.8271, -1911.8898, 3625.8286]),
}


def test_noise_schedule_golden():
    ns = _ns()
    for t, (la, std, lam) in {
            0.002: (-0.00004372, 0.00935094, 4.67223501),
            0.5: (-0.35276836, 0.71144682, -0.01231375),
            1.0: (-9.22480202, 1.0, -9.22480202)}.items():
        np.testing.assert_allclose(ns.marginal_log_mean_coeff_np(t), la,
                                   rtol=2e-4, atol=1e-7)
        # reference derives log-alphas in float32; we use float64 (tiny
        # differences at the smallest t)
        np.testing.assert_allclose(ns.marginal_std_np(t), std, rtol=5e-4)
        np.testing.assert_allclose(ns.marginal_lambda_np(t), lam, rtol=2e-4)
    np.testing.assert_allclose(ns.inverse_lambda_np(2.0), 0.07868412882,
                               rtol=1e-4)
    np.testing.assert_allclose(ns.inverse_lambda_np(-3.0), 0.9680774211,
                               rtol=1e-4)
    # jnp variants agree with numpy planning variants
    for t in (0.01, 0.3, 0.9):
        np.testing.assert_allclose(float(ns.marginal_lambda(jnp.float32(t))),
                                   ns.marginal_lambda_np(t), rtol=1e-4)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_solver_golden(name):
    algo, method, order, steps, skip, st, expected = GOLDEN[name]
    out = _run(algo, method, order, steps=steps, skip=skip, st=st)
    np.testing.assert_allclose(_pick(out), expected, rtol=3e-3)


def test_clamp_corrector_golden():
    out = _run("dpmsolver++", "multistep", 2, steps=8,
               corr=lambda x0, t: jnp.clip(x0, -1, 1), x=_x0() * 3)
    np.testing.assert_allclose(
        _pick(out), [-1.0280081, -1.0179682, 1.0280081], rtol=1e-4)


def test_classifier_free_guidance_golden():
    ns = _ns()
    cond = jnp.asarray(np.transpose(
        np.linspace(0, 1, 2 * 5 * 4 * 4,
                    dtype=np.float32).reshape(2, 5, 4, 4), (0, 2, 3, 1)))

    def model_nhwc(x, t, c=None):
        return _model(x, t, c)

    mf = model_wrapper(model_nhwc, ns, model_type="noise",
                       guidance_type="classifier-free", condition=cond,
                       unconditional_condition=jnp.zeros_like(cond),
                       guidance_scale=2.0)
    out = _run("dpmsolver++", "multistep", 2, mfn=mf)
    np.testing.assert_allclose(
        _pick(out), [-3136.8093, -1974.7072, 3259.7769], rtol=3e-3)


def test_x_start_wrapper_self_consistency():
    """x_start model derived from the noise model must sample identically
    (the reference's x_start path is broken for 4-D; ours is fixed)."""
    ns = _ns()

    def x_start_model(x, t_input, cond=None):
        t_cont = t_input / 1000.0 + 1.0 / ns.total_N
        alpha = ns.marginal_alpha(t_cont).reshape((-1,) + (1,) * (x.ndim - 1))
        sigma = ns.marginal_std(t_cont).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - sigma * _model(x, t_input, cond)) / alpha

    mf_noise = model_wrapper(_model, ns, model_type="noise")
    mf_x0 = model_wrapper(x_start_model, ns, model_type="x_start")
    s1 = DPMSolver(mf_noise, ns).sample(_x0(), steps=10, order=2,
                                        method="multistep")
    s2 = DPMSolver(mf_x0, ns).sample(_x0(), steps=10, order=2,
                                     method="multistep")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=2e-2,
                               atol=2e-1)


def test_input_time_mode_index():
    """input_time_mode="index" conditions the denoiser on the discrete
    schedule's own (fractional) index axis: continuous t=i/N maps to
    i-1, so the grid spans exactly [0, N-1] like the DDIM protocol's
    respaced indices (vs the reference's (t-1/N)*1000 virtual axis)."""
    ns = _ns()
    x = _x0()

    def t_echo(xx, t_input, cond=None):
        return jnp.broadcast_to(
            jnp.reshape(t_input, (-1, 1, 1, 1)).astype(xx.dtype), xx.shape)

    mf_idx = model_wrapper(t_echo, ns, model_type="noise",
                           input_time_mode="index")
    mf_ref = model_wrapper(t_echo, ns, model_type="noise")
    for t_cont in (1.0 / ns.total_N, 0.37, 1.0):
        tc = jnp.full((x.shape[0],), t_cont)
        got_idx = float(mf_idx(x, tc)[0, 0, 0, 0])
        got_ref = float(mf_ref(x, tc)[0, 0, 0, 0])
        np.testing.assert_allclose(got_idx, t_cont * ns.total_N - 1.0,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            got_ref, (t_cont - 1.0 / ns.total_N) * 1000.0,
            rtol=1e-5, atol=1e-4)
    # the index grid spans [0, N-1]
    assert abs(float(mf_idx(x, jnp.full((x.shape[0],), 1.0))[0, 0, 0, 0])
               - (ns.total_N - 1)) < 1e-3

    with pytest.raises(AssertionError):
        model_wrapper(_model, ns, input_time_mode="bogus")


def test_grid_skip_type():
    """skip_type="grid" places every step ON the discrete schedule's own
    t_array (exact lambdas, no log-alpha interpolation)."""
    ns = _ns()
    solver = DPMSolver(model_wrapper(_model, ns, model_type="noise"), ns)
    N = ns.total_N
    ts = solver.get_time_steps("grid", 1.0, 1.0 / N, N - 1)
    np.testing.assert_allclose(ts, ns.t_array[::-1], rtol=0, atol=1e-12)
    ts5 = solver.get_time_steps("grid", 1.0, 1.0 / N, 5)
    assert len(ts5) == 6 and ts5[0] == 1.0 and ts5[-1] == 1.0 / N
    assert all(any(abs(t - g) < 1e-12 for g in ns.t_array) for t in ts5)
    with pytest.raises(ValueError):   # more steps than grid points
        solver.get_time_steps("grid", 1.0, 1.0 / N, N)
    ns_cont = NoiseScheduleVP("linear")
    solver_cont = DPMSolver(
        model_wrapper(_model, ns_cont, model_type="noise"), ns_cont)
    with pytest.raises(ValueError):   # needs a discrete schedule
        solver_cont.get_time_steps("grid", 1.0, 1e-3, 5)


def test_grid_denoise_beats_residual_noise_at_small_T():
    """On a small-T discrete schedule the plain multistep output at
    t_0=1/T retains sigma(t_0) of noise; denoise_to_zero removes it.
    With a perfect x0 model the dz output is exactly x0."""
    betas = np.linspace(1e-2, 0.2, 8)
    ns = NoiseScheduleVP("discrete", betas=betas)
    x0_true = _x0()

    def perfect_x0(x, t_input, cond=None):
        return x0_true

    mf = model_wrapper(perfect_x0, ns, model_type="x_start")
    solver = DPMSolver(mf, ns, algorithm_type="dpmsolver++")
    xT = _x0() * 0.3 + 1.1
    plain = solver.sample(xT, steps=6, order=1, method="multistep",
                          skip_type="grid")
    dz = solver.sample(xT, steps=5, order=1, method="multistep",
                       skip_type="grid", denoise_to_zero=True)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(x0_true),
                               rtol=1e-4, atol=1e-5)
    # the plain output still carries the t_0 marginal mix
    assert float(np.abs(np.asarray(plain) - np.asarray(x0_true)).max()) \
        > 1e-2


def test_multistep_is_jittable_and_scan_based():
    ns = _ns()
    solver = DPMSolver(model_wrapper(_model, ns, model_type="noise"), ns)
    f = jax.jit(lambda x: solver.sample(x, steps=20, order=2,
                                        method="multistep"))
    out = f(_x0())
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(_x0())))


def test_adaptive_runs():
    ns = _ns()
    solver = DPMSolver(model_wrapper(_model, ns, model_type="noise"), ns)
    out = solver.sample(_x0() * 0.1, order=2, method="adaptive")
    assert np.all(np.isfinite(np.asarray(out)))


def test_add_noise_and_inverse():
    ns = _ns()
    solver = DPMSolver(model_wrapper(_model, ns, model_type="noise"), ns)
    x = _x0()
    xt = solver.add_noise(jax.random.PRNGKey(0), x, jnp.array([0.5]))
    assert xt.shape == x.shape
    out = solver.inverse(x * 0.1, steps=5, order=1, method="multistep")
    assert np.all(np.isfinite(np.asarray(out)))
