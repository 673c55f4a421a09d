"""Schedule parity tests.

Golden values were generated ONCE by running the reference implementation
(/root/reference/diffusion/diffusion_ddpm_pan.py) on CPU and are hardcoded
here, so the tests have no dependency on the reference tree.
"""
import numpy as np
import pytest

from difpan_tpu.diffusion import (
    make_beta_schedule, schedule_from_betas, cosine_schedule,
    space_timesteps, respace,
)

# (schedule, first3, last3, sum) from the reference make_beta_schedule(T=500,
# linear_start=1e-4, linear_end=2e-2, cosine_s=8e-3)
GOLDEN_BETAS = {
    "cosine": ([8.74240726e-05, 1.06854066e-04, 1.26285759e-04],
               [0.55554836, 0.74999757, 0.999], 11.06003900466872),
    "linear": ([0.0001, 0.00013988, 0.00017976],
               [0.01992024, 0.01996012, 0.02], 5.025),
    "quad": ([0.0001, 0.00010534, 0.00011081],
             [0.01985129, 0.01992558, 0.02], 3.5885866246031393),
    "warmup10": ([0.0001, 0.00050612, 0.00091224],
                 [0.02, 0.02, 0.02], 9.5025),
    "warmup50": ([0.0001, 0.00017992, 0.00025984],
                 [0.02, 0.02, 0.02], 7.512500000000001),
    "const": ([0.02, 0.02, 0.02], [0.02, 0.02, 0.02], 10.0),
    "jsd": ([0.002, 0.00200401, 0.00200803],
            [0.33333333, 0.5, 1.0], 6.792823429990525),
}


@pytest.mark.parametrize("name", sorted(GOLDEN_BETAS))
def test_beta_schedules_match_reference(name):
    first3, last3, total = GOLDEN_BETAS[name]
    b = make_beta_schedule(name, 500, 1e-4, 2e-2, cosine_s=8e-3)
    assert b.shape == (500,)
    # first3/last3 were captured from numpy's 8-significant-digit repr
    np.testing.assert_allclose(b[:3], first3, rtol=5e-4)
    np.testing.assert_allclose(b[-3:], last3, rtol=5e-4)
    np.testing.assert_allclose(b.sum(), total, rtol=1e-10)


def test_derived_buffers_match_reference():
    s = cosine_schedule(500)
    idx = [0, 1, 250, 499]
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod)[idx],
        [9.9995631e-01, 9.9990284e-01, 7.0051897e-01, 9.8564924e-05],
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod)[idx],
        [0.00935008, 0.01393803, 0.7136338, 1.0], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance)[idx],
        [0.0, 4.8086044e-05, 6.2726047e-03, 9.9899030e-01], rtol=1e-5,
        atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s.posterior_log_variance_clipped)[idx],
        [-4.6051701e+01, -9.9425182e+00, -5.0715637e+00, -1.0102057e-03],
        rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef1)[idx],
        [1.0, 0.550008, 0.00870879, 0.00311378], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s.posterior_mean_coef2)[idx],
        [0.0, 0.44999197, 0.9907387, 0.03162247], rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(s.p2_loss_weight)[idx], 1.0)


def test_space_timesteps_ddim25():
    ts = space_timesteps(500, "ddim25")
    assert sorted(ts) == list(range(0, 500, 20))


def test_space_timesteps_sections():
    # 300 steps into [10, 15, 20] sections per the reference docstring
    ts = space_timesteps(300, [10, 15, 20])
    assert len(ts) == 45
    assert max(ts) < 300


def test_respace_matches_reference():
    base = cosine_schedule(500)
    re, tmap = respace(base, "ddim25")
    assert re.num_timesteps == 25
    np.testing.assert_array_equal(tmap, np.arange(0, 500, 20))
    golden = [8.74400139e-05, 5.81729412e-03, 1.35648251e-02, 2.13574767e-02,
              2.92569399e-02, 3.73283029e-02, 4.56421971e-02, 5.42777181e-02,
              6.33249879e-02, 7.28898644e-02, 8.30994844e-02, 9.41088796e-02,
              1.06112301e-01, 1.19357646e-01, 1.34167612e-01, 1.50973856e-01,
              1.70367539e-01, 1.93182588e-01, 2.20636964e-01, 2.54581571e-01,
              2.97970235e-01, 3.55807006e-01, 4.37214136e-01, 5.60270309e-01,
              7.61762500e-01]
    np.testing.assert_allclose(np.asarray(re.betas), golden, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(re.sqrt_alphas_cumprod)[[0, 1, 24]],
        [0.99995625, 0.9970435, 0.05918652], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(re.posterior_log_variance_clipped)[[0, 1, 24]],
        [-46.0517, -9.35939, -0.28342444], rtol=1e-5)


def test_respace_is_functional():
    """Respacing must not mutate the base schedule (the reference mutates
    in place; we verify value semantics)."""
    base = cosine_schedule(500)
    before = np.asarray(base.betas).copy()
    respace(base, "ddim25")
    np.testing.assert_array_equal(np.asarray(base.betas), before)
    assert base.num_timesteps == 500
