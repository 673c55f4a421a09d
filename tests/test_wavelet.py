"""Haar DWT parity with pywt db1 semantics (pywt's documented example values
hardcoded; pywt itself is not installed here)."""
import jax.numpy as jnp
import numpy as np

from difpan_tpu.ops import haar_dwt2, haar_idwt2, haar_dwt2_nhwc


def test_haar_1d_pairs_match_pywt_example():
    # pywt.dwt([1,2,3,4], 'db1') == ([2.12132034, 4.94974747],
    #                                [-0.70710678, -0.70710678])
    x = np.array([[1.0, 2.0, 3.0, 4.0]])[None]  # (1, 1, 4) -> use 2D on rows
    x2 = np.tile(x, (1, 2, 1))  # (1, 2, 4): two identical rows
    ll, (h, v, d) = haar_dwt2(x2)
    # two identical rows -> row-lowpass = row*sqrt(2), row-highpass = 0
    np.testing.assert_allclose(
        ll[0, 0], np.array([2.12132034, 4.94974747]) * np.sqrt(2), rtol=1e-7)
    np.testing.assert_allclose(
        v[0, 0], np.array([-0.70710678, -0.70710678]) * np.sqrt(2), rtol=1e-7)
    np.testing.assert_allclose(h, 0, atol=1e-12)
    np.testing.assert_allclose(d, 0, atol=1e-12)


def test_haar_2d_separable_hand_computed():
    x = np.arange(16, dtype=np.float64).reshape(1, 4, 4)
    ll, (h, v, d) = haar_dwt2(x)
    # ll[0,0] = mean of 2x2 block * 2: (0+1+4+5)/2 = 5
    np.testing.assert_allclose(ll[0], [[5.0, 9.0], [21.0, 25.0]])
    # h: detail along H (rows 0-1 difference): ((0+1)-(4+5))/2 = -4
    np.testing.assert_allclose(h[0], [[-4.0, -4.0], [-4.0, -4.0]])
    # v: detail along W: ((0+4)-(1+5))/2 = -1
    np.testing.assert_allclose(v[0], [[-1.0, -1.0], [-1.0, -1.0]])
    np.testing.assert_allclose(d[0], 0, atol=1e-12)


def test_haar_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 8, 8))
    ll, coeffs = haar_dwt2(x)
    np.testing.assert_allclose(haar_idwt2(ll, coeffs), x, atol=1e-12)


def test_haar_energy_preservation():
    rng = np.random.default_rng(1)
    x = rng.random((1, 2, 16, 16))
    ll, (h, v, d) = haar_dwt2(x)
    e_in = np.sum(x ** 2)
    e_out = sum(np.sum(c ** 2) for c in (ll, h, v, d))
    np.testing.assert_allclose(e_in, e_out, rtol=1e-12)


def test_nhwc_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.random((2, 8, 8, 3)).astype(np.float32)
    ll_j, (h_j, v_j, d_j) = haar_dwt2_nhwc(jnp.asarray(x))
    x_nchw = np.transpose(x, (0, 3, 1, 2))
    ll_n, (h_n, v_n, d_n) = haar_dwt2(x_nchw)
    for a, b in [(ll_j, ll_n), (h_j, h_n), (v_j, v_n), (d_j, d_n)]:
        np.testing.assert_allclose(
            np.transpose(np.asarray(a), (0, 3, 1, 2)), b, atol=1e-6)
