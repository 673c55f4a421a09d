"""Q2n parity tests — goldens from a one-time run of the reference legacy
implementation (`utils/_metric_legacy.py:15-259`)."""
import numpy as np

from difpan_tpu.metrics.q2n import q2n


def _fixtures():
    rng = np.random.RandomState(7)
    gt = (rng.rand(1, 32, 32, 4) * 1000).astype(np.float64)
    x = (gt + rng.randn(1, 32, 32, 4) * 30).clip(0, 1023)
    gt2 = (rng.rand(1, 33, 33, 8) * 1500).astype(np.float64)
    x2 = (gt2 + rng.randn(1, 33, 33, 8) * 40).clip(0, 2047)
    return gt, x, gt2, x2


def test_q2n_legacy_golden():
    gt, x, gt2, x2 = _fixtures()
    m = q2n(gt, x, 16, 16)
    np.testing.assert_allclose(
        m.ravel(), [1.03940795, 1.02200309, 1.01596109, 1.05680798],
        rtol=1e-7)
    m2 = q2n(gt2, x2, 16, 16)
    assert m2.shape == (1, 3, 3)
    np.testing.assert_allclose(
        m2.ravel()[:4], [0.97303144, 0.96219081, 1.00398708, 0.9816678],
        rtol=1e-6)
    np.testing.assert_allclose(float(m2.mean()), 0.8690101259, rtol=5e-4)


def test_q2n_legacy_identity_quirk():
    """Reference quirk: identical images do NOT give exactly 1 (W-axis qv
    slicing bug, reproduced)."""
    gt, _, _, _ = _fixtures()
    np.testing.assert_allclose(
        float(q2n(gt, gt.copy(), 16, 16).mean()), 1.0355034193, rtol=1e-7)


def test_q2n_fixed_identity():
    """With legacy_qv=False the corrected math scores identical images 1."""
    gt, _, _, _ = _fixtures()
    np.testing.assert_allclose(
        float(q2n(gt, gt.copy(), 16, 16, legacy_qv=False).mean()), 1.0,
        atol=1e-9)


def test_q2n_nonpow2_bands():
    """31-band input works (the reference would crash on its channel-pad)."""
    rng = np.random.RandomState(0)
    gt = (rng.rand(1, 32, 32, 31) * 1000)
    x = (gt + rng.randn(1, 32, 32, 31) * 30).clip(0, 1023)
    # legacy qv slicing needs C <= block size; use the fixed math here
    m = q2n(gt, x, 16, 16, legacy_qv=False)
    assert m.shape == (1, 2, 2)
    assert np.all(np.isfinite(m))
