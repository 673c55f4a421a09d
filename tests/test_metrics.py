"""Metric parity tests — golden values from a one-time run of the reference
implementation (`utils/_metric_legacy.py`, `utils/loss_utils.py`)."""
import jax.numpy as jnp
import numpy as np

from difpan_tpu.metrics import AnalysisPanAcc, NonAnalysisPanAcc, analysis_accu
from difpan_tpu.utils.losses import hybrid_l1_ssim, ssim


def _fixture():
    rng = np.random.RandomState(42)
    gt = rng.rand(16, 16, 4).astype(np.float32)
    pr = (gt + 0.05 * rng.randn(16, 16, 4)).clip(0, 1).astype(np.float32)
    return gt, pr


def test_analysis_accu_golden():
    gt, pr = _fixture()
    d = analysis_accu(gt, pr, ratio=4, choices=5)
    golden = {"SAM": 4.376308917999268, "ERGAS": 2.504978656768799,
              "PSNR": -26.19565773010254, "CC": 0.9858751893043518}
    for k, v in golden.items():
        np.testing.assert_allclose(d[k], v, rtol=3e-5)


def test_analysis_accu_identical_images():
    gt, _ = _fixture()
    d = analysis_accu(gt, gt.copy(), ratio=4, choices=5)
    assert d["SAM"] == 0.0 and d["ERGAS"] == 0.0
    assert d["PSNR"] == -np.inf  # legacy sign quirk: -inf for perfect match
    np.testing.assert_allclose(d["CC"], 1.0, atol=1e-6)


def test_analysis_accu_choices4_has_no_cc():
    gt, pr = _fixture()
    d = analysis_accu(gt, pr, ratio=4, choices=4)
    assert set(d) == {"SAM", "ERGAS", "PSNR"}


def test_pan_acc_running_average():
    rng = np.random.RandomState(0)
    gt = rng.rand(4, 16, 16, 4).astype(np.float32)
    pr = (gt + 0.02 * rng.randn(4, 16, 16, 4)).clip(0, 1).astype(np.float32)
    acc = AnalysisPanAcc()
    acc(gt[:2], pr[:2])
    first = dict(acc.acc_ave)
    acc(gt[2:], pr[2:])
    # the running average changes and stays finite
    assert set(acc.acc_ave) == {"SAM", "ERGAS", "PSNR", "CC", "SSIM"}
    assert all(np.isfinite(v) for v in acc.acc_ave.values())
    assert acc.acc_ave["SAM"] != first["SAM"]
    # averaging all at once equals incremental (same per-image weights)
    acc2 = AnalysisPanAcc()
    acc2(gt, pr)
    for k in acc.acc_ave:
        np.testing.assert_allclose(acc.acc_ave[k], acc2.acc_ave[k], rtol=1e-5)


def test_non_analysis_noop():
    acc = NonAnalysisPanAcc()
    acc(None, None)
    assert acc.acc_ave == {}


def test_ssim_loss_golden():
    """HybridL1SSIM golden from reference `loss_utils.py` (window 11,
    sigma 1.5, weights (1.0, 0.1))."""
    rng = np.random.RandomState(42)
    _ = rng.rand(16, 16, 4), rng.randn(16, 16, 4)  # keep rng stream aligned
    x = rng.rand(2, 4, 32, 32).astype(np.float32)
    y = (x + 0.1 * rng.randn(2, 4, 32, 32)).astype(np.float32)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    y_nhwc = jnp.asarray(np.transpose(y, (0, 2, 3, 1)))
    np.testing.assert_allclose(
        float(ssim(x_nhwc, y_nhwc)), 0.9473774433135986, rtol=1e-5)
    np.testing.assert_allclose(
        float(hybrid_l1_ssim(x_nhwc, y_nhwc)), 0.08457652479410172,
        rtol=1e-5)
