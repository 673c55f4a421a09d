"""Reduced-resolution pansharpening metrics, bit-matched to the reference.

Reproduces `/root/reference/utils/_metric_legacy.py:294-379` (analysis_accu)
and `/root/reference/utils/metric.py:24-98,153-166` (AnalysisPanAcc +
skimage-style SSIM), including the quirks that define the published numbers:

  * 1-px border cut is ``img[0:-1, 0:-1]`` — only the LAST row/col
    (`_metric_legacy.py:300-302` with dim_cut=1);
  * SAM uses a round-half-away trick at 6 digits and the constant
    pi = 3.14159256 (`:328-330`);
  * "PSNR" is ``20*log10(rmse)`` — the reference's sign quirk (`:341-346`):
    it is the NEGATIVE of conventional PSNR. Reproduced verbatim so numbers
    are comparable; `psnr_conventional` is also provided.
  * SSIM follows skimage.structural_similarity defaults on float inputs:
    win_size=7 uniform filter, data_range=2.0 (skimage assumes [-1,1] for
    floats), per-channel then averaged, border-cropped by 3 px.

Implemented with numpy + scipy only (runs host-side on eval outputs).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import numpy as np
from scipy.ndimage import uniform_filter

PI_REF = 3.14159256  # reference's constant (`_metric_legacy.py:330`)
N_DIGITS = 6


def _round_half_up(x: float, digits: int) -> float:
    """torch.round is round-half-to-even on tensors, but the reference's
    `(x * 1e6).round() / 1e6` runs on a float32 scalar tensor — match
    numpy rint semantics (banker's rounding, same as torch)."""
    scale = 10.0 ** digits
    return float(np.rint(np.float32(x) * scale) / scale)


def sam_ergas(img_base: np.ndarray, img_out: np.ndarray, ratio: int = 4):
    """SAM (degrees) and ERGAS on one (H, W, C) image pair."""
    img_base = img_base.astype(np.float32)
    img_out = img_out.astype(np.float32)
    sum1 = np.sum(img_base * img_out, axis=2)
    sum2 = np.sum(img_base * img_base, axis=2)
    sum3 = np.sum(img_out * img_out, axis=2)
    t = np.sqrt(sum2 * sum3)
    num = int(np.sum(t > 0))
    with np.errstate(divide="ignore", invalid="ignore"):
        angle = np.arccos(sum1 / t)
    sumangle = np.where(np.isnan(angle), 0.0, angle).sum()
    averangle = sumangle / num if num != 0 else sumangle
    averangle = _round_half_up(averangle, N_DIGITS)
    sam = averangle * 180.0 / PI_REF

    chan = img_out.shape[2]
    summ = 0.0
    for i in range(chan):
        a1 = np.mean((img_base[:, :, i] - img_out[:, :, i]) ** 2)
        m1 = np.mean(img_base[:, :, i])
        summ = summ + a1 / (m1 * m1)
    ergas = 100.0 * (1.0 / ratio) * math.sqrt(summ / chan)
    return float(sam), float(ergas)


def analysis_accu(img_base: np.ndarray, img_out: np.ndarray, ratio: int = 4,
                  flag_cut_bounds: bool = True, dim_cut: int = 1,
                  choices: int = 4) -> Dict[str, float]:
    """Per-image SAM/ERGAS/PSNR(/CC) on (H, W, C) arrays
    (`_metric_legacy.py:299-379`)."""
    if flag_cut_bounds:
        img_base = img_base[dim_cut - 1:-dim_cut, dim_cut - 1:-dim_cut, :]
        img_out = img_out[dim_cut - 1:-dim_cut, dim_cut - 1:-dim_cut, :]
    img_base = img_base.astype(np.float32)
    img_out = img_out.astype(np.float32)
    h, w, chan = img_out.shape

    sam, ergas = sam_ergas(img_base, img_out, ratio)

    # legacy "PSNR" = 20*log10(rmse): negative of conventional PSNR (:341-346)
    mse = np.mean((img_base - img_out) ** 2, axis=(0, 1))
    rmse = np.sqrt(mse)
    with np.errstate(divide="ignore"):
        temp = np.log(1.0 / rmse) / math.log(10)
    psnr = float(np.mean(-20.0 * temp))

    out = {"SAM": sam, "ERGAS": ergas, "PSNR": psnr}
    if choices == 5:
        c1 = (np.sum(img_base * img_out, axis=(0, 1))
              - h * w * (np.mean(img_base, axis=(0, 1))
                         * np.mean(img_out, axis=(0, 1))))
        c2 = (np.sum(img_out ** 2, axis=(0, 1))
              - h * w * np.mean(img_out, axis=(0, 1)) ** 2)
        c3 = (np.sum(img_base ** 2, axis=(0, 1))
              - h * w * np.mean(img_base, axis=(0, 1)) ** 2)
        out["CC"] = float(np.mean(c1 / np.sqrt(c2 * c3)))
    return out


def psnr_conventional(img_gt: np.ndarray, img_test: np.ndarray,
                      data_range: float = 1.0) -> float:
    """Standard PSNR for users who want the conventional sign."""
    mse = np.mean((img_gt.astype(np.float64) - img_test) ** 2)
    return float(10 * np.log10(data_range ** 2 / mse))


def ssim_skimage(im1: np.ndarray, im2: np.ndarray, win_size: int = 7,
                 data_range: float = 2.0, channel_axis: Optional[int] = 0
                 ) -> float:
    """skimage.metrics.structural_similarity equivalent with its float-input
    defaults (uniform 7x7 window, data_range=2.0, K1=0.01, K2=0.03,
    border-cropped mean) — the metric path SSIM (`utils/metric.py:153-166`).
    """
    if channel_axis is not None:
        ims1 = np.moveaxis(im1, channel_axis, 0)
        ims2 = np.moveaxis(im2, channel_axis, 0)
        return float(np.mean([
            ssim_skimage(a, b, win_size, data_range, channel_axis=None)
            for a, b in zip(ims1, ims2)]))
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size ** 2
    cov_norm = NP / (NP - 1)

    def f(x):
        return uniform_filter(x, size=win_size)

    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1, A2 = 2 * ux * uy + C1, 2 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return float(S[pad:-pad, pad:-pad].mean())


class NonAnalysisPanAcc:
    """Full-res no-op accumulator (`utils/metric.py:11-19`)."""

    def __init__(self):
        self.acc_ave: Dict[str, float] = {}
        self.last_acc: Dict[str, float] = {}
        self._call_n = 0

    def __call__(self, *args, **kwargs):
        self.acc_ave = {}
        self.last_acc = {}

    def print_str(self, *args, **kwargs):
        return "full res: no supervised acc"


class AnalysisPanAcc:
    """Running batch-averaged SAM/ERGAS/PSNR/CC/SSIM accumulator with the
    reference's incremental-mean semantics (`utils/metric.py:24-98`).

    Inputs are NHWC float arrays in [0, 1] (the reference takes NCHW torch
    tensors; pass ``channel_last=False`` to accept NCHW numpy directly).
    """

    KEYS = ("SAM", "ERGAS", "PSNR", "CC", "SSIM")

    def __init__(self, ergas_ratio: int = 4, channel_last: bool = True):
        self.ergas_ratio = ergas_ratio
        self.channel_last = channel_last
        self.clear_history()

    def clear_history(self):
        self._acc_d: Dict[str, float] = {}
        self._call_n = 0
        self.acc_ave = {k: 0.0 for k in self.KEYS}

    @property
    def last_acc(self):
        return self._acc_d

    @staticmethod
    def _sum_acc(d_ave, d_now, n, n2=1):
        for k in d_ave.keys():
            d_ave[k] = d_ave[k] * n + d_now[k] * n2
        return d_ave

    @staticmethod
    def _average_acc(d_ave, n):
        for k in d_ave.keys():
            d_ave[k] /= n
        return d_ave

    def _to_hwc(self, img):
        return img if self.channel_last else np.transpose(img, (1, 2, 0))

    def _to_chw(self, img):
        return np.transpose(img, (2, 0, 1)) if self.channel_last else img

    def once_batch_call(self, b_gt, b_pred) -> Dict[str, float]:
        b_gt = np.asarray(b_gt)
        b_pred = np.asarray(b_pred)
        acc = {k: 0.0 for k in ("SAM", "ERGAS", "PSNR", "CC")}
        for i, (gt, pred) in enumerate(zip(b_gt, b_pred)):
            d = analysis_accu(self._to_hwc(gt), self._to_hwc(pred),
                              ratio=self.ergas_ratio, choices=5)
            acc = self._sum_acc(acc, d, i)
            acc = self._average_acc(acc, i + 1)
        acc["SSIM"] = float(np.mean([
            ssim_skimage(self._to_chw(gt), self._to_chw(pred))
            for gt, pred in zip(b_gt, b_pred)]))
        self._acc_d = acc
        return acc

    def __call__(self, b_gt, b_pred) -> Dict[str, float]:
        n = np.asarray(b_gt).shape[0]
        self.acc_ave = self._sum_acc(
            self.acc_ave, self.once_batch_call(b_gt, b_pred),
            self._call_n, n2=n)
        self.acc_ave = self._average_acc(self.acc_ave, self._call_n + n)
        self._call_n += n
        return self.acc_ave

    def print_str(self, acc_d=None):
        if acc_d is None:
            acc_d = self.acc_ave
        return ", ".join(f"{k}: {v:.6f}" for k, v in acc_d.items())
