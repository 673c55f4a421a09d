"""Synthetic h5-layout fixtures for tests and benchmarks.

Generates physically-plausible reduced-res pansharpening data: a random
smooth "ground truth" HR MS cube, its blurred+decimated MS, the bilinear
upsampled LMS, and a band-average PAN — so metrics and training behave like
on real data (same key layout as the reference's WV3/GF2/QB and CAVE h5
files)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def _smooth_noise(rng, shape, smooth=4):
    x = rng.random(shape)
    # cheap separable smoothing for spatial correlation
    for axis in (-2, -1):
        for _ in range(smooth):
            x = (x + np.roll(x, 1, axis=axis)) / 2
    return x


def _box_down(x: np.ndarray, r: int) -> np.ndarray:
    n, c, h, w = x.shape
    return x.reshape(n, c, h // r, r, w // r, r).mean(axis=(3, 5))


def _bilinear_up(x: np.ndarray, r: int) -> np.ndarray:
    # nearest-plus-smoothing upsample is fine for fixtures
    up = np.repeat(np.repeat(x, r, axis=-2), r, axis=-1)
    for axis in (-2, -1):
        up = (up + np.roll(up, 1, axis=axis)) / 2
    return up


def make_synthetic_pan_h5(n: int = 8, channels: int = 4, size: int = 64,
                          ratio: int = 4, division: float = 1023.0,
                          seed: int = 0, full_res: bool = False
                          ) -> Dict[str, np.ndarray]:
    """Reduced-res: {gt, ms, lms, pan}; full-res: {ms, lms, pan}. NCHW,
    value range [0, division] like raw sensor h5 files."""
    rng = np.random.default_rng(seed)
    gt = _smooth_noise(rng, (n, channels, size, size)) * division
    ms = _box_down(gt, ratio)
    lms = _bilinear_up(ms, ratio)
    pan = gt.mean(axis=1, keepdims=True)
    d = {"ms": ms, "lms": lms, "pan": pan}
    if not full_res:
        d["gt"] = gt
    return d


def make_synthetic_hisr_h5(n: int = 4, bands: int = 31, size: int = 64,
                           ratio: int = 4, seed: int = 0
                           ) -> Dict[str, np.ndarray]:
    """{GT, LRHSI, RGB, HSI_up} in [0, 1], NCHW (CAVE/Harvard layout)."""
    rng = np.random.default_rng(seed)
    gt = _smooth_noise(rng, (n, bands, size, size))
    lr = _box_down(gt, ratio)
    hsi_up = _bilinear_up(lr, ratio)
    rgb = np.stack([gt[:, : bands // 3].mean(1),
                    gt[:, bands // 3: 2 * bands // 3].mean(1),
                    gt[:, 2 * bands // 3:].mean(1)], axis=1)
    return {"GT": gt.astype(np.float32), "LRHSI": lr.astype(np.float32),
            "RGB": rgb.astype(np.float32),
            "HSI_up": hsi_up.astype(np.float32)}
