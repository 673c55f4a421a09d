"""Loss functions (jnp, NHWC) matching `/root/reference/utils/loss_utils.py`.

The engine trains with plain L1 (`diffusion_engine.py:189`); HybridL1SSIM and
Charbonnier are provided for capability parity (`loss_utils.py:73-95,181-205`).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def charbonnier_loss(pred, target, eps: float = 1e-3):
    """`loss_utils.py:161-187`."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))


def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """1-D gaussian identical to `loss_utils.gaussian` (`:11-18`)."""
    g = np.array([
        math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2))
        for x in range(window_size)], dtype=np.float32)
    return g / g.sum()


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Windowed-gaussian SSIM over NHWC batches, matching the reference
    training-loss SSIM (`loss_utils.py:30-59`): depthwise gaussian filter,
    SAME (zero) padding of window_size//2, C1/C2 for data_range=1, mean over
    all pixels INCLUDING borders (unlike skimage's cropped variant used by
    the metrics module)."""
    g1 = _gaussian_window(window_size, sigma)
    kernel2d = jnp.asarray(np.outer(g1, g1))
    c = img1.shape[-1]
    # depthwise conv: kernel (kh, kw, 1, C) with feature_group_count=C
    kernel = jnp.tile(kernel2d[:, :, None, None], (1, 1, 1, c))
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = filt(img1 * img1) - mu1_sq
    sigma2_sq = filt(img2 * img2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def hybrid_l1_ssim(pred, target, weights=(1.0, 0.1)):
    """L1 + 0.1*(1 - SSIM)  (`loss_utils.py:73-83`, weights `:74`)."""
    return (weights[0] * l1_loss(pred, target)
            + weights[1] * (1.0 - ssim(pred, target)))


def get_loss(loss_type: str):
    """Factory mirroring `loss_utils.get_loss` (`:190-205`)."""
    table = {
        "l1": l1_loss,
        "mse": l2_loss,
        "l2": l2_loss,
        "charbonnier": charbonnier_loss,
        "l1ssim": hybrid_l1_ssim,
        "hybrid": lambda p, t: l1_loss(p, t) / 10.0 + l2_loss(p, t),
        "charbssim": lambda p, t: (charbonnier_loss(p, t, eps=1e-4)
                                   + (1.0 - ssim(p, t))),
    }
    if loss_type not in table:
        raise NotImplementedError(f"loss {loss_type} is not implemented")
    return table[loss_type]
