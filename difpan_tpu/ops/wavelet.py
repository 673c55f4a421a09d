"""Single-level Haar (db1) 2-D DWT, exactly matching pywt.wavedec2 semantics.

The reference computes wavelet features on the host with pywt at dataset
init (`/root/reference/dataset/pan_dataset.py:74-81`,
`dataset/hisr.py:50-55`). For even-length axes (all datasets here), pywt's
db1 with symmetric padding reduces to pairwise sums/differences scaled by
1/sqrt(2):

    cA[k] = (x[2k] + x[2k+1]) / sqrt(2)
    cD[k] = (x[2k] - x[2k+1]) / sqrt(2)

pywt.dwt2 returns (cA, (cH, cV, cD)) = ('aa', ('da', 'ad', 'dd')) over axes
(-2, -1): cH is detail along H / approx along W, cV is approx along H /
detail along W.

Two implementations: numpy (host data pipeline, one-time over whole arrays)
and jnp NHWC (device, jit/grad-friendly — slicing + adds fuse into
neighbouring ops under XLA so there is no reason for a custom kernel here).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_SQRT2 = np.sqrt(2.0)


def haar_dwt2(x: np.ndarray) -> Tuple[np.ndarray, Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """pywt.wavedec2(x, 'db1', level=1, axes=(-2, -1)) equivalent.

    x: (..., H, W) with even H, W. Returns (ll, (h, v, d)) each
    (..., H/2, W/2), float64 like pywt.
    """
    x = np.asarray(x, dtype=np.float64)
    assert x.shape[-1] % 2 == 0 and x.shape[-2] % 2 == 0, \
        "Haar level-1 requires even H, W"
    lo_h = (x[..., 0::2, :] + x[..., 1::2, :]) / _SQRT2
    hi_h = (x[..., 0::2, :] - x[..., 1::2, :]) / _SQRT2
    ll = (lo_h[..., :, 0::2] + lo_h[..., :, 1::2]) / _SQRT2
    lh = (lo_h[..., :, 0::2] - lo_h[..., :, 1::2]) / _SQRT2  # 'ad' -> cV
    hl = (hi_h[..., :, 0::2] + hi_h[..., :, 1::2]) / _SQRT2  # 'da' -> cH
    hh = (hi_h[..., :, 0::2] - hi_h[..., :, 1::2]) / _SQRT2  # 'dd' -> cD
    return ll, (hl, lh, hh)


def haar_idwt2(ll, coeffs) -> np.ndarray:
    """Inverse of `haar_dwt2` (pywt.waverec2 equivalent)."""
    hl, lh, hh = coeffs
    lo_h = np.empty(ll.shape[:-1] + (ll.shape[-1] * 2,), dtype=np.float64)
    hi_h = np.empty_like(lo_h)
    lo_h[..., 0::2] = (ll + lh) / _SQRT2
    lo_h[..., 1::2] = (ll - lh) / _SQRT2
    hi_h[..., 0::2] = (hl + hh) / _SQRT2
    hi_h[..., 1::2] = (hl - hh) / _SQRT2
    out = np.empty(lo_h.shape[:-2] + (lo_h.shape[-2] * 2, lo_h.shape[-1]),
                   dtype=np.float64)
    out[..., 0::2, :] = (lo_h + hi_h) / _SQRT2
    out[..., 1::2, :] = (lo_h - hi_h) / _SQRT2
    return out


def haar_dwt2_nhwc(x: jnp.ndarray):
    """Device-side NHWC version: (B, H, W, C) -> (ll, (h, v, d)) each
    (B, H/2, W/2, C)."""
    lo_h = (x[:, 0::2] + x[:, 1::2]) / _SQRT2
    hi_h = (x[:, 0::2] - x[:, 1::2]) / _SQRT2
    ll = (lo_h[:, :, 0::2] + lo_h[:, :, 1::2]) / _SQRT2
    lh = (lo_h[:, :, 0::2] - lo_h[:, :, 1::2]) / _SQRT2
    hl = (hi_h[:, :, 0::2] + hi_h[:, :, 1::2]) / _SQRT2
    hh = (hi_h[:, :, 0::2] - hi_h[:, :, 1::2]) / _SQRT2
    return ll, (hl, lh, hh)


def wavelet_flip_signs(image_n_channel: int, pan_channel: int,
                       order: str = "pan") -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel sign corrections for spatially flipping a packed
    `wavelet_cond_pack` tensor.

    Flipping an image along W negates its cV ('ad') and cD ('dd') Haar
    coefficients (the W-axis difference changes sign; for even W the
    Haar pairs map onto each other reversed, see `haar_dwt2`); flipping
    along H negates cH ('da') and cD. The reference's flip augmentation
    (`/root/reference/dataset/pan_dataset.py:191-203`) flips every tensor
    as stored WITHOUT these sign fixes — i.e. its augmented wavelet cond
    is not the DWT of the augmented image. These vectors make the flip
    exact: multiply the flipped packed tensor by `sign_h` for W-flips and
    `sign_v` for H-flips (channel-last).

    Returns (sign_h, sign_v), each shape (C + 3*P,) float32.
    """
    c, p = image_n_channel, pan_channel
    ll = np.ones(c)
    if order == "pan":        # [lms_LL, pan_H, pan_D, pan_V]
        h_sign_w, d_sign_w, v_sign_w = 1.0, -1.0, -1.0
        sign_h = np.concatenate([ll, np.full(p, h_sign_w),
                                 np.full(p, d_sign_w), np.full(p, v_sign_w)])
        sign_v = np.concatenate([ll, np.full(p, -1.0),
                                 np.full(p, -1.0), np.full(p, 1.0)])
    elif order == "hisr":     # [hsi_LL, rgb_H, rgb_V, rgb_D]
        sign_h = np.concatenate([ll, np.full(p, 1.0),
                                 np.full(p, -1.0), np.full(p, -1.0)])
        sign_v = np.concatenate([ll, np.full(p, -1.0),
                                 np.full(p, 1.0), np.full(p, -1.0)])
    else:
        raise ValueError(order)
    return sign_h.astype(np.float32), sign_v.astype(np.float32)


def wavelet_cond_pack(lms_ll: np.ndarray, pan_coeffs, order: str = "pan"
                      ) -> np.ndarray:
    """Stack wavelet features on the channel axis in the reference's order.

    order='pan'  -> [lms_LL, pan_H, pan_D, pan_V] (`pan_dataset.py:140-142`)
    order='hisr' -> [hsi_LL, rgb_H, rgb_V, rgb_D] (`hisr.py:57-59`)
    Inputs are channel-first (N, C, h, w) like the host pipeline.
    """
    h, v, d = pan_coeffs
    if order == "pan":
        parts = [lms_ll, h, d, v]
    elif order == "hisr":
        parts = [lms_ll, h, v, d]
    else:
        raise ValueError(order)
    return np.concatenate(parts, axis=1)
