"""Q2n (hypercomplex universal image quality index) — behavioral port of the
reference's legacy implementation (`/root/reference/utils/_metric_legacy.py:
15-259`, itself from PanCollection).

The reference version is dead code (the `choices=5` metric path skips it,
`utils/metric.py:27-29`), and it carries quirks preserved here for parity,
validated by hardcoded goldens in tests:

  * inputs are truncated to uint16 before scoring;
  * images are padded to the block grid by replicating the last row/column;
  * the hypercomplex conjugation/normalization sign conventions produce
    values that can exceed 1 even for identical images;
  * per-block statistics are computed over the whole batch at once (the
    reference effectively assumes batch size 1 — call it per image).

One fix over the reference: non-power-of-2 band counts are channel-padded
correctly (the reference's `np.concatenate(gt, dif, axis=-1)` call would
crash; e.g. 31-band CAVE).
"""

from __future__ import annotations

import math

import numpy as np


def _conj(v: np.ndarray) -> np.ndarray:
    return np.concatenate([v[..., :1], -v[..., 1:]], axis=-1)


def _onion_mult(o1: np.ndarray, o2: np.ndarray) -> np.ndarray:
    """Cayley-Dickson-style product of 2^k-dim hypercomplex vectors over the
    last axis, with the reference's exact conjugation placement
    (`_metric_legacy.py:199-259`, onion_mult/onion_mult2D share it)."""
    n = o1.shape[-1]
    if n == 1:
        return o1 * o2
    half = n // 2
    a = o1[..., :half]
    b = _conj(o1[..., half:])
    c = o2[..., :half]
    d = _conj(o2[..., half:])
    if n == 2:
        return np.concatenate([a * c - d * b, a * d + c * b], axis=-1)
    r1 = _onion_mult(a, c)
    r2 = _onion_mult(d, _conj(b))
    r3 = _onion_mult(_conj(a), d)
    r4 = _onion_mult(c, b)
    return np.concatenate([r1 - r2, r3 + r4], axis=-1)


def _block_quality(dat1: np.ndarray, dat2: np.ndarray,
                   legacy_qv: bool = True) -> np.ndarray:
    """Quality vector of one (N, bs, bs, C) block pair
    (`_metric_legacy.py:107-196` semantics)."""
    dat1 = dat1.astype(np.float64)
    dat2 = dat2.astype(np.float64)
    # conjugate the fused block (reference `:113`)
    dat2 = np.concatenate([dat2[..., :1], -dat2[..., 1:]], axis=-1)
    n, bs, bs2, c = dat1.shape
    npx = bs * bs2
    ratio = npx / (npx - 1)

    # per-band block normalization with the reference's sign conventions
    # (`:143-155`: branch on mean==0; bands 1+ normalize the un-conjugated
    # value then re-negate)
    for i in range(c):
        band = dat1[..., i]
        s, t = float(band.mean()), float(band.std())
        if t == 0:
            t = 1e-8
        dat1[..., i] = (band - s) / t + 1
        if s == 0:
            if i == 0:
                dat2[..., i] = dat2[..., i] - s + 1
            else:
                dat2[..., i] = -(-dat2[..., i] - s + 1)
        else:
            if i == 0:
                dat2[..., i] = (dat2[..., i] - s) / t + 1
            else:
                dat2[..., i] = -(((-dat2[..., i] - s) / t) + 1)
    m1 = dat1.mean(axis=(0, 1, 2))  # reference means over the whole batch
    m2 = dat2.mean(axis=(0, 1, 2))
    mod_q1m = math.sqrt(float(np.sum(m1 ** 2)))
    mod_q2m = math.sqrt(float(np.sum(m2 ** 2)))
    mod_q1_sq = np.sum(dat1 ** 2, axis=-1)
    mod_q2_sq = np.sum(dat2 ** 2, axis=-1)

    termine2 = mod_q1m * mod_q2m
    termine4 = mod_q1m ** 2 + mod_q2m ** 2
    int1 = ratio * mod_q1_sq.mean()
    int2 = ratio * mod_q2_sq.mean()
    termine3 = int1 + int2 - ratio * (mod_q1m ** 2 + mod_q2m ** 2)
    mean_bias = 2 * termine2 / termine4
    if termine3 == 0:
        q = np.zeros((n, c))
        q[:, -1] = mean_bias
        return q
    cbm = 2.0 / termine3
    qu = _onion_mult(dat1, dat2)
    qm = _onion_mult(m1, m2)
    if legacy_qv:
        # reference quirk (`:187-189`): qv[..., i] averages qu[:, :, i] —
        # a W-axis slice, NOT the channel axis. Reproduced verbatim.
        qv = np.array([ratio * qu[:, :, i].mean() for i in range(c)])
    else:
        qv = ratio * qu.mean(axis=(0, 1, 2))
    q = qv - ratio * qm
    return (q * mean_bias * cbm)[None].repeat(n, axis=0)


def q2n(gt: np.ndarray, x: np.ndarray, q_blocks_size: int = 32,
        q_shift: int = 32, *, legacy_qv: bool = True) -> np.ndarray:
    """Q2n index map over shifted blocks. gt/x: (N, H, W, C) in sensor
    range; returns (N, stepx, stepy) of per-block |q|. Mean it for the
    scalar index."""
    gt = np.asarray(gt)
    x = np.asarray(x)
    n, h, w, c = gt.shape
    stepx = max(math.ceil(h / q_shift), 1)
    stepy = max(math.ceil(w / q_shift), 1)
    pad_h = (stepx - 1) * q_shift + q_blocks_size - h
    pad_w = (stepy - 1) * q_shift + q_blocks_size - w

    def pad(img):
        out = np.zeros((n, h + pad_h, w + pad_w, c), dtype=np.float64)
        out[:, :h, :w] = img
        if pad_w > 0:
            out[:, :h, w:] = img[:, :, w - 1:w]  # replicate last column
        if pad_h > 0:
            out[:, h:, :] = out[:, h - 1:h, :]   # replicate last row
        return out

    gt = pad(gt).astype(np.uint16)
    x = pad(x).astype(np.uint16)

    # channel-pad to the next power of two (fixed vs the reference)
    if 2 ** math.ceil(math.log2(c)) != c:
        extra = 2 ** math.ceil(math.log2(c)) - c
        z = np.zeros(gt.shape[:-1] + (extra,), dtype=np.uint16)
        gt = np.concatenate([gt, z], axis=-1)
        x = np.concatenate([x, z], axis=-1)

    valori = np.zeros((n, stepx, stepy, gt.shape[-1]))
    for j in range(stepx):
        for i in range(stepy):
            blk_gt = gt[:, j * q_shift: j * q_shift + q_blocks_size,
                        i * q_shift: i * q_shift + q_blocks_size]
            blk_x = x[:, j * q_shift: j * q_shift + q_blocks_size,
                      i * q_shift: i * q_shift + q_blocks_size]
            valori[:, j, i, :] = _block_quality(blk_gt, blk_x,
                                                legacy_qv=legacy_qv)
    return np.sqrt(np.sum(valori ** 2, axis=-1))
