"""MHIF (multispectral+hyperspectral image fusion) dataset — CAVE/Harvard.

Mirrors `/root/reference/dataset/hisr.py:23-168`: h5 keys GT/LRHSI/RGB/HSI_up
(NCHW), one-time Haar DWT of hsi_up + rgb packed as
[hsi_LL, rgb_H, rgb_V, rgb_D] (`:57-59` — note H,V,D order, different from
PanDataset's H,D,V). RGB plays the "pan" role. Stored NHWC float32.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import numpy as np

from ..ops.wavelet import haar_dwt2, wavelet_cond_pack
from .pan_dataset import _nchw_to_nhwc


def _erase_affine(img: np.ndarray, p: float,
                  rng: np.random.Generator) -> np.ndarray:
    """RandomErasing + RandomAffine on one (H, W, C) image, numpy/cv2.
    Parameter ranges match the reference transform (`hisr.py:80-90`)."""
    import cv2
    h, w, c = img.shape
    out = img.copy()
    # RandomErasing(p=aug_prob inside the pair)
    if rng.random() < p:
        area = h * w
        for _ in range(10):
            target = rng.uniform(0.02, 0.15) * area
            ratio = rng.uniform(0.2, 1.0)
            eh = int(round(np.sqrt(target * ratio)))
            ew = int(round(np.sqrt(target / ratio)))
            if eh < h and ew < w:
                y = rng.integers(0, h - eh + 1)
                x = rng.integers(0, w - ew + 1)
                out[y:y + eh, x:x + ew] = 0.0
                break
    # RandomAffine(degrees (0,70), translate (0.1,0.2), scale (0.95,1.2))
    angle = rng.uniform(0.0, 70.0)
    tx = rng.uniform(-0.1, 0.1) * w
    ty = rng.uniform(-0.2, 0.2) * h
    scale = rng.uniform(0.95, 1.2)
    m = cv2.getRotationMatrix2D((w / 2, h / 2), angle, scale)
    m[:, 2] += (tx, ty)
    # cv2 handles <=4 channels per call; warp channel chunks for HSI cubes
    chunks = []
    for i in range(0, c, 4):
        warped = cv2.warpAffine(np.ascontiguousarray(out[..., i:i + 4]), m,
                                (w, h), flags=cv2.INTER_LINEAR)
        if warped.ndim == 2:
            warped = warped[..., None]
        chunks.append(warped)
    return np.concatenate(chunks, axis=-1)


class HISRDataSets:
    def __init__(
        self,
        d: Union[Dict[str, np.ndarray], "h5py.File"],  # noqa: F821
        normalize: bool = False,
        aug_prob: float = 0.0,
        wavelets: bool = False,
    ):
        assert not normalize, "@normalize should be False"
        self.aug_prob = aug_prob
        self.wavelets = wavelets

        def arr(key):
            return np.asarray(d[key], dtype=np.float32)

        self.gt = _nchw_to_nhwc(arr("GT"))
        self.lr_hsi = _nchw_to_nhwc(arr("LRHSI"))
        self.rgb = _nchw_to_nhwc(arr("RGB"))
        self.hsi_up = _nchw_to_nhwc(arr("HSI_up"))

        if wavelets:
            hsi_main, _ = haar_dwt2(arr("HSI_up"))
            _, rgb_coeffs = haar_dwt2(arr("RGB"))
            packed = wavelet_cond_pack(hsi_main, rgb_coeffs, order="hisr")
            self.wavelet_dcp = _nchw_to_nhwc(packed.astype(np.float32))

        self.size = self.gt.shape[0]

    def __len__(self) -> int:
        return self.size

    def __getitem__(self, index):
        """(rgb, hsi_up, gt[, wavelets]) — `hisr.py:139-165`; rgb is the
        "pan", hsi_up the "lms"."""
        if self.wavelets:
            return (self.rgb[index], self.hsi_up[index], self.gt[index],
                    self.wavelet_dcp[index])
        return (self.rgb[index], self.hsi_up[index], self.gt[index])

    def _arrays(self):
        if self.wavelets:
            return (self.rgb, self.hsi_up, self.gt, self.wavelet_dcp)
        return (self.rgb, self.hsi_up, self.gt)

    def batch(self, idx: np.ndarray,
              rng: Optional[np.random.Generator] = None):
        """Batch gather with the reference's erase/affine augmentation pair
        (`hisr.py:74-100`: RandomApply([RandomErasing(scale=(.02,.15),
        ratio=(.2,1)), RandomAffine(degrees=(0,70), translate=(.1,.2),
        scale=(.95,1.2), bilinear)], p=aug_prob)), applied with a shared
        per-sample seed to every tensor (`:129-137`). The engine always uses
        aug_prob=0 (`diffusion_engine.py:155`)."""
        parts = [np.take(a, idx, axis=0) for a in self._arrays()]
        if self.aug_prob > 0 and rng is not None:
            for si in range(len(idx)):
                if rng.random() >= self.aug_prob:
                    continue
                seed = int(rng.integers(0, 2 ** 31 - 1))
                for a in parts:
                    a[si] = _erase_affine(a[si], self.aug_prob,
                                          np.random.default_rng(seed))
        return tuple(parts)

    def __repr__(self):
        return f"HISRDataSets(num={self.size}, wavelets={self.wavelets})"
