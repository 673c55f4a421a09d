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
        """Batch gather. The reference ships erase/affine augs but the
        engine always uses aug_prob=0 (`diffusion_engine.py:155`); we
        implement shared-seed flips for the nonzero-prob capability."""
        parts = [np.take(a, idx, axis=0) for a in self._arrays()]
        if self.aug_prob > 0 and rng is not None:
            flips_h = rng.random(len(idx)) < self.aug_prob
            flips_v = rng.random(len(idx)) < self.aug_prob
            for a in parts:
                a[flips_h] = a[flips_h, :, ::-1]
                a[flips_v] = a[flips_v, ::-1, :]
        return tuple(parts)

    def __repr__(self):
        return f"HISRDataSets(num={self.size}, wavelets={self.wavelets})"
