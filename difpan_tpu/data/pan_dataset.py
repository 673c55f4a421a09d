"""PAN/MS pansharpening dataset (WV3/GF2/QB h5 layout).

Host-side pipeline mirroring `/root/reference/dataset/pan_dataset.py:30-232`:
one-time load of the whole h5 into numpy, one-time Haar DWT (our numpy
`ops.wavelet` replaces pywt), sensor-division normalization, optional
box-filter high-pass and flip augmentation. Arrays are stored NHWC float32,
ready for direct `jax.device_put`.

h5 keys: gt/ms/lms/pan (reduced-res) or ms/lms/pan (full-res); all NCHW.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple, Union

import numpy as np

from ..ops.wavelet import haar_dwt2, wavelet_cond_pack


def _nchw_to_nhwc(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(x, (0, 2, 3, 1)))


def random_erase_channel(x: np.ndarray, n_channel: int,
                         rng: np.random.Generator) -> np.ndarray:
    """Zero a random subset of channels (p=0.5 each) — capability parity
    with `pan_dataset.py:18-27` (the reference defines this aug but ships it
    disabled, `:199-202`). x is (H, W, C) NHWC."""
    if x.shape[-1] != n_channel:
        return x
    mask = rng.random(n_channel) < 0.5
    x = x.copy()
    x[..., mask] = 0.0
    return x


class PanDataset:
    def __init__(
        self,
        d: Union[Dict[str, np.ndarray], "h5py.File"],  # noqa: F821
        aug_prob: float = 0.0,
        hp: bool = False,
        hp_ksize: Tuple[int, int] = (5, 5),
        norm_range: bool = True,
        full_res: bool = False,
        division: float = 2047.0,
        wavelets: bool = False,
        *,
        constrain_channel: bool = False,
    ):
        self.wavelets = wavelets
        self.full_res = full_res
        self.aug_prob = aug_prob
        # debug-only channel constraint (`pan_dataset.py:61-68`)
        self.slice_channel = [1, 2, 5] if constrain_channel else slice(None)

        def arr(key):
            return np.asarray(d[key], dtype=np.float64)

        if not full_res:
            self.gt = arr("gt")[:, self.slice_channel]
        self.ms = arr("ms")[:, self.slice_channel]
        self.lms = arr("lms")[:, self.slice_channel]
        self.pan = arr("pan")

        if wavelets:
            lms_main, _ = haar_dwt2(self.lms)
            _, pan_coeffs = haar_dwt2(self.pan)
        else:
            lms_main = pan_coeffs = None

        self.size = self.ms.shape[0]

        self.hp = hp
        self.hp_ksize = hp_ksize
        if hp and hp_ksize is not None:
            self._group_high_pass(hp_ksize)

        def norm_func(x):
            # `pan_dataset.py:127-134`: division-normalize to ~[0,1], or
            # min/max to [-1,1]
            if not norm_range:
                x = x / division
            else:
                x = x - x.min()
                x = x / x.max()
                x = 2 * x - 1
            return x.astype(np.float32)

        self.pan = _nchw_to_nhwc(norm_func(self.pan))
        self.ms = _nchw_to_nhwc(norm_func(self.ms))
        self.lms = _nchw_to_nhwc(norm_func(self.lms))
        if wavelets:
            # channel order [lms_LL, pan_H, pan_D, pan_V]
            # (`pan_dataset.py:140-142`)
            packed = wavelet_cond_pack(lms_main, pan_coeffs, order="pan")
            self.wavelets_dcp = _nchw_to_nhwc(norm_func(packed))
        if not full_res:
            self.gt = _nchw_to_nhwc(norm_func(self.gt))

    # -- optional high-pass (`pan_dataset.py:178-189`) --------------------
    @staticmethod
    def _get_high_pass(data: np.ndarray, k_size) -> np.ndarray:
        import cv2
        out = data.copy()
        for i, img in enumerate(data):
            hp = cv2.boxFilter(img.transpose(1, 2, 0), -1, k_size)
            if hp.ndim == 2:
                hp = hp[..., np.newaxis]
            out[i] = img - hp.transpose(2, 0, 1)
        return out

    def _group_high_pass(self, k_size):
        self.ms = self._get_high_pass(self.ms, k_size)
        self.pan = self._get_high_pass(self.pan, k_size)

    # -- access -----------------------------------------------------------
    def __len__(self) -> int:
        return self.size

    def __getitem__(self, item):
        """Returns (pan, lms[, gt][, wavelets]) — same tuple shapes as the
        reference (`pan_dataset.py:205-221`), NHWC."""
        if not self.full_res:
            if not self.wavelets:
                data = (self.pan[item], self.lms[item], self.gt[item])
            else:
                data = (self.pan[item], self.lms[item], self.gt[item],
                        self.wavelets_dcp[item])
        else:
            if not self.wavelets:
                data = (self.pan[item], self.lms[item])
            else:
                data = (self.pan[item], self.lms[item],
                        self.wavelets_dcp[item])
        return data

    def batch(self, idx: np.ndarray, rng: Optional[np.random.Generator] = None):
        """Gather a batch by index array, with optional shared-seed flip
        augmentation (`pan_dataset.py:191-203` — same flip applied to every
        tensor of the sample)."""
        parts = [np.take(a, idx, axis=0) for a in self._arrays()]
        if self.aug_prob > 0 and rng is not None:
            flips_h = rng.random(len(idx)) < self.aug_prob
            flips_v = rng.random(len(idx)) < self.aug_prob
            for a in parts:
                a[flips_h] = a[flips_h, :, ::-1]
                a[flips_v] = a[flips_v, ::-1, :]
        return tuple(parts)

    def _arrays(self):
        if not self.full_res:
            if self.wavelets:
                return (self.pan, self.lms, self.gt, self.wavelets_dcp)
            return (self.pan, self.lms, self.gt)
        if self.wavelets:
            return (self.pan, self.lms, self.wavelets_dcp)
        return (self.pan, self.lms)

    def __repr__(self):
        return (f"PanDataset(num={self.size}, full_res={self.full_res}, "
                f"wavelets={self.wavelets}, hp={self.hp})")
