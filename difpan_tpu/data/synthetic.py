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


# ---------------------------------------------------------------------------
# Wald-protocol generator (round 4): structured scenes + MTF degradation.
#
# The plain `make_synthetic_pan_h5` scenes are iterated-roll smoothed noise —
# spatially band-limited enough that validation metrics saturate once a model
# fits the low frequencies (round-3 run: SSIM +0.4% over the last 25k iters).
# This generator builds scenes the way the reference's real h5 inputs are
# built from sensor imagery under the Wald protocol
# (`/root/reference/dataset/pan_dataset.py:163-176` assumes gt/ms/lms/pan with
# ms = MTF-degraded + decimated gt, lms = interpolated ms, pan at HR):
#   * HR scene  = linear spectral mixing of K material endmembers whose
#     abundance maps have sharp region boundaries (softmax over smooth
#     fields), per-material texture, geometric overlays (rectangles/lines),
#     and a smooth illumination field -> real edges + textures + mixed pixels.
#   * ms   = per-band MTF-matched Gaussian blur (Nyquist gain ~0.3 like WV3)
#            then r-fold decimation.
#   * lms  = bicubic upsample of ms back to the HR grid (stand-in for the
#            23-tap polynomial interp used on the real data).
#   * pan  = fixed spectral-response weighted sum of HR bands (visible-band
#            weighted), at HR.
#   * small additive sensor noise on ms/pan (~42 dB SNR) so exact inversion
#     is impossible and metrics keep discriminating late in training.
# ---------------------------------------------------------------------------


def _mtf_gaussian_blur(x: np.ndarray, ratio: int, gnyq: np.ndarray
                       ) -> np.ndarray:
    """Per-band separable Gaussian whose frequency response at the decimated
    grid's Nyquist (f = 1/(2*ratio) on the HR grid) equals the band's MTF
    Nyquist gain: exp(-2 pi^2 s^2 f^2) = G  =>  s = (r/pi)*sqrt(2*ln(1/G)).
    x: (n, C, H, W); gnyq: (C,)."""
    n, c, h, w = x.shape
    out = np.empty_like(x)
    for ci in range(c):
        s = (ratio / np.pi) * np.sqrt(2.0 * np.log(1.0 / gnyq[ci]))
        half = max(1, int(np.ceil(4 * s)))
        t = np.arange(-half, half + 1)
        k = np.exp(-0.5 * (t / s) ** 2)
        k /= k.sum()
        xi = x[:, ci]
        # reflect-pad + separable convolution along H then W
        xp = np.pad(xi, ((0, 0), (half, half), (0, 0)), mode="reflect")
        xi = np.einsum("nkhw,k->nhw", np.stack(
            [xp[:, i:i + h] for i in range(2 * half + 1)], axis=1), k)
        xp = np.pad(xi, ((0, 0), (0, 0), (half, half)), mode="reflect")
        out[:, ci] = np.einsum("nkhw,k->nhw", np.stack(
            [xp[:, :, i:i + w] for i in range(2 * half + 1)], axis=1), k)
    return out


def _bicubic_up(x: np.ndarray, r: int) -> np.ndarray:
    """Grid-aligned bicubic upsample, (n, C, h, w) -> (n, C, h*r, w*r)."""
    from scipy import ndimage
    n, c, h, w = x.shape
    out = np.empty((n, c, h * r, w * r), dtype=x.dtype)
    for i in range(n):
        for ci in range(c):
            out[i, ci] = ndimage.zoom(x[i, ci], r, order=3, mode="reflect",
                                      grid_mode=True)
    return out


def _structured_scenes(rng, n: int, c: int, size: int, n_mat: int = 6
                       ) -> np.ndarray:
    """(n, c, size, size) HR cubes in [0, 1]: spectral mixing of n_mat
    materials with sharp abundance boundaries, texture, rectangles/lines,
    and smooth illumination."""
    h = w = size
    # material endmember spectra: smooth random curves in [0.1, 1]
    steps = rng.normal(0, 0.25, (n, n_mat, c)).cumsum(axis=-1)
    spectra = 0.1 + 0.9 * (steps - steps.min(-1, keepdims=True)) / (
        np.ptp(steps, -1).clip(1e-6)[..., None])
    # abundance maps: softmax over smooth fields at two spatial scales ->
    # piecewise regions with sharp boundaries and thin mixed-pixel seams
    fields = (_smooth_noise(rng, (n, n_mat, h, w), smooth=10) * 2.0 +
              _smooth_noise(rng, (n, n_mat, h, w), smooth=3))
    beta = rng.uniform(8.0, 16.0, (n, 1, 1, 1))
    e = np.exp(beta * (fields - fields.max(1, keepdims=True)))
    abund = e / e.sum(1, keepdims=True)
    # per-material multiplicative texture (bandpass noise, varied scale)
    fine = _smooth_noise(rng, (n, n_mat, h, w), smooth=1)
    coarse = _smooth_noise(rng, (n, n_mat, h, w), smooth=4)
    tex = 1.0 + 0.35 * (fine - coarse)
    gt = np.einsum("nkhw,nkc->nchw", abund * tex, spectra)
    # geometric overlays: axis-aligned rectangles + 1-2 px lines with their
    # own spectra (roads/buildings -> strong straight edges)
    for i in range(n):
        for _ in range(rng.integers(2, 6)):
            y0, x0 = rng.integers(0, h - 4), rng.integers(0, w - 4)
            ph = int(rng.integers(3, max(4, h // 3)))
            pw = int(rng.integers(3, max(4, w // 3)))
            spec = rng.uniform(0.1, 1.0, c)
            a = rng.uniform(0.6, 1.0)
            region = gt[i, :, y0:y0 + ph, x0:x0 + pw]
            region *= (1 - a)
            region += a * spec[:, None, None]
        for _ in range(rng.integers(1, 4)):
            spec = rng.uniform(0.1, 1.0, c)
            t = int(rng.integers(1, 3))
            if rng.random() < 0.5:
                y0 = int(rng.integers(0, h - t))
                gt[i, :, y0:y0 + t, :] = spec[:, None, None]
            else:
                x0 = int(rng.integers(0, w - t))
                gt[i, :, :, x0:x0 + t] = spec[:, None, None]
    # smooth illumination field
    illum = 0.85 + 0.3 * _smooth_noise(rng, (n, 1, h, w), smooth=12)
    gt = np.clip(gt * illum, 0.0, 1.0)
    return gt.astype(np.float64)


def make_wald_pan_h5(n: int = 8, channels: int = 8, size: int = 64,
                     ratio: int = 4, division: float = 2047.0,
                     seed: int = 0, full_res: bool = False,
                     noise_snr_db: float = 42.0,
                     sensor_seed: int | None = None) -> Dict[str, np.ndarray]:
    """Structured Wald-protocol pansharpening fixture: {gt, ms, lms, pan}
    (full_res drops gt), NCHW, range [0, division]. See module comment.

    `sensor_seed` pins the sensor response (per-band MTF Nyquist gains and
    the pan spectral weights) independently of the scene content seed.
    The reference's real datasets come from ONE satellite — every train and
    test patch shares a single MTF + spectral response
    (`/root/reference/dataset/pan_dataset.py:30-176` loads one sensor's h5)
    — so an epochless stream must randomize scenes while holding the
    sensor fixed. Leaving it None keeps the legacy behavior (sensor drawn
    from `seed`), which across differently-seeded chunks makes the
    pan->MS spectral mapping ambiguous and demonstrably degrades SAM."""
    rng = np.random.default_rng(seed)
    gt = _structured_scenes(rng, n, channels, size)
    # WV3-like per-band MTF Nyquist gains (~0.27-0.35), fixed per dataset
    gnyq_rng = np.random.default_rng(
        (seed if sensor_seed is None else sensor_seed) + 7919)
    gnyq = gnyq_rng.uniform(0.27, 0.35, channels)
    ms = _mtf_gaussian_blur(gt, ratio, gnyq)[:, :, ::ratio, ::ratio]
    lms = _bicubic_up(ms, ratio)
    # pan spectral response: visible-band-weighted sum over HR bands
    wts = gnyq_rng.uniform(0.5, 1.0, channels)
    wts[: max(1, channels // 2)] += 1.0   # bias toward the visible half
    wts /= wts.sum()
    pan = np.einsum("nchw,c->nhw", gt, wts)[:, None]
    # additive sensor noise on the measured products (not on gt)
    sig = 10.0 ** (-noise_snr_db / 20.0)
    ms = ms + rng.normal(0, sig * ms.std(), ms.shape)
    pan = pan + rng.normal(0, sig * pan.std(), pan.shape)
    scale = division
    d = {"ms": np.clip(ms, 0, 1) * scale, "lms": np.clip(lms, 0, 1) * scale,
         "pan": np.clip(pan, 0, 1) * scale}
    if not full_res:
        d["gt"] = gt * scale
    return {k: v.astype(np.float32) for k, v in d.items()}


def make_wald_hisr_h5(n: int = 4, bands: int = 31, size: int = 64,
                      ratio: int = 4, seed: int = 0,
                      noise_snr_db: float = 42.0,
                      sensor_seed: int | None = None) -> Dict[str, np.ndarray]:
    """Structured Wald-protocol hyperspectral fixture: {GT, LRHSI, RGB,
    HSI_up} in [0, 1], NCHW (CAVE/Harvard layout). `sensor_seed` pins the
    MTF gains independently of scene content (see make_wald_pan_h5); the
    RGB camera response is already deterministic."""
    rng = np.random.default_rng(seed)
    gt = _structured_scenes(rng, n, bands, size, n_mat=8)
    gnyq = np.random.default_rng(
        (seed if sensor_seed is None else sensor_seed) + 7919
    ).uniform(0.28, 0.34, bands)
    lr = _mtf_gaussian_blur(gt, ratio, gnyq)[:, :, ::ratio, ::ratio]
    hsi_up = _bicubic_up(lr, ratio)
    # RGB camera response: three Gaussian bumps over the band axis
    b = np.arange(bands)
    centers = [bands * 0.80, bands * 0.50, bands * 0.18]   # R, G, B
    resp = np.stack([np.exp(-0.5 * ((b - mu) / (bands * 0.12)) ** 2)
                     for mu in centers])
    resp /= resp.sum(1, keepdims=True)
    rgb = np.einsum("nchw,rc->nrhw", gt, resp)
    sig = 10.0 ** (-noise_snr_db / 20.0)
    lr = lr + rng.normal(0, sig * lr.std(), lr.shape)
    rgb = rgb + rng.normal(0, sig * rgb.std(), rgb.shape)
    return {"GT": gt.astype(np.float32),
            "LRHSI": np.clip(lr, 0, 1).astype(np.float32),
            "RGB": np.clip(rgb, 0, 1).astype(np.float32),
            "HSI_up": np.clip(hsi_up, 0, 1).astype(np.float32)}


def make_wald_pan_h5_chunked(n: int, channels: int = 8, size: int = 64,
                             ratio: int = 4, division: float = 2047.0,
                             seed: int = 0, chunk: int = 1024,
                             verbose: bool = False,
                             sensor_seed: int | None = None
                             ) -> Dict[str, np.ndarray]:
    """Chunked `make_wald_pan_h5` for big n on small hosts: generates in
    `chunk`-sample pieces (seed*1000+i each — deterministic for a given
    (n, chunk, seed)) and concatenates. Bounds peak memory to O(chunk)
    f64 intermediates instead of O(n) (~10 GB at n=8192 single-shot).
    `sensor_seed` holds ONE sensor response across every chunk (without it
    each 1024-piece draws its own — a different satellite per chunk)."""
    parts = []
    done = 0
    i = 0
    while done < n:
        m = min(chunk, n - done)
        parts.append(make_wald_pan_h5(n=m, channels=channels, size=size,
                                      ratio=ratio, division=division,
                                      seed=seed * 1000 + i,
                                      sensor_seed=sensor_seed))
        done += m
        i += 1
        if verbose:
            print(f"[wald gen] {done}/{n}", flush=True)
    return {k: np.concatenate([p[k] for p in parts], axis=0)
            for k in parts[0]}


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
