"""Data pipeline tests: dataset loaders on synthetic h5-layout fixtures,
batch iteration, prefetch, cond packing."""
import jax
import jax.numpy as jnp
import numpy as np

from difpan_tpu.data import (
    HISRDataSets, PanDataset, batch_iterator, device_prefetch,
    get_dataset_spec, make_synthetic_hisr_h5, make_synthetic_pan_h5,
    pack_cond,
)


def test_registry():
    wv3 = get_dataset_spec("wv3")
    assert wv3.n_channels == 8 and wv3.division == 2047.0
    assert get_dataset_spec("gf2").division == 1023.0
    assert get_dataset_spec("cave").pan_channels == 3
    import pytest
    with pytest.raises(NotImplementedError):
        get_dataset_spec("nope")


def test_pan_dataset_reduced():
    d = make_synthetic_pan_h5(n=6, channels=4, size=64, division=1023.0)
    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True)
    assert len(ds) == 6
    pan, lms, gt, wav = ds[0]
    assert pan.shape == (64, 64, 1)
    assert lms.shape == (64, 64, 4)
    assert gt.shape == (64, 64, 4)
    assert wav.shape == (32, 32, 4 + 3)  # lms_LL(4) + pan H,D,V(3)
    assert 0 <= gt.min() and gt.max() <= 1.0 + 1e-6
    # wavelet LL of [0,1]-ranged data is ~2x range (1/sqrt2 twice per axis)
    assert wav[..., :4].max() <= 2.1


def test_pan_dataset_full_res():
    d = make_synthetic_pan_h5(n=4, channels=4, size=64, full_res=True)
    ds = PanDataset(d, norm_range=False, division=1023.0, full_res=True,
                    wavelets=True)
    pan, lms, wav = ds[0]
    assert not hasattr(ds, "gt")
    assert pan.shape == (64, 64, 1) and lms.shape == (64, 64, 4)


def test_pan_dataset_highpass():
    d = make_synthetic_pan_h5(n=2, channels=4, size=32)
    ds = PanDataset(d, norm_range=False, division=1023.0, hp=True,
                    wavelets=False)
    # high-pass removes local mean -> near-zero average
    assert abs(ds.pan.mean()) < 0.05


def test_hisr_dataset():
    d = make_synthetic_hisr_h5(n=3, bands=31, size=64)
    ds = HISRDataSets(d, wavelets=True)
    rgb, hsi_up, gt, wav = ds[1]
    assert rgb.shape == (64, 64, 3)
    assert hsi_up.shape == (64, 64, 31)
    assert gt.shape == (64, 64, 31)
    assert wav.shape == (32, 32, 31 + 9)  # hsi_LL(31) + rgb H,V,D(9)


def test_batch_iterator_shapes_and_epochs():
    d = make_synthetic_pan_h5(n=10, channels=4, size=32)
    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True)
    batches = list(batch_iterator(ds, 4, epochs=1, drop_remainder=True))
    assert len(batches) == 2
    pan, lms, gt, wav = batches[0]
    assert pan.shape == (4, 32, 32, 1) and wav.shape == (4, 16, 16, 7)
    # without drop_remainder: 3 batches (4+4+2)
    batches = list(batch_iterator(ds, 4, epochs=1))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]


def test_batch_iterator_augmentation():
    d = make_synthetic_pan_h5(n=8, channels=4, size=32)
    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True,
                    aug_prob=1.0)
    (pan, lms, gt, wav), = list(batch_iterator(ds, 8, epochs=1,
                                               shuffle=False))
    # aug_prob=1 -> both flips applied to every sample, consistently
    np.testing.assert_allclose(pan, ds.pan[:, ::-1, ::-1], atol=1e-7)
    np.testing.assert_allclose(gt, ds.gt[:, ::-1, ::-1], atol=1e-7)


def test_device_prefetch_and_pack_cond():
    d = make_synthetic_pan_h5(n=4, channels=4, size=32)
    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True)
    it = device_prefetch(batch_iterator(ds, 2, epochs=1, drop_remainder=True))
    batches = list(it)
    assert len(batches) == 2
    pan, lms, gt, wav = batches[0]
    assert isinstance(pan, jax.Array)
    cond = pack_cond(lms, pan, wav)
    assert cond.shape == (2, 32, 32, 4 + 1 + 7)
    # first channels are lms verbatim
    np.testing.assert_allclose(np.asarray(cond[..., :4]), np.asarray(lms))


def test_hisr_erase_affine_aug():
    d = make_synthetic_hisr_h5(n=4, bands=31, size=32)
    ds = HISRDataSets(d, wavelets=True, aug_prob=1.0)
    rng = np.random.default_rng(0)
    rgb, hsi, gt, wav = ds.batch(np.arange(4), rng)
    # every sample transformed; shapes preserved; same warp applied to
    # paired tensors (rotated zero-corners line up between rgb and gt)
    assert rgb.shape == (4, 32, 32, 3) and gt.shape == (4, 32, 32, 31)
    assert not np.allclose(gt, ds.gt[:4])
    corner_rgb = rgb[:, 0, 0, :].sum(-1) == 0
    corner_gt = gt[:, 0, 0, :].sum(-1) == 0
    np.testing.assert_array_equal(corner_rgb, corner_gt)


def test_random_erase_channel():
    from difpan_tpu.data.pan_dataset import random_erase_channel
    rng = np.random.default_rng(3)
    x = np.ones((8, 8, 4), np.float32)
    out = random_erase_channel(x, 4, rng)
    zeroed = (out.sum(axis=(0, 1)) == 0)
    assert 0 < zeroed.sum() <= 4
    # wrong channel count -> unchanged (reference behavior)
    np.testing.assert_array_equal(random_erase_channel(x, 8, rng), x)


# --- Wald-protocol structured generator (round 4) ---------------------------

def test_wald_pan_generator():
    from difpan_tpu.data import make_wald_pan_h5
    from difpan_tpu.data.synthetic import _mtf_gaussian_blur
    d = make_wald_pan_h5(n=4, channels=8, size=64, division=2047.0, seed=1)
    assert set(d) == {"gt", "ms", "lms", "pan"}
    assert d["gt"].shape == (4, 8, 64, 64)
    assert d["ms"].shape == (4, 8, 16, 16)
    assert d["lms"].shape == (4, 8, 64, 64)
    assert d["pan"].shape == (4, 1, 64, 64)
    for v in d.values():
        assert v.dtype == np.float32
        assert v.min() >= 0.0 and v.max() <= 2047.0
    # Wald consistency: ms is the MTF-blurred+decimated gt up to the small
    # injected sensor noise (same per-dataset Nyquist gains, seed+7919)
    gn = np.random.default_rng(1 + 7919).uniform(0.27, 0.35, 8)
    ms0 = _mtf_gaussian_blur(d["gt"] / 2047.0, 4, gn)[:, :, ::4, ::4] * 2047.0
    rel = np.abs(ms0 - d["ms"]).mean() / d["ms"].std()
    assert rel < 0.03, rel
    # structured scenes: materially more edge energy than the smooth-noise
    # generator (the round-3 saturation fix)
    old = make_synthetic_pan_h5(n=4, channels=8, size=64, division=2047.0,
                                seed=1)
    def grad_e(x):
        return (np.abs(np.diff(x, axis=-1)).mean() +
                np.abs(np.diff(x, axis=-2)).mean())
    assert grad_e(d["gt"]) > 1.4 * grad_e(old["gt"])
    # loads through the real dataset class
    ds = PanDataset(d, norm_range=False, division=2047.0, wavelets=True)
    pan, lms, gt, wav = ds[0]
    assert gt.shape == (64, 64, 8) and wav.shape == (32, 32, 11)
    assert 0.0 <= gt.min() and gt.max() <= 1.0


def test_wald_pan_full_res_and_determinism():
    from difpan_tpu.data import make_wald_pan_h5
    d1 = make_wald_pan_h5(n=2, channels=4, size=32, seed=5, full_res=True)
    assert set(d1) == {"ms", "lms", "pan"}
    d2 = make_wald_pan_h5(n=2, channels=4, size=32, seed=5, full_res=True)
    for k in d1:
        np.testing.assert_array_equal(d1[k], d2[k])


def test_wald_hisr_generator():
    from difpan_tpu.data import make_wald_hisr_h5
    d = make_wald_hisr_h5(n=2, bands=31, size=64, seed=3)
    assert set(d) == {"GT", "LRHSI", "RGB", "HSI_up"}
    assert d["GT"].shape == (2, 31, 64, 64)
    assert d["LRHSI"].shape == (2, 31, 16, 16)
    assert d["RGB"].shape == (2, 3, 64, 64)
    assert d["HSI_up"].shape == (2, 31, 64, 64)
    for v in d.values():
        assert 0.0 <= v.min() and v.max() <= 1.0
    ds = HISRDataSets(d, wavelets=True)
    rgb, up, gt, wav = ds[0]
    assert gt.shape == (64, 64, 31)


def test_wald_chunked_generator_deterministic():
    from difpan_tpu.data.synthetic import make_wald_pan_h5_chunked
    d1 = make_wald_pan_h5_chunked(n=6, channels=4, size=32, seed=9, chunk=4)
    d2 = make_wald_pan_h5_chunked(n=6, channels=4, size=32, seed=9, chunk=4)
    assert d1["gt"].shape == (6, 4, 32, 32)
    for k in d1:
        np.testing.assert_array_equal(d1[k], d2[k])


def test_wald_sensor_seed_pins_sensor_across_content_seeds():
    """Round-5 regime fix: `sensor_seed` must hold ONE sensor response
    (MTF Nyquist gains AND pan spectral weights) across chunks with
    different content seeds — the reference's one-satellite regime
    (/root/reference/dataset/pan_dataset.py:30-176 loads a single
    sensor's h5). Without it each chunk draws its own sensor and the
    pan->MS spectral mapping is ambiguous across the stream."""
    from difpan_tpu.data.synthetic import make_wald_pan_h5

    # same flat scene content isolates the sensor response: feed a
    # constant-ish scene by comparing pan/ms RATIOS across seeds instead —
    # simpler: two different content seeds, same sensor_seed, must yield
    # DIFFERENT gt but the IDENTICAL pan response applied. We recover the
    # pan weights by least squares from (gt, pan) and compare.
    d1 = make_wald_pan_h5(n=4, channels=4, size=32, seed=1, sensor_seed=43,
                          noise_snr_db=200.0)
    d2 = make_wald_pan_h5(n=4, channels=4, size=32, seed=2, sensor_seed=43,
                          noise_snr_db=200.0)
    assert not np.allclose(d1["gt"], d2["gt"])   # scenes differ

    def pan_weights(d):
        a = d["gt"].transpose(0, 2, 3, 1).reshape(-1, 4)
        b = d["pan"].reshape(-1)
        w, *_ = np.linalg.lstsq(a, b, rcond=None)
        return w

    np.testing.assert_allclose(pan_weights(d1), pan_weights(d2),
                               rtol=1e-4, atol=1e-5)

    # and WITHOUT sensor_seed the two seeds draw different pan weights
    e1 = make_wald_pan_h5(n=4, channels=4, size=32, seed=1,
                          noise_snr_db=200.0)
    e2 = make_wald_pan_h5(n=4, channels=4, size=32, seed=2,
                          noise_snr_db=200.0)
    assert np.abs(pan_weights(e1) - pan_weights(e2)).max() > 1e-3

    # chunked path threads it through every piece: recovered weights match
    # the single-shot sensor
    from difpan_tpu.data.synthetic import make_wald_pan_h5_chunked
    dc = make_wald_pan_h5_chunked(n=6, channels=4, size=32, seed=9,
                                  chunk=2, sensor_seed=43)
    ds = make_wald_pan_h5(n=2, channels=4, size=32, seed=9 * 1000,
                          sensor_seed=43)
    np.testing.assert_array_equal(dc["gt"][:2], ds["gt"])


def test_wald_hisr_sensor_seed():
    from difpan_tpu.data.synthetic import make_wald_hisr_h5
    d1 = make_wald_hisr_h5(n=2, bands=8, size=32, seed=1, sensor_seed=43)
    d2 = make_wald_hisr_h5(n=2, bands=8, size=32, seed=2, sensor_seed=43)
    assert not np.allclose(d1["GT"], d2["GT"])
    # same MTF: blurring the same input with both pipelines would need
    # internals; instead assert determinism + that sensor_seed changes
    # nothing when it equals the legacy derivation is NOT required — just
    # that two content seeds with one sensor_seed give identical gains via
    # the public contract: regenerating seed=1 twice matches exactly
    d1b = make_wald_hisr_h5(n=2, bands=8, size=32, seed=1, sensor_seed=43)
    for k in d1:
        np.testing.assert_array_equal(d1[k], d1b[k])
