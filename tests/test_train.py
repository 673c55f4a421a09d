"""End-to-end training tests on the 8-device CPU mesh: tiny model + synthetic
data, full engine loop with validation + checkpointing, loss decreases."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difpan_tpu.data import PanDataset, make_synthetic_pan_h5
from difpan_tpu.train import (TrainConfig, TrainState, create_train_state,
                              ema_update, make_optimizer, train)
from difpan_tpu.train.engine import build_diffusion, build_model, \
    make_train_step, make_sample_fn
from difpan_tpu.parallel import make_mesh, batch_sharding, replicated_sharding


def _tiny_cfg(**kw):
    base = dict(
        dataset_name="qb", image_n_channel=4, pan_channel=1, image_size=32,
        n_steps=50, batch_size=8, inner_channel=8, channel_mults=(1, 2),
        attn_res=(16,), res_blocks=1, dropout=0.1, valid_every=10,
        log_every=5, valid_batch_size=8, valid_section_counts="ddim10",
        ema_start_iter=5, max_iterations=20)
    base.update(kw)
    return TrainConfig(**base)


class _NullLogger:
    def print(self, *a):
        pass

    def log_scalar(self, *a):
        pass

    def log_scalars(self, *a):
        pass


def _dataset(n=16, size=32):
    d = make_synthetic_pan_h5(n=n, channels=4, size=size, division=1023.0,
                              seed=3)
    return PanDataset(d, norm_range=False, division=1023.0, wavelets=True)


def test_train_step_runs_and_loss_decreases():
    cfg = _tiny_cfg()
    ds = _dataset()
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(1e-3, 1e-4, grad_clip_norm=1.0)
    pan, lms, gt, wav = ds.batch(np.arange(8))
    batch = tuple(jnp.asarray(a) for a in (pan, lms, gt, wav))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 4)), jnp.array([0]),
        jnp.zeros((1, 32, 32, 12)), train=False)["params"]
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, model, dcfg, sched, tx),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert int(state.step) == 30
    assert np.isfinite(losses).all()
    # trend check: mean of last 5 below mean of first 5
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_ema_semantics():
    p = {"w": jnp.ones(3)}
    e = {"w": jnp.zeros(3)}
    # before start_iter: copy
    out = ema_update(p, e, jnp.int32(3), decay=0.9, start_iter=5)
    np.testing.assert_allclose(out["w"], 1.0)
    # after: decay mix
    out = ema_update(p, {"w": jnp.zeros(3)}, jnp.int32(6), decay=0.9,
                     start_iter=5)
    np.testing.assert_allclose(out["w"], 0.1, rtol=1e-6)


def test_optimizer_lr_schedule_and_clip():
    tx = make_optimizer(lr=1.0, weight_decay=0.0,
                        milestones=(5, 10), gamma=0.1, grad_clip_norm=1e9)
    params = {"w": jnp.zeros(1)}
    st = tx.init(params)
    g = {"w": jnp.ones(1)}
    # AdamW normalizes by sqrt(v): after many identical grads step ~ lr
    for i in range(20):
        upd, st = tx.update(g, st, params)
        if i == 3:
            early = float(upd["w"][0])
        if i == 12:
            late = float(upd["w"][0])
    # lr decayed by 0.1 twice between step 4 and 13
    assert abs(late / early - 0.01) < 0.005


def test_full_train_loop_with_validation_and_checkpoint(tmp_path):
    cfg = _tiny_cfg(ckpt_dir=str(tmp_path / "ckpts"),
                    run_dir=str(tmp_path / "runs"),
                    samples_dir=str(tmp_path / "samples"),
                    show_recon=True, recon_every=10)
    ds = _dataset()
    mesh = make_mesh(8)
    valid_recs = []
    state = train(ds, ds, cfg, mesh=mesh, logger=_NullLogger(),
                  max_iterations=20,
                  on_valid=lambda s, st, acc: valid_recs.append((s, acc)))
    assert int(jax.device_get(state.step)) == 20
    # every validation carries BOTH the protocol metrics and the one-shot
    # posterior-mean (x0_*) metrics, all finite (X0_STUDY.md)
    assert [s for s, _ in valid_recs] == [10, 20]
    for _, acc in valid_recs:
        assert {"SAM", "x0_SAM", "x0_SSIM"} <= set(acc), sorted(acc)
        assert all(np.isfinite(float(v)) for v in acc.values())
    # training-time image artifacts (`diffusion_engine.py:250-270,303-320`)
    for rel in ("recon_x/iter_10.png", "recon_x/iter_20.png",
                "valid_samples/iter_10.png", "valid_samples/iter_20.png"):
        assert (tmp_path / "samples" / rel).exists(), rel
    # two validations (at 10 and 20) -> checkpoints saved
    from difpan_tpu.utils.checkpoints import latest_step, restore_checkpoint
    assert latest_step(cfg.ckpt_dir) == 20
    restored = restore_checkpoint(cfg.ckpt_dir, state)
    np.testing.assert_array_equal(
        jax.device_get(restored.step), jax.device_get(state.step))
    l1 = jax.tree_util.tree_leaves(restored.params)
    l2 = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a, b)


def test_sample_fn_sharded():
    """Batch-sharded DDIM sampling over the 8-device mesh."""
    cfg = _tiny_cfg()
    ds = _dataset()
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 4)), jnp.array([0]),
        jnp.zeros((1, 32, 32, 12)), train=False)["params"]
    mesh = make_mesh(8)
    data_sh = batch_sharding(mesh)
    repl_sh = replicated_sharding(mesh)
    fn = jax.jit(make_sample_fn(cfg, model, dcfg, sched, "ddim10"),
                 in_shardings=(repl_sh, repl_sh, data_sh, data_sh, data_sh),
                 out_shardings=data_sh)
    pan, lms, gt, wav = ds.batch(np.arange(8))
    sr = fn(jax.device_put(params, repl_sh), jax.random.PRNGKey(0),
            jax.device_put(jnp.asarray(pan), data_sh),
            jax.device_put(jnp.asarray(lms), data_sh),
            jax.device_put(jnp.asarray(wav), data_sh))
    assert sr.shape == (8, 32, 32, 4)
    assert float(jnp.min(sr)) >= 0.0 and float(jnp.max(sr)) <= 1.0
    assert len(sr.sharding.device_set) == 8


def test_train_step_bf16_compute():
    cfg = _tiny_cfg(compute_dtype="bfloat16")
    ds = _dataset()
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(1e-3, 1e-4, grad_clip_norm=1.0)
    pan, lms, gt, wav = ds.batch(np.arange(8))
    batch = tuple(jnp.asarray(a) for a in (pan, lms, gt, wav))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 4)), jnp.array([0]),
        jnp.zeros((1, 32, 32, 12)), train=False)["params"]
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, model, dcfg, sched, tx),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(10):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # master params stay f32
    assert all(v.dtype == jnp.float32
               for v in jax.tree_util.tree_leaves(state.params))


def test_train_step_remat_matches_no_remat():
    """jax.checkpoint remat must not change the computed loss/params."""
    ds = _dataset()
    pan, lms, gt, wav = ds.batch(np.arange(8))
    batch = tuple(jnp.asarray(a) for a in (pan, lms, gt, wav))
    results = []
    for remat in (False, True):
        cfg = _tiny_cfg(remat=remat, dropout=0.0)
        model = build_model(cfg)
        dcfg, sched = build_diffusion(cfg)
        tx = make_optimizer(1e-3, 1e-4, grad_clip_norm=1.0)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 32, 32, 4)), jnp.array([0]),
            jnp.zeros((1, 32, 32, 12)), train=False)["params"]
        state = create_train_state(params, tx)
        step = jax.jit(make_train_step(cfg, model, dcfg, sched, tx))
        state, loss = step(state, batch, jax.random.PRNGKey(7))
        results.append((float(loss),
                        jax.tree_util.tree_leaves(state.params)[0]))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(results[0][1]),
                               np.asarray(results[1][1]), atol=1e-6)


def test_train_loop_hisr_family(tmp_path):
    """Engine end-to-end on the MHIF family (rgb=pan role, 3 channels)."""
    from difpan_tpu.data import HISRDataSets, make_synthetic_hisr_h5
    d = make_synthetic_hisr_h5(n=8, bands=8, size=32)
    ds = HISRDataSets(d, wavelets=True)
    cfg = TrainConfig(
        dataset_name="cave", image_n_channel=8, pan_channel=3,
        image_size=32, n_steps=20, batch_size=4, inner_channel=8,
        channel_mults=(1, 2), attn_res=(16,), res_blocks=1, dropout=0.0,
        valid_every=6, log_every=3, valid_batch_size=4,
        valid_section_counts="ddim5", ema_start_iter=2,
        ckpt_dir=str(tmp_path / "ck"), run_dir=str(tmp_path / "runs"))
    mesh = make_mesh(4)
    state = train(ds, ds, cfg, mesh=mesh, logger=_NullLogger(),
                  max_iterations=6)
    assert int(jax.device_get(state.step)) == 6


def test_device_prefetch_with_sharding():
    from difpan_tpu.data import batch_iterator, device_prefetch
    from difpan_tpu.parallel import batch_sharding
    ds = _dataset(n=16)
    mesh = make_mesh(8)
    sh = batch_sharding(mesh)
    it = device_prefetch(
        batch_iterator(ds, 8, epochs=1, drop_remainder=True), sharding=sh)
    batches = list(it)
    assert len(batches) == 2
    assert len(batches[0][0].sharding.device_set) == 8


def test_train_validation_covers_remainder(tmp_path):
    """Validation must score ALL samples (reference drop_last=False),
    padding the remainder batch to the compiled shape."""
    cfg = _tiny_cfg(valid_batch_size=6, valid_every=5, max_iterations=5,
                    ckpt_dir=str(tmp_path / "ck"),
                    run_dir=str(tmp_path / "runs"))
    ds = _dataset(n=10)  # 10 = 6 + remainder 4
    mesh = make_mesh(2)
    seen = {}

    def on_valid(step, state, acc):
        seen[step] = acc

    state = train(ds, ds, cfg, mesh=mesh, logger=_NullLogger(),
                  max_iterations=5, on_valid=on_valid)
    assert 5 in seen and np.isfinite(list(seen[5].values())).all()


def test_train_step_pred_var(tmp_path):
    """Learned-variance engine config: 2C-output UNet + pred_var loss train
    end-to-end on the tiny fixture (VERDICT item 4)."""
    cfg = _tiny_cfg(pred_var=True)
    ds = _dataset(n=8)
    model = build_model(cfg)
    assert model.out_channel == 2 * cfg.image_n_channel
    dcfg, sched = build_diffusion(cfg)
    assert dcfg.pred_var
    tx = make_optimizer(1e-3, 1e-4, grad_clip_norm=1.0)
    pan, lms, gt, wav = ds.batch(np.arange(8))
    batch = tuple(jnp.asarray(a) for a in (pan, lms, gt, wav))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 4)), jnp.array([0]),
        jnp.zeros((1, 32, 32, 12)), train=False)["params"]
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(cfg, model, dcfg, sched, tx),
                   donate_argnums=(0,))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, loss = step(state, batch, k)
        losses.append(float(jax.device_get(loss)))
    assert all(np.isfinite(losses))
    # the sampler consumes the 2C head and returns C channels
    sfn = jax.jit(make_sample_fn(cfg, model, dcfg, sched, "ddim5"))
    sr = sfn(state.ema_params, jax.random.PRNGKey(2), batch[0], batch[1],
             batch[3])
    assert sr.shape == (8, 32, 32, 4)
    assert np.all(np.isfinite(np.asarray(sr)))


def test_device_data_training_matches_host_batches(tmp_path):
    """cfg.device_data gathers batches on device from a resident dataset by
    index; with aug-free data the index stream mirrors batch_iterator's
    permutation, so the loss sequence is identical to the host-batch path."""
    from difpan_tpu.data import PanDataset, make_synthetic_pan_h5
    from difpan_tpu.train import TrainConfig, train

    d_train = make_synthetic_pan_h5(n=16, channels=4, size=32,
                                    division=1023.0, seed=7)
    d_valid = make_synthetic_pan_h5(n=4, channels=4, size=32,
                                    division=1023.0, seed=8)
    losses = {}
    for device_data in (False, True):
        cfg = TrainConfig(
            dataset_name="qb", image_n_channel=4, pan_channel=1,
            image_size=32, n_steps=25, batch_size=8, inner_channel=8,
            channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
            dropout=0.0, max_iterations=4, valid_every=100, log_every=1,
            seed=5, device_data=device_data,
            ckpt_dir=str(tmp_path / f"w{device_data}"),
            run_dir=str(tmp_path / f"r{device_data}"),
            samples_dir=str(tmp_path / f"s{device_data}"))

        captured = []

        class CapLogger:
            def print(self, *m):
                pass

            def log_scalar(self, tag, value, step):
                if tag == "denoised_loss":
                    captured.append(float(value))

            def log_scalars(self, tag, d, step):
                pass

        train(dict(d_train), dict(d_valid), cfg, logger=CapLogger())
        losses[device_data] = captured
    assert len(losses[True]) == len(losses[False]) == 4
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-5, atol=1e-6)


def test_steps_per_call_scan_matches_per_step(tmp_path):
    """cfg.steps_per_call chains K train steps into one lax.scan dispatch
    (the tunnel-dispatch amortizer used by the long run). Same host rng
    stream + same index stream => the logged loss sequence and the final
    params must match the per-step path bit-for-bit (up to f32 reassoc)."""
    import jax
    from difpan_tpu.train import TrainConfig, train

    d_train = make_synthetic_pan_h5(n=16, channels=4, size=32,
                                    division=1023.0, seed=7)
    d_valid = make_synthetic_pan_h5(n=4, channels=4, size=32,
                                    division=1023.0, seed=8)
    out = {}
    for k in (1, 4):
        cfg = TrainConfig(
            dataset_name="qb", image_n_channel=4, pan_channel=1,
            image_size=32, n_steps=25, batch_size=8, inner_channel=8,
            channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
            dropout=0.0, max_iterations=8, valid_every=8, log_every=1,
            seed=5, device_data=True, steps_per_call=k,
            ckpt_dir=str(tmp_path / f"w{k}"),
            run_dir=str(tmp_path / f"r{k}"),
            samples_dir=str(tmp_path / f"s{k}"))

        captured = []

        class CapLogger:
            def print(self, *m):
                pass

            def log_scalar(self, tag, value, step):
                if tag == "denoised_loss":
                    captured.append((step, float(value)))

            def log_scalars(self, tag, d, step):
                pass

            def log_image(self, *a, **kw):
                pass

        state = train(dict(d_train), dict(d_valid), cfg, logger=CapLogger())
        out[k] = (captured,
                  jax.tree_util.tree_map(np.asarray, state.params))
    steps1 = [s for s, _ in out[1][0]]
    steps4 = [s for s, _ in out[4][0]]
    assert steps1 == steps4 == list(range(1, 9))
    np.testing.assert_allclose([v for _, v in out[1][0]],
                               [v for _, v in out[4][0]],
                               rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        out[1][1], out[4][1])


def test_steps_per_call_must_divide_valid_every():
    import pytest
    from difpan_tpu.train import TrainConfig, train
    d = make_synthetic_pan_h5(n=8, channels=4, size=32, division=1023.0)
    cfg = TrainConfig(dataset_name="qb", image_n_channel=4, pan_channel=1,
                      image_size=32, batch_size=4, device_data=True,
                      steps_per_call=7, valid_every=10, max_iterations=2,
                      inner_channel=8, channel_mults=(1, 2), res_blocks=1)
    with pytest.raises(ValueError, match="steps_per_call"):
        train(dict(d), dict(d), cfg)


def test_device_augment_matches_host_flips():
    """device_augment (on-device, inside the jitted gather) must apply the
    SAME transformation PanDataset.batch's host flips do: at prob=1.0 every
    sample flips both H and V across every tensor of the tuple; at prob=0.0
    it is the identity."""
    from difpan_tpu.train.engine import device_augment

    rng = np.random.default_rng(0)
    batch = tuple(jnp.asarray(rng.normal(size=(4, 8, 8, c)), jnp.float32)
                  for c in (1, 4, 4, 12))
    key = jax.random.PRNGKey(3)

    out1 = device_augment(batch, key, 1.0)   # uniform < 1.0 always true
    for a, o in zip(batch, out1):
        np.testing.assert_array_equal(
            np.asarray(o), np.asarray(a)[:, ::-1, ::-1, :])

    out0 = device_augment(batch, key, 0.0)
    for a, o in zip(batch, out0):
        np.testing.assert_array_equal(np.asarray(o), np.asarray(a))


def test_device_augment_shared_per_sample_decision():
    """At prob=0.5 each sample draws ONE h and ONE v decision shared by
    every tensor: wherever tensor 0 flipped, all others must have too."""
    from difpan_tpu.train.engine import device_augment

    rng = np.random.default_rng(1)
    batch = tuple(jnp.asarray(rng.normal(size=(16, 8, 8, c)), jnp.float32)
                  for c in (1, 4))
    out = device_augment(batch, jax.random.PRNGKey(7), 0.5)
    for i in range(16):
        for a, o in zip(batch, out):
            ai, oi = np.asarray(a)[i], np.asarray(o)[i]
            match = any(
                np.array_equal(oi, v) for v in
                (ai, ai[:, ::-1], ai[::-1, :], ai[::-1, ::-1]))
            assert match
        # the realized flip of tensor 0 and tensor 1 must be the same one
        a0, o0 = np.asarray(batch[0])[i], np.asarray(out[0])[i]
        a1, o1 = np.asarray(batch[1])[i], np.asarray(out[1])[i]
        flips = [(1, 1), (1, -1), (-1, 1), (-1, -1)]
        f0 = {f for f in flips if np.array_equal(o0, a0[::f[0], ::f[1]])}
        f1 = {f for f in flips if np.array_equal(o1, a1[::f[0], ::f[1]])}
        assert f0 & f1


def test_device_aug_scan_matches_per_step(tmp_path):
    """steps_per_call chaining must stay bit-identical to K=1 with the
    on-device augmentation enabled (same key-split order per step)."""
    from difpan_tpu.train import TrainConfig, train

    d_train = make_synthetic_pan_h5(n=16, channels=4, size=32,
                                    division=1023.0, seed=7)
    d_valid = make_synthetic_pan_h5(n=4, channels=4, size=32,
                                    division=1023.0, seed=8)
    out = {}
    for k in (1, 4):
        cfg = TrainConfig(
            dataset_name="qb", image_n_channel=4, pan_channel=1,
            image_size=32, n_steps=25, batch_size=8, inner_channel=8,
            channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
            dropout=0.0, max_iterations=8, valid_every=8, log_every=1,
            seed=5, device_data=True, device_aug_prob=0.7,
            steps_per_call=k,
            ckpt_dir=str(tmp_path / f"w{k}"),
            run_dir=str(tmp_path / f"r{k}"),
            samples_dir=str(tmp_path / f"s{k}"))

        captured = []

        class CapLogger(_NullLogger):
            def log_scalar(self, tag, value, step):
                if tag == "denoised_loss":
                    captured.append(float(value))

            def log_image(self, *a, **kw):
                pass

        train(dict(d_train), dict(d_valid), cfg, logger=CapLogger())
        out[k] = captured
    assert len(out[1]) == len(out[4]) == 8
    np.testing.assert_allclose(out[1], out[4], rtol=1e-6, atol=1e-7)


def test_device_aug_requires_device_data():
    from difpan_tpu.train import TrainConfig, train
    d = make_synthetic_pan_h5(n=8, channels=4, size=32, division=1023.0)
    cfg = TrainConfig(dataset_name="qb", image_n_channel=4, pan_channel=1,
                      image_size=32, batch_size=4, device_data=False,
                      device_aug_prob=0.5, max_iterations=2,
                      inner_channel=8, channel_mults=(1, 2), res_blocks=1)
    with pytest.raises(ValueError, match="device_aug_prob"):
        train(dict(d), dict(d), cfg)


def test_device_augment_wavelet_sign_fix():
    """With wavelet_signs, the augmented wavelet cond must be EXACTLY the
    packed DWT of the flipped image — i.e. device_augment(batch) equals
    PanDataset.batch of a dataset built from spatially flipped raw inputs.
    (Without signs — reference parity — the detail planes come out with
    the wrong sign: the reference flips every tensor as stored,
    `/root/reference/dataset/pan_dataset.py:191-203`.)"""
    from difpan_tpu.ops.wavelet import wavelet_flip_signs
    from difpan_tpu.train.engine import device_augment

    d = make_synthetic_pan_h5(n=4, channels=4, size=16, division=1023.0,
                              seed=11)
    ds = PanDataset(d, norm_range=False, division=1023.0, wavelets=True)
    batch = tuple(jnp.asarray(a) for a in ds.batch(np.arange(4)))

    signs = wavelet_flip_signs(4, 1, order="pan")
    out = device_augment(batch, jax.random.PRNGKey(0), 1.0,
                         wavelet_signs=signs)   # flips H AND V everywhere

    d_flip = {k: np.ascontiguousarray(v[:, :, ::-1, ::-1])
              for k, v in d.items()}
    ds_flip = PanDataset(d_flip, norm_range=False, division=1023.0,
                         wavelets=True)
    want = ds_flip.batch(np.arange(4))
    for o, w in zip(out, want):
        np.testing.assert_allclose(np.asarray(o), w, rtol=0, atol=2e-6)

    # and the unsigned (reference-parity) flip differs on detail planes
    out_ref = device_augment(batch, jax.random.PRNGKey(0), 1.0)
    wav_ref, wav_want = np.asarray(out_ref[3]), want[3]
    assert not np.allclose(wav_ref, wav_want, atol=1e-4)


def test_device_augment_wavelet_sign_fix_hisr():
    """Same exactness property for the HISR pack order [LL, H, V, D]."""
    from difpan_tpu.data import HISRDataSets
    from difpan_tpu.data.synthetic import make_synthetic_hisr_h5
    from difpan_tpu.ops.wavelet import wavelet_flip_signs
    from difpan_tpu.train.engine import device_augment

    d = make_synthetic_hisr_h5(n=4, bands=7, size=16, seed=5)
    ds = HISRDataSets(d, wavelets=True)
    batch = tuple(jnp.asarray(a) for a in ds.batch(np.arange(4)))
    signs = wavelet_flip_signs(7, 3, order="hisr")
    out = device_augment(batch, jax.random.PRNGKey(2), 1.0,
                         wavelet_signs=signs)
    d_flip = {k: np.ascontiguousarray(v[:, :, ::-1, ::-1])
              for k, v in d.items()}
    want = HISRDataSets(d_flip, wavelets=True).batch(np.arange(4))
    for o, w in zip(out, want):
        np.testing.assert_allclose(np.asarray(o), w, rtol=0, atol=2e-6)


def test_rotate_pool():
    """rotate_pool overwrites exactly [start, start+m) of every pool array
    and leaves the rest untouched."""
    from difpan_tpu.train.engine import rotate_pool

    rng = np.random.default_rng(0)
    pool = tuple(jnp.asarray(rng.normal(size=(16, 4, 4, c)), jnp.float32)
                 for c in (1, 3))
    chunk = tuple(jnp.asarray(rng.normal(size=(4, 4, 4, c)), jnp.float32)
                  for c in (1, 3))
    out = jax.jit(rotate_pool)(pool, chunk, jnp.asarray(6, jnp.int32))
    for p, c, o in zip(pool, chunk, out):
        p, c, o = map(np.asarray, (p, c, o))
        np.testing.assert_array_equal(o[6:10], c)
        np.testing.assert_array_equal(o[:6], p[:6])
        np.testing.assert_array_equal(o[10:], p[10:])


def test_train_refresh_fn_streams_chunks(tmp_path):
    """The epochless stream: train() polls refresh_fn once per dispatch and
    rotates returned chunks into the device pool; the run completes and the
    poll count matches the dispatch count."""
    d_train = make_synthetic_pan_h5(n=16, channels=4, size=32,
                                    division=1023.0, seed=7)
    d_valid = make_synthetic_pan_h5(n=8, channels=4, size=32,
                                    division=1023.0, seed=8)
    ds_chunk = PanDataset(
        make_synthetic_pan_h5(n=4, channels=4, size=32, division=1023.0,
                              seed=9),
        norm_range=False, division=1023.0, wavelets=True)
    chunk = ds_chunk.batch(np.arange(4))

    polls = [0]

    def refresh_fn():
        polls[0] += 1
        return chunk if polls[0] % 2 == 0 else None   # every other poll

    cfg = _tiny_cfg(device_data=True, max_iterations=8, valid_every=8,
                    valid_batch_size=8,
                    ckpt_dir=str(tmp_path / "w"), run_dir=str(tmp_path / "r"),
                    samples_dir=str(tmp_path / "s"))
    state = train(dict(d_train), dict(d_valid), cfg, logger=_NullLogger(),
                  refresh_fn=refresh_fn)
    assert int(jax.device_get(state.step)) == 8
    assert polls[0] == 8   # one poll per dispatch (steps_per_call=1)


def test_train_pause_check_checkpoints_off_boundary(tmp_path):
    """pause_check() is polled every dispatch; when it fires mid-segment the
    engine checkpoints at the CURRENT step (off the valid_every boundary)
    and exits — the graceful-SIGTERM path that makes a cooperative PAUSE
    cost ~0 iterations. Resume continues from that exact step."""
    d = make_synthetic_pan_h5(n=16, channels=4, size=32, division=1023.0,
                              seed=3)
    cfg = _tiny_cfg(device_data=True, max_iterations=20, valid_every=5,
                    valid_batch_size=8,
                    ckpt_dir=str(tmp_path / "w"), run_dir=str(tmp_path / "r"),
                    samples_dir=str(tmp_path / "s"))
    calls = [0]

    def pause_check():
        calls[0] += 1
        return calls[0] > 7    # fire mid-segment (step 7; valid_every=5)

    state = train(dict(d), dict(d), cfg, logger=_NullLogger(),
                  pause_check=pause_check)
    stopped = int(jax.device_get(state.step))
    assert stopped == 7 and stopped % cfg.valid_every != 0
    assert os.path.isdir(str(tmp_path / "w" / "7"))

    # resume from the off-boundary checkpoint and finish the schedule
    from difpan_tpu.utils.checkpoints import restore_checkpoint
    restored = restore_checkpoint(str(tmp_path / "w"), state)
    state2 = train(dict(d), dict(d), cfg, logger=_NullLogger(),
                   restore_state=restored)
    assert int(jax.device_get(state2.step)) == 20

    # a pause before any progress must NOT re-save (orbax dir collision)
    state3 = train(dict(d), dict(d), cfg, logger=_NullLogger(),
                   restore_state=restored, pause_check=lambda: True)
    assert int(jax.device_get(state3.step)) == 7


def test_train_should_stop_ends_after_validation(tmp_path):
    """should_stop(step) is consulted after each validation+checkpoint and
    ends the run cleanly (the RSS self-restart hook)."""
    d = make_synthetic_pan_h5(n=16, channels=4, size=32, division=1023.0,
                              seed=3)
    cfg = _tiny_cfg(device_data=True, max_iterations=20, valid_every=5,
                    valid_batch_size=8,
                    ckpt_dir=str(tmp_path / "w"), run_dir=str(tmp_path / "r"),
                    samples_dir=str(tmp_path / "s"))
    state = train(dict(d), dict(d), cfg, logger=_NullLogger(),
                  should_stop=lambda step: step >= 10)
    assert int(jax.device_get(state.step)) == 10
    assert os.path.isdir(str(tmp_path / "w" / "10"))
