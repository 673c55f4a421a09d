"""Spatial parallelism tests on the 8-device CPU mesh: halo-exchange conv
equals the global conv; overlap-tile sampling reconstructs a sane image."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from difpan_tpu.parallel import make_mesh
from difpan_tpu.parallel.spatial import (halo_exchange_h, sharded_conv3x3,
                                         tiled_sample)


def test_sharded_conv3x3_matches_global():
    mesh = make_mesh(8, axis_name="sp")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 16, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))

    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    f = shard_map(
        lambda xs: sharded_conv3x3(xs, k, "sp", bias=bias),
        mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sharded_conv3x3_stride2_matches_global():
    mesh = make_mesh(8, axis_name="sp")
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 128, 8, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 5)).astype(np.float32))
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    f = shard_map(
        lambda xs: sharded_conv3x3(xs, k, "sp", stride=2),
        mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"))
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_halo_exchange_values():
    mesh = make_mesh(4, axis_name="sp")
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1)

    f = shard_map(lambda xs: halo_exchange_h(xs, "sp", halo=1),
                  mesh=mesh, in_specs=P(None, "sp"),
                  out_specs=P(None, "sp"))
    out = np.asarray(f(x)).reshape(4, 4)  # 4 shards x (1 + 2 + 1) rows
    # shard 1 holds rows [2,3]; halos: row 1 above, row 4 below
    np.testing.assert_allclose(out[1], [1, 2, 3, 4])
    # global edges zero-padded
    assert out[0, 0] == 0.0 and out[3, -1] == 0.0


def test_tiled_sample_blending():
    """A sampler that returns lms verbatim must reconstruct lms exactly
    (feather weights sum to 1 everywhere)."""
    rng = np.random.default_rng(2)
    H = W = 96
    lms = rng.random((1, H, W, 4)).astype(np.float32)
    pan = rng.random((1, H, W, 1)).astype(np.float32)
    wav = rng.random((1, H // 2, W // 2, 7)).astype(np.float32)

    def sample_fn(key, pan_t, lms_t, wav_t):
        return lms_t

    out = tiled_sample(sample_fn, jax.random.PRNGKey(0), pan, lms, wav,
                       tile=64, overlap=32, tile_batch=4)
    np.testing.assert_allclose(out, lms, atol=1e-5)


def test_sharded_encoder_stage_matches_unsharded():
    """Stage-level H-sharding (VERDICT item 8): a full encoder stage
    (CSM + ResnetBlock x2 + Downsample) run as 8 H-slabs under shard_map
    with halo exchange + global-GN psums matches the unsharded modules."""
    import jax
    import jax.numpy as jnp
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from difpan_tpu.models.sr3_dwt import ResnetBlocWithAttn
    from difpan_tpu.models.common import Downsample
    from difpan_tpu.parallel import make_mesh
    from difpan_tpu.parallel.spatial import sharded_encoder_stage

    B, H, W, C = 2, 64, 32, 8   # H=64 over 8 devices -> 8-row slabs
    cond_dim, dim_out, emb = 5, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    cond = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, cond_dim))
    t_emb = jax.random.normal(jax.random.PRNGKey(2), (B, emb))

    blocks = [ResnetBlocWithAttn(dim_out=dim_out, cond_dim=cond_dim,
                                 norm_groups=1, dropout=0.0, with_attn=False,
                                 encoder=True) for _ in range(2)]
    bparams = []
    h_in = x
    for i, bm in enumerate(blocks):
        p = bm.init({"params": jax.random.PRNGKey(3 + i)}, h_in, t_emb,
                    cond, train=False)["params"]
        bparams.append(p)
        h_in = bm.apply({"params": p}, h_in, t_emb, cond, train=False)
    down = Downsample(dim_out)
    dparams = down.init(jax.random.PRNGKey(9), h_in)["params"]
    ref = down.apply({"params": dparams}, h_in)

    mesh = make_mesh(8)
    spec = P(None, "data", None, None)
    fn = shard_map(
        lambda bp, dp, xx, te, cc: sharded_encoder_stage(
            bp, dp, xx, te, cc, axis_name="data", groups=1),
        mesh=mesh, in_specs=(P(), P(), spec, P(), spec), out_specs=spec)
    out = jax.jit(fn)(bparams, dparams, x, t_emb, cond)
    assert out.shape == (B, H // 2, W // 2, dim_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_full_unet_h_sharded_matches_unsharded():
    """The COMPLETE UNetSR3-DWT eval forward on H-sharded slabs under
    shard_map (halo convs, psum GN, cross-shard FWM softmax/context,
    gathered mid attention) == the unsharded model.apply, same params."""
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh
    from difpan_tpu.parallel.sharded_unet import make_sharded_unet_forward

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2, 2, 4),
        attn_res=(8,), res_blocks=2, dropout=0.0, image_size=64,
        self_condition=True)

    B, H, W = 2, 64, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, c))
    cond = jax.random.normal(jax.random.PRNGKey(1),
                             (B, H, W, 2 * c + 4 * pc))
    t = jnp.array([7, 410])
    params = model.init({"params": jax.random.PRNGKey(2)}, x, t, cond,
                        train=False)["params"]
    ref = model.apply({"params": params}, x, t, cond, None, train=False)

    mesh = make_mesh(8)
    fn = make_sharded_unet_forward(model, mesh)
    out = fn(params, x, t, cond)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-5)


def test_sharded_sampler_matches_unsharded():
    """End-to-end H-sharded DDIM sampling (shard_map'd UNet inside the scan)
    == the engine's unsharded sampler, same params/key."""
    from difpan_tpu.diffusion import (DiffusionConfig, make_beta_schedule,
                                      respace, schedule_from_betas)
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh, make_sharded_sampler
    from difpan_tpu.data.loader import pack_cond
    from difpan_tpu.diffusion import ddim_sample_loop

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    B, H, W = 1, 32, 32
    key = jax.random.PRNGKey(3)
    pan = jax.random.uniform(jax.random.PRNGKey(4), (B, H, W, pc))
    lms = jax.random.uniform(jax.random.PRNGKey(5), (B, H, W, c))
    wav = jax.random.uniform(jax.random.PRNGKey(6),
                             (B, H // 2, W // 2, c + 3 * pc))
    params = model.init(
        {"params": jax.random.PRNGKey(7)}, lms, jnp.array([0]),
        jnp.zeros((B, H, W, 2 * c + 4 * pc)), train=False)["params"]

    dcfg = DiffusionConfig(channels=c, pred_mode="x_start", loss_type="l1",
                           clamp_range=(0.0, 1.0), self_condition=True)
    sched_re, _ = respace(schedule_from_betas(
        make_beta_schedule("cosine", 20, cosine_s=8e-3)), "ddim4")

    # unsharded reference (plain model.apply inside the same loop)
    cond = pack_cond(lms, pan, wav)

    def model_fn(x, t, cc, sc, k):
        return model.apply({"params": params}, x, t, cond, sc, train=False)

    ref = jnp.clip(ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
                   + lms, 0.0, 1.0)

    mesh = make_mesh(8)
    sample = make_sharded_sampler(model, mesh, dcfg, sched_re)
    out = sample(params, key, pan, lms, wav)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_dpm_sampler_matches_unsharded():
    """H-sharded DPM-Solver++ multistep sampling == the unsharded solver,
    same params/key (the fast-sampler path for beyond-HBM images)."""
    from difpan_tpu.diffusion import make_beta_schedule
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh, make_sharded_dpm_sampler
    from difpan_tpu.data.loader import pack_cond
    from difpan_tpu.solvers import DPMSolver, NoiseScheduleVP, model_wrapper

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    B, H, W = 1, 32, 32
    key = jax.random.PRNGKey(13)
    pan = jax.random.uniform(jax.random.PRNGKey(14), (B, H, W, pc))
    lms = jax.random.uniform(jax.random.PRNGKey(15), (B, H, W, c))
    wav = jax.random.uniform(jax.random.PRNGKey(16),
                             (B, H // 2, W // 2, c + 3 * pc))
    params = model.init(
        {"params": jax.random.PRNGKey(17)}, lms, jnp.array([0]),
        jnp.zeros((B, H, W, 2 * c + 4 * pc)), train=False)["params"]
    betas = make_beta_schedule("cosine", 50, cosine_s=8e-3)

    # unsharded reference
    cond = pack_cond(lms, pan, wav)
    ns = NoiseScheduleVP("discrete", betas=betas)

    def x0_model(xx, t_input):
        return model.apply({"params": params}, xx, t_input, cond,
                           train=False)

    model_fn = model_wrapper(x0_model, ns, model_type="x_start")
    solver = DPMSolver(model_fn, ns, algorithm_type="dpmsolver++",
                       correcting_x0_fn=lambda x0, t: jnp.clip(x0, 0, 1))
    xT = jax.random.normal(key, lms.shape)
    ref = jnp.clip(solver.sample(xT, steps=4, order=2, method="multistep",
                                 skip_type="time_uniform") + lms, 0.0, 1.0)

    mesh = make_mesh(8)
    sample = make_sharded_dpm_sampler(model, mesh, betas, steps=4, order=2)
    out = sample(params, key, pan, lms, wav)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_sampler_autopad_harvard_rows():
    """Non-divisible H auto-pads and crops (VERDICT r2 item 2): a 1000-row
    Harvard-shaped image samples on the 8-device mesh — inputs edge-padded
    to H=1008 (= 8 * 2^(stages-1) multiple) inside the sampler — and
    matches the unsharded sampler run on identically padded inputs."""
    from difpan_tpu.diffusion import (DiffusionConfig, make_beta_schedule,
                                      respace, schedule_from_betas,
                                      ddim_sample_loop)
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh, make_sharded_sampler
    from difpan_tpu.data.loader import pack_cond

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    B, H, W = 1, 1000, 16   # Harvard full-res row count
    key = jax.random.PRNGKey(23)
    pan = jax.random.uniform(jax.random.PRNGKey(24), (B, H, W, pc))
    lms = jax.random.uniform(jax.random.PRNGKey(25), (B, H, W, c))
    wav = jax.random.uniform(jax.random.PRNGKey(26),
                             (B, H // 2, W // 2, c + 3 * pc))
    params = model.init(
        {"params": jax.random.PRNGKey(27)}, lms[:, :32, :16],
        jnp.array([0]), jnp.zeros((B, 32, 16, 2 * c + 4 * pc)),
        train=False)["params"]

    dcfg = DiffusionConfig(channels=c, pred_mode="x_start", loss_type="l1",
                           clamp_range=(0.0, 1.0), self_condition=True)
    sched_re, _ = respace(schedule_from_betas(
        make_beta_schedule("cosine", 10, cosine_s=8e-3)), "ddim2")

    mesh = make_mesh(8)
    sample = make_sharded_sampler(model, mesh, dcfg, sched_re)
    out = sample(params, key, pan, lms, wav)
    assert out.shape == (B, H, W, c)   # cropped back

    # unsharded reference on the SAME edge-padded inputs, cropped the same
    ph = 1008 - H
    pad = lambda a, p: jnp.pad(a, ((0, 0), (0, p), (0, 0), (0, 0)),
                               mode="edge")
    pan_p, lms_p, wav_p = pad(pan, ph), pad(lms, ph), pad(wav, ph // 2)
    cond = pack_cond(lms_p, pan_p, wav_p)

    def model_fn(x, t, cc, sc, k):
        return model.apply({"params": params}, x, t, cond, sc, train=False)

    ref = jnp.clip(ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
                   + lms_p, 0.0, 1.0)[:, :H]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_dp_sp_2d_mesh_sampler_matches_unsharded():
    """dp x sp on ONE mesh (VERDICT r2 item 3): a (4 data x 2 space) mesh
    samples a batch of 4 H-sharded images; numerics match the unsharded
    sampler (batch shards over `data`, rows over `space`)."""
    from difpan_tpu.diffusion import (DiffusionConfig, make_beta_schedule,
                                      respace, schedule_from_betas,
                                      ddim_sample_loop)
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh_2d, make_sharded_sampler
    from difpan_tpu.data.loader import pack_cond

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    B, H, W = 4, 32, 16
    key = jax.random.PRNGKey(33)
    pan = jax.random.uniform(jax.random.PRNGKey(34), (B, H, W, pc))
    lms = jax.random.uniform(jax.random.PRNGKey(35), (B, H, W, c))
    wav = jax.random.uniform(jax.random.PRNGKey(36),
                             (B, H // 2, W // 2, c + 3 * pc))
    params = model.init(
        {"params": jax.random.PRNGKey(37)}, lms, jnp.array([0]),
        jnp.zeros((B, H, W, 2 * c + 4 * pc)), train=False)["params"]

    dcfg = DiffusionConfig(channels=c, pred_mode="x_start", loss_type="l1",
                           clamp_range=(0.0, 1.0), self_condition=True)
    sched_re, _ = respace(schedule_from_betas(
        make_beta_schedule("cosine", 20, cosine_s=8e-3)), "ddim3")

    cond = pack_cond(lms, pan, wav)

    def model_fn(x, t, cc, sc, k):
        return model.apply({"params": params}, x, t, cond, sc, train=False)

    ref = jnp.clip(ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
                   + lms, 0.0, 1.0)

    mesh = make_mesh_2d(4, 2)
    sample = make_sharded_sampler(model, mesh, dcfg, sched_re,
                                  axis_name="space")
    out = sample(params, key, pan, lms, wav)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_dp_sp_2d_mesh_dpm_sampler_runs():
    """DPM-Solver++ on the 2-D mesh with a non-divisible batch: batch 3
    pads to 4 (data axis; H=28 already divides space*2^(stages-1)=4) — and
    the numerics match the unsharded solver on the same padded inputs,
    cropped back (VERDICT r3 item 7: same bar as the DDIM sibling)."""
    from difpan_tpu.diffusion import make_beta_schedule
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh_2d, make_sharded_dpm_sampler
    from difpan_tpu.data.loader import pack_cond
    from difpan_tpu.solvers import DPMSolver, NoiseScheduleVP, model_wrapper

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    B, H, W = 3, 28, 16
    pan = jax.random.uniform(jax.random.PRNGKey(44), (B, H, W, pc))
    lms = jax.random.uniform(jax.random.PRNGKey(45), (B, H, W, c))
    wav = jax.random.uniform(jax.random.PRNGKey(46),
                             (B, H // 2, W // 2, c + 3 * pc))
    params = model.init(
        {"params": jax.random.PRNGKey(47)}, lms[:, :16], jnp.array([0]),
        jnp.zeros((B, 16, W, 2 * c + 4 * pc)), train=False)["params"]
    betas = make_beta_schedule("cosine", 50, cosine_s=8e-3)

    mesh = make_mesh_2d(4, 2)
    sample = make_sharded_dpm_sampler(model, mesh, betas, steps=3, order=2,
                                      axis_name="space")
    key = jax.random.PRNGKey(48)
    out = sample(params, key, pan, lms, wav)
    assert out.shape == (B, H, W, c)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)

    # unsharded reference on the SAME padded inputs (B 3->4 repeat-last;
    # no H pad needed), same key, cropped the same
    pad_b = lambda a: jnp.concatenate([a, a[-1:]], axis=0)
    pan_p, lms_p, wav_p = pad_b(pan), pad_b(lms), pad_b(wav)
    cond = pack_cond(lms_p, pan_p, wav_p)
    ns = NoiseScheduleVP("discrete", betas=betas)

    def x0_model(xx, t_input):
        return model.apply({"params": params}, xx, t_input, cond,
                           train=False)

    solver = DPMSolver(model_wrapper(x0_model, ns, model_type="x_start"),
                       ns, algorithm_type="dpmsolver++",
                       correcting_x0_fn=lambda x0, t: jnp.clip(x0, 0, 1))
    xT = jax.random.normal(key, lms_p.shape)
    ref = solver.sample(xT, steps=3, order=2, method="multistep",
                        skip_type="time_uniform")
    ref = jnp.clip(ref + lms_p, 0.0, 1.0)[:B, :H]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_sharded_x0_sampler_matches_unsharded():
    """One-shot posterior-mean mode (sampler='x0', NFE=1) on the 2-D mesh:
    non-divisible batch 3 pads to 4, and numerics match the unsharded
    one-forward-pass x0 prediction (self_cond=0, t=T-1) on the same padded
    inputs, cropped back."""
    from difpan_tpu.diffusion import make_beta_schedule, schedule_from_betas
    from difpan_tpu.models import UNetSR3DWT
    from difpan_tpu.parallel import make_mesh_2d, make_sharded_x0_sampler
    from difpan_tpu.data.loader import pack_cond

    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=32, self_condition=True)
    B, H, W = 3, 28, 16
    pan = jax.random.uniform(jax.random.PRNGKey(54), (B, H, W, pc))
    lms = jax.random.uniform(jax.random.PRNGKey(55), (B, H, W, c))
    wav = jax.random.uniform(jax.random.PRNGKey(56),
                             (B, H // 2, W // 2, c + 3 * pc))
    params = model.init(
        {"params": jax.random.PRNGKey(57)}, lms[:, :16], jnp.array([0]),
        jnp.zeros((B, 16, W, 2 * c + 4 * pc)), train=False)["params"]
    sched = schedule_from_betas(make_beta_schedule("cosine", 50,
                                                   cosine_s=8e-3))

    mesh = make_mesh_2d(4, 2)
    sample = make_sharded_x0_sampler(model, mesh, sched, axis_name="space")
    key = jax.random.PRNGKey(58)
    out = sample(params, key, pan, lms, wav)
    assert out.shape == (B, H, W, c)

    # unsharded reference on the SAME padded inputs (B 3->4 repeat-last),
    # same key: one forward at t=T-1 from sigma_T-scaled noise, sc=0
    pad_b = lambda a: jnp.concatenate([a, a[-1:]], axis=0)
    pan_p, lms_p, wav_p = pad_b(pan), pad_b(lms), pad_b(wav)
    cond = pack_cond(lms_p, pan_p, wav_p)
    T = int(sched.betas.shape[0])
    sig_T = jnp.sqrt(1.0 - sched.alphas_cumprod[T - 1])
    xt = jax.random.normal(key, lms_p.shape) * sig_T
    t = jnp.full((lms_p.shape[0],), T - 1, jnp.int32)
    pred = model.apply({"params": params}, xt, t, cond,
                       jnp.zeros_like(xt), train=False)
    ref = jnp.clip(pred + lms_p, 0.0, 1.0)[:B, :H]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def _tiny_train_setup(dropout, compute_dtype="float32"):
    from difpan_tpu.train.engine import (TrainConfig, build_diffusion,
                                         build_model)
    from difpan_tpu.train.state import create_train_state, make_optimizer

    cfg = TrainConfig(
        dataset_name="qb", image_n_channel=4, pan_channel=1, image_size=32,
        n_steps=20, batch_size=2, inner_channel=8, channel_mults=(1, 2),
        attn_res=(8,), res_blocks=1, dropout=dropout, ema_start_iter=1,
        self_condition=True, compute_dtype=compute_dtype)
    model = build_model(cfg)
    dcfg, sched = build_diffusion(cfg)
    tx = make_optimizer(cfg.lr_d, cfg.weight_decay,
                        grad_clip_norm=cfg.grad_clip_norm)
    B, H, W = 2, 32, 16
    rngs = [jax.random.PRNGKey(i) for i in range(60, 64)]
    pan = jax.random.uniform(rngs[0], (B, H, W, 1))
    lms = jax.random.uniform(rngs[1], (B, H, W, 4))
    gt = jnp.clip(lms + 0.1 * jax.random.normal(rngs[2], (B, H, W, 4)),
                  0, 1)
    wav = jax.random.uniform(rngs[3], (B, H // 2, W // 2, 7))
    params = model.init(
        {"params": jax.random.PRNGKey(70)}, lms, jnp.array([0]),
        jnp.zeros((B, H, W, 12)), train=False)["params"]
    state = create_train_state(params, tx)
    return cfg, model, dcfg, sched, tx, state, (pan, lms, gt, wav)


def test_sharded_train_step_matches_dp_loss():
    """Train-mode H-sharding (VERDICT r2 item 7): the shard_map'd train
    step (explicit self-cond + gradients through the inline cond branches
    + optimizer + EMA) reproduces an unsharded train step — same loss and
    same updated params. Both sides run deterministically (dropout 0,
    stochastic=False): the decoder's hardcoded DropPath 0.2 draws from
    flax's global rng stream, which per-shard streams cannot reproduce
    bit-for-bit, so stochastic parity is distributional, not exact."""
    import optax
    from difpan_tpu.data.loader import pack_cond
    from difpan_tpu.diffusion import p_losses
    from difpan_tpu.parallel import make_mesh, make_sharded_train_step
    from difpan_tpu.train.state import TrainState, ema_update

    cfg, model, dcfg, sched, tx, state, batch = _tiny_train_setup(0.0)
    # two keys covering BOTH self-cond coin branches (PRNGKey(99) ->
    # coin False: self_cond == x_noisy; PRNGKey(3) -> coin True: the
    # no-grad x0 estimate path, which exercises the [self_cond, x] concat
    # order in the sharded head conv)
    keys = [jax.random.PRNGKey(99), jax.random.PRNGKey(3)]
    coins = [bool(jax.random.bernoulli(jax.random.split(k, 5)[2]))
             for k in keys]
    assert coins == [False, True], coins

    def ref_step(state, batch, key):
        # the sharded step's structure with the plain unsharded forward
        pan, lms, gt, wavelets = batch
        cond = pack_cond(lms, pan, wavelets)
        res = gt - lms

        def loss_fn(params):
            def model_fn(x, t, c, sc, k):
                return model.apply({"params": params}, x, t, cond, sc,
                                   train=False)
            return p_losses(dcfg, sched, model_fn, key, res, cond)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(params, state.ema_params, state.step,
                         decay=cfg.ema_decay, start_iter=cfg.ema_start_iter)
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema), loss

    mesh = make_mesh(8, axis_name="space")
    sh_step = jax.jit(make_sharded_train_step(cfg, model, dcfg, sched, tx,
                                              mesh, axis_name="space",
                                              stochastic=False))
    jit_ref = jax.jit(ref_step)
    for key in keys:
        ref_state, ref_loss = jit_ref(state, batch, key)
        sh_state, sh_loss = sh_step(state, batch, key)

        np.testing.assert_allclose(float(sh_loss), float(ref_loss),
                                   rtol=1e-4, atol=1e-5)
        assert int(sh_state.step) == int(ref_state.step) == 1
        flat_ref = jax.tree_util.tree_leaves(ref_state.params)
        flat_sh = jax.tree_util.tree_leaves(sh_state.params)
        for a, b in zip(flat_ref, flat_sh):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-3, atol=2e-5)


def test_sharded_train_step_with_dropout_runs():
    """Dropout-active sharded training in bf16 compute (engine parity:
    the _dtype_casts pattern applies inside the sharded step too): loss
    finite, params move and stay f32 masters, EMA follows. Per-shard
    decorrelated masks can't match the flax global mask bit-for-bit, so
    this checks execution + sanity, not equality."""
    from difpan_tpu.parallel import make_mesh, make_sharded_train_step

    cfg, model, dcfg, sched, tx, state, batch = _tiny_train_setup(
        0.2, compute_dtype="bfloat16")
    mesh = make_mesh(8, axis_name="space")
    sh_step = jax.jit(make_sharded_train_step(cfg, model, dcfg, sched, tx,
                                              mesh, axis_name="space"))
    st1, loss1 = sh_step(state, batch, jax.random.PRNGKey(1))
    st2, loss2 = sh_step(st1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))
    assert int(st2.step) == 2
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(st2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))
    assert all(v.dtype == jnp.float32
               for v in jax.tree_util.tree_leaves(st2.params))
