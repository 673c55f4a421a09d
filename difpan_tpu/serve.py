"""Persistent sampler service — load weights once, serve many requests.

The reference repo is CLI-batch only (train/test scripts,
`/root/reference/diffusion_engine.py:351-505`); production serving needs the
params resident on device and the sampler compiled once. This module is that
deployment surface:

  * ``SamplerService`` keeps params on device and jits one sampling program
    per (batch, H, W) request shape (LRU of compiled shapes; batches are
    padded up to the nearest pooled size so arbitrary request sizes reuse a
    handful of programs);
  * wavelet features are computed host-side when a request omits them (the
    same Haar DWT the training pipeline uses);
  * the HTTP layer is stdlib-only: POST ``/sample`` with an .npz body
    (arrays ``pan`` (B,H,W,P) and ``lms`` (B,H,W,C) in [0,1], optional
    ``wavelets`` (B,H/2,W/2,C+3P)) returns an .npz ``{sr: (B,H,W,C)}``;
    GET ``/healthz`` reports the compiled-shape cache.

Protocol parity with `train/eval.py:evaluate`: cosine schedule, DDIM
respacing, ``sr = clip(sample + lms, 0, 1)``.
"""

from __future__ import annotations

import io
import json
import logging
import queue
import threading
import time
import traceback
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple

log = logging.getLogger("difpan.serve")

import jax
import jax.numpy as jnp
import numpy as np

from .data import get_dataset_spec
from .data.loader import pack_cond
from .diffusion import (DiffusionConfig, ddim_sample_loop, make_beta_schedule,
                        respace, schedule_from_betas)
from .models import UNetSR3DWT
from .ops.wavelet import haar_dwt2, wavelet_cond_pack


def _round_up_batch(n: int, pool=(1, 2, 4, 8, 16, 32)) -> int:
    for p in pool:
        if n <= p:
            return p
    return n


class SamplerService:
    """Resident sampling engine: one params copy, compile-per-shape LRU."""

    def __init__(
        self,
        params: Any,
        dataset_name: str = "wv3",
        *,
        model: Optional[UNetSR3DWT] = None,
        # matches the reference's shipped eval invocation
        # (`diffusion_engine.py:527`: n_steps=25 + ddim25, identity
        # respacing) and our `test` CLI default, so the service returns the
        # same samples as batch eval on the same weights; pass 500/1500 for
        # the alternative configs in the reference source
        n_steps: int = 25,
        section_counts: str = "ddim25",
        sampler: str = "ddim",
        dpm_order: int = 2,
        dtype: str = "float32",
        max_compiled_shapes: int = 8,
        seed: int = 0,
        pred_var: bool = False,
        microbatch: bool = True,
        batch_window_ms: float = 3.0,
        max_merged_batch: int = 32,
        space_shards: int = 0,
        cond_evict_res: Optional[int] = None,
    ):
        self.spec = get_dataset_spec(dataset_name)
        self.pred_var = pred_var
        self.model = model or self._default_model()
        if dtype == "bfloat16":
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
        self.params = jax.device_put(params)
        self.dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        self.dcfg = DiffusionConfig(
            channels=self.spec.n_channels, pred_mode="x_start",
            loss_type="l1", clamp_range=(0.0, 1.0), self_condition=True,
            pred_var=pred_var)
        # sampler="ddim": the eval protocol (cosine T=n_steps, identity
        # ddim respacing). sampler="dpm": DPM-Solver++ multistep (order
        # `dpm_order`, n_steps NFE); NFE_STUDY.md quantifies the
        # quality/NFE trade. sampler="x0": NFE=1 posterior-mean mode
        # (scripts/x0_probe.py) — one forward pass predicting x0 from pure
        # noise at the top of a cosine T=n_steps schedule; n_steps must be
        # the TRAIN schedule length (the engine's 3000) so t lands in the
        # weights' time-embedding convention. Best distortion metrics at
        # 1/25th the protocol's model evals; iterative samplers buy
        # perceptual sharpness, not per-pixel accuracy.
        assert sampler in ("ddim", "dpm", "x0"), sampler
        if sampler == "dpm" and n_steps < 2:
            raise ValueError("dpm preset needs n_steps >= 2")
        self.sampler = sampler
        self.n_steps = n_steps
        self.dpm_order = dpm_order
        # evict cond-cache entries above this resolution (recomputed
        # in-scan) — HBM headroom for large request shapes
        self.cond_evict_res = cond_evict_res
        if sampler == "ddim":
            self.sched_re, _ = respace(
                schedule_from_betas(
                    make_beta_schedule("cosine", n_steps, cosine_s=8e-3)),
                section_counts)
        elif sampler == "x0":
            self.sched_re = None
            sched_full = schedule_from_betas(
                make_beta_schedule("cosine", n_steps, cosine_s=8e-3))
            self._x0_sigma_T = float(
                np.sqrt(1.0 - np.asarray(sched_full.alphas_cumprod)[-1]))
        else:
            # dpm mode: n_steps is the solver NFE, not a schedule length —
            # building the DDIM respacing here would reject e.g.
            # (n_steps=20, 'ddim25') even though it is never sampled
            self.sched_re = None
        # round-4 DPM preset (NFE_STUDY.md group G): when the requested
        # NFE fits the protocol schedule's grid, integrate the SAME
        # discrete cosine T=25 the DDIM protocol samples, with
        # grid-aligned steps (exact lambdas) and a final first-order
        # denoise — at T=25 the solver's t_0 = 1/25 still carries
        # sigma ~= 0.09 of noise, which is what made the round-3 preset
        # lose +44% SAM. Larger NFE falls back to the round-3
        # cosine-T=500 time_uniform configuration.
        protocol_T = 25
        if n_steps <= protocol_T:
            self.dpm_betas = make_beta_schedule("cosine", protocol_T,
                                                cosine_s=8e-3)
            self.dpm_skip, self.dpm_denoise = "grid", True
        else:
            self.dpm_betas = make_beta_schedule("cosine", 500,
                                                cosine_s=8e-3)
            self.dpm_skip, self.dpm_denoise = "time_uniform", False
        self._compiled: "OrderedDict[Tuple[int, int, int], Any]" = \
            OrderedDict()
        self._max_shapes = max_compiled_shapes
        self._lock = threading.Lock()
        self._key = jax.random.PRNGKey(seed)
        # micro-batching: concurrent same-shape requests merge into one
        # padded device batch instead of serializing N sampling programs
        self._microbatch = microbatch
        self._batch_window_s = batch_window_ms / 1000.0
        self._max_merged = max_merged_batch
        self._queue: "queue.Queue" = queue.Queue()
        self._batcher_started = False
        # shape groups dispatch to workers so one shape's cold compile
        # never head-of-line-blocks another shape's traffic (ADVICE r3)
        from concurrent.futures import ThreadPoolExecutor
        self._group_pool = ThreadPoolExecutor(
            max_workers=4, thread_name_prefix="difpan-group")
        # exact H-sharded sampling over `space_shards` devices (beyond-HBM
        # single images; non-divisible sizes auto-padded + cropped)
        self._space_mesh = None
        if space_shards > 0:
            if cond_evict_res is not None:
                # same contract as evaluate(): the H-sharded sampler hoists
                # its own partitioned cond cache — don't silently drop the
                # caller's HBM-budget flag
                raise ValueError(
                    "cond_evict_res is not supported with space_shards "
                    "(the sharded cond cache is already partitioned); "
                    "use one or the other")
            from .parallel import make_mesh
            self._space_mesh = make_mesh(space_shards, axis_name="space")

    def _default_model(self) -> UNetSR3DWT:
        # per-dataset eval config (`diffusion_engine.py:371-393`)
        return UNetSR3DWT(
            in_channel=self.spec.n_channels,
            out_channel=self.spec.n_channels * (2 if self.pred_var else 1),
            lms_channel=self.spec.n_channels,
            pan_channel=self.spec.pan_channels,
            inner_channel=32, norm_groups=1, channel_mults=(1, 2, 2, 4),
            attn_res=(8,), res_blocks=3, dropout=0.2, image_size=64,
            self_condition=True, pred_var=self.pred_var)

    # -- sampling -----------------------------------------------------------

    def _sample_fn(self):
        model, dcfg, sched_re = self.model, self.dcfg, self.sched_re
        dt = self.dtype

        def cast_in(a):
            return a.astype(dt) if a.dtype == jnp.float32 else a

        if self.sampler == "dpm":
            from .solvers import DPMSolver, NoiseScheduleVP, model_wrapper
            ns = NoiseScheduleVP("discrete", betas=self.dpm_betas)
            # NFE accounting: the final denoise is one model eval
            steps = self.n_steps - (1 if self.dpm_denoise else 0)
            order = self.dpm_order

            def sample(params, key, pan, lms, wavelets):
                cond = pack_cond(lms, pan, wavelets)
                cache = model.apply({"params": params}, None, None,
                                    cast_in(cond), cond_only=True,
                                    cache_max_res=self.cond_evict_res)
                cond_in = (cast_in(cond) if self.cond_evict_res is not None
                           else None)

                def x0_model(xx, t_input):
                    out = model.apply({"params": params}, cast_in(xx),
                                      t_input, cond_in, train=False,
                                      cond_cache=cache)
                    if self.pred_var:
                        # learned-variance head: the solver consumes the
                        # mean half only (`gaussian.p_losses._mean_part`)
                        out = jnp.split(out, 2, axis=-1)[0]
                    return out.astype(jnp.float32)

                model_fn = model_wrapper(x0_model, ns, model_type="x_start")
                # same x0 clamp as the DDIM protocol path (dcfg
                # clamp_range): the reference's (-1,1) belongs to its
                # [-1,1]-data pansharpen_model family, not the engine
                # protocol (NFE_STUDY.md round 4: ~9% SAM win)
                solver = DPMSolver(
                    model_fn, ns, algorithm_type="dpmsolver++",
                    correcting_x0_fn=lambda x0, t: jnp.clip(
                        x0, *self.dcfg.clamp_range))
                xT = jax.random.normal(key, lms.shape)
                s = solver.sample(xT, steps=steps, order=order,
                                  method="multistep",
                                  skip_type=self.dpm_skip,
                                  denoise_to_zero=self.dpm_denoise)
                return jnp.clip(s + lms, 0.0, 1.0)

            return sample

        if self.sampler == "x0":
            sig_T, t_top = self._x0_sigma_T, self.n_steps - 1

            def sample(params, key, pan, lms, wavelets):
                cond = pack_cond(lms, pan, wavelets)
                cache = model.apply({"params": params}, None, None,
                                    cast_in(cond), cond_only=True,
                                    cache_max_res=self.cond_evict_res)
                cond_in = (cast_in(cond) if self.cond_evict_res is not None
                           else None)
                xT = jax.random.normal(key, lms.shape) * sig_T
                t = jnp.full((lms.shape[0],), t_top, jnp.int32)
                out = model.apply({"params": params}, cast_in(xT), t,
                                  cond_in, cast_in(jnp.zeros_like(xT)),
                                  train=False, cond_cache=cache)
                if self.pred_var:
                    out = jnp.split(out, 2, axis=-1)[0]
                return jnp.clip(out.astype(jnp.float32) + lms, 0.0, 1.0)

            return sample

        def sample(params, key, pan, lms, wavelets):
            cond = pack_cond(lms, pan, wavelets)
            cache = model.apply({"params": params}, None, None,
                                cast_in(cond), cond_only=True,
                                cache_max_res=self.cond_evict_res)
            cond_in = (cast_in(cond) if self.cond_evict_res is not None
                       else None)

            def model_fn(x, t, c, sc, k):
                # the diffusion state x is f32 (and the solver math stays
                # f32); cast at the model boundary so the UNet runs in the
                # service dtype — the engine's _dtype_casts pattern
                out = model.apply({"params": params}, cast_in(x), t,
                                  cond_in, cast_in(sc), train=False,
                                  cond_cache=cache)
                return out.astype(jnp.float32)

            s = ddim_sample_loop(dcfg, sched_re, model_fn, key, cond)
            return jnp.clip(s + lms, 0.0, 1.0)

        return sample

    def _get_compiled(self, shape: Tuple[int, int, int]):
        # create the jit wrapper under the lock so concurrent first
        # requests for one shape share a single wrapper — jax then
        # deduplicates the (expensive) trace/compile internally instead of
        # two threads compiling the same program twice
        with self._lock:
            fn = self._compiled.get(shape)
            if fn is None:
                if self._space_mesh is not None and self.sampler == "dpm":
                    from .parallel import make_sharded_dpm_sampler
                    fn = make_sharded_dpm_sampler(
                        self.model, self._space_mesh, self.dpm_betas,
                        steps=self.n_steps - (1 if self.dpm_denoise
                                              else 0),
                        order=self.dpm_order, axis_name="space",
                        skip_type=self.dpm_skip,
                        denoise_to_zero=self.dpm_denoise)
                elif self._space_mesh is not None and self.sampler == "x0":
                    raise ValueError(
                        "sampler='x0' with space_shards is not wired — "
                        "NFE=1 has no sampling scan to partition; serve "
                        "it unsharded (25x cheaper than the protocol)")
                elif self._space_mesh is not None:
                    from .parallel import make_sharded_sampler
                    fn = make_sharded_sampler(
                        self.model, self._space_mesh, self.dcfg,
                        self.sched_re, axis_name="space")
                else:
                    fn = jax.jit(self._sample_fn())
                self._compiled[shape] = fn
                while len(self._compiled) > self._max_shapes:
                    self._compiled.popitem(last=False)
            else:
                self._compiled.move_to_end(shape)
            return fn

    def _wavelets_host(self, pan: np.ndarray, lms: np.ndarray) -> np.ndarray:
        """[lms_LL, pan_H, pan_D, pan_V] at half resolution, NHWC — the
        training pipeline's layout (`data/pan_dataset.py`)."""
        lms_chw = np.transpose(lms, (0, 3, 1, 2))
        pan_chw = np.transpose(pan, (0, 3, 1, 2))
        lms_ll, _ = haar_dwt2(lms_chw)
        _, pan_coeffs = haar_dwt2(pan_chw)
        packed = wavelet_cond_pack(lms_ll, pan_coeffs, order="pan")
        return np.transpose(packed, (0, 2, 3, 1)).astype(np.float32)

    def _normalize(self, pan, lms, wavelets):
        """Shared input normalization for sample()/submit(): f32 arrays,
        pan channel dim, dataset channel validation, host wavelets when
        omitted. Idempotent."""
        pan = np.asarray(pan, np.float32)
        lms = np.asarray(lms, np.float32)
        if pan.ndim == 3:
            pan = pan[..., None]
        if lms.ndim != 4 or lms.shape[-1] != self.spec.n_channels:
            raise ValueError(
                f"lms must be (B,H,W,{self.spec.n_channels}) for dataset "
                f"'{self.spec.name}', got {lms.shape}")
        if wavelets is None:
            wavelets = self._wavelets_host(pan, lms)
        return pan, lms, np.asarray(wavelets, np.float32)

    def sample(self, pan: np.ndarray, lms: np.ndarray,
               wavelets: Optional[np.ndarray] = None,
               seed: Optional[int] = None) -> np.ndarray:
        """pan (B,H,W,P), lms (B,H,W,C) in [0,1] -> sr (B,H,W,C) in [0,1]."""
        pan, lms, wavelets = self._normalize(pan, lms, wavelets)
        n_real = pan.shape[0]

        b = _round_up_batch(n_real)

        def pad(a):
            if a.shape[0] == b:
                return a
            return np.concatenate(
                [a, np.repeat(a[-1:], b - a.shape[0], axis=0)], axis=0)

        pan_p, lms_p, wav_p = pad(pan), pad(lms), pad(wavelets)
        fn = self._get_compiled((b, lms.shape[1], lms.shape[2]))
        with self._lock:
            if seed is None:
                self._key, k = jax.random.split(self._key)
            else:
                k = jax.random.PRNGKey(seed)
        # inputs stay f32 — the sampler casts at the model boundary, so the
        # final `sample + lms` add keeps full precision
        args = tuple(jnp.asarray(a, jnp.float32)
                     for a in (pan_p, lms_p, wav_p))
        sr = fn(self.params, k, *args)
        return np.asarray(jax.device_get(sr), np.float32)[:n_real]

    def compiled_shapes(self):
        with self._lock:
            return list(self._compiled.keys())

    # warmup shape cap: 8k x 8k x batch 64 is far beyond any sane request
    # but keeps one unauthenticated GET from allocating unbounded host
    # memory / compiling absurd programs (the same memory-exhaustion guard
    # max_body_bytes gives POST /sample)
    MAX_WARMUP_BATCH = 64
    MAX_WARMUP_HW = 8192

    def warmup(self, batch: int = 1, height: int = 64, width: int = 64
               ) -> Tuple[int, int, int]:
        """Compile (and touch) the sampling program for a request shape
        before real traffic arrives. Returns the pooled compiled shape."""
        if not (1 <= batch <= self.MAX_WARMUP_BATCH
                and 1 <= height <= self.MAX_WARMUP_HW
                and 1 <= width <= self.MAX_WARMUP_HW):
            raise ValueError(
                f"warmup shape out of bounds: batch={batch} (max "
                f"{self.MAX_WARMUP_BATCH}), h={height}/w={width} (max "
                f"{self.MAX_WARMUP_HW})")
        b = _round_up_batch(batch)
        c, p = self.spec.n_channels, self.spec.pan_channels
        pan = np.zeros((b, height, width, p), np.float32)
        lms = np.zeros((b, height, width, c), np.float32)
        self.sample(pan, lms, seed=0)
        return (b, height, width)

    # -- micro-batching ------------------------------------------------------

    class _Pending:
        __slots__ = ("pan", "lms", "wavelets", "event", "result", "error")

        def __init__(self, pan, lms, wavelets):
            self.pan, self.lms, self.wavelets = pan, lms, wavelets
            self.event = threading.Event()
            self.result = None
            self.error: Optional[BaseException] = None

    def _ensure_batcher(self):
        with self._lock:
            if not self._batcher_started:
                t = threading.Thread(target=self._batcher_loop, daemon=True,
                                     name="difpan-microbatcher")
                t.start()
                self._batcher_started = True

    def _batcher_loop(self):
        try:
            while True:
                item = self._queue.get()
                items = [item]
                try:
                    # linger a short window so concurrent requests pile up
                    deadline = time.monotonic() + self._batch_window_s
                    while (sum(p.pan.shape[0] for p in items)
                           < self._max_merged):
                        timeout = deadline - time.monotonic()
                        if timeout <= 0:
                            break
                        try:
                            items.append(self._queue.get(timeout=timeout))
                        except queue.Empty:
                            break
                    # merge per FULL trailing shape (spatial dims AND
                    # channel counts of all three arrays) — so one
                    # malformed request can only fail its own group, never
                    # innocent co-batched clients
                    groups: Dict[Tuple, List] = {}
                    for p in items:
                        key = (p.pan.shape[1:], p.lms.shape[1:],
                               p.wavelets.shape[1:])
                        groups.setdefault(key, []).append(p)
                    chunks: List[List] = []
                    for group in groups.values():
                        # greedy-pack into chunks <= max_merged so merging
                        # never compiles an oversized one-off batch shape
                        chunk: List = []
                        total = 0
                        for p in group:
                            n = p.pan.shape[0]
                            if chunk and total + n > self._max_merged:
                                chunks.append(chunk)
                                chunk, total = [], 0
                            chunk.append(p)
                            total += n
                        if chunk:
                            chunks.append(chunk)
                    # distinct shape groups run on worker threads: a
                    # first-request compile (minutes on TPU) for one shape
                    # must not head-of-line-block other shapes (ADVICE r3)
                    if len(chunks) == 1:
                        self._run_group(chunks[0])
                    else:
                        for c in chunks:
                            self._group_pool.submit(self._run_group, c)
                except BaseException as e:  # noqa: BLE001 — deliver, don't
                    for p in items:         # die: waiters would hang forever
                        if p is not None:   # (stray sentinel-safe)
                            p.error = e
                            p.event.set()
        finally:
            # if the loop ever exits (interpreter teardown, catastrophic
            # error), let the next submit() restart a fresh batcher instead
            # of queueing into a dead thread (ADVICE r3)
            with self._lock:
                self._batcher_started = False

    def _run_group(self, group: List["_Pending"]):
        try:
            pan = np.concatenate([p.pan for p in group], axis=0)
            lms = np.concatenate([p.lms for p in group], axis=0)
            wav = np.concatenate([p.wavelets for p in group], axis=0)
            sr = self.sample(pan, lms, wav)
            off = 0
            for p in group:
                n = p.pan.shape[0]
                p.result = sr[off:off + n]
                off += n
        except BaseException as e:  # noqa: BLE001 — delivered to waiters
            for p in group:
                p.error = e
        finally:
            for p in group:
                p.event.set()

    def submit(self, pan: np.ndarray, lms: np.ndarray,
               wavelets: Optional[np.ndarray] = None,
               seed: Optional[int] = None) -> np.ndarray:
        """Like :meth:`sample`, but concurrent submits of the same spatial
        shape merge into one padded device batch (the serving entry point).

        Requests with an explicit ``seed`` bypass the merger: per-request
        determinism requires a dedicated sampling program.
        """
        if not self._microbatch or seed is not None:
            return self.sample(pan, lms, wavelets, seed=seed)
        pan, lms, wavelets = self._normalize(pan, lms, wavelets)
        self._ensure_batcher()
        item = self._Pending(pan, lms, wavelets)
        self._queue.put(item)
        # liveness: if the batcher thread dies while this item is queued,
        # re-ensure on each wait tick so a fresh batcher picks it up —
        # a submit must never hang on a dead thread (ADVICE r3)
        while not item.event.wait(timeout=2.0):
            self._ensure_batcher()
        if item.error is not None:
            raise item.error
        return item.result


# -- HTTP layer -------------------------------------------------------------


def _make_handler(service: SamplerService, max_body_bytes: int):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, obj: Dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "dataset": service.spec.name,
                    "compiled": [list(s) for s in
                                 service.compiled_shapes()],
                })
            elif self.path.startswith("/warmup"):
                # GET /warmup?batch=4&h=64&w=64 — compile ahead of traffic
                from urllib.parse import parse_qs, urlparse
                q = parse_qs(urlparse(self.path).query)

                def qi(name, default):
                    return int(q[name][0]) if name in q else default
                try:
                    shape = service.warmup(qi("batch", 1), qi("h", 64),
                                           qi("w", 64))
                    self._json(200, {"status": "warm", "shape": list(shape)})
                except ValueError as e:   # out-of-bounds / bad params
                    self._json(400, {"error": str(e)})
                except Exception:
                    log.exception("warmup failed")
                    self._json(500, {"error": "warmup failed (see log)"})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            n = int(self.headers.get("Content-Length", "0"))
            if n > max_body_bytes:
                # drain in bounded chunks (O(1) memory) so the client's
                # write doesn't die on a broken pipe before it can read
                # the 413
                left = n
                while left > 0:
                    got = len(self.rfile.read(min(left, 1 << 20)))
                    if got == 0:   # client hung up mid-upload — EOF, stop
                        break
                    left -= got
                self._json(413, {"error": f"body too large ({n} bytes > "
                                          f"{max_body_bytes} limit)"})
                return
            try:
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                seed = (int(self.headers["X-Seed"])
                        if "X-Seed" in self.headers else None)
                pan, lms = data["pan"], data["lms"]
                wav = data["wavelets"] if "wavelets" in data.files else None
            except Exception as e:  # malformed request — client's fault
                self._json(400, {"error": f"bad request: "
                                          f"{type(e).__name__}: {e}"})
                return
            try:
                try:
                    sr = service.submit(pan, lms, wav, seed=seed)
                except ValueError as e:  # input validation — client error
                    self._json(400, {"error": f"bad request: {e}"})
                    return
                buf = io.BytesIO()
                np.savez_compressed(buf, sr=sr)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npz")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception:  # internal — log server-side, don't leak
                log.error("sample failed:\n%s", traceback.format_exc())
                self._json(500, {"error": "internal error (see server log)"})

    return Handler


def serve(service: SamplerService, port: int = 8500, host: str = "127.0.0.1",
          *, block: bool = True,
          max_body_mb: float = 256.0) -> ThreadingHTTPServer:
    """Start the HTTP server; returns it (daemon-threaded when block=False).

    Request handling is thread-per-connection; concurrent same-shape
    ``/sample`` requests merge into one padded device batch via the
    service's micro-batcher. Bodies above ``max_body_mb`` are rejected
    with 413 (memory-exhaustion guard for non-loopback binds).
    """
    httpd = ThreadingHTTPServer(
        (host, port), _make_handler(service, int(max_body_mb * 1024 * 1024)))
    if block:
        httpd.serve_forever()
    else:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
    return httpd
