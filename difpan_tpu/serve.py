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
import threading
from collections import OrderedDict
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional, Tuple

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
        dtype: str = "float32",
        max_compiled_shapes: int = 8,
        seed: int = 0,
        pred_var: bool = False,
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
        self.sched_re, _ = respace(
            schedule_from_betas(
                make_beta_schedule("cosine", n_steps, cosine_s=8e-3)),
            section_counts)
        self._compiled: "OrderedDict[Tuple[int, int, int], Any]" = \
            OrderedDict()
        self._max_shapes = max_compiled_shapes
        self._lock = threading.Lock()
        self._key = jax.random.PRNGKey(seed)

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

        def sample(params, key, pan, lms, wavelets):
            cond = pack_cond(lms, pan, wavelets)
            cache = model.apply({"params": params}, None, None,
                                cast_in(cond), cond_only=True)

            def model_fn(x, t, c, sc, k):
                # the diffusion state x is f32 (and the solver math stays
                # f32); cast at the model boundary so the UNet runs in the
                # service dtype — the engine's _dtype_casts pattern
                out = model.apply({"params": params}, cast_in(x), t, None,
                                  cast_in(sc), train=False,
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

    def sample(self, pan: np.ndarray, lms: np.ndarray,
               wavelets: Optional[np.ndarray] = None,
               seed: Optional[int] = None) -> np.ndarray:
        """pan (B,H,W,P), lms (B,H,W,C) in [0,1] -> sr (B,H,W,C) in [0,1]."""
        pan = np.asarray(pan, np.float32)
        lms = np.asarray(lms, np.float32)
        if pan.ndim == 3:
            pan = pan[..., None]
        n_real = pan.shape[0]
        if wavelets is None:
            wavelets = self._wavelets_host(pan, lms)
        wavelets = np.asarray(wavelets, np.float32)

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


# -- HTTP layer -------------------------------------------------------------


def _make_handler(service: SamplerService):
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
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = np.load(io.BytesIO(self.rfile.read(n)),
                               allow_pickle=False)
                seed = (int(self.headers["X-Seed"])
                        if "X-Seed" in self.headers else None)
                sr = service.sample(
                    data["pan"], data["lms"],
                    data["wavelets"] if "wavelets" in data.files else None,
                    seed=seed)
                buf = io.BytesIO()
                np.savez_compressed(buf, sr=sr)
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "application/x-npz")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # surface the error to the client
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: SamplerService, port: int = 8500, host: str = "127.0.0.1",
          *, block: bool = True) -> ThreadingHTTPServer:
    """Start the HTTP server; returns it (daemon-threaded when block=False).

    Note: request handling is thread-per-connection but device work is
    serialized by the service lock + jax dispatch; a single chip serves one
    sampling program at a time.
    """
    httpd = ThreadingHTTPServer((host, port), _make_handler(service))
    if block:
        httpd.serve_forever()
    else:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
    return httpd
