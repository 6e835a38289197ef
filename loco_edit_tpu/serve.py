"""Warm-pipeline edit server — all four engines.

The editing workflow's cost profile is cold-start dominated: the first
flagship edit pays ~minutes of XLA compilation + executable loads (SD 810 s /
LCM 944 s / IF 448 s cold through the tunnel — BENCH.md), while a warm
pipeline serves the same edit in seconds. This module keeps ONE warm edit
pipeline (jit caches + basis disk cache) behind a minimal HTTP API, so
interactive editing front-ends get steady-state latency. The engine follows
the CLI flags: --model_name picks uncond / SD / LCM / DeepFloyd-IF exactly as
cli.main does. Requests serialize through a lock (one chip, one compute
stream); scale-out is one process per chip behind any HTTP balancer.

  POST /edit    uncond: {"seed": int | "image": <b64 f32 NHWC bytes>,
                 "pixel": bool? (default true: uint8 PNG payload),
                 "mask_bbox": [y0, y1, x0, x1] | null,
                 "pca_rank": int?, "sample_name": str?}
                T2I engines add: {"for_prompt": str (required),
                 "edit_prompt": str?, "semantic": bool? (default: true iff
                 an edit_prompt is given — text-supervised direction; false
                 = unsupervised power iteration)}; "seed" seeds zT/xT; the
                 mask_bbox is in DECODED-image pixel coordinates for SD/LCM
                 (the pullback output space) and 64px pixel space for IF.
             -> {"strips": {pc: <b64 bytes>}, "shape": [...], "dtype": "float32"
                 | "uint8" (with "pixel": true — on-device PNG-payload
                 conversion, 4x smaller pull+response),
                 "null_space_projection": bool (false = maskless fallback to
                 the unprojected basis), "secs": float}
  POST /edit_batch {"items": [{"seed" | "image", "mask_bbox"?, "sample_name"?},
                 ...], "pixel": bool?, "pca_rank": int?
                 (+ top-level "for_prompt"/"edit_prompt"/"semantic" for
                 SD/LCM; IF has no batch API)}
             -> {"results": [<per-item /edit payload>],
                 "null_space_projection": bool, "secs": float}
                (throughput form: ONE batched inversion/generation program
                for the whole set — see run_edit_batch in
                pipelines/{uncond,sd,lcm}.py; projection is a whole-batch
                property, so ONE item without "mask_bbox" downgrades the
                batch to the unprojected basis — the response flag,
                batch-level and per item, says which basis was used)
  POST /invert  {"image": <b64>, "refine_steps": int?}   (uncond + SD;
                exact-inversion fixed-point depth; default = server
                --inv_refine_steps)
             -> {"xT": <b64>, "shape": [...]}
  POST /segment {"image": <b64>, "filter_mask": int?, "points_per_side": int?}
             -> {"masks": <b64 uint8 (N, H, W)>, "shape": [...]}   (all-TPU SAM)
  GET  /health  -> {"ok": true, "engine": "...", "edits_served": n}

Run: python -m loco_edit_tpu.serve --model_name FFHQ_P2 \
         --checkpoint_path ffhq_p2.pt --port 8787 [+ any cli.args flags]
  or: python -m loco_edit_tpu.serve --model_name stable-diffusion-2-1-base \
         --checkpoint_path sd21_unet.safetensors --for_prompt "a photo" ...
"""

from __future__ import annotations

import base64
import contextlib
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _b64(a: np.ndarray) -> str:
    a = np.asarray(a)
    if a.dtype != np.uint8:   # floats normalize to f32; uint8 pixels pass through
        a = np.ascontiguousarray(a, np.float32)
    return base64.b64encode(np.ascontiguousarray(a).tobytes()).decode()


def _unb64(s: str, shape) -> np.ndarray:
    return np.frombuffer(base64.b64decode(s), np.float32).reshape(shape).copy()


class EditService:
    """The warm pipeline + request logic (transport-agnostic, used directly
    in tests and wrapped by the HTTP handler below)."""

    def __init__(self, args):
        if getattr(args, "is_stable_diffusion", False):
            self.engine = "sd"
        elif getattr(args, "is_LCM", False):
            self.engine = "lcm"
        elif getattr(args, "is_DeepFloyd_IF_diffusion", False):
            self.engine = "if"
        else:
            self.engine = "uncond"

        if self.engine == "uncond":
            from loco_edit_tpu.cli.main import build_uncond_pipeline

            self.pipe, self.denoiser, self.rng = build_uncond_pipeline(args)
            self.sample_shape = self.denoiser.sample_shape   # input space
            self.mask_shape = (1,) + self.sample_shape       # mask space
        else:
            from loco_edit_tpu.cli.main import (build_if_pipeline,
                                                build_lcm_pipeline,
                                                build_sd_pipeline)

            builder = {"sd": build_sd_pipeline, "lcm": build_lcm_pipeline,
                       "if": build_if_pipeline}[self.engine]
            self.pipe, self.bundle, self.rng = builder(args)
            self.denoiser = None
            if self.engine == "if":
                # IF edits pixels directly: input == mask space
                self.sample_shape = self.bundle["sample_shape"]
                self.mask_shape = (1,) + self.sample_shape
            else:
                # SD/LCM: the seed samples zT in latent space, but the
                # pullback output (and hence the mask) lives in the DECODED
                # image space — derive its shape without running the VAE
                import jax
                import jax.numpy as jnp

                self.sample_shape = self.bundle["latent_shape"]
                img = jax.eval_shape(
                    self.pipe.decode,
                    jax.ShapeDtypeStruct((1,) + self.sample_shape,
                                         jnp.float32))
                self.mask_shape = tuple(img.shape)
        self.lock = threading.Lock()
        self.edits_served = 0
        self._args = args
        self._sam = None        # SamFlaxBundle, converted on first use
        # separate init lock: the first-time SAM torch load + conversion can
        # take minutes and must not stall /edit and /invert requests, which
        # only contend on self.lock
        self._sam_lock = threading.Lock()

    def _sam_bundle(self):
        with self._sam_lock:
            if self._sam is None:
                from transformers import SamModel

                from loco_edit_tpu.masks.sam import prepare_sam_flax

                model = SamModel.from_pretrained(
                    self._args.mask_model_name,
                    cache_dir=getattr(self._args, "cache_folder", None) or None,
                ).eval()
                # only the converted Flax bundle is kept warm — the ~1.2 GB
                # torch model is dropped right after conversion
                self._sam = prepare_sam_flax(model)
            return self._sam

    def _resolve_input(self, req: dict):
        import jax

        h, w, c = self.sample_shape
        if "image" in req and req["image"]:
            if self.engine in ("sd", "lcm"):
                raise ValueError(
                    'SD/LCM /edit takes "seed" (zT); use /invert for images')
            x0 = _unb64(req["image"], (1, h, w, c))
            return x0, None
        seed = int(req.get("seed", 0))
        xT = np.asarray(jax.random.normal(
            jax.random.key(seed), (1, h, w, c), "float32"))
        return None, xT

    def _bbox_mask(self, req: dict) -> np.ndarray | None:
        """Boolean mask from a [y0, y1, x0, x1] bbox in the engine's mask
        space (sample pixels for uncond/IF, decoded-image pixels for SD/LCM)."""
        if not req.get("mask_bbox"):
            return None
        y0, y1, x0_, x1 = req["mask_bbox"]
        mask = np.zeros(self.mask_shape, bool)
        mask[:, y0:y1, x0_:x1, :] = True
        return mask

    def _cache_name(self, req: dict, rank: int) -> str:
        """Basis caches are disk-keyed by sample_name (pipelines/uncond.py),
        so the default name must be a function of everything that determines
        the basis — input (seed or image bytes), mask, prompts, and rank —
        or a second request would silently reuse the first request's
        directions."""
        if req.get("sample_name"):
            return str(req["sample_name"])
        import hashlib

        ident = {k: req.get(k) for k in ("seed", "image", "mask_bbox",
                                         "for_prompt", "edit_prompt",
                                         "semantic")}
        digest = hashlib.sha1(
            json.dumps(ident, sort_keys=True).encode()).hexdigest()[:16]
        return f"serve-{digest}-r{rank}"

    @contextlib.contextmanager
    def _cfg_overrides(self, **kv):
        """Per-request pipeline-config overrides, restored on exit (the warm
        pipeline is shared state; requests serialize through self.lock)."""
        cfg = self.pipe.cfg
        old = {k: getattr(cfg, k) for k in kv}
        for k, v in kv.items():
            setattr(cfg, k, v)
        try:
            yield
        finally:
            for k, v in old.items():
                setattr(cfg, k, v)

    @staticmethod
    def _pixel_flag(req: dict) -> bool:
        # "pixel": strips return as uint8 pixels converted ON DEVICE (4x
        # smaller device pull AND response payload). Default TRUE on the
        # serve path — the strips are the PNG payload for an HTTP client;
        # "pixel": false opts back into raw float strips (the library API's
        # default, which golden tests compare)
        px = req.get("pixel", True)
        if not isinstance(px, bool):   # reject "false"/1/...: a string
            raise ValueError('"pixel" must be a JSON boolean')
        return px

    @staticmethod
    def _strip_payload(strips: dict) -> dict:
        first = next(iter(strips.values()))
        return {"strips": {str(pc): _b64(s) for pc, s in strips.items()},
                "shape": list(first.shape), "dtype": str(first.dtype)}

    @staticmethod
    def _semantic_flag(req: dict) -> bool:
        """Text-supervised direction iff an edit_prompt is given, unless the
        client says otherwise ("semantic": bool)."""
        if "semantic" in req:
            if not isinstance(req["semantic"], bool):
                raise ValueError('"semantic" must be a JSON boolean')
            return req["semantic"]
        return bool(req.get("edit_prompt"))

    def _t2i_prompts(self, req: dict) -> tuple[str, str]:
        fp = req.get("for_prompt")
        if not fp or not isinstance(fp, str):
            raise ValueError(f'"{self.engine}" engine requires "for_prompt"')
        return fp, str(req.get("edit_prompt") or "")

    def _edit_t2i(self, req: dict) -> dict:
        """One warm T2I edit (SD / LCM / IF). The engines' own run_* methods
        do the work; this adapts the request (seeded zT/xT, bbox mask in
        the pullback output space, semantic switch) and normalizes the
        response to the /edit strips payload."""
        for_prompt, edit_prompt = self._t2i_prompts(req)
        semantic = self._semantic_flag(req)
        px = self._pixel_flag(req)
        mask = self._bbox_mask(req)
        _, zT = self._resolve_input(req)
        rank = int(req.get("pca_rank") or self.pipe.cfg.pca_rank)
        name = self._cache_name(req, rank)
        with self.lock:
            t0 = time.perf_counter()
            nsp = (self.pipe.cfg.null_space_projection and mask is not None)
            over = dict(pixel_output=px, pca_rank=rank,
                        null_space_projection=nsp)
            if self.engine == "sd":
                over["vis_num_pc"] = rank
            if self.engine == "lcm":
                over["non_semantic"] = not semantic
            with self._cfg_overrides(**over):
                if self.engine == "sd":
                    out = self.pipe.run_edit_null_space_projection_zt(
                        for_prompt, edit_prompt, zT=zT, mask=mask,
                        sample_name=name, semantic=semantic)
                    strips = out["strips"]
                elif self.engine == "lcm":
                    out = self.pipe.run_edit_null_space_projection_zt(
                        for_prompt, edit_prompt, zT=zT, mask=mask,
                        sample_name=name)
                    strips = {0: out["image"]}
                else:   # if
                    out = self.pipe.run_edit_null_space_projection_xt(
                        for_prompt, edit_prompt, xT=zT, mask=mask,
                        sample_name=name, semantic=semantic)
                    strips = {0: out["image"]}
            secs = time.perf_counter() - t0
            self.edits_served += 1
        return {**self._strip_payload(strips),
                "null_space_projection": nsp, "secs": round(secs, 3)}

    def edit(self, req: dict) -> dict:
        if self.engine != "uncond":
            return self._edit_t2i(req)
        mask = self._bbox_mask(req)
        x0, xT = self._resolve_input(req)
        px = self._pixel_flag(req)
        rank = int(req.get("pca_rank") or self.pipe.cfg.pca_rank)
        name = self._cache_name(req, rank)
        with self.lock:
            t0 = time.perf_counter()
            # API contract: one strip per requested principal component;
            # null-space projection needs a mask — maskless requests fall
            # back to the unprojected basis (signalled in the response)
            nsp = (self.pipe.cfg.null_space_projection and mask is not None)
            with self._cfg_overrides(
                    pixel_output=px, pca_rank=rank, vis_num_pc=rank,
                    null_space_projection=nsp):
                out = self.pipe.run_edit_null_space_projection(
                    x0=x0, xT=xT, mask=mask, sample_name=name)
            secs = time.perf_counter() - t0
            self.edits_served += 1
        return {**self._strip_payload(out["strips"]),
                "null_space_projection": nsp, "secs": round(secs, 3)}

    def edit_batch(self, req: dict) -> dict:
        """Throughput form: resolve every item, then run ONE batched
        inversion program (all image items together) and one batched forward
        via pipelines/uncond.py run_edit_batch. Mask semantics follow /edit
        per item — but null-space projection is a whole-batch property, so
        one maskless item switches the entire batch to the unprojected
        basis (documented in the module header)."""
        items = req.get("items")
        if not isinstance(items, list) or not items:
            raise ValueError('"items" must be a non-empty list')
        if self.engine == "if":
            raise ValueError("the IF engine has no batch API (cascade); "
                             "POST items to /edit individually")
        px = self._pixel_flag(req)
        h, w, c = self.sample_shape
        mh, mw, mc = self.mask_shape[1:]
        rank = int(req.get("pca_rank") or self.pipe.cfg.pca_rank)
        n = len(items)

        xTs = np.zeros((n, h, w, c), np.float32)
        masks = np.zeros((n, mh, mw, mc), bool)
        img_rows, img_stack, names = [], [], []
        all_masked = True
        for i, it in enumerate(items):
            if not isinstance(it, dict):
                raise ValueError('"items" entries must be objects')
            x0, xT = self._resolve_input(it)
            if x0 is not None:
                img_rows.append(i)
                img_stack.append(x0[0])
            else:
                xTs[i] = xT[0]
            if it.get("mask_bbox"):
                y0, y1, x0_, x1 = it["mask_bbox"]
                masks[i, y0:y1, x0_:x1, :] = True
            else:
                # all-ones == extract_basis's maskless path bit-for-bit
                # (pipelines/uncond.py:200-201)
                masks[i] = True
                all_masked = False
            names.append(it.get("sample_name") or self._cache_name(it, rank))

        if self.engine in ("sd", "lcm"):
            return self._edit_batch_t2i(req, xTs, masks, names, all_masked,
                                        px, rank)

        with self.lock:
            t0 = time.perf_counter()
            # projection is a whole-batch property: one maskless item
            # downgrades the batch to the unprojected basis, so the response
            # carries the flag (batch-level AND per item) rather than
            # relying on the module-docstring caveat alone
            nsp = self.pipe.cfg.null_space_projection and all_masked
            with self._cfg_overrides(
                    pixel_output=px, pca_rank=rank, vis_num_pc=rank,
                    null_space_projection=nsp):
                if img_rows:   # ONE inversion program for every image item
                    inv = np.asarray(self.pipe.invert(
                        np.stack(img_stack).astype(np.float32)))
                    xTs[img_rows] = inv
                results = self.pipe.run_edit_batch(
                    xTs=xTs, masks=masks, sample_names=names)
            secs = time.perf_counter() - t0
            self.edits_served += n
        return {"results": [
                    {**self._strip_payload(r["strips"]),
                     "null_space_projection": nsp} for r in results],
                "null_space_projection": nsp, "secs": round(secs, 3)}

    def _edit_batch_t2i(self, req, zTs, masks, names, all_masked, px, rank):
        """SD/LCM throughput form: ONE batched generation program runs every
        seed to edit_t (pipelines/{sd,lcm}.py run_edit_batch)."""
        for_prompt, edit_prompt = self._t2i_prompts(req)
        semantic = self._semantic_flag(req)
        with self.lock:
            t0 = time.perf_counter()
            nsp = self.pipe.cfg.null_space_projection and all_masked
            over = dict(pixel_output=px, pca_rank=rank,
                        null_space_projection=nsp)
            if self.engine == "sd":
                over["vis_num_pc"] = rank
            if self.engine == "lcm":
                over["non_semantic"] = not semantic
            with self._cfg_overrides(**over):
                if self.engine == "sd":
                    results = self.pipe.run_edit_batch(
                        for_prompt, edit_prompt, zTs=zTs, masks=masks,
                        sample_names=names, semantic=semantic)
                    payloads = [self._strip_payload(r["strips"])
                                for r in results]
                else:
                    results = self.pipe.run_edit_batch(
                        for_prompt, edit_prompt, zTs=zTs, masks=masks,
                        sample_names=names)
                    payloads = [self._strip_payload({0: r["image"]})
                                for r in results]
            secs = time.perf_counter() - t0
            self.edits_served += len(names)
        return {"results": [{**p, "null_space_projection": nsp}
                            for p in payloads],
                "null_space_projection": nsp, "secs": round(secs, 3)}

    def invert(self, req: dict) -> dict:
        if self.engine in ("lcm", "if"):
            raise ValueError(f"the {self.engine} engine has no inversion "
                             "path (reference parity)")
        # uncond inverts in sample space; SD through the VAE encoder from
        # decoded-image space (pipelines/sd.py invert)
        shape = ((1,) + self.sample_shape if self.engine == "uncond"
                 else self.mask_shape)
        h, w, c = shape[1:]
        x0 = _unb64(req["image"], (1, h, w, c))
        with self.lock:
            old = self.pipe.cfg.inv_refine_steps
            if "refine_steps" in req:  # per-request exact-inversion depth
                self.pipe.cfg.inv_refine_steps = int(req["refine_steps"])
            try:
                xT = np.asarray(self.pipe.invert(x0))
            finally:
                self.pipe.cfg.inv_refine_steps = old
        return {"xT": _b64(xT), "shape": list(xT.shape)}

    def segment(self, req: dict) -> dict:
        """All-TPU SAM mask proposals for an edit-frame image (params are
        converted once and kept warm, like the edit pipeline)."""
        from loco_edit_tpu.masks.sam import segment_image_flax_encoder
        from loco_edit_tpu.utils.io import to_uint8

        # masks live in the engine's decoded-image space (== sample space
        # for uncond/IF)
        h, w, c = self.mask_shape[1:]
        x0 = _unb64(req["image"], (1, h, w, c))
        # bundle conversion happens OUTSIDE the edit lock (its own init
        # lock); only the device work below contends with /edit
        bundle = self._sam_bundle()
        with self.lock:
            masks = segment_image_flax_encoder(
                to_uint8(x0)[0], prepared=bundle, resolution=h,
                filter_mask=int(req.get("filter_mask", 100)),
                points_per_side=int(req.get("points_per_side", 32)))
        payload = base64.b64encode(
            np.ascontiguousarray(masks, np.uint8).tobytes()).decode()
        return {"masks": payload, "shape": list(masks.shape)}

    def health(self) -> dict:
        return {"ok": True, "engine": self.engine,
                "edits_served": self.edits_served}


def make_server(service: EditService, port: int = 8787) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                return self._send(200, service.health())
            return self._send(404, {"error": "unknown path"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/edit":
                    return self._send(200, service.edit(req))
                if self.path == "/edit_batch":
                    return self._send(200, service.edit_batch(req))
                if self.path == "/invert":
                    return self._send(200, service.invert(req))
                if self.path == "/segment":
                    return self._send(200, service.segment(req))
                return self._send(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001 — report, keep serving
                return self._send(500, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None):
    import argparse

    from loco_edit_tpu.cli.args import parse_args, preset

    from loco_edit_tpu.core.cache import enable_compile_cache

    outer = argparse.ArgumentParser("loco-edit-tpu serve", add_help=False)
    outer.add_argument("--port", type=int, default=8787)
    port_args, rest = outer.parse_known_args(argv)

    # persistent compile cache: a server restart with unchanged shapes warms
    # from disk in seconds instead of re-paying the 400-950 s cold compile
    cache_dir = enable_compile_cache()
    if cache_dir:
        print(f"compile cache: {cache_dir}", flush=True)

    args = preset(parse_args(rest))
    service = EditService(args)
    # warm the compile caches before accepting traffic
    print(f"warming {service.engine} pipeline "
          "(first compile may take minutes on TPU)...", flush=True)
    warm = {"seed": 0, "sample_name": "warmup"}
    if service.engine != "uncond":
        warm["for_prompt"] = args.for_prompt or "a photo"
        warm["edit_prompt"] = args.edit_prompt or ""
    # Long cold compiles can hit transient backend drops (remote-compile
    # services close idle/long connections); each retry resumes from the
    # programs already landed in the persistent compile cache.
    for attempt in range(3):
        try:
            service.edit(warm)
            break
        except Exception as e:  # noqa: BLE001 — transient backend failures
            if attempt == 2 or "UNAVAILABLE" not in str(e):
                raise
            print(f"warm-up compile attempt {attempt + 1} failed "
                  f"({e}); retrying...", flush=True)
    srv = make_server(service, port_args.port)
    print(f"serving on 127.0.0.1:{port_args.port}", flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
