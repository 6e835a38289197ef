"""T-LOCO on a Latent Consistency Model: few-step z-space editing.

Counterpart of the reference EditLatentConsistency (src/modules/edit.py:42-479):
4-step LCM sampling with the guidance-scale embedding (w = guidance_scale - 1,
edit.py:118-121, no CFG batch), edit at an integer step index (default 2),
text-supervised prompt-delta directions or unsupervised subspace iteration on
the consistency output through the VAE decoder, null-space projection, walks,
and the SEGA ablation (denoise the tail under the edit prompt).

Execution standard (round 5, matching pipelines/uncond.py — BENCH.md):
fresh modify+null bases fuse into one dual program on the shared Jacobian
(non-semantic path), strip denoise + VAE decode run tile-aligned / DP-sharded
batches, artifact IO overlaps device compute, --mesh_probe shards the probe
axis, --pixel_output pulls on-device uint8 strips, and --vT_path transfers a
saved direction instead of recomputing."""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.core.rng import RngStream
from loco_edit_tpu.diffusion.lcm import LCMGrid, lcm_denoised, lcm_grid, lcm_scan
from loco_edit_tpu.editing import (
    dual_subspace_iteration,
    load_directions,
    normalize_rows,
    null_space_project,
    save_directions,
    subspace_iteration,
    x_space_guidance_strip,
)
from loco_edit_tpu.editing.pullback import padded_probe_count
from loco_edit_tpu.pipelines.common import EngineExec
from loco_edit_tpu.utils.io import save_image_grid, to_uint8_pixels_device


@dataclasses.dataclass
class LCMEditConfig:
    num_inference_steps: int = 4
    edit_t_idx: int = 2
    guidance_scale: float = 7.5
    x_space_guidance_scale: float = 5.0
    x_space_guidance_edit_step: float = 1.0
    x_space_guidance_num_step: int = 1
    vis_num: int = 1
    pca_rank: int = 1
    pca_rank_null: int = 5
    null_space_projection: bool = True
    non_semantic: bool = False
    min_iter: int = 10
    max_iter: int = 50
    convergence_threshold: float = 1e-3
    probe_chunk: int | None = None
    compute_dtype: str = "fp32"  # informs _auto_probe_chunk's HBM default
    scaling_factor: float = 0.18215
    memory_bound: int = 0        # chunk strip denoise batches (0 = off)
    mesh_probe: int = 0          # shard probes over this many devices (0 = off)
    mesh_data: int = 0           # DP-shard the strip frame axis (0 = off)
    pixel_output: bool = False   # on-device uint8 strips (see pipelines/sd.py)
    result_folder: str = "./runs"
    save_images: bool = True
    use_sega: bool = False


class LCMEditPipeline(EngineExec):
    """unet_apply(z, t, context, w) -> eps; decode(z) -> x; prompt_encoder.
    Jit caching, IO overlap, mesh sharding and tile-aligned batching come
    from EngineExec (pipelines/common.py)."""

    def __init__(self, unet_apply, decode, prompt_encoder, cfg: LCMEditConfig,
                 rng: RngStream, latent_shape=(64, 64, 4),
                 grid: LCMGrid | None = None):
        self.cfg = cfg
        self.rng = rng
        self.unet_apply = unet_apply
        self.decode = decode
        self.prompt_encoder = prompt_encoder
        self.latent_shape = latent_shape
        self.grid = grid or lcm_grid(cfg.num_inference_steps)
        self.w = cfg.guidance_scale - 1.0
        # test hook: deterministic inter-step noise for cross-implementation
        # goldens (noise_fn(step_idx, shape, dtype); None = fresh JAX keys)
        self._noise_fn = None
        self._noise_ver = 0
        self._emb_cache: dict[str, jnp.ndarray] = {}
        self._jit_cache: dict = {}
        os.makedirs(cfg.result_folder, exist_ok=True)

    @property
    def noise_fn(self):
        return self._noise_fn

    @noise_fn.setter
    def noise_fn(self, fn):
        # the hook's noise is baked into the traced program as constants, so
        # assigning (or clearing) it must invalidate forward_steps' jit cache:
        # the version counter is part of the cache key below. Superseded
        # hooked traces are EVICTED (they pin device buffers via their baked
        # noise constants; repeated set/clear cycles would otherwise leak a
        # compiled program per assignment).
        self._noise_fn = fn
        self._noise_ver += 1
        self._jit_cache = {k: v for k, v in self._jit_cache.items()
                           if not (k[0] == "fwd" and k[-1] is not None
                                   and k[-1] != self._noise_ver)}

    def emb(self, prompt: str) -> jnp.ndarray:
        if prompt not in self._emb_cache:
            self._emb_cache[prompt] = self.prompt_encoder(prompt)
        return self._emb_cache[prompt]

    def _eps_fn(self, prompt: str) -> Callable:
        ctx = self.emb(prompt)

        def f(z, t):
            c = jnp.broadcast_to(ctx, (z.shape[0],) + ctx.shape[-2:])
            w = jnp.full((z.shape[0],), self.w, z.dtype)
            return self.unet_apply(z, t, c, w)

        return f

    def forward_steps(self, z, prompt: str, start_idx: int = 0,
                      end_idx: int | None = None):
        """(z_next, denoised) over LCM grid steps (edit.py:147-203)."""
        f = self._eps_fn(prompt)
        key = ("fwd", z.shape[0], prompt, start_idx, end_idx,
               self._noise_ver if self._noise_fn is not None else None)
        fn = self._jit(key, lambda: jax.jit(
            lambda zz, k: lcm_scan(f, zz, self.grid, k, start_idx, end_idx,
                                   noise_fn=self.noise_fn)))
        # fresh inter-step noise per call: repeated/chunked forward passes
        # must not share the stochastic consistency-sampler stream
        self._noise_calls = getattr(self, "_noise_calls", 0) + 1
        nk = jax.random.fold_in(self.rng.fork("lcm-noise").key,
                                self._noise_calls - 1)
        return fn(jnp.asarray(z), nk)

    def decode_to_image(self, den) -> np.ndarray:
        fn = self._jit(("dec", den.shape[0]), lambda: jax.jit(
            lambda zz: self.decode(zz / self.cfg.scaling_factor)))
        return np.asarray(fn(jnp.asarray(den)))

    def decode_strips(self, den) -> np.ndarray:
        """Batched strip decode, chunked/DP-sharded; with cfg.pixel_output
        the uint8 PNG-payload conversion fuses into the decode program (4x
        smaller 512px device->host pull — see pipelines/sd.py)."""
        px = self.cfg.pixel_output

        def dec(zz):
            def build():
                def run(z_):
                    img = self.decode(z_ / self.cfg.scaling_factor)
                    return to_uint8_pixels_device(img) if px else img
                return jax.jit(run)
            return self._jit(("dec-strip", zz.shape[0], px), build)(zz)

        return np.asarray(self.run_batched(dec, jnp.asarray(den)))

    def consistency_x0_fn(self, prompt: str, step_idx: int) -> Callable:
        """f(z_t) = decode(denoised(z_t)) at one grid step — the LCM engine's
        get_x0 (edit.py:206-247)."""
        f = self._eps_fn(prompt)
        t = float(self.grid.t[step_idx])

        def g(z):
            eps = f(z, jnp.asarray(t))
            den = lcm_denoised(z, eps, self.grid, step_idx)
            return self.decode(den / self.cfg.scaling_factor)

        return g

    def _probe_chunk(self, probe_sharding) -> int | None:
        # same through-the-decoder pullback as the SD engine -> same 16G HBM
        # ceiling and dtype-dependent default chunk (see pipelines/sd.py);
        # sharded probe batches are never serialized through lax.map
        from loco_edit_tpu.pipelines.sd import _auto_probe_chunk

        if probe_sharding is not None:
            return None
        return _auto_probe_chunk(self.cfg.probe_chunk, self.cfg.compute_dtype)

    def extract_basis(self, zt, prompt: str, mask, rank: int, v_init=None):
        cfg = self.cfg
        g = self.consistency_x0_fn(prompt, cfg.edit_t_idx)
        m = (jnp.ones((1, 1, 1, 1), jnp.float32) if mask is None
             else jnp.asarray(mask, jnp.float32))
        # matched-probe golden runs (v_init) pin the exact probe batch — no
        # padding, no sharding
        probe_sharding = None if v_init is not None else self._probe_sharding()
        chunk = self._probe_chunk(probe_sharding)

        def run(z, mw, key):
            return subspace_iteration(
                g, z, key, rank=rank, mask=mw, min_iter=cfg.min_iter,
                max_iter=cfg.max_iter, tol=cfg.convergence_threshold,
                probe_chunk=chunk, probe_sharding=probe_sharding,
                pad_probes=None if v_init is None else False, v_init=v_init)

        if v_init is not None:   # probe-matched runs: don't cache on stale probes
            fn = jax.jit(run)
        else:
            fn = self._jit(("basis", zt.shape, rank, prompt, mask is not None),
                           lambda: jax.jit(run))
        return fn(jnp.asarray(zt), m, self.rng.fork(f"lcm-probes-{rank}").key)

    def extract_dual_basis(self, zt, prompt: str, mask, rank: int,
                           rank_null: int):
        """Fused modify+null extraction on the shared consistency-through-
        decoder Jacobian (the non-semantic path's two solo runs,
        edit.py:283-369 twice) — probe keys match the solos exactly."""
        cfg = self.cfg
        g = self.consistency_x0_fn(prompt, cfg.edit_t_idx)
        probe_sharding = self._probe_sharding()
        chunk = self._probe_chunk(probe_sharding)

        def run(z, mw, ka, kb):
            return dual_subspace_iteration(
                g, z, ka, kb, rank_a=rank, rank_b=rank_null,
                mask_a=mw, mask_b=(mw == 0).astype(jnp.float32),
                min_iter=cfg.min_iter, max_iter=cfg.max_iter,
                tol=cfg.convergence_threshold, probe_chunk=chunk,
                probe_sharding=probe_sharding)

        fn = self._jit(("dual-basis", zt.shape, rank, rank_null, prompt),
                       lambda: jax.jit(run))
        m = jnp.asarray(np.asarray(mask, np.float32))
        return fn(jnp.asarray(zt), m,
                  self.rng.fork(f"lcm-probes-{rank}").key,
                  self.rng.fork(f"lcm-probes-{rank_null}").key)

    def delta_zt_via_grad(self, zt, for_prompt: str, edit_prompt: str,
                          mask) -> jnp.ndarray:
        """Prompt-delta direction (edit.py:250-280): one VJP of
        <x0(edit) - x0(for), x0_edit(z)>."""
        g_for = self.consistency_x0_fn(for_prompt, self.cfg.edit_t_idx)
        g_edit = self.consistency_x0_fn(edit_prompt, self.cfg.edit_t_idx)
        mw = None if mask is None else jnp.asarray(mask, jnp.float32)

        def run(z):
            delta = g_edit(z) - g_for(z)
            if mw is not None:
                delta = delta * mw.astype(delta.dtype)

            def h(zz):
                y = g_edit(zz)
                if mw is not None:
                    y = y * mw.astype(y.dtype)
                return jnp.sum(delta * y)

            v = jax.grad(h)(z).reshape(1, -1).astype(jnp.float32)
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        fn = self._jit(("delta", zt.shape, for_prompt, edit_prompt,
                        mask is not None), lambda: jax.jit(run))
        return fn(jnp.asarray(zt))

    # -- experiment internals -----------------------------------------------------

    def _resolve_basis(self, zt, for_prompt: str, edit_prompt: str, mask,
                       out_dir: str):
        """Modify direction (subspace iteration or prompt delta) + null-space
        projection; fresh non-semantic modify+null fuse into one dual
        program when their padded probe batches agree."""
        cfg = self.cfg
        mesh_sz = cfg.mesh_probe if cfg.mesh_probe > 1 else None
        use_dual = (
            cfg.non_semantic and cfg.null_space_projection and mask is not None
            and padded_probe_count(cfg.pca_rank, mesh_size=mesh_sz)
            == padded_probe_count(cfg.pca_rank_null, mesh_size=mesh_sz))

        vT_null_pre = None
        if use_dual:
            t0 = time.time()
            basis, nbasis = self.extract_dual_basis(
                zt, for_prompt, mask, cfg.pca_rank, cfg.pca_rank_null)
            vT_modify = jax.block_until_ready(basis.vT)
            vT_null_pre = nbasis.vT
            print(f"power method runtime == {time.time() - t0:.2f}s "
                  f"({int(basis.iters)} iters, fused modify+null)")
        elif cfg.non_semantic:
            t0 = time.time()
            vT_modify = jax.block_until_ready(
                self.extract_basis(zt, for_prompt, mask, cfg.pca_rank).vT)
            print(f"power method runtime == {time.time() - t0:.2f}s")
        else:
            vT_modify = self.delta_zt_via_grad(zt, for_prompt, edit_prompt,
                                               mask)

        if cfg.null_space_projection:
            if mask is None:
                raise ValueError("null-space projection requires a mask")
            vT_null = (vT_null_pre if vT_null_pre is not None
                       else self.extract_basis(zt, for_prompt,
                                               ~np.asarray(mask, bool),
                                               cfg.pca_rank_null).vT)
            vT = null_space_project(vT_modify, vT_null, cfg.pca_rank_null)
        else:
            vT = normalize_rows(vT_modify)
        self._submit_io(save_directions,
                        os.path.join(out_dir, "basis", "vT.npz"),
                        np.asarray(vT))
        return vT

    def _render_strip(self, zt, for_prompt: str, vT, out_dir: str):
        """Walk + completion consistency steps + decode: one tile-aligned
        chunked / DP-sharded denoise and one batched decode."""
        cfg = self.cfg
        strip = x_space_guidance_strip(
            jnp.asarray(zt), vT[0], scale=cfg.x_space_guidance_scale,
            edit_step=cfg.x_space_guidance_edit_step,
            num_steps=cfg.x_space_guidance_num_step, vis_num=cfg.vis_num)
        den = self.run_batched(
            lambda ss: self.forward_steps(ss, for_prompt,
                                          cfg.edit_t_idx, None)[1], strip)
        img = self.decode_strips(den)
        if cfg.save_images:
            self._submit_io(save_image_grid, img, os.path.join(
                out_dir, f"edit-lcm-idx{cfg.edit_t_idx}.png"))
        return img, den

    # -- experiments --------------------------------------------------------------

    def run_edit_null_space_projection_zt(
            self, for_prompt: str, edit_prompt: str = "", zT=None,
            mask=None, sample_name: str = "sample",
            vT_path: str | None = None) -> dict:
        """The LCM experiment (reference edit.py:373-470). vT_path loads a
        saved direction file instead of computing (direction transfer)."""
        cfg = self.cfg
        h, w, c = self.latent_shape
        if zT is None:
            zT = jax.random.normal(self.rng.fork("zT").key, (1, h, w, c))
        out_dir = os.path.join(cfg.result_folder, sample_name)
        os.makedirs(out_dir, exist_ok=True)

        zt, _den = self.forward_steps(zT, for_prompt, 0, cfg.edit_t_idx)

        if cfg.use_sega:
            _, den = self.forward_steps(zt, edit_prompt, cfg.edit_t_idx, None)
            img = self.decode_to_image(den)
            if cfg.save_images:
                save_image_grid(img, os.path.join(out_dir, "sega.png"))
            return {"image": img}

        if vT_path:
            vT = jnp.asarray(load_directions(vT_path)[0])
        else:
            vT = self._resolve_basis(zt, for_prompt, edit_prompt, mask,
                                     out_dir)

        img, den = self._render_strip(zt, for_prompt, vT, out_dir)
        self.flush_io()
        return {"zt": np.asarray(zt), "vT": np.asarray(vT), "image": img,
                "denoised": np.asarray(den), "out_dir": out_dir}

    def run_edit_batch(
            self, for_prompt: str, edit_prompt: str = "", zTs=None,
            masks: np.ndarray | None = None,
            sample_names: list[str] | None = None) -> list[dict]:
        """Throughput form over N seeds (matches the uncond/SD engines'
        run_edit_batch): ONE batched consistency-forward program runs every
        sample to edit_t_idx; basis/strip programs are reused across
        samples."""
        cfg = self.cfg
        n = zTs.shape[0]
        zts, _ = self.forward_steps(self.shard_samples(zTs), for_prompt,
                                    0, cfg.edit_t_idx)
        zts = jnp.asarray(zts)[:n]
        names = sample_names or [f"batch{i:03d}" for i in range(n)]
        results = []
        for i in range(n):
            out_dir = os.path.join(cfg.result_folder, names[i])
            os.makedirs(out_dir, exist_ok=True)
            # all-False row == maskless sample (see pipelines/sd.py
            # run_edit_batch): a zero mask weight would NaN the direction
            mask_i = (masks[i:i + 1] if masks is not None
                      and np.asarray(masks[i]).any() else None)
            vT = self._resolve_basis(zts[i:i + 1], for_prompt, edit_prompt,
                                     mask_i, out_dir)
            img, den = self._render_strip(zts[i:i + 1], for_prompt, vT,
                                          out_dir)
            results.append({"zt": np.asarray(zts[i:i + 1]),
                            "vT": np.asarray(vT), "image": img,
                            "denoised": np.asarray(den), "out_dir": out_dir})
        self.flush_io()
        return results
