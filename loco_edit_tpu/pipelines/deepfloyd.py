"""T-LOCO on DeepFloyd-IF: pixel-space cascade editing engine.

Counterpart of the reference EditDeepFloydIF (src/modules/edit.py:1198-2028):
stage-1 64px pixel-space editing with the full 8-mode CFG combiner and
learned-sigma channel splits (edit.py:1286-1373), t_max=990 linspace scheduler
(src/utils/utils.py:159-170), direct prompt-difference directions WITHOUT a
Jacobian (get_v_modify, edit.py:1722-1741) or the prompt-delta Jacobian
(get_delta_xt_via_grad, edit.py:1679-1720) or the subspace iteration, DiffEdit
masks from epsilon differences (edit.py:1394-1407), the masked-DiffEdit
ablation sampler (MaskedDDPMforwardsteps, edit.py:1485-1563), and a
superresolution hook for the stage-2 upscaler (edit.py:1375-1392; the
reference disables stage 3).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.core.rng import RngStream
from loco_edit_tpu.diffusion import LinspaceDDIM
from loco_edit_tpu.diffusion.sampling import ddim_scan
from loco_edit_tpu.diffusion.scheduler import ddim_step
from loco_edit_tpu.editing import (
    dual_subspace_iteration,
    load_directions,
    mask_cache_tag,
    normalize_rows,
    null_space_project,
    save_directions,
    subspace_iteration,
    x_space_guidance_strip,
)
from loco_edit_tpu.editing.cfg import cfg_eps, perpendicular_component
from loco_edit_tpu.editing.pullback import padded_probe_count
from loco_edit_tpu.masks.diffedit import diffedit_mask
from loco_edit_tpu.pipelines.common import EngineExec
from loco_edit_tpu.utils.io import save_image_grid, to_uint8_pixels_device


@dataclasses.dataclass
class IFEditConfig:
    for_steps: int = 100
    edit_t: float = 0.75
    t_max: int = 990
    guidance_scale: float = 7.0
    guidance_scale_edit: float = 4.0
    x_space_guidance_scale: float = 1.0
    x_space_guidance_edit_step: float = 1.0
    x_space_guidance_num_step: int = 4
    vis_num: int = 2
    pca_rank: int = 1
    pca_rank_null: int = 5
    null_space_projection: bool = True
    tilda_v_score_type: str = "(for-edit)-direct"
    jacobian: bool = False
    min_iter: int = 10
    max_iter: int = 50
    convergence_threshold: float = 1e-3
    probe_chunk: int | None = None
    memory_bound: int = 0        # chunk strip denoise batches (0 = off)
    mesh_probe: int = 0          # shard probes over this many devices (0 = off)
    mesh_data: int = 0           # DP-shard the strip frame axis (0 = off)
    pixel_output: bool = False   # on-device uint8 strips (see pipelines/sd.py)
    result_folder: str = "./runs"
    save_images: bool = True


class IFEditPipeline(EngineExec):
    """unet_apply(x, t, context) -> (B,H,W,2C) with learned sigma channels,
    prompt_encoder str -> (1, seq, dim) T5 states, superres: optional callable
    (images, prompt) -> upscaled images (the stage-2 hook). Jit caching, IO
    overlap, mesh sharding and tile-aligned batching come from EngineExec
    (pipelines/common.py)."""

    def __init__(self, unet_apply, prompt_encoder, cfg: IFEditConfig,
                 rng: RngStream, sample_shape=(64, 64, 3), superres=None,
                 scheduler: LinspaceDDIM | None = None):
        self.cfg = cfg
        self.rng = rng
        self.sample_shape = sample_shape
        c = sample_shape[-1]
        # IF stage-1 predicts [eps | sigma]: the CFG combiner operates on the
        # eps half (the reference splits per chunk, edit.py:1328-1335 —
        # algebraically identical to splitting first)
        self.unet_apply = lambda x, t, ctx: unet_apply(x, t, ctx)[..., :c]
        self.prompt_encoder = prompt_encoder
        self.superres = superres
        # IF checkpoints are trained on squaredcos_cap_v2 (the diffusers
        # cosine table, 1000 entries); the reference keeps the checkpoint
        # scheduler's alphas_cumprod (utils.py:159-170)
        self.scheduler = scheduler or LinspaceDDIM(
            t_max=cfg.t_max, noise_schedule="squaredcos_cap_v2")
        self.gen_grid = self.scheduler.generation_grid(cfg.for_steps)
        self.edit_t_idx = self.scheduler.nearest_step_index(cfg.for_steps, cfg.edit_t)
        self._emb_cache: dict[str, jnp.ndarray] = {}
        self._jit_cache: dict = {}
        os.makedirs(cfg.result_folder, exist_ok=True)

    def emb(self, prompt: str) -> jnp.ndarray:
        if prompt not in self._emb_cache:
            self._emb_cache[prompt] = self.prompt_encoder(prompt)
        return self._emb_cache[prompt]

    def prompt_set(self, for_prompt: str, edit_prompt: str = "") -> dict:
        return {"for": self.emb(for_prompt), "edit": self.emb(edit_prompt),
                "null": self.emb("")}

    def _eps_fn(self, prompts: dict, mode: str) -> Callable:
        enabled = self.cfg.guidance_scale > 1.0
        return lambda x, t: cfg_eps(
            self.unet_apply, x, t, prompts, mode, self.cfg.guidance_scale,
            self.cfg.guidance_scale_edit, enabled=enabled)

    def forward_steps(self, xt, prompts: dict, mode: str, start_idx: int = 0,
                      end_idx: int | None = None) -> jnp.ndarray:
        grid = self.gen_grid.slice(
            start_idx, len(self.gen_grid) if end_idx in (None, -1) else end_idx)
        fn = self._jit(("fwd", xt.shape[0], mode, start_idx, end_idx),
                       lambda: jax.jit(lambda x, f=self._eps_fn(prompts, mode),
                                       g=grid: ddim_scan(f, x, g)))
        return fn(jnp.asarray(xt))

    def masked_forward_steps(self, xt, prompts: dict, mask,
                             start_idx: int = 0, end_idx: int | None = None):
        """DiffEdit ablation sampler: per step, blend the edit-guided and
        for-guided DDIM updates through the mask (edit.py:1540-1548)."""
        grid = self.gen_grid.slice(
            start_idx, len(self.gen_grid) if end_idx in (None, -1) else end_idx)
        f_for = self._eps_fn(prompts, "null+(for-null)")
        f_edit = self._eps_fn(prompts, "null+(edit-null)")
        m = jnp.asarray(mask, jnp.float32)

        def run(x):
            def body(x, step_in):
                e_for = f_for(x, step_in["t"])
                e_edit = f_edit(x, step_in["t"])
                x_for, _ = ddim_step(x, e_for, step_in["ab"], step_in["ab_next"])
                x_edit, _ = ddim_step(x, e_edit, step_in["ab"], step_in["ab_next"])
                mm = m.astype(x.dtype)
                return x_edit * mm + x_for * (1 - mm), None

            xs = {"t": jnp.asarray(grid.t), "ab": jnp.asarray(grid.alpha_bar),
                  "ab_next": jnp.asarray(grid.alpha_bar_next)}
            return jax.lax.scan(body, x, xs)[0]

        fn = self._jit(("masked_fwd", xt.shape[0], start_idx, end_idx),
                       lambda: jax.jit(run))
        return fn(jnp.asarray(xt))

    # -- direction sources -----------------------------------------------------

    def pmp_fn(self, prompts: dict, mode: str) -> Callable:
        t = float(self.gen_grid.t[self.edit_t_idx])
        ab = float(self.gen_grid.alpha_bar[self.edit_t_idx])
        eps = self._eps_fn(prompts, mode)

        def f(x):
            e = eps(x, jnp.asarray(t))
            return (x - e * jnp.sqrt(1.0 - ab)) / jnp.sqrt(ab)

        return f

    def direct_direction(self, xt, prompts: dict, mode: str) -> jnp.ndarray:
        """get_v_modify without Jacobian (edit.py:1722-1741): the direction is
        an epsilon combination at x_t itself."""
        t = float(self.gen_grid.t[self.edit_t_idx])

        def run(x):
            if mode == "(for-edit)-direct":
                v = cfg_eps(self.unet_apply, x, t, prompts, "(for-edit)",
                            self.cfg.guidance_scale, enabled=True)
            elif mode == "(edit-null)-direct":
                v = -cfg_eps(self.unet_apply, x, t, prompts, "(edit-null)",
                             self.cfg.guidance_scale, enabled=True)
            elif mode == "proj_null[for-null](edit-null)-direct":
                e1 = cfg_eps(self.unet_apply, x, t, prompts, "(for-null)",
                             self.cfg.guidance_scale, enabled=True)
                e2 = cfg_eps(self.unet_apply, x, t, prompts, "(edit-null)",
                             self.cfg.guidance_scale, enabled=True)
                v = -perpendicular_component(e2, e1)
            else:
                raise ValueError(f"unknown direct mode {mode!r}")
            v = v.reshape(1, -1).astype(jnp.float32)
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        fn = self._jit(("direct", xt.shape, mode), lambda: jax.jit(run))
        return fn(jnp.asarray(xt))

    def delta_xt_via_grad(self, xt, prompts: dict, mask, mode: str) -> jnp.ndarray:
        """Prompt-delta Jacobian direction in pixel space (edit.py:1679-1720)."""
        f_base = self.pmp_fn(prompts, "null+(for-null)")
        f_mode = self.pmp_fn(prompts, mode)
        mw = None if mask is None else jnp.asarray(mask, jnp.float32)

        def run(x):
            delta = f_mode(x) - f_base(x)
            if mw is not None:
                delta = delta * mw.astype(delta.dtype)

            def g(xx):
                y = f_mode(xx)
                if mw is not None:
                    y = y * mw.astype(y.dtype)
                return jnp.sum(delta * y)

            v = jax.grad(g)(x).reshape(1, -1).astype(jnp.float32)
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        fn = self._jit(("delta", xt.shape, mode, mask is not None),
                       lambda: jax.jit(run))
        return fn(jnp.asarray(xt))

    def extract_basis(self, xt, prompts: dict, mode: str, mask, rank: int):
        cfg = self.cfg
        f = self.pmp_fn(prompts, mode)
        m = (jnp.ones((1, 1, 1, 1), jnp.float32) if mask is None
             else jnp.asarray(mask, jnp.float32))
        probe_sharding = self._probe_sharding()
        chunk = None if probe_sharding is not None else cfg.probe_chunk

        def run(x, mw, key):
            return subspace_iteration(
                f, x, key, rank=rank, mask=mw, min_iter=cfg.min_iter,
                max_iter=cfg.max_iter, tol=cfg.convergence_threshold,
                probe_chunk=chunk, probe_sharding=probe_sharding)

        fn = self._jit(("basis", xt.shape, rank, mode, mask is not None),
                       lambda: jax.jit(run))
        return fn(jnp.asarray(xt), m, self.rng.fork(f"if-probes-{rank}").key)

    def extract_dual_basis(self, xt, prompts: dict, mode: str, mask,
                           rank: int, rank_null: int):
        """Fused modify+null extraction on the shared pixel-space PMP
        Jacobian (the non-semantic path's two solo runs, edit.py:1589-1676
        twice) — probe keys match the solos exactly."""
        cfg = self.cfg
        f = self.pmp_fn(prompts, mode)
        probe_sharding = self._probe_sharding()
        chunk = None if probe_sharding is not None else cfg.probe_chunk

        def run(x, mw, ka, kb):
            return dual_subspace_iteration(
                f, x, ka, kb, rank_a=rank, rank_b=rank_null,
                mask_a=mw, mask_b=(mw == 0).astype(jnp.float32),
                min_iter=cfg.min_iter, max_iter=cfg.max_iter,
                tol=cfg.convergence_threshold, probe_chunk=chunk,
                probe_sharding=probe_sharding)

        fn = self._jit(("dual-basis", xt.shape, rank, rank_null, mode),
                       lambda: jax.jit(run))
        m = jnp.asarray(np.asarray(mask, np.float32))
        return fn(jnp.asarray(xt), m,
                  self.rng.fork(f"if-probes-{rank}").key,
                  self.rng.fork(f"if-probes-{rank_null}").key)

    def diffedit_mask(self, x0, prompts: dict) -> np.ndarray:
        f_for = self._eps_fn(prompts, "null+(for-null)")
        f_edit = self._eps_fn(prompts, "null+(edit-null)")
        ab = self.scheduler.schedule.alphas_cumprod
        m = diffedit_mask(f_for, f_edit, jnp.asarray(x0), ab,
                          self.rng.fork("diffedit").key)
        return np.asarray(m)

    # -- experiments --------------------------------------------------------------

    def run_edit_null_space_projection_xt(
            self, for_prompt: str, edit_prompt: str = "", xT=None,
            mask=None, sample_name: str = "sample", semantic: bool = True,
            ablation: str | None = None, vT_path: str | None = None) -> dict:
        """Pixel-space IF edit (reference edit.py:1744-2028). semantic=True
        uses the direct/jacobian prompt directions, else the subspace
        iteration; ablation 'diffedit' runs the masked sampler, 'sega' the
        edit-guided tail denoise (reference edit.py:2000-2007), both instead
        of the basis machinery. vT_path loads a saved direction file instead
        of computing (direction transfer)."""
        cfg = self.cfg
        prompts = self.prompt_set(for_prompt, edit_prompt)
        h, w, c = self.sample_shape
        if xT is None:
            xT = jax.random.normal(self.rng.fork("xT").key, (1, h, w, c))
        out_dir = os.path.join(cfg.result_folder, sample_name)
        os.makedirs(out_dir, exist_ok=True)

        xt = self.forward_steps(xT, prompts, "null+(for-null)", 0, self.edit_t_idx)

        if ablation == "sega":
            x0 = self.forward_steps(xt, prompts, "null+(for-null)+(edit-null)",
                                    self.edit_t_idx, None)
            img = np.asarray(x0)
            if cfg.save_images:
                save_image_grid(img, os.path.join(out_dir, "sega.png"))
            return {"image": img}

        if ablation == "diffedit":
            if mask is None:
                raise ValueError("diffedit ablation needs a mask")
            x0 = self.masked_forward_steps(xt, prompts, mask,
                                           self.edit_t_idx, None)
            img = np.asarray(x0)
            if cfg.save_images:
                save_image_grid(img, os.path.join(out_dir, "diffedit.png"))
            return {"image": img}

        if vT_path:
            vT = jnp.asarray(load_directions(vT_path)[0])
        else:
            vT = self._resolve_basis_xt(xt, prompts, mask, out_dir, semantic)

        strip = x_space_guidance_strip(
            jnp.asarray(xt), vT[0], scale=cfg.x_space_guidance_scale,
            edit_step=cfg.x_space_guidance_edit_step,
            num_steps=cfg.x_space_guidance_num_step, vis_num=cfg.vis_num)
        # tile-aligned chunked / DP-sharded completion denoise; IF's PMP
        # output IS pixel space, so pixel_output converts the strip itself
        x0 = self.run_batched(
            lambda ss: self.forward_steps(ss, prompts, "null+(for-null)",
                                          self.edit_t_idx, None), strip)
        if cfg.pixel_output:
            fn = self._jit(("px", x0.shape[0]),
                           lambda: jax.jit(to_uint8_pixels_device))
            x0 = fn(x0)
        img = np.asarray(x0)
        if cfg.save_images:
            self._submit_io(save_image_grid, img,
                            os.path.join(out_dir, "edit-if-stage1.png"))
        if self.superres is not None:
            img = self.superres(img, for_prompt)
            if cfg.save_images:
                self._submit_io(save_image_grid, img,
                                os.path.join(out_dir, "edit-if-stage2.png"))
        self.flush_io()
        return {"xt": np.asarray(xt), "vT": np.asarray(vT), "image": img,
                "out_dir": out_dir}

    def _resolve_basis_xt(self, xt, prompts: dict, mask, out_dir: str,
                          semantic: bool):
        """Basis memoization with the reference's all-or-nothing file
        semantics (edit.py:1790-1810 reloads u/vT-modify + u/vT-null when
        every file of the configured rank/edit_t/mask exists, skipping the
        power iteration on the resumed run); fresh non-semantic modify+null
        fuse into one dual program when their padded probe batches agree.
        Mask identity is part of the cache key (reference:
        select-mask{mask_index} in the basis dir, edit.py:1790)."""
        cfg = self.cfg
        self.flush_io()   # cache-existence checks must see queued writes
        basis_dir = os.path.join(out_dir, "basis")
        tag = mask_cache_tag(mask)
        modify_path = os.path.join(
            basis_dir, f"vT-modify-{cfg.edit_t}T-rank{cfg.pca_rank}-{tag}.npz")
        null_path = os.path.join(
            basis_dir,
            f"vT-null-{cfg.edit_t}T-rank{cfg.pca_rank_null}-{tag}.npz")
        cached = (not semantic and os.path.exists(modify_path)
                  and (not cfg.null_space_projection
                       or os.path.exists(null_path)))
        mesh_sz = cfg.mesh_probe if cfg.mesh_probe > 1 else None
        vT_null_pre = None
        use_dual = (
            not semantic and not cached and cfg.null_space_projection
            and mask is not None
            and padded_probe_count(cfg.pca_rank, mesh_size=mesh_sz)
            == padded_probe_count(cfg.pca_rank_null, mesh_size=mesh_sz))

        if cached:
            vT_modify = jnp.asarray(load_directions(modify_path)[0])
        elif semantic:
            if cfg.jacobian:
                vT_modify = self.delta_xt_via_grad(xt, prompts, mask,
                                                   cfg.tilda_v_score_type)
            else:
                vT_modify = self.direct_direction(xt, prompts,
                                                  cfg.tilda_v_score_type)
        elif use_dual:
            t0 = time.time()
            basis, nbasis = self.extract_dual_basis(
                xt, prompts, "null+(for-null)", mask,
                cfg.pca_rank, cfg.pca_rank_null)
            vT_modify = jax.block_until_ready(basis.vT)
            vT_null_pre = nbasis.vT
            print(f"power method runtime == {time.time() - t0:.2f}s "
                  f"({int(basis.iters)} iters, fused modify+null)")
            self._submit_io(save_directions, modify_path,
                            np.asarray(vT_modify), edit_t=cfg.edit_t)
            self._submit_io(save_directions, null_path,
                            np.asarray(vT_null_pre), edit_t=cfg.edit_t)
        else:
            t0 = time.time()
            vT_modify = jax.block_until_ready(self.extract_basis(
                xt, prompts, "null+(for-null)", mask, cfg.pca_rank).vT)
            print(f"power method runtime == {time.time() - t0:.2f}s")
            self._submit_io(save_directions, modify_path,
                            np.asarray(vT_modify), edit_t=cfg.edit_t)

        if cfg.null_space_projection:
            if mask is None:
                raise ValueError("null-space projection requires a mask")
            if vT_null_pre is not None:
                vT_null = vT_null_pre
            elif cached:
                vT_null = jnp.asarray(load_directions(null_path)[0])
            else:
                vT_null = self.extract_basis(xt, prompts, "null+(for-null)",
                                             ~np.asarray(mask, bool),
                                             cfg.pca_rank_null).vT
                if not semantic:
                    self._submit_io(save_directions, null_path,
                                    np.asarray(vT_null), edit_t=cfg.edit_t)
            vT = null_space_project(vT_modify, vT_null, cfg.pca_rank_null)
        else:
            vT = normalize_rows(vT_modify)
        self._submit_io(save_directions,
                        os.path.join(out_dir, "basis", "vT.npz"),
                        np.asarray(vT))
        return vT
