"""T-LOCO on Stable Diffusion: latent z-space editing engine.

Counterpart of the reference EditStableDiffusion (src/modules/edit.py:483-1194):
CFG denoising with prompt-combination modes, DDIM inversion through the VAE
encoder, PMP *through the VAE decoder* for the pullback (get_x0,
edit.py:757-781), text-supervised directions via the prompt-delta Jacobian
(get_delta_zt_via_grad, edit.py:783-828), unsupervised directions via the
shared subspace iteration, null-space projection, x-space-guidance walks in
z_t, and the SEGA ablation branch (edit.py:1166-1173).

Execution standard (round 5): this engine runs the same measured playbook as
the flagship uncond engine (pipelines/uncond.py, BENCH.md rounds 2-4) —
  - every principal component's walk strip concatenates into ONE tile-aligned
    chunked denoise + ONE batched VAE decode (the reference denoises AND
    decodes each PC's strip as its own small batch, edit.py:1019-1042);
  - fresh modify+null bases fuse into one dual_subspace_iteration program on
    the shared Jacobian;
  - artifact IO overlaps device compute (EngineExec);
  - --mesh_probe shards the probe axis, --mesh_data DP-shards the strip
    frame axis; --pixel_output pulls on-device uint8 strips (4x smaller at
    512px than the uncond case this was measured on).
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
from loco_edit_tpu.editing import (
    dual_subspace_iteration,
    load_directions,
    mask_cache_tag,
    normalize_rows,
    null_space_project,
    save_directions,
    subspace_iteration,
)
from loco_edit_tpu.editing.cfg import cfg_eps
from loco_edit_tpu.editing.pullback import padded_probe_count
from loco_edit_tpu.pipelines.common import (EngineExec, concat_pc_strips,
                                            split_pc_strips)
from loco_edit_tpu.utils.io import save_image_grid, to_uint8_pixels_device


def _auto_probe_chunk(configured: int | None,
                      compute_dtype: str = "fp32") -> int | None:
    """Default probe chunk for z-space pullbacks THROUGH the VAE decoder.

    Measured on one 16G v5e (SD 2.1 UNet + 512px decode, rank-5, 10 sweeps,
    per-block remat — scripts/bench_t2i_basis.py):

      bf16: the full 8-probe tile FITS and the chunked lax.map forms only
        serialize the cross-probe overlap — 8.94 s unchunked (42.7% MFU)
        vs 13.19 s chunk=4 vs 14.52 s chunk=2. Default 8: identical to
        unchunked at rank<=8 (one tile) while still bounding memory to
        8-probe chunks at higher ranks.
      fp32: the unchunked sweep needs >21G of HLO temps (measured OOM,
        dominated by the f32 VJP buffers through the decoder) -> default 2.

    Under the memory-lean attention JVP (the default, ops/attention.py) the
    logits-sized tangent buffers halve and TWO tiles fit: the fused dual
    16-probe program measured 14.55 s at chunk 16 vs 16.03 s at chunk 8
    (1.10x, scripts/bench_sd_probe_chunk.py) with no OOM -> bf16 default 16
    (one chunk for the dual program, still one chunk for a rank<=8 solo
    basis). LOCO_ATTN_JVP=ad restores plain autodiff and the 8-probe cap.

    --probe_chunk overrides either way."""
    if configured is not None:
        return configured
    try:
        if jax.default_backend() == "tpu":
            # --dtype fp16 maps to bfloat16 compute (t2i_registry.py
            # load_sd_bundle), so it gets the bf16 full-tile default too
            if compute_dtype in ("bf16", "bfloat16", "fp16", "float16"):
                lean = os.environ.get("LOCO_ATTN_JVP", "lean") != "ad"
                return 16 if lean else 8
            return 2
    except RuntimeError:
        pass
    return None


@dataclasses.dataclass
class SDEditConfig:
    for_steps: int = 100
    inv_steps: int = 100
    # fixed-point exact-inversion refinement per step (0 = reference-exact)
    inv_refine_steps: int = 0
    edit_t: float = 0.7
    guidance_scale: float = 7.5
    guidance_scale_edit: float = 4.0
    x_space_guidance_scale: float = 1.0
    x_space_guidance_edit_step: float = 1.0
    x_space_guidance_num_step: int = 8
    vis_num: int = 4
    vis_num_pc: int = 1
    pca_rank: int = 2
    pca_rank_null: int = 2
    null_space_projection: bool = True
    min_iter: int = 10
    max_iter: int = 50
    convergence_threshold: float = 1e-3
    probe_chunk: int | None = None
    compute_dtype: str = "fp32"  # informs _auto_probe_chunk's HBM default
    scaling_factor: float = 0.18215
    t_max: int = 999
    memory_bound: int = 0        # chunk strip denoise batches (0 = off)
    mesh_probe: int = 0          # shard probes over this many devices (0 = off)
    mesh_data: int = 0           # DP-shard the strip frame axis (0 = off)
    # Return edited strips as uint8 pixels, converted ON DEVICE (the exact
    # PNG payload; see pipelines/uncond.py pixel_output). At 512px the f32
    # pull is 4x the uncond case this was measured at ~1 s/edit on — off by
    # default so float strips stay the raw API output (golden tests).
    pixel_output: bool = False
    result_folder: str = "./runs"
    save_images: bool = True
    tilda_v_score_type: str = "null+(for-null)+(edit-null)"
    use_sega: bool = False


class SDEditPipeline(EngineExec):
    """Bound to: unet_apply(z, t, context) -> eps (batched), decode(z) -> x,
    encode(x, key) -> z (sampled latent, already scaled), and a prompt
    encoder str -> (1, seq, dim). Jit caching, IO overlap, mesh sharding and
    tile-aligned batching come from EngineExec (pipelines/common.py)."""

    def __init__(self, unet_apply, decode, encode, prompt_encoder,
                 cfg: SDEditConfig, rng: RngStream,
                 latent_shape=(64, 64, 4),
                 scheduler: LinspaceDDIM | None = None,
                 learn_sigma: bool = False):
        self.cfg = cfg
        self.rng = rng
        self.decode = decode
        self.encode = encode
        self.latent_shape = latent_shape
        if learn_sigma:
            c = latent_shape[-1]
            self.unet_apply = lambda z, t, ctx: unet_apply(z, t, ctx)[..., :c]
        else:
            self.unet_apply = unet_apply
        # SD checkpoints are trained on the scaled_linear beta table; the
        # reference keeps the checkpoint scheduler's alphas_cumprod when it
        # monkey-patches set_timesteps/step (utils.py:147-157)
        self.scheduler = scheduler or LinspaceDDIM(
            t_max=cfg.t_max, noise_schedule="scaled_linear")
        self.gen_grid = self.scheduler.generation_grid(cfg.for_steps)
        self.inv_grid = self.scheduler.inversion_grid(cfg.inv_steps)
        self.edit_t_idx = self.scheduler.nearest_step_index(cfg.for_steps, cfg.edit_t)
        self.prompt_encoder = prompt_encoder
        self._emb_cache: dict[str, jnp.ndarray] = {}
        os.makedirs(cfg.result_folder, exist_ok=True)

    # -- prompts ---------------------------------------------------------------

    def emb(self, prompt: str) -> jnp.ndarray:
        if prompt not in self._emb_cache:
            self._emb_cache[prompt] = self.prompt_encoder(prompt)
        return self._emb_cache[prompt]

    def prompt_set(self, for_prompt: str, edit_prompt: str = "") -> dict:
        return {"for": self.emb(for_prompt), "edit": self.emb(edit_prompt),
                "null": self.emb("")}

    # -- denoising primitives ---------------------------------------------------

    def _eps_fn(self, prompts: dict, mode: str) -> Callable:
        enabled = self.cfg.guidance_scale > 1.0
        return lambda z, t: cfg_eps(
            self.unet_apply, z, t, prompts, mode,
            self.cfg.guidance_scale, self.cfg.guidance_scale_edit,
            enabled=enabled)

    def generate(self, zt, prompts: dict, mode: str, start_idx: int = 0,
                 end_idx: int | None = None) -> jnp.ndarray:
        grid = self.gen_grid.slice(
            start_idx, len(self.gen_grid) if end_idx in (None, -1) else end_idx)
        key = ("gen", zt.shape[0], start_idx, end_idx, mode)
        fn = self._jit(key, lambda: jax.jit(
            lambda z, f=self._eps_fn(prompts, mode), g=grid: ddim_scan(f, z, g)))
        return fn(jnp.asarray(zt))

    def generate_chunked(self, zt, prompts: dict, mode: str,
                         start_idx: int = 0, end_idx: int | None = None):
        """generate() over a big frame batch: ONE SPMD program when
        --mesh_data > 1, else tile-aligned 16-frame chunks on TPU /
        --memory_bound chunks elsewhere (EngineExec.run_batched — the
        uncond engine's measured 1.65x strip-denoise form)."""
        return self.run_batched(
            lambda c: self.generate(c, prompts, mode, start_idx, end_idx), zt)

    def invert(self, x0, inv_prompt: str = "") -> jnp.ndarray:
        """Real image -> sampled VAE latent -> ascending DDIM (no CFG, the
        reference passes guidance=None on the live path, edit.py:567-633)."""
        z0 = self.encode(jnp.asarray(x0), self.rng.fork("vae-sample").key)
        prompts = {"for": self.emb(inv_prompt), "edit": self.emb(""),
                   "null": self.emb("")}
        # no-CFG single pass under inv prompt
        f = lambda z, t, p=prompts: cfg_eps(  # noqa: E731
            self.unet_apply, z, t, p, "null+(for-null)",
            self.cfg.guidance_scale, enabled=False)
        from loco_edit_tpu.diffusion.sampling import ddim_invert

        r = int(getattr(self.cfg, "inv_refine_steps", 0))
        fn = self._jit(("inv", z0.shape[0], inv_prompt, r),
                       lambda: jax.jit(lambda z: ddim_invert(
                           f, z, self.inv_grid, refine_steps=r)))
        return fn(z0)

    def decode_to_image(self, z) -> np.ndarray:
        fn = self._jit(("dec", z.shape[0]), lambda: jax.jit(
            lambda zz: self.decode(zz / self.cfg.scaling_factor)))
        return np.asarray(fn(jnp.asarray(z)))

    def decode_strips(self, z) -> np.ndarray:
        """Batched strip decode: one chunked/DP-sharded program over the whole
        frame batch (the reference decodes each PC strip separately,
        edit.py:1035); with cfg.pixel_output the uint8 PNG-payload conversion
        fuses into the decode program so the 512px device->host pull is 4x
        smaller."""
        px = self.cfg.pixel_output

        def dec(zz):
            def build():
                def run(z_):
                    img = self.decode(z_ / self.cfg.scaling_factor)
                    return to_uint8_pixels_device(img) if px else img
                return jax.jit(run)
            return self._jit(("dec-strip", zz.shape[0], px), build)(zz)

        return np.asarray(self.run_batched(dec, jnp.asarray(z)))

    # -- pullback objects --------------------------------------------------------

    def pmp_through_decoder(self, prompts: dict, mode: str) -> Callable:
        """f(z_t) = decode(PMP(z_t)) — the Jacobian target (edit.py:757-781)."""
        t = float(self.gen_grid.t[self.edit_t_idx])
        ab = float(self.gen_grid.alpha_bar[self.edit_t_idx])
        eps = self._eps_fn(prompts, mode)

        def f(z):
            e = eps(z, jnp.asarray(t))
            z0 = (z - e * jnp.sqrt(1.0 - ab)) / jnp.sqrt(ab)
            return self.decode(z0 / self.cfg.scaling_factor)

        return f

    def _probe_chunk(self, probe_sharding) -> int | None:
        # sharded probe batches must not be serialized through lax.map — the
        # per-chip slice is what bounds memory there (<= 8 probes/chip at the
        # lcm(8, mesh) padding for rank <= 8)
        if probe_sharding is not None:
            return None
        return _auto_probe_chunk(self.cfg.probe_chunk, self.cfg.compute_dtype)

    def extract_basis(self, zt, prompts: dict, mode: str,
                      mask: np.ndarray | None, rank: int):
        cfg = self.cfg
        f = self.pmp_through_decoder(prompts, mode)
        m = (jnp.ones((1, 1, 1, 1), jnp.float32) if mask is None
             else jnp.asarray(mask, jnp.float32))
        probe_sharding = self._probe_sharding()
        chunk = self._probe_chunk(probe_sharding)

        def run(z, mw, key):
            return subspace_iteration(
                f, z, key, rank=rank, mask=mw, min_iter=cfg.min_iter,
                max_iter=cfg.max_iter, tol=cfg.convergence_threshold,
                probe_chunk=chunk, probe_sharding=probe_sharding)

        fn = self._jit(("basis", zt.shape, rank, mode, mask is not None),
                       lambda: jax.jit(run))
        return fn(jnp.asarray(zt), m, self.rng.fork(f"probes-{rank}-{mode}").key)

    def extract_dual_basis(self, zt, prompts: dict, mode: str,
                           mask: np.ndarray, rank: int, rank_null: int):
        """Mask + complement-mask bases of the SAME decode(PMP) Jacobian in
        one program (dual_subspace_iteration; see pipelines/uncond.py
        extract_dual_basis): one hoisted UNet+VAE linearization instead of
        two, both probe groups in one tangent/cotangent batch (still bounded
        by the probe chunk — at SD scale the fused 2x8-probe sweep runs as
        two lax.map chunks of one 8-probe tile each, sharing the primal).
        Probe keys match the two solo extract_basis calls exactly."""
        cfg = self.cfg
        f = self.pmp_through_decoder(prompts, mode)
        probe_sharding = self._probe_sharding()
        chunk = self._probe_chunk(probe_sharding)

        def run(z, mw, ka, kb):
            # complement binarized exactly like the solo path's
            # ~np.asarray(mask, bool) (any nonzero weight counts as inside)
            return dual_subspace_iteration(
                f, z, ka, kb, rank_a=rank, rank_b=rank_null,
                mask_a=mw, mask_b=(mw == 0).astype(jnp.float32),
                min_iter=cfg.min_iter, max_iter=cfg.max_iter,
                tol=cfg.convergence_threshold, probe_chunk=chunk,
                probe_sharding=probe_sharding)

        fn = self._jit(("dual-basis", zt.shape, rank, rank_null, mode),
                       lambda: jax.jit(run))
        m = jnp.asarray(np.asarray(mask, np.float32))
        return fn(jnp.asarray(zt), m,
                  self.rng.fork(f"probes-{rank}-{mode}").key,
                  self.rng.fork(f"probes-{rank_null}-{mode}").key)

    def delta_zt_via_grad(self, zt, prompts: dict, mask: np.ndarray | None,
                          mode: str) -> jnp.ndarray:
        """Text-supervised direction: one VJP of <delta_x0, decode(PMP(z))>
        where delta_x0 = decode(PMP under `mode`) - decode(PMP under
        null+(for-null)) (reference get_delta_zt_via_grad, edit.py:783-828)."""
        f_base = self.pmp_through_decoder(prompts, "null+(for-null)")
        f_mode = self.pmp_through_decoder(prompts, mode)
        mw = None if mask is None else jnp.asarray(mask, jnp.float32)

        def run(z, key):
            delta = f_mode(z) - f_base(z)
            if mw is not None:
                delta = delta * mw.astype(delta.dtype)

            def g(zz):
                y = f_mode(zz)
                if mw is not None:
                    y = y * mw.astype(y.dtype)
                return jnp.sum(delta * y)

            v = jax.grad(g)(z).reshape(1, -1).astype(jnp.float32)
            return v / jnp.linalg.norm(v, axis=1, keepdims=True)

        fn = self._jit(("delta", zt.shape, mode, mask is not None),
                       lambda: jax.jit(run))
        return fn(jnp.asarray(zt), self.rng.fork("delta").key)

    # -- experiment internals -----------------------------------------------------

    def _resolve_basis_zt(self, zt, prompts: dict, mask, out_dir: str,
                          semantic: bool):
        """Disk-cached basis resolution for ONE latent — solo/fused dispatch
        with the reference's all-or-nothing file semantics (edit.py:966-999:
        reload u/vT-modify + u/vT-null when every file of the configured
        rank/edit_t exists, skipping the power iteration). Mask identity is
        part of the key (reference: select-mask{mask_index} in the basis
        dir, edit.py:966) — a --mask_index switch recomputes."""
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

        # fresh modify+null on the same Jacobian fuse into one program when
        # their padded probe batches agree (see extract_dual_basis)
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
            vT_modify = self.delta_zt_via_grad(zt, prompts, mask,
                                               cfg.tilda_v_score_type)
        elif use_dual:
            t0 = time.time()
            basis, nbasis = self.extract_dual_basis(
                zt, prompts, "null+(for-null)", mask,
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
                zt, prompts, "null+(for-null)", mask, cfg.pca_rank).vT)
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
                vT_null = self.extract_basis(zt, prompts, "null+(for-null)",
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
                        np.asarray(vT), edit_t=cfg.edit_t)
        return vT

    def _render_strips_zt(self, zt, prompts: dict, vT, out_dir: str):
        """Walks + completion denoise + decode for ONE latent. ALL principal
        components' strips concatenate into one frame batch: one tile-aligned
        chunked denoise program and one batched VAE decode amortize across
        every PC (the reference loops PCs through separate small-batch
        denoises and separate decodes, edit.py:1019-1042 — the exact
        anti-pattern BENCH.md round 3 measured at 1.65x on uncond)."""
        cfg = self.cfg
        n_pc = min(cfg.vis_num_pc, vT.shape[0])
        per_pc, big = concat_pc_strips(
            jnp.asarray(zt), vT, n_pc, scale=cfg.x_space_guidance_scale,
            edit_step=cfg.x_space_guidance_edit_step,
            num_steps=cfg.x_space_guidance_num_step, vis_num=cfg.vis_num)
        strips, z0_strips = {}, {}
        if n_pc:
            z0_all = self.generate_chunked(big, prompts, "null+(for-null)",
                                           self.edit_t_idx, None)
            img_all = self.decode_strips(z0_all)
            strips = split_pc_strips(per_pc, img_all)
            z0_strips = split_pc_strips(per_pc, np.asarray(z0_all))
            if cfg.save_images:
                for pc, img in strips.items():
                    self._submit_io(
                        save_image_grid, img,
                        os.path.join(out_dir,
                                     f"edit-zt-{cfg.edit_t}T-pc{pc:03d}.png"))
        return strips, z0_strips

    # -- experiments --------------------------------------------------------------

    def run_edit_null_space_projection_zt(
            self, for_prompt: str, edit_prompt: str = "", zT=None,
            mask: np.ndarray | None = None, sample_name: str = "sample",
            semantic: bool = False, vT_path: str | None = None) -> dict:
        """Unsupervised (power-iteration) or text-supervised (semantic=True)
        z-space edit (reference edit.py:917-1042 / :1044-1173). vT_path loads
        a previously saved direction file instead of computing the basis
        (direction transfer — the reference exposes the same on the uncond
        engine, edit.py:2333-2336)."""
        cfg = self.cfg
        prompts = self.prompt_set(for_prompt, edit_prompt)
        h, w, c = self.latent_shape
        if zT is None:
            zT = jax.random.normal(self.rng.fork("zT").key, (1, h, w, c))

        out_dir = os.path.join(cfg.result_folder, sample_name)
        os.makedirs(out_dir, exist_ok=True)

        if cfg.use_sega:
            # SEGA ablation: no basis at all, just edit-guided denoising from
            # the edit timestep (edit.py:1166-1173)
            zt = self.generate(zT, prompts, "null+(for-null)", 0, self.edit_t_idx)
            z0 = self.generate(zt, prompts, "null+(for-null)+(edit-null)",
                               self.edit_t_idx, None)
            img = self.decode_to_image(z0)
            if cfg.save_images:
                save_image_grid(img, os.path.join(out_dir, "sega.png"))
            return {"image": img}

        zt = self.generate(zT, prompts, "null+(for-null)", 0, self.edit_t_idx)

        if vT_path:
            vT = jnp.asarray(load_directions(vT_path)[0])
        else:
            vT = self._resolve_basis_zt(zt, prompts, mask, out_dir, semantic)

        strips, z0_strips = self._render_strips_zt(zt, prompts, vT, out_dir)
        self.flush_io()   # every artifact is on disk when the call returns
        return {"zt": np.asarray(zt), "vT": np.asarray(vT), "strips": strips,
                "z0_strips": z0_strips, "out_dir": out_dir}

    def run_edit_batch(
            self, for_prompt: str, edit_prompt: str = "", zTs=None,
            x0s=None, masks: np.ndarray | None = None,
            sample_names: list[str] | None = None,
            semantic: bool = False) -> list[dict]:
        """Throughput form over N samples (capability beyond the reference,
        which edits one sample per process — matches the uncond engine's
        run_edit_batch, pipelines/uncond.py). ONE batched program runs every
        sample's generation to edit_t (or inversion, for real-image x0s),
        and every compiled program (fused dual basis, 16-frame denoise
        chunks, batched decode) is reused across samples. Per-sample disk
        artifacts are written exactly as N single runs would."""
        cfg = self.cfg
        assert (zTs is None) != (x0s is None), "exactly one of zTs / x0s"
        prompts = self.prompt_set(for_prompt, edit_prompt)
        n = (zTs if x0s is None else x0s).shape[0]
        if x0s is not None:
            zTs = self.invert(self.shard_samples(x0s))   # ONE batched program
        else:
            zTs = self.shard_samples(zTs)
        names = sample_names or [f"batch{i:03d}" for i in range(n)]

        zts = jnp.asarray(self.generate(
            zTs, prompts, "null+(for-null)", 0, self.edit_t_idx))[:n]

        results = []
        for i in range(n):
            out_dir = os.path.join(cfg.result_folder, names[i])
            os.makedirs(out_dir, exist_ok=True)
            # an all-False row means "this sample has no mask" (the serve
            # batch builds dense rows): a zero output weight would make the
            # basis/delta direction 0/0 = NaN, so treat it as None exactly
            # like the single-sample API's maskless call
            mask_i = (masks[i:i + 1] if masks is not None
                      and np.asarray(masks[i]).any() else None)
            vT = self._resolve_basis_zt(zts[i:i + 1], prompts, mask_i,
                                        out_dir, semantic)
            strips, z0_strips = self._render_strips_zt(
                zts[i:i + 1], prompts, vT, out_dir)
            results.append({"zt": np.asarray(zts[i:i + 1]),
                            "vT": np.asarray(vT), "strips": strips,
                            "z0_strips": z0_strips, "out_dir": out_dir})
        self.flush_io()
        return results
