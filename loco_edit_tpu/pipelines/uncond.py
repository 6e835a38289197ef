"""LOCO-Edit proper: the unconditional-DDPM edit engine.

Orchestrates the flagship path (reference EditUncondDiffusion,
src/modules/edit.py:2034-2625; call stack SURVEY.md 3.1):

  DDIM-invert real image -> denoise to edit_t -> masked PMP-Jacobian basis
  (cached on disk) -> null-space projection against the complement-mask basis
  -> +/- x-space-guidance walks per principal component -> finish denoising
  with the eta=1 performance-boosting tail -> PNG strips + direction files.

All device work is jitted: inversion and generation are lax.scan loops, the
basis extraction a lax.while_loop; the host only moves PNGs and .npz caches.
"""

from __future__ import annotations

import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.core.rng import RngStream
from loco_edit_tpu.diffusion import LinspaceDDIM, ddim_generate, ddim_invert
from loco_edit_tpu.editing import (
    EditBasis,
    dual_subspace_iteration,
    load_directions,
    mask_cache_tag,
    null_space_project,
    normalize_rows,
    save_directions,
    subspace_iteration,
    x_space_guidance_strip,
)
from loco_edit_tpu.editing.pullback import (eps_pullback_fn,
                                            padded_probe_count,
                                            pmp_pullback_fn)
from loco_edit_tpu.models.base import Denoiser
from loco_edit_tpu.pipelines.common import EngineExec
from loco_edit_tpu.utils.io import save_image_grid, to_uint8_pixels_device


@dataclasses.dataclass
class UncondEditConfig:
    for_steps: int = 100
    inv_steps: int = 100
    # fixed-point exact-inversion refinement per step (0 = reference-exact)
    inv_refine_steps: int = 0
    edit_t: float = 0.6
    performance_boosting_t: float = 0.2
    # x-space guidance (reference preset: uncond scale dict keyed by h_t,
    # src/configs/params.py:15-21; flagship config scale 4 @0.6T... CLI passes
    # explicit values; defaults follow the CelebA script: scale 0.5 x 16 steps)
    x_space_guidance_scale: float = 0.5
    x_space_guidance_edit_step: float = 1.0
    x_space_guidance_num_step: int = 16
    vis_num: int = 4
    vis_num_pc: int = 5
    pca_rank: int = 5
    pca_rank_null: int = 5
    null_space_projection: bool = True
    encoder_decoder_by_et: bool = False   # pull back eps instead of PMP
    min_iter: int = 10
    max_iter: int = 50
    convergence_threshold: float = 1e-4
    probe_chunk: int | None = None
    mesh_probe: int = 0          # shard probes over this many devices (0 = off)
    memory_bound: int = 0        # chunk strip denoise batches (0 = no chunking)
    # DP-shard the walk-strip / batch-edit frame axis over this many devices
    # (0 = off). This is SURVEY §5.7's second parallel axis: the reference
    # host-chunks strip denoise to bound memory (edit.py:723-746,2561-2593);
    # here the frame batch is one SPMD program over a "data" mesh instead of
    # a host loop — the dominant E2E leg (48 boosted denoise frames, ~7.7 s
    # of the 10.85 s flagship edit single-chip) splits across chips.
    mesh_data: int = 0
    # Return edited strips as uint8 pixels, converted ON DEVICE (the exact
    # PNG payload; reference buffers uint8 chunks in its IF sampler,
    # edit.py:1450-1475). 4x smaller device->host pull — ~1 s/edit on the
    # tunneled dev chip (bench_e2e_breakdown.py). Off by default: float
    # strips remain the raw API output (golden tests compare them).
    pixel_output: bool = False
    result_folder: str = "./runs"
    save_images: bool = True


class UncondEditPipeline(EngineExec):
    """Artifact IO overlap, jit caching, mesh sharding, and tile-aligned
    batch execution come from EngineExec (pipelines/common.py) — the shared
    home of the round-2..4 execution lessons (BENCH.md)."""

    def __init__(self, denoiser: Denoiser, cfg: UncondEditConfig,
                 rng: RngStream, scheduler: LinspaceDDIM | None = None):
        self.denoiser = denoiser
        self.cfg = cfg
        self.rng = rng
        self.scheduler = scheduler or LinspaceDDIM()
        self.gen_grid = self.scheduler.generation_grid(cfg.for_steps)
        self.inv_grid = self.scheduler.inversion_grid(cfg.inv_steps)
        self.edit_t_idx = self.scheduler.nearest_step_index(cfg.for_steps, cfg.edit_t)
        self.boost_eta = self.scheduler.boost_eta_flags(
            cfg.for_steps, cfg.performance_boosting_t)
        self._boost_calls = 0   # per-call noise-stream counter (see generate)
        os.makedirs(cfg.result_folder, exist_ok=True)

    def invert(self, x0: jnp.ndarray) -> jnp.ndarray:
        r = int(getattr(self.cfg, "inv_refine_steps", 0))
        fn = self._jit(("invert", r), lambda: jax.jit(
            lambda x: ddim_invert(self.denoiser.eps_fn, x, self.inv_grid,
                                  refine_steps=r)))
        return fn(jnp.asarray(x0))

    def generate(self, xt: jnp.ndarray, start_idx: int = 0,
                 end_idx: int | None = None, boost: bool = False) -> jnp.ndarray:
        key = (("gen", xt.shape[0], start_idx, end_idx, boost))
        eta = self.boost_eta if boost else None

        def build():
            def run(x, k):
                return ddim_generate(self.denoiser.eps_fn, x, self.gen_grid,
                                     start_idx=start_idx, end_idx=end_idx,
                                     eta=eta, rng_key=k)
            return jax.jit(run)

        fn = self._jit(key, build)
        # Fresh noise stream per boosted call (the reference draws fresh randn
        # per step/call, edit.py:2556-2559): fold a call counter into the key
        # so principal-component strips / repeated runs get independent tails.
        noise_key = jax.random.fold_in(
            self.rng.fork("boost-eta").key, self._boost_calls)
        if boost:
            self._boost_calls += 1
        return fn(jnp.asarray(xt), noise_key)

    def generate_chunked(self, xt: jnp.ndarray, start_idx: int = 0,
                         end_idx: int | None = None, boost: bool = False):
        """generate(), chunking the batch by cfg.memory_bound (the reference
        chunks strip denoise at edit.py:2561-2593 to bound peak memory — a
        rank-5 x 16-step walk strip at 256px is a 9-45 image batch). The last
        chunk is zero-padded to the chunk size so every chunk reuses one
        compiled program, then sliced back.

        With memory_bound=0 on TPU, batches above 16 are chunked at 16
        anyway: measured on v5e at the flagship 256px config, TILE-ALIGNED
        batches (16/32/48) all run the denoise scan at ~70-72% MFU while
        ragged ones sit lower (batch 18: 53%, batch 45: 66%, batch 9: 41%),
        so 3 x 16-frame programs denoise the 45-frame strip set in 7.72 s vs
        7.88 s for one batch-45 program and 12.74 s for the reference's five
        per-PC batch-9 programs (scripts/bench_strip_variants.py).

        With cfg.mesh_data > 1 the host loop is replaced by ONE SPMD program:
        the frame axis is padded to the mesh and sharded over the "data"
        axis, so XLA splits the whole denoise scan across chips with no
        collectives in the loop body (the frames are independent) — each
        chip denoises b/N frames at its own tile-aligned batch. The eta-tail
        noise stays a single jax.random draw over the full batch, which is
        deterministic under SPMD partitioning, so a sharded run produces the
        SAME pixels as the unsharded program of the same shape (asserted in
        __graft_entry__.dryrun_multichip)."""
        return self.run_batched(
            lambda c: self.generate(c, start_idx, end_idx, boost), xt)

    def pullback_fn(self, mask: np.ndarray | None):
        t = float(self.gen_grid.t[self.edit_t_idx])
        ab = float(self.gen_grid.alpha_bar[self.edit_t_idx])
        if self.cfg.encoder_decoder_by_et:
            return eps_pullback_fn(self.denoiser.eps_fn, t)
        return pmp_pullback_fn(self.denoiser.eps_fn, ab, t)

    def extract_basis(self, xt: jnp.ndarray, mask: np.ndarray | None,
                      rank: int, stream: str = "probes") -> EditBasis:
        cfg = self.cfg
        f = self.pullback_fn(None)
        m = None if mask is None else jnp.asarray(mask, jnp.float32)
        probe_sharding = self._probe_sharding()

        def build():
            def run(x, mw, key):
                return subspace_iteration(
                    f, x, key, rank=rank,
                    mask=mw, min_iter=cfg.min_iter, max_iter=cfg.max_iter,
                    tol=cfg.convergence_threshold, probe_chunk=cfg.probe_chunk,
                    probe_sharding=probe_sharding)
            return jax.jit(run)

        key = ("basis", xt.shape, rank, mask is not None)
        fn = self._jit(key, build)
        if m is None:
            m = jnp.ones_like(jnp.asarray(xt), jnp.float32)
        return fn(jnp.asarray(xt), m, self.rng.fork(f"{stream}-r{rank}").key)

    def extract_dual_basis(self, xt: jnp.ndarray, mask: np.ndarray,
                           rank: int, rank_null: int):
        """Mask + complement-mask bases of the SAME Jacobian in one program
        (dual_subspace_iteration): shares the hoisted linearization and fuses
        both probe groups into one tangent/cotangent batch — on TPU two
        rank-5 runs each pad to an 8-probe tile, while the fused 16-probe
        batch costs about one padded-16 run (BENCH.md rank-10 row). Matches
        two extract_basis calls (same probe keys) at a fixed sweep budget."""
        cfg = self.cfg
        f = self.pullback_fn(None)
        probe_sharding = self._probe_sharding()

        def build():
            def run(x, mw, ka, kb):
                # complement binarized exactly like the solo path's
                # ~np.asarray(mask, bool): any nonzero weight counts as
                # "inside", so soft masks cannot give cache-state-dependent
                # null bases (modify keeps the soft weights, as solo does)
                return dual_subspace_iteration(
                    f, x, ka, kb, rank_a=rank, rank_b=rank_null,
                    mask_a=mw, mask_b=(mw == 0).astype(jnp.float32),
                    min_iter=cfg.min_iter, max_iter=cfg.max_iter,
                    tol=cfg.convergence_threshold,
                    probe_chunk=cfg.probe_chunk,
                    probe_sharding=probe_sharding)
            return jax.jit(run)

        fn = self._jit(("dual-basis", xt.shape, rank, rank_null), build)
        m = jnp.asarray(np.asarray(mask, np.float32))
        return fn(jnp.asarray(xt), m,
                  self.rng.fork(f"probes-r{rank}").key,
                  self.rng.fork(f"probes-null-r{rank_null}").key)

    # -- the flagship experiment ----------------------------------------------

    def _resolve_basis(self, xt, mask, out_dir, random_edit: bool = False):
        """Disk-cached basis resolution for ONE sample — the exact flagship
        semantics (modify cache -> fused dual when both bases are fresh and
        their padded probe batches agree -> solo runs otherwise; null-space
        projection or row normalization; per-pc direction files). Shared by
        run_edit_null_space_projection and run_edit_batch so the batch API
        cannot drift from what N single runs write."""
        cfg = self.cfg
        self.flush_io()   # cache-existence checks below must see all writes
        basis_dir = os.path.join(out_dir, "basis",
                                 f"local_basis-{cfg.edit_t}T")
        # the mask is part of the cache key (the reference's basis dir embeds
        # select-mask{mask_index}, edit.py:2283-2336): switching --mask_index
        # must recompute, not reload the previous mask's bases
        tag = mask_cache_tag(mask)
        mod_path = os.path.join(
            basis_dir, f"vT-modify-rank-{cfg.pca_rank}-{tag}.npz")
        null_path = os.path.join(
            basis_dir, f"vT-null-{cfg.pca_rank_null}-{tag}.npz")

        # When BOTH bases must be computed fresh (and their padded probe
        # batches agree), fuse them into one program on the shared Jacobian
        # (see extract_dual_basis) — including probe-sharded --mesh_probe
        # runs, whose flattened 2R-probe axis shards the mesh; the cached /
        # single-basis / mismatched-padding cases keep separate solo runs.
        vT_null_pre = None
        mesh_sz = cfg.mesh_probe if cfg.mesh_probe > 1 else None
        use_dual = (
            cfg.null_space_projection and mask is not None
            and not os.path.exists(mod_path)
            and not os.path.exists(null_path)
            and padded_probe_count(cfg.pca_rank, mesh_size=mesh_sz)
            == padded_probe_count(cfg.pca_rank_null, mesh_size=mesh_sz))

        if os.path.exists(mod_path):
            vT_modify = jnp.asarray(load_directions(mod_path)[0])
        elif use_dual:
            t0 = time.time()
            basis, nbasis = self.extract_dual_basis(
                xt, mask, cfg.pca_rank, cfg.pca_rank_null)
            vT_modify = jax.block_until_ready(basis.vT)
            vT_null_pre = nbasis.vT
            print(f"power method runtime == {time.time() - t0:.2f}s "
                  f"({int(basis.iters)} iters, fused modify+null)")
            self._submit_io(save_directions, mod_path, vT_modify,
                            edit_t=cfg.edit_t, rank=cfg.pca_rank)
            self._submit_io(save_directions, null_path, vT_null_pre,
                            edit_t=cfg.edit_t, rank=cfg.pca_rank_null)
        else:
            t0 = time.time()
            basis = self.extract_basis(xt, mask, cfg.pca_rank)
            vT_modify = jax.block_until_ready(basis.vT)
            print(f"power method runtime == {time.time() - t0:.2f}s "
                  f"({int(basis.iters)} iters)")
            self._submit_io(save_directions, mod_path, vT_modify,
                            edit_t=cfg.edit_t, rank=cfg.pca_rank)

        if random_edit:
            vT_modify = jax.random.normal(
                self.rng.fork("random-edit").key, vT_modify.shape)

        if cfg.null_space_projection:
            if mask is None:
                raise ValueError("null-space projection requires a mask")
            if vT_null_pre is not None:
                vT_null = vT_null_pre
            elif os.path.exists(null_path):
                vT_null = jnp.asarray(load_directions(null_path)[0])
            else:
                t0 = time.time()
                nbasis = self.extract_basis(
                    xt, ~np.asarray(mask, bool), cfg.pca_rank_null,
                    stream="probes-null")
                vT_null = jax.block_until_ready(nbasis.vT)
                print(f"null-space power method runtime == {time.time() - t0:.2f}s")
                self._submit_io(save_directions, null_path, vT_null,
                                edit_t=cfg.edit_t, rank=cfg.pca_rank_null)
            vT = null_space_project(vT_modify, vT_null, cfg.pca_rank_null)
        else:
            vT = normalize_rows(vT_modify)

        basis_name = (f"edit_{cfg.edit_t}T_null_proj_{cfg.null_space_projection}"
                      f"_rank{cfg.pca_rank_null}_scale_{cfg.x_space_guidance_scale}")
        for pc in range(vT.shape[0]):
            self._submit_io(
                save_directions,
                os.path.join(basis_dir, f"pc_{pc:03d}-vT.npz"),
                vT[pc:pc + 1], edit_t=cfg.edit_t, pc=pc)
        return vT, basis_name

    def _render_strips(self, xt, vT, out_dir, basis_name):
        """Walks + completion denoise for ONE sample. All principal
        components' strips concatenate into one batch so a single compiled
        program amortizes the scan across every PC (the reference denoises
        each PC's strip as its own sequential batch, edit.py:2340-2364;
        batch-9 denoise is MFU-starved — BENCH.md sweep); memory_bound /
        the TPU tile-aligned 16 still chunk the big batch, mirroring the
        reference's own single-strip chunking (edit.py:2561)."""
        cfg = self.cfg
        n_pc = min(cfg.vis_num_pc, vT.shape[0])
        per_pc = [x_space_guidance_strip(
            xt, vT[pc], scale=cfg.x_space_guidance_scale,
            edit_step=cfg.x_space_guidance_edit_step,
            num_steps=cfg.x_space_guidance_num_step, vis_num=cfg.vis_num)
            for pc in range(n_pc)]
        strips = {}
        if n_pc:
            edited_dev = self.generate_chunked(
                jnp.concatenate(per_pc, axis=0), self.edit_t_idx, None,
                boost=True)
            if cfg.pixel_output:
                edited_dev = to_uint8_pixels_device(edited_dev)
            edited_all = np.asarray(edited_dev)
            offset = 0
            for pc, sp in enumerate(per_pc):
                strips[pc] = edited_all[offset:offset + sp.shape[0]]
                offset += sp.shape[0]
                if cfg.save_images:
                    self._submit_io(
                        save_image_grid, strips[pc],
                        os.path.join(out_dir, f"edit-{basis_name}-pc{pc:03d}.png"))
        return strips

    def run_edit_null_space_projection(
        self, x0: np.ndarray | None = None, xT: np.ndarray | None = None,
        mask: np.ndarray | None = None, sample_name: str = "sample",
        vT_path: str | None = None, random_edit: bool = False,
    ) -> dict:
        """Full LOCO-Edit on one sample (reference edit.py:2215-2366).

        Provide x0 (a real image -> DDIM inversion) or xT (a latent). mask is
        boolean NHWC (or None for unmasked). vT_path loads a previously saved
        direction file instead of computing the basis (direction transfer).
        Returns a dict with xt, vT, per-pc edited strips.
        """
        cfg = self.cfg
        assert (x0 is None) != (xT is None), "exactly one of x0 / xT"
        if xT is None:
            xT = self.invert(x0)

        xt, t_idx = jnp.asarray(self.generate(xT, 0, self.edit_t_idx)), self.edit_t_idx

        out_dir = os.path.join(cfg.result_folder, sample_name)
        os.makedirs(out_dir, exist_ok=True)

        if vT_path:
            vT, _meta = load_directions(vT_path)
            vT = jnp.asarray(vT)
            basis_name = f"edit_{cfg.edit_t}T-load-basis-{os.path.basename(vT_path)}"
        else:
            vT, basis_name = self._resolve_basis(xt, mask, out_dir,
                                                 random_edit=random_edit)

        strips = self._render_strips(xt, vT, out_dir, basis_name)
        self.flush_io()   # every artifact is on disk when the call returns
        return {"xt": np.asarray(xt), "vT": np.asarray(vT), "strips": strips,
                "edit_t_idx": t_idx, "out_dir": out_dir}

    def run_edit_batch(
        self, x0s: np.ndarray | None = None, xTs: np.ndarray | None = None,
        masks: np.ndarray | None = None,
        sample_names: list[str] | None = None,
    ) -> list[dict]:
        """Throughput form of run_edit_null_space_projection over N samples —
        a capability the reference does not have (its engine edits one
        sample_idx per process, edit.py:2215).

        The batch axis amortizes the MFU-starved batch-1 legs: ONE
        inversion and ONE forward program run the whole (N, H, W, C) batch
        (batch-1 denoise steps are the most starved shape on TPU — BENCH.md
        batch sweep), and every compiled program (fused dual basis, 16-frame
        denoise chunks) is reused across samples. The strip denoise stays
        per-sample: it is already tile-saturated at the 16-frame chunk, and
        a measured cross-sample concatenation variant was SLOWER (the big
        device concat + reslice cost more than the zero chunk-count change
        — 11.9 s/image vs 10.85 single at N=4, BENCH.md). Per-sample disk
        artifacts (basis caches, direction files, PNGs) are written exactly
        as N single runs would.

        masks: (N, H, W, C) boolean. Returns one result dict per sample.
        """
        cfg = self.cfg
        assert (x0s is None) != (xTs is None), "exactly one of x0s / xTs"
        n = (x0s if xTs is None else xTs).shape[0]

        # --mesh_data: the sample axis of the batched inversion/forward
        # programs is DP-sharded too (both are deterministic, so padding
        # to the mesh is free); the strips inherit it via generate_chunked
        if xTs is None:
            xTs = self.invert(self.shard_samples(x0s))   # ONE batched program
        else:
            xTs = self.shard_samples(xTs)
        assert masks is not None and masks.shape[0] == n
        names = sample_names or [f"batch{i:03d}" for i in range(n)]

        xts = jnp.asarray(self.generate(xTs, 0, self.edit_t_idx))[:n]  # ONE program

        results = []
        for i in range(n):
            out_dir = os.path.join(cfg.result_folder, names[i])
            os.makedirs(out_dir, exist_ok=True)
            vT, basis_name = self._resolve_basis(
                xts[i:i + 1], masks[i:i + 1], out_dir)
            strips = self._render_strips(xts[i:i + 1], vT, out_dir,
                                         basis_name)
            results.append({"xt": np.asarray(xts[i:i + 1]),
                            "vT": np.asarray(vT), "strips": strips,
                            "edit_t_idx": self.edit_t_idx,
                            "out_dir": out_dir})
        self.flush_io()
        return results

    def group_edit(self, xT: np.ndarray, vT_paths: list[str],
                   sample_name: str = "group") -> np.ndarray:
        """Sequential composition of saved directions (reference
        group_edit_null_space_projection, edit.py:2171-2212): apply each
        direction's full walk offset in turn, visualizing each stage."""
        cfg = self.cfg
        xt = jnp.asarray(self.generate(jnp.asarray(xT), 0, self.edit_t_idx))
        frames = [xt]
        cur = xt
        for p in vT_paths:
            vT, _ = load_directions(p)
            vk = jnp.asarray(vT[0]).reshape(xt.shape[1:]).astype(xt.dtype)
            cur = cur + cfg.x_space_guidance_scale * cfg.x_space_guidance_num_step * vk
            frames.append(cur)
        strip = jnp.concatenate(frames, axis=0)
        edited = self.generate_chunked(strip, self.edit_t_idx, None, boost=True)
        if cfg.pixel_output:
            edited = to_uint8_pixels_device(edited)
        if cfg.save_images:
            out_dir = os.path.join(cfg.result_folder, sample_name)
            save_image_grid(np.asarray(edited),
                            os.path.join(out_dir, "group_edit.png"))
        return np.asarray(edited)
