"""Shared engine execution machinery.

Every lesson measured on the uncond engine in rounds 2-4 (BENCH.md) lives
here once, so all four edit engines inherit it instead of re-implementing:

  - **Overlapped artifact IO**: disk artifacts (.npz direction caches, PNG
    strips) are written on a single IO thread so they overlap device compute
    instead of serializing after it (~1 s/edit measured on the tunneled dev
    chip, BENCH.md round 4). Submitted as soon as their arrays exist, drained
    before any cache-existence check and before every public run_* method
    returns.
  - **Tile-aligned batch chunking**: TILE-ALIGNED denoise batches (16/32/48)
    run at ~70-72% MFU on v5e while ragged ones starve (batch 9: 41%), so
    big frame batches chunk at 16 on TPU even with --memory_bound unset
    (scripts/bench_strip_variants.py: 3 x 16-frame programs denoise a
    45-frame strip set in 7.72 s vs 12.74 s for five per-PC batch-9
    programs — the reference's pattern, src/modules/edit.py:2340-2364).
  - **Mesh axes**: --mesh_probe shards the subspace iteration's probe axis
    (the embarrassingly-parallel dimension the reference serializes in host
    chunks of 5, edit.py:2419,2448); --mesh_data DP-shards the walk-strip /
    batch-edit frame axis (the reference host-chunks it to bound memory,
    edit.py:723-746,2561-2593). Both are equivalence-checked in
    __graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


class EngineExec:
    """Mixin for edit pipelines: jit caching, overlapped artifact IO, mesh
    sharding (probe / data axes), tile-aligned batched execution.

    Expects `self.cfg` with optional `mesh_probe`, `mesh_data`,
    `memory_bound` fields; every helper degrades to a single-device no-op
    when a field is absent or 0. All state is created lazily so engines
    need no __init__ cooperation.
    """

    # -- jit cache -------------------------------------------------------------

    def _jit(self, key, build: Callable):
        cache = getattr(self, "_jit_cache", None)
        if cache is None:
            cache = self._jit_cache = {}
        if key not in cache:
            cache[key] = build()
        return cache[key]

    # -- overlapped artifact IO --------------------------------------------------

    def _submit_io(self, fn, *args, **kw):
        from concurrent.futures import ThreadPoolExecutor

        if getattr(self, "_io_pool", None) is None:
            self._io_pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="loco-io")
            self._io_pending = []
        self._io_pending.append(self._io_pool.submit(fn, *args, **kw))

    def flush_io(self):
        """Wait for every queued artifact write (re-raising any error)."""
        pending = getattr(self, "_io_pending", None)
        if not pending:
            return
        self._io_pending = []
        for f in pending:
            f.result()

    # -- mesh sharding ------------------------------------------------------------

    def _probe_sharding(self):
        """NamedSharding over the probe axis when cfg.mesh_probe > 1 (the
        embarrassingly-parallel axis; solo AND fused extraction shard it)."""
        n = getattr(self.cfg, "mesh_probe", 0)
        if n <= 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from loco_edit_tpu.core.mesh import PROBE_AXIS, make_mesh

        mesh = make_mesh({PROBE_AXIS: n}, devices=jax.devices()[:n])
        return NamedSharding(mesh, P(PROBE_AXIS))

    def _data_sharding(self):
        """NamedSharding over the frame/sample batch axis when
        cfg.mesh_data > 1 (the walk-strip / batch-edit axis, SURVEY §5.7)."""
        n = getattr(self.cfg, "mesh_data", 0)
        if n <= 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        from loco_edit_tpu.core.mesh import DATA_AXIS, make_mesh

        mesh = make_mesh({DATA_AXIS: n}, devices=jax.devices()[:n])
        return NamedSharding(mesh, P(DATA_AXIS))

    # -- batched execution ----------------------------------------------------------

    def run_batched(self, fn: Callable[[jnp.ndarray], jnp.ndarray],
                    x: jnp.ndarray) -> jnp.ndarray:
        """Apply a batch-preserving device fn over x's leading axis.

        With cfg.mesh_data > 1: ONE SPMD program — the frame axis is padded
        to the mesh (x8 sublane-aligned per device on TPU) and sharded over
        the "data" axis, so XLA splits the whole program across chips with
        no collectives in the loop body (frames are independent). Any
        batch-wide jax.random draw inside fn is deterministic under SPMD
        partitioning, so a sharded run produces the SAME output as the
        unsharded program of the same (padded) shape (asserted in
        __graft_entry__.dryrun_multichip).

        Otherwise: host-chunked at cfg.memory_bound, defaulting to the
        tile-aligned 16 on TPU for batches above 16 (see module docstring).
        fn may be called multiple times (once per chunk); per-call RNG
        streams inside fn therefore advance per chunk, exactly as the
        engines' pre-existing map_chunked paths did.
        """
        from loco_edit_tpu.utils.chunk import map_chunked

        x = jnp.asarray(x)
        ds = self._data_sharding()
        if ds is not None:
            n = int(ds.mesh.devices.size)
            b = x.shape[0]
            # per-device sublane alignment on TPU (ragged small batches waste
            # tiles AND relayout — BENCH.md batch sweep); plain mesh multiple
            # elsewhere so the dryrun exercises the exact shipped padding
            unit = n * 8 if jax.default_backend() == "tpu" and b > n else n
            pad = (-b) % unit
            if pad:
                x = jnp.concatenate(
                    [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
            out = fn(jax.device_put(x, ds))
            return out[:b] if pad else out
        bound = getattr(self.cfg, "memory_bound", 0)
        if not bound and x.shape[0] > 16:
            try:
                if jax.default_backend() == "tpu":
                    bound = 16
            except RuntimeError:
                pass
        return map_chunked(fn, x, bound)

    def shard_samples(self, x: jnp.ndarray) -> jnp.ndarray:
        """--mesh_data for a batch-edit sample axis: pad to the mesh and
        shard (deterministic programs only — padding is free there)."""
        ds = self._data_sharding()
        x = jnp.asarray(x)
        if ds is None:
            return x
        pad = (-x.shape[0]) % int(ds.mesh.devices.size)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        return jax.device_put(x, ds)


def concat_pc_strips(xt, vT, n_pc: int, *, scale: float, edit_step: float,
                     num_steps: int, vis_num: int):
    """Build every principal component's x-space-guidance walk strip and
    concatenate them into ONE frame batch (list of per-pc strips is returned
    too, for splitting results back). One tile-aligned chunked denoise of the
    concatenation replaces the reference's per-PC serial batches
    (edit.py:2340-2364) — measured 1.65x on uncond (BENCH.md round 3)."""
    from loco_edit_tpu.editing import x_space_guidance_strip

    per_pc = [x_space_guidance_strip(
        jnp.asarray(xt), vT[pc], scale=scale, edit_step=edit_step,
        num_steps=num_steps, vis_num=vis_num) for pc in range(n_pc)]
    if not per_pc:
        return [], None
    return per_pc, jnp.concatenate(per_pc, axis=0)


def split_pc_strips(per_pc, batch_out):
    """Split a concatenated per-PC result batch back into the per-pc dict."""
    import numpy as np

    out, offset = {}, 0
    arr = np.asarray(batch_out)
    for pc, sp in enumerate(per_pc):
        out[pc] = arr[offset:offset + sp.shape[0]]
        offset += sp.shape[0]
    return out
