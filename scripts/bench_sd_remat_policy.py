"""Does a remat policy close any of the SD basis floor gap? (VERDICT r4 #4)

The shipped SD basis program runs per-block remat with FULL recompute
(remat=True, policy=None); the floor analysis counts that recompute as
executed work (bench_sd_basis_floor.py: 8.91 s achieved vs 3.81 s floor at
42.8% MFU). `dots_no_batch` (jax.checkpoint_policies.dots_with_no_batch_dims
_saveable) keeps weight-matmul outputs and recomputes only batched dots —
less recompute inside the tangent/cotangent sweeps for a few MB/block of
residuals. This measures the same rank-5 0.7T headline under both policies
(and no-remat, if it fits) so the answer is a number, not a guess.

stderr: details; stdout: one JSON line.
"""

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

RANK, ITERS = 5, 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def cheap_params(model, *ex):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *ex)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        fill = 1.0 if name == "scale" else 0.01
        return jnp.full(s.shape, fill, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def main():
    from loco_edit_tpu.diffusion import LinspaceDDIM
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.models.sd import (SDUNet, VAEConfig, VAEDecoder,
                                         sd_preset)

    log("devices:", jax.devices())
    dtype = jnp.bfloat16
    key = jax.random.key(0)
    zt = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 64, 4),
                           jnp.float32)
    mask = (jax.random.uniform(jax.random.fold_in(key, 2),
                               (1, 512, 512, 3)) < 0.2).astype(jnp.float32)
    ctx = jax.random.normal(jax.random.key(3), (1, 77, 1024), jnp.float32) * 0.2

    dd = LinspaceDDIM(t_max=999, noise_schedule="scaled_linear")
    grid = dd.generation_grid(100)
    idx = dd.nearest_step_index(100, 0.7)
    t_edit, ab = float(grid.t[idx]), float(grid.alpha_bar[idx])

    results = {}
    for label, remat, policy in [("remat_full", True, None),
                                 ("remat_dots_no_batch", True,
                                  "dots_no_batch"),
                                 ("no_remat", False, None)]:
        ucfg = dataclasses.replace(sd_preset("sd21-base", dtype=dtype),
                                   remat=remat, remat_policy=policy)
        unet = SDUNet(ucfg)
        uparams = cheap_params(unet, jnp.zeros((1, 64, 64, 4), dtype),
                               jnp.zeros((1,)), ctx.astype(dtype))
        vae = VAEDecoder(VAEConfig(dtype=dtype, remat=True))
        vparams = cheap_params(vae, jnp.zeros((1, 64, 64, 4), dtype))
        ctx_d = ctx.astype(dtype)
        gs = 7.5

        def eps(z, t):
            zz = jnp.concatenate([z, z])
            cc = jnp.concatenate(
                [jnp.broadcast_to(ctx_d, (z.shape[0],) + ctx_d.shape[1:]),
                 jnp.zeros((z.shape[0],) + ctx_d.shape[1:], dtype)])
            tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (zz.shape[0],))
            e = unet.apply(uparams, zz.astype(dtype), tt, cc)
            e_c, e_u = jnp.split(e, 2)
            return e_u + gs * (e_c - e_u)

        def f(z):
            e = eps(z, t_edit)
            z0 = (z - e * jnp.sqrt(1.0 - ab)) / jnp.sqrt(ab)
            return vae.apply(vparams, (z0 / 0.18215).astype(dtype))

        run = jax.jit(lambda z: subspace_iteration(
            f, z, jax.random.fold_in(key, 3), rank=RANK, mask=mask,
            min_iter=ITERS - 1, max_iter=ITERS, tol=0.0, probe_chunk=8).vT)
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(run(zt))
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(zt))
                ts.append(time.perf_counter() - t0)
            results[label] = round(min(ts), 4)
            log(f"{label}: {min(ts):.4f}s (first {compile_s:.1f}s, "
                f"runs {[f'{t:.3f}' for t in ts]})")
        except Exception as e:  # noqa: BLE001 — OOM is an expected outcome
            results[label] = None
            log(f"{label}: FAILED ({type(e).__name__}: {str(e)[:200]})")

    base, dots = results.get("remat_full"), results.get("remat_dots_no_batch")
    print(json.dumps({
        "metric": "sd_basis_remat_policy_rank5_0.7T",
        "unit": "s", **results,
        "speedup": round(base / dots, 3) if base and dots else None,
    }), flush=True)


if __name__ == "__main__":
    main()
