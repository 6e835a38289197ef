"""Whole-basis A/B of the memory-lean attention JVP on the SD rank-5 basis.

Same headline as bench_sd_basis_floor.py / bench_sd_remat_policy.py (rank-5
masked basis at 0.7T through the 512px VAE, 10 fixed sweeps, shipped config:
bf16, per-block remat with dots_no_batch, probe_chunk=8), measured with
LOCO_ATTN_JVP=ad (plain autodiff — the round-4/5 baseline numbers) and
=lean (ops/attention.py custom rule: model-dtype logits-sized tangent
streams, no dW materialization). The layer-level version of this A/B is
scripts/bench_attn_jvp.py; this is the number that decides the default.

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

    ucfg = dataclasses.replace(sd_preset("sd21-base", dtype=dtype),
                               remat=True, remat_policy="dots_no_batch")
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

    results = {}
    for mode in ("ad", "lean"):
        os.environ["LOCO_ATTN_JVP"] = mode  # read at trace time
        run = jax.jit(lambda z: subspace_iteration(
            f, z, jax.random.fold_in(key, 3), rank=RANK, mask=mask,
            min_iter=ITERS - 1, max_iter=ITERS, tol=0.0, probe_chunk=8).vT)
        t0 = time.perf_counter()
        jax.block_until_ready(run(zt))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run(zt))
            ts.append(time.perf_counter() - t0)
        results[mode] = round(min(ts), 4)
        log(f"attn_jvp={mode}: {min(ts):.4f}s (first {compile_s:.1f}s, "
            f"runs {[f'{t:.3f}' for t in ts]})")

    print(json.dumps({
        "metric": "sd_basis_attn_jvp_rank5_0.7T",
        "unit": "s", **results,
        "speedup": round(results["ad"] / results["lean"], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
