"""Probe-chunk sweep for the FUSED dual basis at SD scale under the lean JVP.

The fused modify+null basis (dual_subspace_iteration, 5+5 ranks -> 16 padded
probes) is the dominant leg of the SD unsupervised edit (~18 s of 78.7 s,
BENCH.md round 5). The shipped bf16 default chunks probes at 8 (the full
sublane tile that fit HBM under PLAIN autodiff — _auto_probe_chunk,
pipelines/sd.py). The memory-lean attention JVP halves the logits-sized
tangent buffers, so a single 16-probe chunk may now fit — fewer lax.map
trips and a 2x wider MXU batch per sweep. This measures the shipped dual
program (SD 2.1-base UNet + 512px VAE, bf16, dots_no_batch remat, 10 fixed
sweeps, complementary ~20% masks) at probe_chunk 8 vs 16; an OOM at 16 is
reported as a measured negative.

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
    from loco_edit_tpu.editing import dual_subspace_iteration
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
    for chunk in (8, 16):
        run = jax.jit(lambda z, c=chunk: dual_subspace_iteration(
            f, z, jax.random.fold_in(key, 3), jax.random.fold_in(key, 4),
            rank_a=RANK, rank_b=RANK, mask_a=mask, mask_b=1.0 - mask,
            min_iter=ITERS - 1, max_iter=ITERS, tol=0.0,
            probe_chunk=c)[0].vT)
        try:
            t0 = time.perf_counter()
            jax.block_until_ready(run(zt))
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(zt))
                ts.append(time.perf_counter() - t0)
            results[f"chunk{chunk}"] = round(min(ts), 4)
            log(f"probe_chunk={chunk}: {min(ts):.4f}s (first {compile_s:.1f}s,"
                f" runs {[f'{t:.3f}' for t in ts]})")
        except Exception as e:  # XlaRuntimeError OOM is the expected failure
            results[f"chunk{chunk}"] = f"failed: {type(e).__name__}"
            log(f"probe_chunk={chunk}: FAILED {type(e).__name__}: "
                f"{str(e)[:300]}")

    out = {"metric": "sd_dual_basis_probe_chunk_rank5+5_0.7T", "unit": "s",
           **results}
    if isinstance(results.get("chunk8"), float) and \
       isinstance(results.get("chunk16"), float):
        out["speedup_16_over_8"] = round(results["chunk8"] /
                                         results["chunk16"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
