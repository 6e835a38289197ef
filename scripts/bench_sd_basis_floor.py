"""SD basis-extraction floor analysis (VERDICT r4 weak #4).

Same methodology as scripts/bench_basis_floor.py (the uncond floor BENCH.md
round 4 shipped): derive the 100%-MFU executed-FLOPs floor for the SD
z-space basis program — 1 primal linearization of decode(PMP(z)) through the
865.9M-param SD 2.1 UNet + 512px VAE decoder (bf16, per-block remat; the
remat recompute is REAL executed work and is included, because the compiled
cost analysis counts the rematerialized ops) + ITERS x (8-probe tangent +
8-probe cotangent) sweeps — then time each component as a LOOP-FREE program
on the chip so the gap between floor and achieved is attributed, not
guessed. Reference target being replaced:
/root/reference/src/modules/edit.py:757-781 (get_x0 through the VAE) feeding
:830-915 (power iteration).

Components (each jitted standalone, min of 3 after warm-up):
  primal    — jax.linearize residual-producing forward (UNet+VAE), batch 1
  tangent   — 8-probe batched JVP through the stored linearization
  cotangent — sweep - tangent (cannot run standalone)
  gram+eigh — the (8x8) Gram step
  sweep16   — one fused tangent+cotangent sweep (the while-loop body)

Output: one JSON line (floor, components, achieved, residual).
"""

from __future__ import annotations

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RANK, R_PAD, ITERS = 5, 8, 10
PEAK = 197e12  # v5e dense bf16


def flops_of(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def timed(jitted, *args, n=3):
    r = jitted(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(jitted(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def cheap_params(model, *ex):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *ex)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        fill = 1.0 if name == "scale" else 0.01
        return jnp.full(s.shape, fill, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def main():
    log("devices:", jax.devices())
    from loco_edit_tpu.diffusion import LinspaceDDIM
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.editing.pullback import init_probes
    from loco_edit_tpu.models.sd import (SDUNet, VAEConfig, VAEDecoder,
                                         sd_preset)

    dtype = jnp.bfloat16
    ucfg = dataclasses.replace(sd_preset("sd21-base", dtype=dtype), remat=True)
    unet = SDUNet(ucfg)
    z_ex = jnp.zeros((1, 64, 64, 4), dtype)
    ctx = jax.random.normal(jax.random.key(3), (1, 77, 1024), jnp.float32) * 0.2
    uparams = cheap_params(unet, z_ex, jnp.zeros((1,)), ctx.astype(dtype))
    vae = VAEDecoder(VAEConfig(dtype=dtype, remat=True))
    vparams = cheap_params(vae, z_ex)

    dd = LinspaceDDIM(t_max=999, noise_schedule="scaled_linear")
    grid = dd.generation_grid(100)
    idx = dd.nearest_step_index(100, 0.7)
    t_edit, ab = float(grid.t[idx]), float(grid.alpha_bar[idx])
    gs, ctx_d = 7.5, ctx.astype(dtype)

    def eps(z, t):
        # CFG pair (null == for ctx here: timing-representative doubled batch)
        zz = jnp.concatenate([z, z])
        cc = jnp.concatenate([jnp.broadcast_to(ctx_d, (z.shape[0],) + ctx_d.shape[1:]),
                              jnp.zeros((z.shape[0],) + ctx_d.shape[1:], dtype)])
        tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (zz.shape[0],))
        e = unet.apply(uparams, zz.astype(dtype), tt, cc)
        e_c, e_u = jnp.split(e, 2)
        return e_u + gs * (e_c - e_u)

    def f(z):
        e = eps(z, t_edit)
        z0 = (z - e * jnp.sqrt(1.0 - ab)) / jnp.sqrt(ab)
        return vae.apply(vparams, (z0 / 0.18215).astype(dtype))

    key = jax.random.key(0)
    zt = jax.random.normal(jax.random.fold_in(key, 1), (1, 64, 64, 4),
                           jnp.float32)
    mask = (jax.random.uniform(jax.random.fold_in(key, 2),
                               (1, 512, 512, 3)) < 0.2).astype(jnp.float32)

    def fw(z):
        y = f(z)
        return y * mask.astype(y.dtype)

    # ---- headline program, measured whole ----------------------------------
    ours = jax.jit(lambda z: subspace_iteration(
        f, z, jax.random.fold_in(key, 3), rank=RANK, mask=mask,
        min_iter=ITERS - 1, max_iter=ITERS, tol=0.0, probe_chunk=8).vT)
    headline = timed(ours, zt)
    log(f"headline: {headline:.4f}s")

    # ---- loop-free components ----------------------------------------------
    d_in = zt.size
    v_pad = init_probes(jax.random.fold_in(key, 9), R_PAD, d_in)

    def primal(z):
        y, _ = jax.linearize(fw, z)
        return y

    def tangent(z, v):
        _, jl = jax.linearize(fw, z)
        return jax.vmap(lambda vi: jl(vi.reshape(z.shape).astype(z.dtype)))(v)

    def sweep(z, v):
        _, jl = jax.linearize(fw, z)
        vjp = jax.linear_transpose(jl, z)
        u = jax.vmap(lambda vi: jl(vi.reshape(z.shape).astype(z.dtype)))(v)
        vp = jax.vmap(lambda ui: vjp(ui)[0].reshape(-1).astype(jnp.float32))(u)
        return vp

    def gram_step(vp, v):
        gram = vp @ vp.T
        w, q = jnp.linalg.eigh(gram)
        w, q = w[::-1], q[:, ::-1]
        s = jnp.sqrt(jnp.maximum(w, 0.0))
        v_new = (q.T @ vp) / jnp.maximum(s, 1e-20)[:, None]
        dots = jnp.sum(v_new * v, axis=1, keepdims=True)
        return v_new * jnp.where(dots < 0, -1.0, 1.0)

    j_primal = jax.jit(primal)
    j_tangent = jax.jit(tangent)
    j_sweep = jax.jit(sweep)
    j_gram = jax.jit(gram_step)

    t_primal = timed(j_primal, zt)
    t_tangent = timed(j_tangent, zt, v_pad)
    t_sweep = timed(j_sweep, zt, v_pad)
    vp0 = j_sweep(zt, v_pad)
    t_gram = timed(j_gram, vp0, v_pad)
    t_cotangent = t_sweep - t_tangent

    f_primal = flops_of(j_primal, zt)
    f_sweep = flops_of(j_sweep, zt, v_pad)
    f_gram = flops_of(j_gram, vp0, v_pad)

    # ---- floors -------------------------------------------------------------
    flops_pad = f_primal + ITERS * (f_sweep - f_primal) + ITERS * f_gram
    flops_useful = (f_primal + ITERS * (f_sweep - f_primal) * (RANK / R_PAD)
                    + ITERS * f_gram)
    floor_pad = flops_pad / PEAK

    comp_sum = t_primal + ITERS * (t_sweep - t_primal) + ITERS * t_gram
    out = {
        "metric": "sd_basis_floor_analysis_rank5_0.7T_512px",
        "unit": "s",
        "headline_s": round(headline, 4),
        "floor_padded_s": round(floor_pad, 4),
        "floor_useful_s": round(flops_useful / PEAK, 4),
        "mfu_padded": round(flops_pad / PEAK / headline, 4),
        "analytic_tf": {"primal": round(f_primal / 1e12, 3),
                        "sweep16": round((f_sweep - f_primal) / 1e12, 3),
                        "gram": round(f_gram / 1e12, 4)},
        "component_s": {"primal": round(t_primal, 4),
                        "tangent8": round(t_tangent - t_primal, 4),
                        "cotangent8": round(t_cotangent, 4),
                        "sweep16": round(t_sweep - t_primal, 4),
                        "gram_eigh": round(t_gram, 4)},
        "component_mfu": {
            "primal": round(f_primal / PEAK / t_primal, 3),
            "sweep16": round((f_sweep - f_primal) / PEAK
                             / max(t_sweep - t_primal, 1e-9), 3)},
        "loopfree_sum_s": round(comp_sum, 4),
        "loop_overhead_s": round(headline - comp_sum, 4),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
