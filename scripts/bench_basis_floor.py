"""Basis-extraction floor analysis (VERDICT r3 #6).

Derives the 100%-MFU floor for the headline program — 1 primal
linearization + ITERS x (R_pad tangent + R_pad cotangent) passes of the
flagship 256px P2 U-Net — the same way BENCH.md derived the 5.3 s denoise
floor, then times each component as a LOOP-FREE program on the chip so the
gap between the floor and the achieved headline number is attributed, not
guessed. (XLA cost_analysis counts a while-loop body once, so all analytic
FLOPs come from loop-free programs x trip count — the BENCH.md protocol.)

Components timed (each jitted standalone, min of 3 after warm-up):
  primal    — jax.linearize residual-producing forward, batch 1
  tangent   — 8-probe batched JVP through the stored linearization
  cotangent — 8-probe batched transposed-J application
  gram+eigh — the (8x8) Gram, eigh, rescale, sign-align step
  sweep16   — one fused tangent+cotangent sweep (what the loop body runs)

Output: one JSON line with the floor (padded FLOPs and useful rank-5
FLOPs), the component times, their sum vs the measured headline, and the
residual (loop/dispatch overhead the components cannot see).
"""

from __future__ import annotations

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


RANK, R_PAD, ITERS, IMG = 5, 8, 10, 256
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


def main():
    log("devices:", jax.devices())
    from loco_edit_tpu.diffusion import LinspaceDDIM
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.editing.pullback import init_probes, pmp_pullback_fn
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset

    cfg = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    x0 = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0, 500.0)

    dd = LinspaceDDIM()
    idx = dd.nearest_step_index(100, 0.6)
    grid = dd.generation_grid(100)
    f = pmp_pullback_fn(lambda z, tt: model.apply(params, z, tt),
                        float(grid.alpha_bar[idx]), float(grid.t[idx]))

    key = jax.random.key(0)
    xt = jax.random.normal(jax.random.fold_in(key, 1), x0.shape, jnp.float32)
    mask = (jax.random.uniform(jax.random.fold_in(key, 2), x0.shape) < 0.2
            ).astype(jnp.float32)

    def fw(z):
        y = f(z)
        return y * mask.astype(y.dtype)

    # ---- headline program, measured whole ----------------------------------
    ours = jax.jit(lambda z: subspace_iteration(
        f, z, jax.random.fold_in(key, 3), rank=RANK, mask=mask,
        min_iter=ITERS - 1, max_iter=ITERS, tol=0.0).vT)
    headline = timed(ours, xt)
    log(f"headline: {headline:.4f}s")

    # ---- loop-free components ----------------------------------------------
    d_in = xt.size
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

    t_primal = timed(j_primal, xt)
    t_tangent = timed(j_tangent, xt, v_pad)
    t_sweep = timed(j_sweep, xt, v_pad)
    vp0 = j_sweep(xt, v_pad)
    t_gram = timed(j_gram, vp0, v_pad)
    # cotangent cannot run standalone (needs the stored linearization), so
    # attribute it as sweep - tangent; both include the shared primal, which
    # cancels in the difference.
    t_cotangent = t_sweep - t_tangent

    f_primal = flops_of(j_primal, xt)
    f_sweep = flops_of(j_sweep, xt, v_pad)
    f_gram = flops_of(j_gram, vp0, v_pad)

    # ---- floors -------------------------------------------------------------
    flops_pad = f_primal + ITERS * (f_sweep - f_primal) + ITERS * f_gram
    # useful = the rank-5 fraction of every probe-batched op (the padded
    # tail rows are thrown away); the primal is fully useful.
    flops_useful = (f_primal + ITERS * (f_sweep - f_primal) * (RANK / R_PAD)
                    + ITERS * f_gram)
    floor_pad = flops_pad / PEAK
    floor_useful = flops_useful / PEAK

    comp_sum = t_primal + ITERS * (t_sweep - t_primal) + ITERS * t_gram
    out = {
        "metric": "basis_floor_analysis_rank5_0.6T_P2_256px",
        "unit": "s",
        "headline_s": round(headline, 4),
        "floor_padded_s": round(floor_pad, 4),
        "floor_useful_s": round(floor_useful, 4),
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
