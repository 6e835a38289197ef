"""Headline benchmark: rank-5 masked PMP-Jacobian basis extraction at 0.6T on
the flagship 256px P2-preset ADM U-Net (bf16), single chip.

Protocol (BASELINE.md): fixed 10 subspace-iteration sweeps (the reference's
min_iter floor, edit.py:2422), rank 5, ~20% spatial mask. `value` is wall
seconds for the TPU-native batched implementation. `vs_baseline` is the
speedup over a faithful same-chip emulation of the reference's execution
pattern (serial per-probe backward passes, thin (r x d) SVD instead of the
Gram trick, per-iteration host sync for the convergence printout — matching
src/modules/edit.py:2443-2494), so the ratio isolates the framework design
from the hardware swap.

Prints exactly ONE JSON line on stdout — emitted IMMEDIATELY after the two
measurements it needs (ours + reference-pattern), before any secondary
section, so a slow cold compile in the extras can never starve the driver's
window of the headline metric (round 3 lost its number exactly this way:
rc=124 with the headline already measured but unprinted). Details and all
secondary measurements (MFU cost analysis, fused dual pair, denoise
throughput) go to stderr, each behind a wall-clock guard
(LOCO_BENCH_GUARD_S, default 600 s elapsed; LOCO_BENCH_FULL=1 forces them).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the tunnel TPU's compile service is slow (minutes
# for the 256px U-Net autodiff graphs); cache hits make re-runs start in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


RANK = 5
ITERS = 10
IMG = 256
T_START = time.monotonic()

# peak dense bf16 FLOP/s per chip, by device_kind substring
_PEAK_FLOPS = (
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v4", 275e12),
)


def peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_FLOPS:
        if sub in kind:
            return peak
    return None


def program_flops_lowered(jitted, *args) -> float | None:
    """Analytic FLOPs WITHOUT a backend compile: host-side HLO cost analysis
    of the lowered (unoptimized) program. Measured within 1.2% of the
    compiled cost_analysis on the linearize+transpose sweep program (CPU,
    tiny ADM preset: 12.07e9 vs 12.22e9) while costing seconds instead of a
    ~10 min cold tunnel compile per shape — this is what lets the MFU
    section run UNGUARDED even when the headline's cold compiles already ate
    the driver's wall-clock budget (BENCH_r04.json: every extra was
    guard-skipped at 827 s).

    The axon PJRT plugin returns None from lowered cost_analysis (verified
    round 5), so on failure the program is re-lowered for the in-process CPU
    backend — FLOP counting is structural, the CPU platform coexists with
    the plugin, and this costs one extra trace (seconds), never a compile."""
    try:
        ca = jitted.lower(*args).cost_analysis()
        if ca is not None and "flops" in ca:
            return float(ca["flops"])
    except Exception as e:  # noqa: BLE001
        log("lowered cost_analysis failed:", e)
    try:
        with jax.default_device(jax.local_devices(backend="cpu")[0]):
            return float(jitted.lower(*args).cost_analysis()["flops"])
    except Exception as e:  # noqa: BLE001
        log("CPU-backend lowered cost_analysis unavailable:", e)
        return None


def mfu(flops: float | None, seconds: float) -> float | None:
    peak = peak_flops()
    if flops is None or peak is None or seconds <= 0:
        return None
    return flops / seconds / peak


def build_model():
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset

    cfg = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    # real initializer params (not constant fill): the timing is
    # data-independent, but realistic weight/activation magnitudes mean the
    # measured program is numerically representative of a checkpointed run
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0)
    return model, params


def main():
    log("devices:", jax.devices())
    from loco_edit_tpu.diffusion import LinspaceDDIM
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.editing.pullback import init_probes, pmp_pullback_fn

    model, params = build_model()
    dd = LinspaceDDIM()
    edit_idx = dd.nearest_step_index(100, 0.6)
    grid = dd.generation_grid(100)
    t_edit = float(grid.t[edit_idx])
    ab_edit = float(grid.alpha_bar[edit_idx])

    eps_fn = lambda z, tt: model.apply(params, z, tt)  # noqa: E731
    f = pmp_pullback_fn(eps_fn, ab_edit, t_edit)

    key = jax.random.key(0)
    xt = jax.random.normal(jax.random.fold_in(key, 1), (1, IMG, IMG, 3), jnp.float32)
    mask = (jax.random.uniform(jax.random.fold_in(key, 2), (1, IMG, IMG, 3)) < 0.2
            ).astype(jnp.float32)

    # ---- TPU-native batched implementation --------------------------------
    def ours(z):
        return subspace_iteration(f, z, jax.random.fold_in(key, 3), rank=RANK,
                                  mask=mask, min_iter=ITERS - 1, max_iter=ITERS,
                                  tol=0.0).vT

    ours_jit = jax.jit(ours)
    vt = ours_jit(xt)
    vt.block_until_ready()  # compile + warm-up
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        ours_jit(xt).block_until_ready()
        times.append(time.perf_counter() - t0)
    ours_sec = min(times)
    log(f"ours: rank-{RANK} x {ITERS} iters = {ours_sec:.3f}s "
        f"(runs: {[f'{t:.3f}' for t in times]})")

    # ---- reference-pattern emulation on the same chip ----------------------
    def fmask(z):
        y = f(z)
        return y * mask.astype(y.dtype)

    jvp_batch = jax.jit(lambda z, v: jax.vmap(
        lambda vi: jax.jvp(fmask, (z,), (vi.reshape(z.shape).astype(z.dtype),))[1])(v))

    def vjp_serial_factory():
        @jax.jit
        def one_bwd(z, ui):
            _, pull = jax.vjp(fmask, z)
            return pull(ui)[0].reshape(-1).astype(jnp.float32)
        return one_bwd

    one_bwd = vjp_serial_factory()
    thin_svd = jax.jit(lambda vp: jnp.linalg.svd(vp, full_matrices=False))

    def reference_pattern_iteration(v):
        # chunked JVP (reference chunk_size=5 == rank here: one batched fwd)
        u = jvp_batch(xt, v)
        # serial per-probe backward passes (torch.autograd.functional.jacobian
        # loops over outputs; each probe re-linearizes)
        vps = [one_bwd(xt, u[i]) for i in range(RANK)]
        vp = jnp.stack(vps)
        _, s, vrows = thin_svd(vp)
        vrows.block_until_ready()  # per-iteration host sync (convergence print)
        return vrows

    v = init_probes(jax.random.fold_in(key, 3), RANK, xt.size)
    v = reference_pattern_iteration(v)  # warm-up/compile
    t0 = time.perf_counter()
    n_timed = 3
    for _ in range(n_timed):
        v = reference_pattern_iteration(v)
    ref_sec = (time.perf_counter() - t0) / n_timed * ITERS
    log(f"reference-pattern (same chip): {ITERS} iters = {ref_sec:.3f}s "
        f"(extrapolated from {n_timed})")

    # ---- THE headline JSON line: printed NOW, before any secondary section.
    # Everything below is stderr-only diagnostics; a cold compile there must
    # never cost the driver the metric (BENCH_r03.json rc=124 post-mortem).
    out = {
        "metric": f"rank{RANK}_masked_basis_extraction_0.6T_P2_256px_{ITERS}iters",
        "value": round(ours_sec, 4),
        "unit": "s",
        "vs_baseline": round(ref_sec / ours_sec, 3),
    }
    print(json.dumps(out), flush=True)

    # 600 s: a warm-cache run reaches the last section at ~450 s through the
    # tunnel (round-5 measurement) and the round-4 driver tolerated 827 s
    # total; a cold run skips the sections either way.
    guard_s = float(os.environ.get("LOCO_BENCH_GUARD_S", "600"))
    force = os.environ.get("LOCO_BENCH_FULL", "") == "1"

    def budget_left(section: str) -> bool:
        elapsed = time.monotonic() - T_START
        if force or elapsed < guard_s:
            return True
        log(f"[skip] {section}: {elapsed:.0f}s elapsed > {guard_s:.0f}s guard")
        return False

    try:
        extras(f, eps_fn, grid, xt, mask, key, ours_sec, budget_left)
    except Exception as e:  # noqa: BLE001 — extras must never cost the rc
        log("extras failed (headline already emitted):", repr(e))


def extras(f, eps_fn, grid, xt, mask, key, ours_sec, budget_left):
    """Secondary measurements, stderr only. Each section is skipped once the
    wall-clock guard trips, so a cold tunnel compile cannot starve the
    driver's window (each full-U-Net autodiff shape costs ~10 min cold)."""
    from loco_edit_tpu.editing import subspace_iteration

    # Analytic FLOPs from LOOP-FREE programs (XLA cost_analysis counts a
    # while/scan body once, so the looped programs undercount): basis =
    # primal linearization + ITERS x (tangent+cotangent sweep). UNGUARDED:
    # uses the lowered (no-backend-compile) cost analysis, so it costs
    # seconds even when the headline's cold compiles already exhausted the
    # wall-clock guard (the round-4 driver capture lost this section).
    if True:
        from loco_edit_tpu.editing.pullback import init_probes as _init_probes

        def fmask_w(z):
            y = f(z)
            return y * mask.astype(y.dtype)

        d_in = xt.size
        r_eff = 8  # padded probe batch (pullback pads rank 5 -> 8 on TPU)

        def primal_only(z):
            y, _ = jax.linearize(fmask_w, z)
            return y

        def primal_and_sweep(z, v):
            _, jl = jax.linearize(fmask_w, z)
            vjp = jax.linear_transpose(jl, z)
            u = jax.vmap(lambda vi: jl(vi.reshape(z.shape).astype(z.dtype)))(v)
            vp = jax.vmap(lambda ui: vjp(ui)[0].reshape(-1).astype(jnp.float32))(u)
            return vp

        v_probe = _init_probes(jax.random.fold_in(key, 9), r_eff, d_in)
        fp = program_flops_lowered(jax.jit(primal_only), xt)
        fps = program_flops_lowered(jax.jit(primal_and_sweep), xt, v_probe)
        if fp is not None and fps is not None:
            basis_flops = fp + ITERS * (fps - fp)
            basis_mfu = mfu(basis_flops, ours_sec)
            if basis_mfu is not None:
                log(f"basis MFU: {basis_flops / 1e12:.2f} TF analytic / "
                    f"{ours_sec:.3f}s = {basis_flops / ours_sec / 1e12:.1f} "
                    f"TF/s -> {100 * basis_mfu:.1f}% of peak")

    # Fused modify+null pair (the shipped flagship path): both flagship bases
    # from ONE dual program on the shared Jacobian; timed HOST-MATERIALIZED
    # (np.asarray) against the two-solo-program form, since block_until_ready
    # through the tunnel can under-report multi-program sequences (BENCH.md).
    if budget_left("fused modify+null pair"):
        from loco_edit_tpu.editing import dual_subspace_iteration

        ka, kb = jax.random.fold_in(key, 3), jax.random.fold_in(key, 4)
        dual_jit = jax.jit(lambda z: tuple(
            b.vT for b in dual_subspace_iteration(
                f, z, ka, kb, rank_a=RANK, rank_b=RANK, mask_a=mask,
                mask_b=1.0 - mask, min_iter=ITERS - 1, max_iter=ITERS,
                tol=0.0)))
        solo_jit = jax.jit(lambda z, m, k: subspace_iteration(
            f, z, k, rank=RANK, mask=m, min_iter=ITERS - 1, max_iter=ITERS,
            tol=0.0).vT)

        def _mat(fn):
            r = fn()
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn()
                ts.append(time.perf_counter() - t0)
            del r
            return min(ts)

        dual_sec = _mat(lambda: [np.asarray(v) for v in dual_jit(xt)])
        solo_sec = _mat(lambda: (np.asarray(solo_jit(xt, mask, ka)),
                                 np.asarray(solo_jit(xt, 1.0 - mask, kb))))
        log(f"fused modify+null pair: {dual_sec:.3f}s vs two solo programs "
            f"{solo_sec:.3f}s ({solo_sec / dual_sec:.2f}x, host-materialized)")

    # Denoise throughput. batch 32: the measured MFU knee (round-3 sweep,
    # BENCH.md — batch 9 was starved at 41%; tile-aligned 16/32/48 ~70-72%)
    if budget_left("denoise throughput"):
        from loco_edit_tpu.diffusion import ddim_generate

        dn_b = 32
        strip = jax.random.normal(jax.random.fold_in(key, 7),
                                  (dn_b, IMG, IMG, 3), jnp.float32)
        gen = jax.jit(lambda z: ddim_generate(eps_fn, z, grid))
        gen(strip).block_until_ready()
        t0 = time.perf_counter()
        gen(strip).block_until_ready()
        dt = time.perf_counter() - t0
        # per-step FLOPs from the loop-free single forward, x 99 steps
        # (lowered analysis: no extra backend compile for a timing-only shape)
        step_flops = program_flops_lowered(
            jax.jit(lambda z: eps_fn(z, 500.0)), strip)
        log(f"denoise: 99 steps x batch {dn_b} @256px = {dt:.2f}s "
            f"({99 / dt:.2f} steps/s, {99 * dn_b / dt:.1f} img-steps/s)")
        if step_flops is not None:
            denoise_flops = 99 * step_flops
            denoise_mfu = mfu(denoise_flops, dt)
            if denoise_mfu is not None:
                log(f"denoise MFU: {denoise_flops / 1e12:.2f} TF / {dt:.2f}s "
                    f"-> {100 * denoise_mfu:.1f}% of peak")


if __name__ == "__main__":
    main()
