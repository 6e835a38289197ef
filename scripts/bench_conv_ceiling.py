"""Pressure-test the "40% denoise MFU is the XLA conv ceiling" claim
(VERDICT r2 weak #2; BENCH.md GN-ablation entry).

Three measurements on the real chip:
  1. batch sweep of the full 99-step denoise program (the E2E hot loop) at
     batches 9 / 18 / 32 / 45 -> steps/s + MFU per batch: locates the MFU
     knee and quantifies what the batched-strip E2E change buys.
  2. the hottest 3x3 conv shapes of the P2 U-Net, XLA conv_general_dilated
     vs an explicit 9-shifted-matmul form (conv as 9 accumulated MXU
     matmuls — a genuinely different schedule, no im2col buffer), chained
     through lax.scan per the tunnel timing rule.
  3. same comparison under linearization (tangent+cotangent), the form the
     basis extraction actually runs.

stderr: details. stdout: one JSON line with everything.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, n=3):
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


PEAK = 197e12  # v5e bf16


def batch_sweep(results):
    from loco_edit_tpu.diffusion import LinspaceDDIM, ddim_generate
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset

    cfg = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0, 500.0)
    eps = lambda z, t: model.apply(params, z, t)  # noqa: E731
    grid = LinspaceDDIM().generation_grid(100)

    # per-step FLOPs from the loop-free single forward (cost_analysis counts
    # scan bodies once — CLAUDE.md rule)
    def step_flops(b):
        z = jnp.zeros((b, 256, 256, 3), jnp.float32)
        ca = jax.jit(lambda zz: eps(zz, 500.0)).lower(z).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])

    sweep = {}
    for b in (9, 18, 32, 45):
        z = jax.random.normal(jax.random.key(b), (b, 256, 256, 3), jnp.float32)
        gen = jax.jit(lambda zz: ddim_generate(eps, zz, grid))
        t0 = time.perf_counter()
        gen(z).block_until_ready()
        log(f"batch {b}: compile+first {time.perf_counter() - t0:.1f}s")
        dt = timeit(gen, z)
        fl = 99 * step_flops(b)
        mfu = fl / dt / PEAK
        sweep[b] = {"s": round(dt, 3), "steps_per_s": round(99 / dt, 2),
                    "img_steps_per_s": round(99 * b / dt, 1),
                    "mfu": round(mfu, 4)}
        log(f"batch {b}: {dt:.2f}s for 99 steps = {99 * b / dt:.0f} "
            f"img-steps/s, MFU {100 * mfu:.1f}%")
    results["denoise_batch_sweep"] = sweep


def _conv9(x, w):
    """3x3 SAME conv as 9 accumulated matmuls (each (B*H*W, Ci) @ (Ci, Co)
    on the MXU, no im2col buffer)."""
    b, h, ww, ci = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            s = jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (b, h, ww, ci))
            y = s @ w[dy, dx]
            out = y if out is None else out + y
    return out


def _conv_xla(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def conv_shapes(results):
    """Hottest P2 shapes: 256x256x128->128 (19.3 GF/img/conv) and
    64x64x256->256 (4.8 GF)."""
    report = {}
    for tag, (b, h, ci, co) in {
        "b9_256x256_128to128": (9, 256, 128, 128),
        "b45_256x256_128to128": (45, 256, 128, 128),
        "b9_64x64_256to256": (9, 64, 256, 256),
    }.items():
        x = jax.random.normal(jax.random.key(0), (b, h, h, ci), jnp.bfloat16)
        w = jax.random.normal(jax.random.key(1), (3, 3, ci, co),
                              jnp.bfloat16) * 0.05
        w9 = jnp.transpose(w, (0, 1, 2, 3))  # (3,3,Ci,Co) indexed w[dy,dx]
        n_chain = 20
        flops = 2.0 * b * h * h * ci * co * 9 * n_chain

        def chain(f, xx, weight):
            def body(c, _):
                return f(c, weight), None
            return jax.lax.scan(body, xx, None, length=n_chain)[0]

        entry = {}
        for name, f, weight in (("xla_conv", _conv_xla, w),
                                ("nine_matmuls", _conv9, w9)):
            # co==ci required for chaining; true for both shapes
            run = jax.jit(lambda xx, ww=weight, ff=f: chain(ff, xx, ww))
            t0 = time.perf_counter()
            run(x).block_until_ready()
            log(f"{tag}/{name}: compile+first {time.perf_counter() - t0:.1f}s")
            dt = timeit(run, x)
            entry[name] = {"s": round(dt, 4),
                           "tflops_s": round(flops / dt / 1e12, 1),
                           "mfu": round(flops / dt / PEAK, 4)}
            log(f"{tag}/{name}: {dt * 1e3:.1f} ms for {n_chain} convs "
                f"-> {flops / dt / 1e12:.1f} TF/s ({100 * flops / dt / PEAK:.1f}%)")
        report[tag] = entry
    results["conv_forms"] = report


def conv_shapes_linearized(results):
    """Tangent+cotangent through both conv forms — the subspace-iteration
    execution pattern (8-probe batch)."""
    report = {}
    b, h, ci, co = 8, 256, 128, 128
    x = jax.random.normal(jax.random.key(0), (1, h, h, ci), jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), (3, 3, ci, co), jnp.bfloat16) * 0.05
    n_chain = 10
    flops = 2.0 * 1 * h * h * ci * co * 9 * n_chain * (2 * b)  # jvp+vjp per probe

    for name, f in (("xla_conv", _conv_xla), ("nine_matmuls", _conv9)):
        def g(z, ff=f):
            def body(c, _):
                return ff(c, w), None
            return jax.lax.scan(body, z, None, length=n_chain)[0]

        def sweep_fn(z, v):
            _, jl = jax.linearize(g, z)
            vjp = jax.linear_transpose(jl, z)
            u = jax.vmap(jl)(v)
            return jax.vmap(lambda ui: vjp(ui)[0])(u)

        v = jax.random.normal(jax.random.key(2), (b,) + x.shape, jnp.bfloat16)
        run = jax.jit(sweep_fn)
        t0 = time.perf_counter()
        run(x, v)[0].block_until_ready()
        log(f"linearized/{name}: compile+first {time.perf_counter() - t0:.1f}s")
        dt = timeit(run, x, v)
        report[name] = {"s": round(dt, 4),
                        "tflops_s": round(flops / dt / 1e12, 1),
                        "mfu": round(flops / dt / PEAK, 4)}
        log(f"linearized/{name}: {dt * 1e3:.1f} ms -> {flops / dt / 1e12:.1f} "
            f"TF/s ({100 * flops / dt / PEAK:.1f}%)")
    results["conv_forms_linearized"] = report


def main():
    log("devices:", jax.devices())
    results = {}
    batch_sweep(results)
    conv_shapes(results)
    conv_shapes_linearized(results)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
