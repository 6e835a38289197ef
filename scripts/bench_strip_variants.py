"""Execution-shape shootout for the flagship strip denoise (60 steps from
0.6T, 45 frames total = 5 PCs x 9-frame mirrored strips, 256px P2 bf16):

  - one batch-45 program        (round-3 pipeline form)
  - five sequential batch-9     (the reference's per-PC serialization)
  - padded batch-48 (tile-aligned), 2x24, 3x16, 2x32(pad 64)

Each variant timed with block_until_ready on every program (the honest
cross-call rule, CLAUDE.md). stdout: one JSON line.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from loco_edit_tpu.diffusion import LinspaceDDIM, ddim_generate
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset

    log("devices:", jax.devices())
    cfg = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 256, 256, 3)), 500.0)
    eps = lambda z, t: model.apply(params, z, t)  # noqa: E731
    dd = LinspaceDDIM()
    grid = dd.generation_grid(100)
    i6 = dd.nearest_step_index(100, 0.6)
    steps = len(grid) - i6
    log(f"strip denoise: {steps} steps from idx {i6}")

    gens = {}

    def gen_b(b):
        if b not in gens:
            gens[b] = jax.jit(lambda z: ddim_generate(eps, z, grid,
                                                      start_idx=i6))
        return gens[b]

    x = jax.random.normal(jax.random.key(1), (64, 256, 256, 3), jnp.float32)

    def run_variant(tag, chunks):
        fns = [gen_b(b) for b in chunks]
        for f, b in zip(fns, chunks):
            t0 = time.perf_counter()
            f(x[:b]).block_until_ready()
            log(f"{tag}: chunk {b} compile+first {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for f, b in zip(fns, chunks):
                f(x[:b]).block_until_ready()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        log(f"{tag}: {best:.3f}s (runs {[f'{t:.3f}' for t in ts]})")
        return round(best, 3)

    out = {
        "one_b45": run_variant("1x45", [45]),
        "five_b9": run_variant("5x9 (reference per-PC)", [9] * 5),
        "one_b48_padded": run_variant("1x48 pad", [48]),
        "two_b24": run_variant("2x24 pad", [24, 24]),
        "three_b16": run_variant("3x16 pad", [16, 16, 16]),
        "two_b32": run_variant("2x32 pad", [32, 32]),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
