"""BASELINE.md protocol rank sweep (rank 1 / 5 / 10) for the masked basis
extraction at 0.6T on the P2 256px U-Net, plus the rank-10 showdown VERDICT
r2 weak #3 asks for: probe_chunk=8 (two lax.map chunks of one full 8-sublane
tile each) vs the padded-16 batch (60% extra probe work in one program).

stderr: details; stdout: one JSON line.
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


ITERS = 10
IMG = 256


def main():
    from loco_edit_tpu.diffusion import LinspaceDDIM
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.editing.pullback import pmp_pullback_fn
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset

    log("devices:", jax.devices())
    cfg = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, IMG, IMG, 3)), 500.0)
    eps = lambda z, t: model.apply(params, z, t)  # noqa: E731
    dd = LinspaceDDIM()
    grid = dd.generation_grid(100)
    i6 = dd.nearest_step_index(100, 0.6)
    f = pmp_pullback_fn(eps, float(grid.alpha_bar[i6]), float(grid.t[i6]))

    key = jax.random.key(0)
    xt = jax.random.normal(jax.random.fold_in(key, 1), (1, IMG, IMG, 3),
                           jnp.float32)
    mask = (jax.random.uniform(jax.random.fold_in(key, 2),
                               (1, IMG, IMG, 3)) < 0.2).astype(jnp.float32)

    def measure(tag, rank, probe_chunk=None, pad_probes=None):
        def run(z):
            return subspace_iteration(
                f, z, jax.random.fold_in(key, 3), rank=rank, mask=mask,
                min_iter=ITERS - 1, max_iter=ITERS, tol=0.0,
                probe_chunk=probe_chunk, pad_probes=pad_probes).vT

        jit = jax.jit(run)
        t0 = time.perf_counter()
        jit(xt).block_until_ready()
        log(f"{tag}: compile+first {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jit(xt).block_until_ready()
            ts.append(time.perf_counter() - t0)
        log(f"{tag}: {min(ts):.3f}s (runs {[f'{t:.3f}' for t in ts]})")
        return round(min(ts), 4)

    out = {
        "rank1": measure("rank1 (pad->8)", 1),
        "rank5": measure("rank5 (pad->8)", 5),
        "rank10_pad16": measure("rank10 padded->16", 10),
        "rank10_chunk8": measure("rank10 chunk8 (2x8 lax.map)", 10,
                                 probe_chunk=8),
        "rank10_ragged": measure("rank10 ragged (no pad)", 10,
                                 pad_probes=False),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
