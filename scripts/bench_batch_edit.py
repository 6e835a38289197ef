"""Amortized per-image cost of the batch-edit API on the real TPU.

run_edit_batch (pipelines/uncond.py) runs N flagship edits as: ONE batched
forward program (the MFU-starved batch-1 leg), the fused dual-basis and
16-frame denoise-chunk programs reused across samples, and a PER-SAMPLE
chunked boost-tail strip denoise — a cross-sample concatenated variant was
measured SLOWER (11.9 s/image at N=4: the 141 MB device concat + reslice
outweigh the zero change in executed chunk count; BENCH.md). Strips
materialize to host as uint8 pixels.

stderr: details; stdout: one JSON line with per-image amortized seconds.
"""

import json
import os
import sys
import tempfile
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


def main():
    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset
    from loco_edit_tpu.models.base import Denoiser
    from loco_edit_tpu.pipelines import UncondEditConfig, UncondEditPipeline

    n = int(os.environ.get("LOCO_BATCH_N", "4"))
    log("devices:", jax.devices(), "batch:", n)
    cfg_m = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg_m)
    params = jax.jit(model.init)(jax.random.key(0),
                                 jnp.zeros((1, 256, 256, 3)), 500.0)
    den = Denoiser(eps_fn=lambda z, t: model.apply(params, z, t),
                   sample_shape=(256, 256, 3))

    td = tempfile.mkdtemp(prefix="bench_batch_")
    cfg = UncondEditConfig(
        for_steps=100, inv_steps=100, edit_t=0.6, performance_boosting_t=0.2,
        x_space_guidance_scale=0.5, x_space_guidance_num_step=16, vis_num=4,
        vis_num_pc=5, pca_rank=5, pca_rank_null=5, null_space_projection=True,
        min_iter=9, max_iter=10, convergence_threshold=0.0,
        pixel_output=True, result_folder=td, save_images=False)
    pipe = UncondEditPipeline(den, cfg, seed_everything(7))

    key = jax.random.key(1)
    xTs = np.asarray(jax.random.normal(key, (n, 256, 256, 3), jnp.float32))
    masks = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 1), (n, 256, 256, 3)) < 0.2)

    def once(tag):
        t0 = time.perf_counter()
        outs = pipe.run_edit_batch(
            xTs=xTs, masks=masks,
            sample_names=[f"{tag}-{i}" for i in range(n)])
        assert len(outs) == n
        assert all(s.dtype == np.uint8
                   for o in outs for s in o["strips"].values())
        return time.perf_counter() - t0

    t_cold = once("warm")
    log(f"cold (incl. compile): {t_cold:.1f}s")
    times = [once(f"r{i}") for i in range(2)]
    log(f"steady batch runs: {[f'{t:.3f}' for t in times]}")
    best = min(times)
    log(f"-> {best / n:.3f}s per image amortized (single-sample path: "
        "10.85s, BENCH.md)")
    print(json.dumps({
        "metric": f"flagship_batch{n}_edit_per_image_amortized",
        "value": round(best / n, 3), "unit": "s",
        "batch_total_s": round(best, 3),
        "runs": [round(t, 3) for t in times],
        "cold_s": round(t_cold, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
