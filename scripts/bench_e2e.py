"""Steady-state E2E timing of the flagship edit on the real TPU.

Full LOCO-Edit on one sample (reference flagship path, edit.py:2215-2366):
rank-5 masked basis (10 fixed sweeps) + rank-5 null basis + null projection
+ 16-step +/- walks on 5 PCs + boost-tail strip denoise of ALL strips as one
batch-45 program + 40-step forward to edit_t, seeded xT (no inversion),
P2-preset 256px ADM U-Net in bf16, single chip.

Round-2 history (BENCH.md): 5.63-5.75 s/edit with the strip denoise executed
as five sequential batch-9 programs; this script measures the batched form.

Usage: python scripts/bench_e2e.py  (details on stderr, one JSON on stdout)
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

    log("devices:", jax.devices())
    cfg_m = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg_m)
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x0, 500.0)
    den = Denoiser(eps_fn=lambda z, t: model.apply(params, z, t),
                   sample_shape=(256, 256, 3))

    td = tempfile.mkdtemp(prefix="bench_e2e_")
    cfg = UncondEditConfig(
        for_steps=100, inv_steps=100, edit_t=0.6, performance_boosting_t=0.2,
        x_space_guidance_scale=0.5, x_space_guidance_edit_step=1.0,
        x_space_guidance_num_step=16, vis_num=4, vis_num_pc=5,
        pca_rank=5, pca_rank_null=5, null_space_projection=True,
        min_iter=9, max_iter=10, convergence_threshold=0.0,
        # strips materialize as their final uint8 PNG payload, converted on
        # device (to_uint8_pixels_device): the f32 pull costs ~1 s through
        # this dev chip's ~35 MB/s tunnel (bench_e2e_breakdown.py) and the
        # uint8 pixels ARE the artifact the edit produces
        pixel_output=True,
        result_folder=td, save_images=False)
    pipe = UncondEditPipeline(den, cfg, seed_everything(7))

    key = jax.random.key(1)
    xT = np.asarray(jax.random.normal(key, (1, 256, 256, 3), jnp.float32))
    mask = np.asarray(jax.random.uniform(
        jax.random.fold_in(key, 1), (1, 256, 256, 3)) < 0.2)
    # LOCO_E2E_INVERT=1: the real-image protocol — start from an image and
    # pay the 100-step DDIM inversion inside the clock (the reference's
    # run_DDIMinversion leg, edit.py:2116-2167) instead of a seeded latent
    invert = os.environ.get("LOCO_E2E_INVERT", "0") == "1"
    x0_img = np.asarray(np.tanh(
        np.asarray(jax.random.normal(jax.random.fold_in(key, 2),
                                     (1, 256, 256, 3))) * 0.6), np.float32)

    def once(name):
        t0 = time.perf_counter()
        out = pipe.run_edit_null_space_projection(
            x0=x0_img if invert else None, xT=None if invert else xT,
            mask=mask, sample_name=name)
        # strips come back as host numpy -> fully materialized
        assert all(np.all(np.isfinite(s)) for s in out["strips"].values())
        return time.perf_counter() - t0, out

    t_cold, out = once("warm")
    n_frames = sum(s.shape[0] for s in out["strips"].values())
    log(f"cold (incl. compile): {t_cold:.1f}s; strip frames total={n_frames}")
    times = []
    for i in range(3):
        dt, _ = once(f"run{i}")
        times.append(dt)
        log(f"steady run {i}: {dt:.3f}s")
    best = min(times)
    print(json.dumps({
        "metric": ("flagship_e2e_real_image_incl_inversion"
                   if invert else
                   "flagship_e2e_warm_rank5_null5_16walks_5pc_256px"),
        "value": round(best, 3), "unit": "s",
        "runs": [round(t, 3) for t in times],
        "cold_s": round(t_cold, 1),
        "strip_frames": int(n_frames),
    }), flush=True)


if __name__ == "__main__":
    main()
