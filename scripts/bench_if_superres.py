"""IF stage-2 super-resolution at PRODUCTION width on the real TPU.

The reference cascade's second stage (superresolution, edit.py:1375-1392:
diffusers IF-II-L at noise_level=250, upscaling the edited 64px strip to
256px; stage 3 is disabled there). Measured here as the SuperResSampler the
IF pipeline plugs in (pipelines/superres.py): bilinear align-corners
upsample + aug-level noise conditioning + 50-step CFG DDIM at 256px over
the channel-concat UNet, for a 3-frame edited strip (the bench_if_e2e.py
walk output), bf16 synthetic params, host-materialized.

stderr: details; stdout: one JSON line.
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


def cheap_params(model, *ex):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *ex)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        fill = 1.0 if name == "scale" else 0.01
        return jnp.full(s.shape, fill, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def main():
    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.models.ifm import IFUNet, if_preset
    from loco_edit_tpu.pipelines.superres import SuperResSampler

    log("devices:", jax.devices())
    dtype = jnp.bfloat16
    preset = os.environ.get("LOCO_SR_PRESET", "IF-II-L")
    ucfg = if_preset(preset, dtype=dtype)
    unet = IFUNet(ucfg)
    x_ex = jnp.zeros((1, 256, 256, 6), dtype)     # [target | conditioning]
    ctx_ex = jnp.zeros((1, 77, 4096), dtype)
    uparams = cheap_params(unet, x_ex, jnp.zeros((1,)), ctx_ex,
                           jnp.zeros((1,)))
    n_params = sum(x.size for x in jax.tree.leaves(uparams))
    log(f"{preset} params: {n_params / 1e6:.1f}M (bf16)")

    def unet_apply(x, t, ctx, aug_t):
        tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        at = jnp.broadcast_to(jnp.asarray(aug_t, jnp.float32), (x.shape[0],))
        return unet.apply(uparams, x.astype(dtype), tt, ctx.astype(dtype), at)

    ctx = jax.random.normal(jax.random.key(3), (1, 77, 4096), jnp.float32) * 0.05
    prompt_encoder = lambda p: jnp.asarray(ctx + 0.01 * (len(p) % 7), dtype)  # noqa: E731

    sr = SuperResSampler(unet_apply, prompt_encoder, out_size=256, steps=50,
                         guidance_scale=4.0, aug_level=250,
                         rng=seed_everything(9))

    strip = np.asarray(np.tanh(np.asarray(
        jax.random.normal(jax.random.key(1), (3, 64, 64, 3))) * 0.5),
        np.float32)

    def once():
        t0 = time.perf_counter()
        out = np.asarray(sr(strip, "a photo of a man"))
        assert out.shape == (3, 256, 256, 3)
        return time.perf_counter() - t0

    t_cold = once()
    log(f"cold (incl. compile): {t_cold:.1f}s")
    times = [once() for _ in range(3)]
    log(f"steady runs: {[f'{t:.3f}' for t in times]}")
    best = min(times)
    log(f"-> {50 * 3 / best:.1f} img-steps/s at 256px (CFG doubled batch)")
    print(json.dumps({
        "metric": f"if_stage2_superres_{preset}_3frames_50steps_256px",
        "value": round(best, 3), "unit": "s",
        "runs": [round(t, 3) for t in times],
        "cold_s": round(t_cold, 1), "unet_params_m": round(n_params / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
