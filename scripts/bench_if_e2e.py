"""Full T-LOCO DeepFloyd-IF stage-1 edit E2E at PRODUCTION width on TPU.

The reference's canonical IF protocol (EditDeepFloydIF
run_edit_null_space_projection_xt, edit.py:1744-1871; flags from
scripts/main_T2I_DeepFloydIF_null_space_projection.sh: edit_t 0.75,
jacobian=True prompt-delta direction, rank-5 null basis,
x_space_guidance 10.0 x 1 step) at the real IF-I-M geometry (426.9M UNet,
64px pixel space, T5-XXL 4096-d contexts, learned-sigma split, bf16,
synthetic params — timing is weight-independent):

  seeded xT -> CFG forward to 0.75T -> jacobian prompt-delta direction (one
  VJP of the prompt-delta against the pixel PMP) -> rank-5 complement-mask
  null basis (10 fixed sweeps — pixel-space pullback, no VAE) -> null
  projection -> walk strip (3 frames) -> CFG completion, strips
  materialized to host. stderr: details; stdout: one JSON line.
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
    from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline

    log("devices:", jax.devices())
    dtype = jnp.bfloat16
    ucfg = if_preset("IF-I-M", dtype=dtype)
    unet = IFUNet(ucfg)
    x_ex = jnp.zeros((1, 64, 64, 3), dtype)
    ctx_ex = jnp.zeros((1, 77, 4096), dtype)
    uparams = cheap_params(unet, x_ex, jnp.zeros((1,)), ctx_ex)
    n_params = sum(x.size for x in jax.tree.leaves(uparams))
    log(f"UNet params: {n_params / 1e6:.1f}M (bf16)")

    def unet_apply(x, t, context):
        tt = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        return unet.apply(uparams, x.astype(dtype), tt, context.astype(dtype))

    ctx = jax.random.normal(jax.random.key(3), (1, 77, 4096), jnp.float32) * 0.05
    prompt_encoder = lambda prompt: jnp.asarray(  # noqa: E731
        ctx + 0.01 * (len(prompt) % 7), dtype)

    td = tempfile.mkdtemp(prefix="bench_if_")
    cfg = IFEditConfig(
        for_steps=100, edit_t=0.75, guidance_scale=7.5,
        guidance_scale_edit=7.5, x_space_guidance_scale=10.0,
        x_space_guidance_num_step=1, vis_num=1,
        pca_rank=1, pca_rank_null=5, null_space_projection=True,
        tilda_v_score_type="null+(for-null)+(edit-null)", jacobian=True,
        min_iter=9, max_iter=10, convergence_threshold=0.0,
        result_folder=td, save_images=False)
    pipe = IFEditPipeline(unet_apply, prompt_encoder, cfg, seed_everything(21))

    xT = np.asarray(jax.random.normal(jax.random.key(1), (1, 64, 64, 3)))
    mask = np.zeros((1, 64, 64, 3), bool)
    mask[:, 20:44, 16:48] = True

    def once(name):
        t0 = time.perf_counter()
        out = pipe.run_edit_null_space_projection_xt(
            "a photo of a man", "a photo of a man wearing glasses", xT=xT,
            mask=mask, sample_name=name, semantic=True)
        assert out["image"].shape[1:] == (64, 64, 3)
        return time.perf_counter() - t0

    t_cold = once("warm")
    log(f"cold (incl. compile): {t_cold:.1f}s")
    times = [once(f"r{i}") for i in range(3)]
    log(f"steady runs: {[f'{t:.3f}' for t in times]}")
    print(json.dumps({
        "metric": "if_i_m_e2e_jacobian_null5_0.75T_64px",
        "value": round(min(times), 3), "unit": "s",
        "runs": [round(t, 3) for t in times],
        "cold_s": round(t_cold, 1), "unet_params_m": round(n_params / 1e6, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
