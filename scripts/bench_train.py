"""Training-step throughput at flagship width (framework-completeness row:
the ledger had edit/basis/denoise numbers but no training number, even though
the TrainLoop is a full subsystem — SURVEY §2 #20).

One real chip: the FFHQ_P2 ADM U-Net (256px, bf16 activations) under the
full `make_train_step` program — eps-MSE loss, value_and_grad, AdamW update,
EMA — the TPU counterpart of the reference's TrainLoop.run_loop body
(src/models/guided_diffusion/train_util.py:180-226). Sweeps the global batch
until HBM says stop and reports the best imgs/s + MFU (fwd+bwd FLOPs from a
loop-free cost_analysis; microbatches=1 keeps the accumulation scan at trip
count 1, so the count is exact — CLAUDE.md loop rule).

stderr: per-batch details; stdout: one JSON line.
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


PEAK = 197e12


def cheap_params(model, *ex):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *ex)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        fill = 1.0 if name == "scale" else 0.01
        return jnp.full(s.shape, fill, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def main():
    from loco_edit_tpu.diffusion.schedule import NoiseSchedule
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset
    from loco_edit_tpu.training.trainer import (TrainConfig, create_train_state,
                                                make_train_step)

    log("devices:", jax.devices())
    # LOCO_TRAIN_PRESET=tiny -> CPU-smokeable shapes (scripts/smoke_* pattern)
    if os.environ.get("LOCO_TRAIN_PRESET") == "tiny":
        from loco_edit_tpu.models.adm.presets import tiny_test_config

        cfg = tiny_test_config(dtype=jnp.bfloat16)
    else:
        cfg = adm_preset("FFHQ_P2", dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    size = cfg.image_size
    x1 = jnp.zeros((1, size, size, 3), jnp.float32)
    params = cheap_params(model, x1, jnp.asarray(500.0, jnp.float32))
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    log(f"ADM params: {n_params / 1e6:.1f}M @ {size}px")

    def apply_fn(p, xt, t):
        return model.apply(p, xt, t.astype(jnp.float32))

    tc = TrainConfig(lr=1e-4, ema_rate=0.9999, microbatches=1)
    step = make_train_step(apply_fn, tc, NoiseSchedule.linear())
    state = create_train_state(params, tc)

    batches = [int(b) for b in os.environ.get(
        "LOCO_TRAIN_BATCHES", "8,16,32").split(",")]
    key = jax.random.key(0)
    best = None
    results = []
    for b in batches:
        x0 = jax.random.normal(jax.random.fold_in(key, b),
                               (b, size, size, 3), jnp.float32)
        t = jnp.arange(b, dtype=jnp.int32) * 31 % 1000
        w = jnp.ones((b,), jnp.float32)
        jstep = jax.jit(step)
        try:
            t0 = time.perf_counter()
            # block on the FULL output (params + EMA + opt state): the loss
            # alone completes before the Adam/EMA tail and under-reports
            cur, m = jax.block_until_ready(
                jstep(state, x0, t, w, jax.random.fold_in(key, 1)))
            cold = time.perf_counter() - t0
            ts = []
            for i in range(3):
                t0 = time.perf_counter()
                cur, m = jax.block_until_ready(
                    jstep(cur, x0, t, w, jax.random.fold_in(key, i + 2)))
                ts.append(time.perf_counter() - t0)
            sec = min(ts)
        except Exception as e:  # noqa: BLE001 — OOM ends the sweep
            log(f"batch {b}: {type(e).__name__}: {str(e)[:200]}")
            break
        flops = None
        try:
            ca = jax.jit(step).lower(
                state, x0, t, w, jax.random.fold_in(key, 1)
            ).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca["flops"])
        except Exception as e:  # noqa: BLE001
            log("cost_analysis unavailable:", e)
        mfu = flops / sec / PEAK if flops else None
        imgs = b / sec
        log(f"batch {b}: {sec:.3f}s/step = {imgs:.1f} imgs/s"
            + (f", {flops / 1e12:.1f} TF -> {100 * mfu:.1f}% MFU" if mfu else "")
            + f" (cold {cold:.1f}s)")
        row = {"batch": b, "sec_per_step": round(sec, 4),
               "imgs_per_sec": round(imgs, 2)}
        if mfu:
            row["mfu"] = round(mfu, 4)
        results.append(row)
        if best is None or imgs > best["imgs_per_sec"]:
            best = row

    out = {"metric": "adm_p2_256px_train_step" if size == 256 else f"adm_tiny_{size}px_train_step", "unit": "imgs/s",
           "value": best["imgs_per_sec"] if best else None,
           "params_m": round(n_params / 1e6, 1), "sweep": results}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
