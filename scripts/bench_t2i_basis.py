"""T2I-scale basis extraction measurement (VERDICT r2 weak #6): rank-5
z-space subspace iteration on the PRODUCTION-width SD 2.1 UNet (865.9M
params, bf16) with the PMP pulled back THROUGH the VAE decoder (the
reference's get_x0, edit.py:757-781) and CFG (doubled-batch cond/uncond)
inside the differentiated function — the actual T-LOCO hot loop at
production scale. Synthetic params (timing is weight-independent).

Degrades gracefully under the 16G single-chip HBM and the remote-compile
service: LOCO_T2I_CHUNK sets probe_chunk (default 4 — the 8-probe unchunked
sweep OOMs HBM at these widths, dominated by the VJP temps through the
512px VAE decoder), LOCO_T2I_NOCFG=1 drops the CFG doubling, LOCO_T2I_NOVAE=1
measures the UNet-only PMP.

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


RANK = 5
ITERS = 10
PEAK = 197e12


def cheap_params(model, *ex):
    shapes = jax.eval_shape(model.init, jax.random.key(0), *ex)

    def leaf(path, s):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        fill = 1.0 if name == "scale" else 0.01
        return jnp.full(s.shape, fill, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def main():
    from loco_edit_tpu.editing import subspace_iteration
    from loco_edit_tpu.models.sd import SDUNet, VAEConfig, VAEDecoder, sd_preset

    log("devices:", jax.devices())
    chunk = int(os.environ.get("LOCO_T2I_CHUNK", "2"))
    use_cfg = os.environ.get("LOCO_T2I_NOCFG", "0") != "1"
    use_vae = os.environ.get("LOCO_T2I_NOVAE", "0") != "1"

    import dataclasses

    # remat=True: per-block jax.checkpoint so jax.linearize re-derives block
    # internals in the tangent/cotangent passes instead of pinning them as
    # residuals — without it the five 4096-token attention layers alone hold
    # ~5G of f32 logits across the whole subspace iteration (measured OOM:
    # 21.5G/15.75G at probe_chunk=4 without remat)
    # LOCO_T2I_POLICY=dots_no_batch keeps projection outputs and recomputes
    # only the batched attention dots (less recompute, slightly more HBM)
    cfg = dataclasses.replace(sd_preset("sd21-base", dtype=jnp.bfloat16),
                              remat=True,
                              remat_policy=os.environ.get("LOCO_T2I_POLICY")
                              or None)
    unet = SDUNet(cfg)
    s = cfg.sample_size
    z0 = jnp.zeros((1, s, s, 4), jnp.float32)
    ctx0 = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.float32)
    params = cheap_params(unet, z0, 500.0, ctx0)
    n_params = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    log(f"SD UNet params: {n_params / 1e6:.1f}M, latent {s}x{s}x4, "
        f"cfg={use_cfg} vae={use_vae} chunk={chunk}")

    # bf16 VAE matches the reference's fp16 T2I inference (SURVEY §2: the
    # T2I engines run torch_dtype=float16); an 8-probe f32 VJP through the
    # 512px decoder alone needs >10G of HLO temps and OOMs the 16G chip
    vcfg = VAEConfig(sample_size=s * 8, dtype=jnp.bfloat16, remat=True)
    dec = VAEDecoder(vcfg)
    lat = s
    pdec = cheap_params(dec, jnp.zeros((1, lat, lat, vcfg.latent_channels)))

    key = jax.random.key(0)
    ctx_c = jax.random.normal(jax.random.fold_in(key, 1),
                              (1, 77, cfg.cross_attention_dim)) * 0.1
    t_edit, ab_edit, g = 700.0, 0.17, 7.5

    # params/pdec/ctx are jit ARGUMENTS (closing over 3.5GB of concrete
    # arrays embeds them as lowering constants — the whole HLO then ships
    # through the remote-compile tunnel)
    def make_f(params, pdec, ctx_c):
        def eps(z):
            if use_cfg:
                e = unet.apply(params, jnp.concatenate([z, z]), t_edit,
                               jnp.concatenate([ctx_c, jnp.zeros_like(ctx_c)]))
                e_c, e_u = jnp.split(e, 2)
                return e_u + g * (e_c - e_u)
            return unet.apply(params, z, t_edit, ctx_c)

        def f(z):
            e = eps(z)
            zz0 = (z - e * jnp.sqrt(1.0 - ab_edit)) / jnp.sqrt(ab_edit)
            if not use_vae:
                return zz0
            return dec.apply(pdec, zz0 / 0.18215)

        return f

    zt = jax.random.normal(jax.random.fold_in(key, 2), (1, s, s, 4), jnp.float32)
    out_shape = (1, s * 8, s * 8, 3) if use_vae else (1, s, s, 4)
    mask = (jax.random.uniform(jax.random.fold_in(key, 3), out_shape) < 0.2
            ).astype(jnp.float32)

    def run(params, pdec, ctx, z, m):
        return subspace_iteration(
            make_f(params, pdec, ctx), z, jax.random.fold_in(key, 4),
            rank=RANK, mask=m, min_iter=ITERS - 1, max_iter=ITERS, tol=0.0,
            probe_chunk=chunk).vT

    jit = jax.jit(run)
    t0 = time.perf_counter()
    jit(params, pdec, ctx_c, zt, mask).block_until_ready()
    t_cold = time.perf_counter() - t0
    log(f"compile+first: {t_cold:.1f}s")
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jit(params, pdec, ctx_c, zt, mask).block_until_ready()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    log(f"steady: {best:.3f}s (runs {[f'{t:.3f}' for t in ts]})")

    # analytic FLOPs from loop-free programs (cost_analysis counts loop
    # bodies once — CLAUDE.md rule)
    r_eff = 8

    def primal_only(params, pdec, ctx, z, m):
        def fw(zz):
            y = make_f(params, pdec, ctx)(zz)
            return y * m.astype(y.dtype)
        y, _ = jax.linearize(fw, z)
        return y

    def primal_and_sweep(params, pdec, ctx, z, m, v):
        def fw(zz):
            y = make_f(params, pdec, ctx)(zz)
            return y * m.astype(y.dtype)
        _, jl = jax.linearize(fw, z)
        vjp = jax.linear_transpose(jl, z)
        u = jax.vmap(lambda vi: jl(vi.reshape(z.shape).astype(z.dtype)))(v)
        return jax.vmap(lambda ui: vjp(ui)[0].reshape(-1).astype(jnp.float32))(u)

    def flops_of(fn, *args):
        try:
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca["flops"])
        except Exception as e:  # noqa: BLE001
            log("cost_analysis unavailable:", e)
            return None

    v = jax.random.normal(jax.random.fold_in(key, 5), (r_eff, zt.size))
    fp = flops_of(primal_only, params, pdec, ctx_c, zt, mask)
    fps = flops_of(primal_and_sweep, params, pdec, ctx_c, zt, mask, v)
    mfu = None
    if fp is not None and fps is not None:
        total = fp + ITERS * (fps - fp)
        mfu = total / best / PEAK
        log(f"MFU: {total / 1e12:.1f} TF / {best:.3f}s = "
            f"{total / best / 1e12:.1f} TF/s -> {100 * mfu:.1f}%")

    out = {"metric": "sd21_rank5_zspace_basis_pmp_through_vae",
           "value": round(best, 3), "unit": "s", "cold_s": round(t_cold, 1),
           "params_m": round(n_params / 1e6, 1),
           "cfg": use_cfg, "vae": use_vae, "chunk": chunk}
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
