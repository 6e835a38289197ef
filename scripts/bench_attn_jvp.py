"""Layer-level A/B of the memory-lean attention JVP (ops/attention.py
`jvp="lean"`) against plain autodiff (`jvp="ad"`) at the SD/LCM basis shapes.

The SD-basis floor analysis (BENCH.md round 5) attributed the 42.8%-of-peak
sweep MFU to the JVP/VJP of the seq-4096 attention levels re-streaming f32
logits-sized tensors from HBM per probe. This harness isolates exactly that:
one self-attention layer (as a closure over fixed projection weights, like
the model), 16-probe tangent + cotangent sweeps chained x10 via lax.scan in
ONE program (separate jit calls through the tunnel mis-time — CLAUDE.md), at

  - the SD/LCM UNet level-0 shape: 4096 tokens, 5 heads x 64, width 320, bf16
  - the VAE mid-block shape: 4096 tokens, 1 head x 512, width 512, bf16

stderr: details; stdout: one JSON line with the speedup per shape.
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

PROBES = 16
SWEEPS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_layer(key, n_tok, width, heads, head_dim, jvp):
    """x (n_tok, width) f32 -> attention(x) flattened f32, bf16 compute —
    the per-layer shape the basis sweeps stream through the UNet."""
    from loco_edit_tpu.ops import sdp_attention

    kq, kk, kv = jax.random.split(key, 3)
    s = width ** -0.5
    wq = (jax.random.normal(kq, (width, heads * head_dim)) * s).astype(jnp.bfloat16)
    wk = (jax.random.normal(kk, (width, heads * head_dim)) * s).astype(jnp.bfloat16)
    wv = (jax.random.normal(kv, (width, heads * head_dim)) * s).astype(jnp.bfloat16)

    def split(y):
        return y.reshape(1, n_tok, heads, head_dim).transpose(0, 2, 1, 3)

    def f(x):
        xb = x.astype(jnp.bfloat16)
        a = sdp_attention(split(xb @ wq), split(xb @ wk), split(xb @ wv),
                          jvp=jvp)
        return a.transpose(0, 2, 1, 3).reshape(n_tok, heads * head_dim
                                               ).astype(jnp.float32)

    return f


def sweep_seconds(f, x, key):
    """10 chained tangent+cotangent 16-probe sweeps in ONE program.

    linearize/linear_transpose happen INSIDE the jitted program — outside,
    the residuals (f32 logits at 4096 tokens: hundreds of MB) become jit
    constants and blow the tunnel's compile-request size limit (HTTP 413)."""
    def prog(v):
        _, jl = jax.linearize(f, x)
        vt = jax.linear_transpose(jl, x)

        def sweep(v, _):
            u = jax.vmap(lambda vi: jl(vi.reshape(x.shape).astype(x.dtype)))(v)
            vp = jax.vmap(
                lambda ui: vt(ui)[0].reshape(-1).astype(jnp.float32))(u)
            vp = vp / jnp.linalg.norm(vp, axis=1, keepdims=True)
            return vp, jnp.zeros(())

        return jax.lax.scan(sweep, v, None, length=SWEEPS)[0]

    v0 = jax.random.normal(key, (PROBES, x.size), jnp.float32)
    v0 = v0 / jnp.linalg.norm(v0, axis=1, keepdims=True)
    prog = jax.jit(prog)
    prog(v0).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        prog(v0).block_until_ready()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    log("devices:", jax.devices())
    shapes = [
        ("sd_level0", dict(n_tok=4096, width=320, heads=5, head_dim=64)),
        ("vae_mid", dict(n_tok=4096, width=512, heads=1, head_dim=512)),
    ]
    key = jax.random.key(0)
    out = {"metric": "attn_jvp_sweep_lean_speedup", "unit": "x"}
    for name, kw in shapes:
        x = jax.random.normal(jax.random.fold_in(key, 1),
                              (kw["n_tok"], kw["width"]), jnp.float32)
        secs = {}
        for jvp in ("ad", "lean"):
            f = make_layer(jax.random.fold_in(key, 2), jvp=jvp, **kw)
            secs[jvp] = sweep_seconds(f, x, jax.random.fold_in(key, 3))
            log(f"{name} [{jvp}]: {SWEEPS} sweeps x {PROBES} probes = "
                f"{secs[jvp]:.4f}s")
        out[name] = round(secs["ad"] / secs["lean"], 3)
        log(f"{name}: lean speedup {out[name]}x")
    out["value"] = out["sd_level0"]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
