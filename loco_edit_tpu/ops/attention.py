"""Attention ops: one call site for the whole model zoo, with a pure-XLA
einsum path (CPU tests, small token counts) and a Pallas flash-attention path
for TPU (long-token cases, e.g. SD latent 4096 tokens).

Numerics match the ADM convention (reference
src/models/guided_diffusion/unet.py:330-391): pre-scale q and k each by
1/sqrt(sqrt(d)) (stabler in low precision than post-division), softmax in
float32, output cast back to the input dtype.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp


def sdp_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                  backend: str = "auto", jvp: str | None = None) -> jnp.ndarray:
    """Scaled dot-product attention.

    q, k, v: (B, H, N, D) — batch, heads, tokens, head dim.
    Returns (B, H, N, D) in q.dtype.

    jvp: "lean" (the default) installs the memory-lean custom JVP below —
    the primal is bit-identical to the plain einsum path, only
    differentiation changes; "ad" keeps plain autodiff. None reads
    LOCO_ATTN_JVP (at trace time) so whole-pipeline A/B benches can flip the
    rule without code changes (scripts/bench_attn_jvp.py measures the
    layer level; BENCH.md round 5 the whole-basis level).
    """
    if backend == "pallas" or (backend == "auto" and _use_pallas(q)):
        from loco_edit_tpu.ops.pallas.flash_attention import flash_attention
        return flash_attention(q, k, v)
    if jvp is None:
        jvp = os.environ.get("LOCO_ATTN_JVP", "lean")
    if jvp == "lean":
        return _lean_attention(q, k, v)
    if jvp != "ad":
        raise ValueError(f"unknown attention jvp mode {jvp!r}")
    return _xla_attention(q, k, v)


def _use_pallas(q: jnp.ndarray) -> bool:
    # Measured on v5-lite at the SD latent shape (B*H=25, N=4096, D=64, bf16):
    # XLA's fused einsum attention runs 4.3 ms vs 11.5 ms for the Pallas flash
    # kernel — at D=64 the flash matmuls use half the MXU lanes and the N^2
    # matrix still fits comfortably, so flash only pays past ~8k tokens where
    # materializing N^2 becomes memory-bound. Auto mode therefore gates on a
    # high token count; pass backend="pallas" to force the kernel.
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    n, d = q.shape[-2], q.shape[-1]
    return on_tpu and n >= 8192 and n % 128 == 0 and d % 8 == 0 and d <= 256


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@jax.custom_jvp
def _lean_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return _xla_attention(q, k, v)


@_lean_attention.defjvp
def _lean_attention_jvp(primals, tangents):
    """Memory-lean attention differentiation for the Jacobian sweeps.

    The subspace iteration (editing/pullback.py) streams `rank` tangent and
    cotangent probes through every attention layer per sweep. Plain autodiff
    of `_xla_attention` materializes, PER PROBE, two f32 logits-sized
    (N_q x N_kv) tangent tensors (dQ.K^T and Q.dK^T), the f32 softmax-JVP
    intermediate, and the (N_q x N_kv) dW operand of the output dot — at the
    SD latent level (4096 tokens) that is the "re-streams f32 logits-sized
    residuals" HBM bill the round-5 basis floor analysis attributed
    (BENCH.md). This hand-written rule cuts that three ways, changing only
    tangent intermediates (the primal stays bit-identical to
    `_xla_attention`, residuals are the bf16 weights instead of the f32
    softmax output):

      - logits-sized tangent intermediates are kept in the MODEL dtype
        (bf16 on TPU; f32 models — the CPU golden suite — see f32 and are
        numerically unchanged), halving every logits-sized stream. The MXU
        still accumulates the dots in f32; only the stored tensors narrow.
      - the softmax-JVP row correction factors through the PRIMAL output:
        dW @ V = (W o dL) @ V - c o (W @ V) = t @ V - c o out  with
        c = rowsum(W o dL), so the (N_q x N_kv) dW tensor is never
        materialized at all (the rowsum accumulates in f32).

    The rule is built from ops that are each linear in exactly one tangent
    operand, so `jax.linear_transpose` derives the cotangent sweep (and
    `jax.vjp` for training / delta directions) with the same lean shapes.
    Measured on v5e at the SD/LCM basis shapes: scripts/bench_attn_jvp.py
    (layer-level) and BENCH.md round 5 (whole-basis A/B vs jvp="ad").
    """
    q, k, v = primals
    dq, dk, dv = tangents
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(d))
    qs = q * scale
    ks = k * scale
    logits = jnp.einsum("bhqd,bhkd->bhqk", qs, ks,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v)

    # tangent: model-dtype logits-sized tensors, f32 row reduction
    dl = (jnp.einsum("bhqd,bhkd->bhqk", dq * scale, ks)
          + jnp.einsum("bhqd,bhkd->bhqk", qs, dk * scale))
    t = w * dl.astype(q.dtype)
    c = jnp.sum(t.astype(jnp.float32), axis=-1, keepdims=True)
    dout = (jnp.einsum("bhqk,bhkd->bhqd", t, v)
            - c.astype(q.dtype) * out
            + jnp.einsum("bhqk,bhkd->bhqd", w, dv))
    return out, dout
