"""Matrix-free Jacobian subspace iteration — the core numeric kernel.

Finds the top right-singular subspace of J = d f(x) / d x (f is the posterior
mean predictor, optionally mask-weighted) without materializing J, by
alternating JVP / VJP sweeps with a small-Gram SVD ("Algorithm 1" of
arXiv 2409.02374; reference implementation
src/modules/edit.py:2406-2504 and three near-identical engine copies).

TPU-native redesign (the source of the headline speedup):
  - All `rank` probes are evaluated as ONE batched JVP via `jax.vmap` over
    `jax.jvp` — the probe axis becomes a device batch dim that shards across
    the mesh, where the reference loops host-chunks of 5 probes serially
    through `torch.func.jacfwd` (edit.py:2419,2448-2455).
  - One `jax.linearize` per sweep shares a single primal forward across ALL
    tangent probes, and its `jax.linear_transpose` drives the cotangent sweep
    — 1 primal + rank tangent + rank cotangent passes per iteration, where the
    reference pays a fresh primal per jacfwd chunk and a serial
    `torch.autograd.functional.jacobian` for the pullbacks (edit.py:2448-2479).
  - The (rank x rank) Gram eigendecomposition replaces the (rank x d) thin SVD
    (d = 196 608 at 256px): identical right-singular subspace, tiny on-device
    cost, no host detours.
  - Masking is a multiplicative 0/1 weight on the output instead of boolean
    gather (edit.py:2388-2390): J -> diag(m) J has the same right-singular
    subspace and values since (MJ)^T(MJ) = J^T diag(m) J, but keeps shapes
    static for XLA.
  - The convergence early-exit (edit.py:2489-2494) is a `lax.while_loop` with
    an on-device predicate; sign-aligned iterates so the eigh sign ambiguity
    cannot stall convergence.
  - On TPU the probe batch is padded up to the 8-sublane tile: measured on
    v5e at the flagship 256px config, a rank-5 probe batch leaves 3/8 of
    every sublane tile empty AND makes XLA flip conv layouts (relayout
    copies were ~25% of the run) — the padded rank-8 iteration runs the
    rank-5 extraction 1.4x FASTER (0.56 s vs 0.79 s) while computing a
    strictly better subspace estimate; the top-`rank` rows are returned.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EditBasis:
    """Result of a subspace iteration.

    u:  (rank, *out_shape) left images J v_i (mask-weighted, zeros off-mask)
    s:  (rank,) singular-value estimates of J (reference returns sqrt of the
        singular values of u^T J, edit.py:2500)
    vT: (rank, d_in) right-singular directions, rows unit-norm
    iters: iterations executed
    """

    u: jnp.ndarray
    s: jnp.ndarray
    vT: jnp.ndarray
    iters: jnp.ndarray


jax.tree_util.register_pytree_node(
    EditBasis,
    lambda b: ((b.u, b.s, b.vT, b.iters), None),
    lambda _, c: EditBasis(*c),
)


def padded_probe_count(rank: int, d_in: int | None = None,
                       mesh_size: int | None = None,
                       pad_probes: bool | None = None) -> int:
    """Probe-batch size an extraction executes for `rank`: padded up to the
    8-sublane tile on TPU (lcm with the mesh size when probe-sharded),
    capped at the space dimension. The ONE home of the padding rule — the
    iteration internals and the pipeline's fused-path eligibility check
    (pipelines/uncond.py) both call this."""
    if pad_probes is None:
        try:
            pad_probes = jax.default_backend() == "tpu"
        except RuntimeError:
            pad_probes = False
    r_eff = rank
    if pad_probes:
        mult = 8
        if mesh_size is not None:
            import numpy as _np

            mult = int(_np.lcm(8, mesh_size))
        r_eff = -(-rank // mult) * mult
    if d_in is not None:
        r_eff = min(r_eff, d_in)
    return r_eff


def init_probes(key: jax.Array, rank: int, d_in: int) -> jnp.ndarray:
    """Random orthonormal probe matrix (rank, d_in), f32 — the reference's
    randn + QR initialization (edit.py:2435-2438). Orthonormalized by
    modified Gram-Schmidt over the (small, static) rank axis: a tall-skinny
    jnp.linalg.qr lowers to a huge Householder loop on TPU and dominates
    compile time; MGS is `rank` fused vector ops."""
    g = jax.random.normal(key, (rank, d_in), jnp.float32)
    rows = []
    for i in range(rank):
        v = g[i]
        for q in rows:
            v = v - jnp.dot(q, v) * q
        rows.append(v / jnp.linalg.norm(v))
    return jnp.stack(rows)


def subspace_iteration(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key: jax.Array,
    *,
    rank: int,
    mask: jnp.ndarray | None = None,
    min_iter: int = 10,
    max_iter: int = 50,
    tol: float = 1e-4,
    probe_chunk: int | None = None,
    probe_sharding=None,
    pad_probes: bool | None = None,
    v_init: jnp.ndarray | None = None,
) -> EditBasis:
    """Estimate the top-`rank` right-singular subspace of d f / d x at x.

    f: x -> y, shapes static. mask: optional 0/1 (or soft) weight broadcastable
    to y. probe_chunk: evaluate probes in chunks of this size via lax.map to
    bound memory (None = all at once). probe_sharding: optional NamedSharding
    (e.g. P("probe")) pinning the probe axis to the mesh so the batched
    tangent/cotangent network passes split across chips over ICI — the
    embarrassingly-parallel axis the reference serializes in host chunks.
    pad_probes: round the probe batch up to the 8-sublane tile (free extra
    probes, measured faster than a ragged batch on TPU — see module
    docstring); default: on for the TPU backend, off elsewhere. Convergence
    is measured on the top-`rank` rows only, and only those are returned.
    v_init: optional explicit (rank, d_in) orthonormal starting probes
    (rows), overriding the random init — used for warm starts and for
    matched-probe golden comparison against the reference iteration
    (tests/test_reference_golden_e2e.py); requires pad_probes=False so the
    probe count equals the given rows.
    """
    x = jnp.asarray(x)
    d_in = x.size
    in_shape = x.shape

    r_eff = padded_probe_count(
        rank, d_in,
        mesh_size=None if probe_sharding is None else probe_sharding.mesh.size,
        pad_probes=pad_probes)

    def fw(z):
        y = f(z)
        if mask is not None:
            y = y * jnp.asarray(mask, y.dtype)
        return y

    def _chunked_vmap(one, batch):
        """vmap over the probe axis, optionally in lax.map chunks."""
        if probe_chunk is None or r_eff <= probe_chunk:
            return jax.vmap(one)(batch)
        pad = (-r_eff) % probe_chunk
        bp = jnp.pad(batch, [(0, pad)] + [(0, 0)] * (batch.ndim - 1))
        out = jax.lax.map(jax.vmap(one),
                          bp.reshape(-1, probe_chunk, *batch.shape[1:]))
        return out.reshape(-1, *out.shape[2:])[:r_eff]

    # x is FIXED across iterations, so J is fixed: linearize ONCE and reuse the
    # linear tangent map + its transpose for every sweep. The primal network
    # runs exactly once per basis extraction; each iteration costs only
    # rank tangent + rank cotangent passes. (The reference re-runs jacfwd and
    # autograd.jacobian — primal included — every iteration.)
    _, jvp_lin = jax.linearize(fw, x)
    vjp_lin = jax.linear_transpose(jvp_lin, x)

    def sweep(v_flat):
        u = _chunked_vmap(
            lambda vi: jvp_lin(vi.reshape(in_shape).astype(x.dtype)), v_flat)
        vp = _chunked_vmap(
            lambda ui: vjp_lin(ui)[0].reshape(d_in).astype(jnp.float32), u)
        return u, vp

    def _pin(arr):
        if probe_sharding is None:
            return arr
        return jax.lax.with_sharding_constraint(arr, probe_sharding)

    if v_init is not None:
        v_init = jnp.asarray(v_init, jnp.float32)
        if v_init.shape != (r_eff, d_in):
            raise ValueError(
                f"v_init shape {v_init.shape} != ({r_eff}, {d_in}); pass "
                "pad_probes=False for an exact probe count")
        v0 = _pin(v_init)
    else:
        v0 = _pin(init_probes(key, r_eff, d_in))
    out_shape = jax.eval_shape(fw, x)
    u0 = jnp.zeros((r_eff,) + out_shape.shape, out_shape.dtype)
    s0 = jnp.zeros((r_eff,), jnp.float32)

    def body(carry):
        i, v, _, _, _ = carry
        u, vp = sweep(_pin(v))                   # u = J v ; vp = u^T J
        u = _pin(u)
        vp = _pin(vp)
        # right-singular vectors of vp via the (rank x rank) Gram matrix
        gram = vp @ vp.T                         # f32
        w, q = jnp.linalg.eigh(gram)             # ascending
        w = w[::-1]
        q = q[:, ::-1]
        s_vp = jnp.sqrt(jnp.maximum(w, 0.0))     # singular values of vp
        v_new = (q.T @ vp) / jnp.maximum(s_vp, 1e-20)[:, None]
        # eigh signs are arbitrary; align to previous iterate so the
        # convergence distance measures subspace movement, not sign flips.
        dots = jnp.sum(v_new * v, axis=1, keepdims=True)
        v_new = v_new * jnp.where(dots < 0, -1.0, 1.0)
        # convergence over the REQUESTED rows only: padded tail rows live in
        # flatter parts of the spectrum and would stall tol-based early exit
        conv = jnp.max(jnp.abs(v_new[:rank] - v[:rank]))
        return i + 1, v_new, u, s_vp, conv

    def cond(carry):
        i, _, _, _, conv = carry
        return (i < max_iter) & ((i <= min_iter) | (conv > tol))

    iters, v, u, s_vp, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), v0, u0, s0, jnp.asarray(jnp.inf, jnp.float32)))

    # reference returns sqrt of the singular values of u^T J ~ sigma^2
    # (edit.py:2482,2500)
    return EditBasis(u=u[:rank], s=jnp.sqrt(s_vp[:rank]), vT=v[:rank],
                     iters=iters)


def dual_subspace_iteration(
    f: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    key_a: jax.Array,
    key_b: jax.Array,
    *,
    rank_a: int,
    rank_b: int,
    mask_a: jnp.ndarray,
    mask_b: jnp.ndarray,
    min_iter: int = 10,
    max_iter: int = 50,
    tol: float = 1e-4,
    probe_chunk: int | None = None,
    probe_sharding=None,
    pad_probes: bool | None = None,
) -> tuple[EditBasis, EditBasis]:
    """Two mask-weighted subspace iterations on the SAME Jacobian, fused.

    The flagship edit needs both the mask basis (vT_modify) and the
    complement-mask basis (vT_null) of one J = d f / d x at the same (x, t)
    (reference runs them as two separate power iterations,
    edit.py:2296-2311). Both only differ in the 0/1 output weight, so they
    share the hoisted linearization and run as ONE while_loop whose
    tangent/cotangent sweeps batch BOTH probe groups: on TPU two separate
    rank-5 extractions each pad 5 -> 8 probes and cost two 8-probe-tile
    programs, while the fused 16-probe batch costs about one 16-probe
    program (measured rank-10 padded-16 = 1.029 s vs 2 x 0.561 s, BENCH.md)
    and runs the primal network pass once instead of twice.

    Per-probe masks keep the math identical to the separate runs: for probe
    i in group g, u_i = m_g * (J v_i) and v'_i = J^T (m_g * u_i) — exactly
    what `subspace_iteration(mask=m_g)` computes (its linearized fn carries
    the mask multiply in both passes) — and the Gram/eigh/convergence steps
    are blockwise per group. Both groups use the same (padded) probe count;
    call only when the padded sizes agree (the pipeline checks). The loop
    exits when BOTH groups converge, so a group may receive extra sweeps
    relative to a solo run — a strictly-better estimate; with a fixed
    iteration budget (min_iter = max_iter, the flagship protocol) the fused
    results equal the separate runs (pinned in tests/test_editing.py).

    probe_sharding: optional NamedSharding over the probe axis (the same
    P(probe) spec solo extraction takes): each group's padded probe batch
    shards across the mesh (groups pad to lcm(8, mesh) so the flattened
    2R-probe sweep divides evenly), and the per-group Gram reductions become
    XLA collectives over ICI.

    Returns (basis_a, basis_b) with the same semantics as two
    `subspace_iteration` calls with (rank_a, mask_a, key_a) / (b).
    """
    x = jnp.asarray(x)
    d_in = x.size
    in_shape = x.shape

    mesh_size = None if probe_sharding is None else probe_sharding.mesh.size
    R = max(padded_probe_count(rank_a, d_in, mesh_size=mesh_size,
                               pad_probes=pad_probes),
            padded_probe_count(rank_b, d_in, mesh_size=mesh_size,
                               pad_probes=pad_probes))

    if probe_sharding is None:
        _pin_flat = _pin_grouped = lambda arr: arr
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        _mesh = probe_sharding.mesh
        _axis = probe_sharding.spec[0]
        _fs = NamedSharding(_mesh, PartitionSpec(_axis))        # (2R, ...)
        _gs = NamedSharding(_mesh, PartitionSpec(None, _axis))  # (2, R, ...)
        _pin_flat = lambda a: jax.lax.with_sharding_constraint(a, _fs)
        _pin_grouped = lambda a: jax.lax.with_sharding_constraint(a, _gs)

    out_aval = jax.eval_shape(f, x)
    m = jnp.stack([
        jnp.broadcast_to(jnp.asarray(mask_a, jnp.float32), out_aval.shape),
        jnp.broadcast_to(jnp.asarray(mask_b, jnp.float32), out_aval.shape),
    ])                                            # (2, *out)
    m_flat = _pin_flat(jnp.repeat(m, R, axis=0))  # (2R, *out) probe-paired

    _, jvp_lin = jax.linearize(f, x)
    vjp_lin = jax.linear_transpose(jvp_lin, x)

    def one_u(vi, mi):
        y = jvp_lin(vi.reshape(in_shape).astype(x.dtype))
        return y * mi.astype(y.dtype)

    def one_v(ui, mi):
        return (vjp_lin(ui * mi.astype(ui.dtype))[0]
                .reshape(d_in).astype(jnp.float32))

    def _chunked(one, a, b):
        n = a.shape[0]
        if probe_chunk is None or n <= probe_chunk:
            return jax.vmap(one)(a, b)
        pad = (-n) % probe_chunk
        ap = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        bp = jnp.pad(b, [(0, pad)] + [(0, 0)] * (b.ndim - 1))
        out = jax.lax.map(
            lambda ab: jax.vmap(one)(*ab),
            (ap.reshape(-1, probe_chunk, *a.shape[1:]),
             bp.reshape(-1, probe_chunk, *b.shape[1:])))
        return out.reshape(-1, *out.shape[2:])[:n]

    v0 = _pin_grouped(jnp.stack([init_probes(key_a, R, d_in),
                                 init_probes(key_b, R, d_in)]))  # (2, R, d)
    u0 = _pin_grouped(jnp.zeros((2, R) + out_aval.shape, out_aval.dtype))
    s0 = jnp.zeros((2, R), jnp.float32)
    # convergence over the REQUESTED rows of each group only (padded tail
    # rows live in flatter parts of the spectrum and would stall tol exits)
    row_w = jnp.stack([
        (jnp.arange(R) < rank_a).astype(jnp.float32),
        (jnp.arange(R) < rank_b).astype(jnp.float32)])

    def body(carry):
        i, v, _, _, _ = carry
        u = _pin_flat(_chunked(one_u, _pin_flat(v.reshape(2 * R, d_in)),
                               m_flat))                        # (2R, *out)
        vp = _pin_grouped(_chunked(one_v, u, m_flat).reshape(2, R, d_in))
        gram = jnp.einsum("grd,gsd->grs", vp, vp)              # (2, R, R) f32
        w, q = jax.vmap(jnp.linalg.eigh)(gram)                 # ascending
        w = w[:, ::-1]
        q = q[:, :, ::-1]
        s_vp = jnp.sqrt(jnp.maximum(w, 0.0))
        v_new = (jnp.einsum("grs,grd->gsd", q, vp)
                 / jnp.maximum(s_vp, 1e-20)[..., None])
        dots = jnp.sum(v_new * v, axis=-1, keepdims=True)
        v_new = _pin_grouped(v_new * jnp.where(dots < 0, -1.0, 1.0))
        conv = jnp.max(jnp.abs(v_new - v) * row_w[..., None])
        return (i + 1, v_new,
                _pin_grouped(u.reshape(2, R, *out_aval.shape)), s_vp, conv)

    def cond(carry):
        i, _, _, _, conv = carry
        return (i < max_iter) & ((i <= min_iter) | (conv > tol))

    iters, v, u, s_vp, _ = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0), v0, u0, s0, jnp.asarray(jnp.inf, jnp.float32)))

    def _basis(g, rank):
        return EditBasis(u=u[g, :rank], s=jnp.sqrt(s_vp[g, :rank]),
                         vT=v[g, :rank], iters=iters)

    return _basis(0, rank_a), _basis(1, rank_b)


def pmp_pullback_fn(eps_fn, alpha_bar_t, t) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build f(x) = PMP(x, t) for a bound denoiser — the `get_x0` closure the
    subspace iteration differentiates (reference edit.py:2369-2391)."""
    from loco_edit_tpu.diffusion.scheduler import pmp

    def f(x):
        return pmp(x, eps_fn(x, t), alpha_bar_t)

    return f


def eps_pullback_fn(eps_fn, t) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """f(x) = eps(x, t): the `encoder_decoder_by_et` variant
    (reference `get_et`, edit.py:2394-2403)."""
    return lambda x: eps_fn(x, t)
