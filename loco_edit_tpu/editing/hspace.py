"""h-space (bottleneck) analysis utilities.

Counterparts of the reference PullBackDDPM's h-space methods
(src/models/ddpm/diffusion.py: get_h :202, get_h_to_e :273, inv_jac_xt :347,
local_pca_xt :379, global_pca_xt :438; ADM variant get_h / local_encoder
pullback at guided_diffusion/unet.py:686-781): the encoder pullback finds
x-space directions whose images under d h / d x are the top singular
directions; h_to_e measures how bottleneck perturbations move the epsilon
output. Built on the same subspace iteration as the main edit algebra."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from loco_edit_tpu.editing.pullback import EditBasis, subspace_iteration


def local_encoder_pullback(h_fn: Callable, x: jnp.ndarray, key: jax.Array, *,
                           rank: int, **kw) -> EditBasis:
    """Top right-singular directions of d h(x) / d x, where h_fn maps x_t to
    the bottleneck feature (e.g. lambda z: model.apply(p, z, t, return_h=True)[-1])."""
    return subspace_iteration(h_fn, x, key, rank=rank, **kw)


def h_to_e(eps_fn_with_inject: Callable, x: jnp.ndarray, u_h: jnp.ndarray,
           scale: float = 1.0) -> jnp.ndarray:
    """Epsilon response to a bottleneck perturbation u_h:
    eps(x | h + scale*u_h) - eps(x) (reference get_h_to_e)."""
    base = eps_fn_with_inject(x, None)
    pert = eps_fn_with_inject(x, scale * u_h)
    return pert - base


def inv_jac(h_fn: Callable, x: jnp.ndarray, u_h: jnp.ndarray,
            perturb_h: float = 1e-1) -> jnp.ndarray:
    """x-space directions realizing given h-space perturbations — the inverse
    Jacobian map (reference PullBackDDPM.inv_jac_xt, ddpm/diffusion.py:347-377).

    The reference perturbs the bottleneck h -> h + perturb_h*u and takes the
    gradient of x' -> ||(h + perturb_h*u) - h(x')|| at the base point x,
    row-normalized. At the base point the residual is exactly perturb_h*u, so
    that gradient is analytically -J_h^T u / ||u|| for ANY perturb_h — the
    finite perturbation cancels. Here it is computed as one shared VJP of
    h_fn, vmapped over the direction rows; `perturb_h` is kept for signature
    parity and only its sign matters (the reference's gradient points AWAY
    from the target, hence the leading minus).

    u_h: (rank, d_h) rows (or (d_h,)); returns (rank, d_in) unit rows.
    """
    u = jnp.atleast_2d(jnp.asarray(u_h))
    h0, vjp = jax.vjp(h_fn, x)

    def one(ui):
        ct = (ui / jnp.maximum(jnp.linalg.norm(ui), 1e-20)).reshape(h0.shape)
        g = vjp(-jnp.sign(perturb_h) * ct.astype(h0.dtype))[0]
        return g.reshape(-1).astype(jnp.float32)

    vT = jax.vmap(one)(u)
    return vT / jnp.maximum(jnp.linalg.norm(vT, axis=1, keepdims=True), 1e-12)


def global_pca_h(h_fn: Callable, xs: jnp.ndarray, *, rank: int,
                 chunk: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Global PCA of bottleneck features over a SAMPLE POPULATION (reference
    PullBackDDPM.global_pca_xt, ddpm/diffusion.py:438-481: h over a batch of
    x_t draws, centered torch.pca_lowrank): returns (singular values (rank,),
    components (rank, d_h)).

    TPU-first: the population axis is small (tens-hundreds) and d_h is large,
    so the SVD runs via the (N, N) Gram eigendecomposition instead of the
    reference's CPU-offloaded randomized PCA; h extraction chunks through
    lax.map to bound memory instead of host buffering (`memory_bound`)."""
    n = xs.shape[0]
    if chunk and n > chunk:
        # pad to a chunk multiple (wrap rows; dropped after the map) so the
        # memory bound holds for every population size, not only divisors
        pad = (-n) % chunk
        xs_p = jnp.concatenate([xs, xs[:pad]]) if pad else xs
        hs = jax.lax.map(jax.vmap(lambda z: h_fn(z[None]).reshape(-1)),
                         xs_p.reshape(-1, chunk, *xs.shape[1:]))
        hs = hs.reshape(xs_p.shape[0], -1)[:n]
    else:
        hs = jax.vmap(lambda z: h_fn(z[None]).reshape(-1))(xs)
    centered = (hs - jnp.mean(hs, axis=0, keepdims=True)).astype(jnp.float32)
    gram = centered @ centered.T                      # (N, N) — tiny
    w, q = jnp.linalg.eigh(gram)
    w = w[::-1][:rank]
    comps = q[:, ::-1][:, :rank].T @ centered         # (rank, d_h)
    comps = comps / jnp.maximum(
        jnp.linalg.norm(comps, axis=1, keepdims=True), 1e-12)
    return jnp.sqrt(jnp.maximum(w, 0.0)), comps


def local_pca_h(h_fn: Callable, x: jnp.ndarray, key: jax.Array, *,
                rank: int, eps: float = 1e-2, n_probes: int = 64) -> jnp.ndarray:
    """PCA of bottleneck features under small input perturbations (the
    reference's local_pca_xt capability): returns (rank, d_h) components."""
    h0 = h_fn(x).reshape(-1)
    probes = jax.random.normal(key, (n_probes,) + x.shape, x.dtype) * eps
    hs = jax.vmap(lambda p: h_fn(x + p).reshape(-1))(probes)
    centered = (hs - h0[None]).astype(jnp.float32)
    gram = centered @ centered.T
    w, q = jnp.linalg.eigh(gram)
    comps = (q[:, ::-1][:, :rank].T @ centered)
    return comps / jnp.linalg.norm(comps, axis=1, keepdims=True)
