"""h-space utilities + an independent numpy oracle for the SD transformer
block numerics (LayerNorm -> attention packing -> GEGLU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.editing.hspace import h_to_e, local_encoder_pullback, local_pca_h
from loco_edit_tpu.models.adm import ADMUNet
from loco_edit_tpu.models.adm.presets import tiny_test_config


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    model = ADMUNet(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0)
    params = jax.tree.map(lambda p: p + 0.02, params)
    return model, params


def test_local_encoder_pullback_h(tiny):
    model, params = tiny
    h_fn = lambda z: model.apply(params, z, 500.0, return_h=True)[-1]  # noqa
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3)) * 0.3
    basis = local_encoder_pullback(h_fn, x, jax.random.key(2), rank=2,
                                   min_iter=1, max_iter=3, tol=1e-3)
    assert basis.vT.shape == (2, 32 * 32 * 3)
    assert basis.u.shape[0] == 2 and basis.u.shape[1:] == (1, 16, 16, 64)


def test_h_to_e_response(tiny):
    model, params = tiny
    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3)) * 0.3

    def eps_with_inject(z, u_h):
        return model.apply(params, z, 500.0, h_inject=u_h)

    u_h = jnp.ones((16, 16, 64)) * 0.1
    de = h_to_e(eps_with_inject, x, u_h)
    assert de.shape == x.shape
    assert float(jnp.max(jnp.abs(de))) > 0


def test_local_pca_h(tiny):
    model, params = tiny
    h_fn = lambda z: model.apply(params, z, 500.0, return_h=True)[-1]  # noqa
    x = jax.random.normal(jax.random.key(4), (1, 32, 32, 3)) * 0.3
    comps = local_pca_h(h_fn, x, jax.random.key(5), rank=3, n_probes=16)
    assert comps.shape == (3, 16 * 16 * 64)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(comps, axis=1)), 1.0,
                               rtol=1e-4)


def test_transformer_block_vs_numpy_oracle():
    """BasicTransformerBlock numerics re-derived in numpy: validates the
    attention head packing, ADM-convention scaling, and GEGLU independent of
    any torch reference."""
    from flax.traverse_util import flatten_dict

    from loco_edit_tpu.models.sd.config import SDUNetConfig
    from loco_edit_tpu.models.sd.unet import BasicTransformerBlock

    cfg = SDUNetConfig(block_out_channels=(32,), attention_head_dim=(2,),
                       cross_attention_dim=16, cross_attn_levels=(True,))
    blk = BasicTransformerBlock(32, 2, cfg)
    x = jax.random.normal(jax.random.key(0), (1, 6, 32))
    ctx = jax.random.normal(jax.random.key(1), (1, 5, 16))
    params = blk.init(jax.random.key(2), x, ctx)
    # randomize (init biases are zero; keep them zero for the oracle's sake)
    params = jax.tree.map(
        lambda p: p + 0.05 * (np.prod(p.shape) % 3 == 0), params)
    got = np.asarray(blk.apply(params, x, ctx))[0]

    p = {"/".join(k): np.asarray(v)
         for k, v in flatten_dict(params["params"]).items()}
    xa = np.asarray(x)[0]
    ca = np.asarray(ctx)[0]

    def ln(z, name):
        mu = z.mean(-1, keepdims=True)
        var = z.var(-1, keepdims=True)
        return ((z - mu) / np.sqrt(var + 1e-5)) * p[f"{name}/scale"] + p[f"{name}/bias"]

    def attn(q_in, kv_in, name, heads):
        q = q_in @ p[f"{name}/to_q/kernel"]
        k = kv_in @ p[f"{name}/to_k/kernel"]
        v = kv_in @ p[f"{name}/to_v/kernel"]
        d = q.shape[-1] // heads
        out = np.zeros_like(q)
        s = 1.0 / np.sqrt(np.sqrt(d))
        for h in range(heads):
            qs = q[:, h * d:(h + 1) * d] * s
            ks = k[:, h * d:(h + 1) * d] * s
            vs = v[:, h * d:(h + 1) * d]
            logits = qs @ ks.T
            w = np.exp(logits - logits.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            out[:, h * d:(h + 1) * d] = w @ vs
        return out @ p[f"{name}/to_out_0/kernel"] + p[f"{name}/to_out_0/bias"]

    h1 = xa + attn(ln(xa, "norm1"), ln(xa, "norm1"), "attn1", 2)
    h2 = h1 + attn(ln(h1, "norm2"), ca, "attn2", 2)
    ff_in = ln(h2, "norm3")
    proj = ff_in @ p["ff_net_0/proj/kernel"] + p["ff_net_0/proj/bias"]
    half, gate = np.split(proj, 2, axis=-1)
    # exact-erf gelu (torch F.gelu / diffusers GEGLU convention)
    from scipy.special import erf

    g = 0.5 * gate * (1 + erf(gate / np.sqrt(2)))
    ff = (half * g) @ p["ff_net_2/kernel"] + p["ff_net_2/bias"]
    expected = h2 + ff

    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_global_pca_matches_exact_svd():
    """global_pca_h (Gram-trick population PCA) == exact numpy SVD of the
    centered feature matrix (reference global_pca_xt capability)."""
    from loco_edit_tpu.editing.hspace import global_pca_h

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4 * 4 * 3, 7)).astype(np.float32)
    h_fn = lambda z: jnp.tanh(z.reshape(1, -1) @ jnp.asarray(w))
    xs = jnp.asarray(rng.normal(size=(12, 4, 4, 3)).astype(np.float32))

    s, comps = global_pca_h(h_fn, xs, rank=3, chunk=4)
    hs = np.stack([np.tanh(np.asarray(x).reshape(-1) @ w) for x in xs])
    hc = hs - hs.mean(0, keepdims=True)
    u_, s_, vt_ = np.linalg.svd(hc, full_matrices=False)
    np.testing.assert_allclose(np.asarray(s), s_[:3], rtol=1e-4)
    align = np.abs(np.sum(np.asarray(comps) * vt_[:3], axis=1))
    np.testing.assert_allclose(align, 1.0, atol=1e-4)


def test_global_pca_chunk_pads_non_divisor_populations():
    """chunk that does not divide N must still chunk (padded lax.map), not
    silently fall back to one full vmap, and must give the same PCA."""
    from loco_edit_tpu.editing.hspace import global_pca_h

    rng = np.random.default_rng(5)
    w = rng.normal(size=(4 * 4 * 3, 7)).astype(np.float32)
    h_fn = lambda z: jnp.tanh(z.reshape(1, -1) @ jnp.asarray(w))
    xs = jnp.asarray(rng.normal(size=(10, 4, 4, 3)).astype(np.float32))

    s_c, comps_c = global_pca_h(h_fn, xs, rank=3, chunk=4)   # 10 % 4 != 0
    s_f, comps_f = global_pca_h(h_fn, xs, rank=3, chunk=0)
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_f), rtol=1e-4)
    align = np.abs(np.sum(np.asarray(comps_c) * np.asarray(comps_f), axis=1))
    np.testing.assert_allclose(align, 1.0, atol=1e-4)
