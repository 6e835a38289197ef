"""SD-family model tests: tiny UNet forward (self+cross attention), LCM
w-conditioning, VAE encode/decode round shapes, converter structure match,
and differentiability of decode∘pmp (the SD edit path requirement)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.models.sd import (
    SDUNet,
    VAEConfig,
    VAEDecoder,
    VAEEncoder,
    sd_preset,
)
from loco_edit_tpu.models.sd.text import fake_prompt_encoder

TINY = sd_preset("tiny")
TINY_VAE = VAEConfig(sample_size=32, block_out_channels=(32, 64),
                     layers_per_block=1)


@pytest.fixture(scope="module")
def tiny_unet():
    model = SDUNet(TINY)
    x = jnp.zeros((2, 8, 8, 4))
    ctx = jnp.zeros((2, 7, TINY.cross_attention_dim))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0, ctx)
    return model, params


def test_unet_forward_shape(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (2, 7, TINY.cross_attention_dim))
    eps = model.apply(params, x, 123.4, ctx)
    assert eps.shape == (2, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(eps)))


def test_unet_context_sensitivity(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
    enc = fake_prompt_encoder(TINY.cross_attention_dim, seq=7)
    e1 = model.apply(params, x, 100.0, enc("a cat"))
    e2 = model.apply(params, x, 100.0, enc("a dog"))
    assert float(jnp.max(jnp.abs(e1 - e2))) > 0


def test_lcm_guidance_embedding():
    cfg = sd_preset("tiny")
    cfg = cfg.__class__(**{**cfg.__dict__, "time_cond_proj_dim": 16})
    model = SDUNet(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0, ctx, 8.0)
    e1 = model.apply(params, x, 500.0, ctx, 4.0)
    e2 = model.apply(params, x, 500.0, ctx, 8.0)
    assert e1.shape == (1, 8, 8, 4)
    with pytest.raises(ValueError):
        model.apply(params, x, 500.0, ctx)  # w required


def test_vae_roundtrip_shapes():
    enc = VAEEncoder(TINY_VAE)
    dec = VAEDecoder(TINY_VAE)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    pe = jax.jit(enc.init)(jax.random.key(1), x)
    mean, logvar = enc.apply(pe, x)
    assert mean.shape == (1, 16, 16, 4)  # one downsample level in tiny cfg
    pd = jax.jit(dec.init)(jax.random.key(2), mean)
    y = dec.apply(pd, mean)
    assert y.shape == (1, 32, 32, 3)


def test_pmp_through_decoder_is_differentiable():
    """The SD edit algebra needs jvp/vjp through unet + pmp + vae.decode
    (reference get_x0, edit.py:757-781)."""
    model = SDUNet(TINY)
    dec = VAEDecoder(TINY_VAE)
    z = jax.random.normal(jax.random.key(0), (1, 8, 8, 4)) * 0.5
    ctx = jax.random.normal(jax.random.key(1), (1, 7, TINY.cross_attention_dim))
    pu = jax.jit(model.init)(jax.random.key(2), z, 500.0, ctx)
    # tiny VAE decoder on 8x8 latents -> 16x16 pixels
    pd = jax.jit(dec.init)(jax.random.key(3), z)

    def f(zt):
        eps = model.apply(pu, zt, 500.0, ctx)
        z0 = (zt - eps * 0.8) / 0.6
        return dec.apply(pd, z0 / 0.18215)

    v = jax.random.normal(jax.random.key(4), z.shape)
    y, u = jax.jvp(f, (z,), (v,))
    _, pull = jax.vjp(f, z)
    (g,) = pull(u)
    assert g.shape == z.shape and bool(jnp.all(jnp.isfinite(g)))


def test_converter_structure_matches_init():
    from loco_edit_tpu.models.sd.convert import convert_sd_unet_state_dict

    cfg = TINY
    model = SDUNet(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
    expected = jax.eval_shape(model.init, jax.random.key(0), x, 500.0, ctx)

    # synthesize a diffusers-named state_dict from the expected tree by
    # inverting the mapping (shapes transposed back to torch conventions)
    flat = {jax.tree_util.keystr(p, simple=True, separator="/"): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(expected)}

    sd = {}

    def put(tname, shape, kind):
        if kind == "lin":
            sd[f"{tname}.weight"] = np.zeros((shape[1], shape[0]), np.float32)
            sd[f"{tname}.bias"] = np.zeros((shape[1],), np.float32)
        elif kind == "lin_nobias":
            sd[f"{tname}.weight"] = np.zeros((shape[1], shape[0]), np.float32)
        elif kind == "conv":
            kh, kw, ci, co = shape
            sd[f"{tname}.weight"] = np.zeros((co, ci, kh, kw), np.float32)
            sd[f"{tname}.bias"] = np.zeros((co,), np.float32)
        elif kind == "norm":
            sd[f"{tname}.weight"] = np.zeros(shape, np.float32)
            sd[f"{tname}.bias"] = np.zeros(shape, np.float32)

    import re

    for path, shape in flat.items():
        parts = path.split("/")[1:]  # drop 'params'
        # reconstruct the diffusers name from our flax name
        name = ".".join(parts[:-1])
        leaf = parts[-1]
        t = (name
             .replace("time_dense0", "time_embedding.linear_1")
             .replace("time_dense1", "time_embedding.linear_2"))
        t = re.sub(r"down_(\d+)_res_(\d+)", r"down_blocks.\1.resnets.\2", t)
        t = re.sub(r"down_(\d+)_attn_(\d+)", r"down_blocks.\1.attentions.\2", t)
        t = re.sub(r"down_(\d+)_downsample", r"down_blocks.\1.downsamplers.0.conv", t)
        n_lev = len(cfg.block_out_channels)
        m = re.match(r"up_(\d+)_res_(\d+)(.*)", t)
        if m:
            t = f"up_blocks.{n_lev - 1 - int(m.group(1))}.resnets.{m.group(2)}{m.group(3)}"
        m = re.match(r"up_(\d+)_attn_(\d+)(.*)", t)
        if m:
            t = f"up_blocks.{n_lev - 1 - int(m.group(1))}.attentions.{m.group(2)}{m.group(3)}"
        m = re.match(r"up_(\d+)_upsample", t)
        if m:
            t = f"up_blocks.{n_lev - 1 - int(m.group(1))}.upsamplers.0.conv"
        t = (t.replace("mid_res_0", "mid_block.resnets.0")
             .replace("mid_res_1", "mid_block.resnets.1")
             .replace("mid_attn", "mid_block.attentions.0")
             .replace("block_0.", "transformer_blocks.0.")
             .replace("ff_net_0", "ff.net.0")
             .replace("ff_net_2", "ff.net.2")
             .replace("to_out_0", "to_out.0"))
        if leaf == "scale" or (leaf == "bias" and len(shape) == 1 and
                               ("norm" in t.split(".")[-1])):
            put(t, shape, "norm")
        elif len(shape) == 4:
            put(t, shape, "conv")
        elif len(shape) == 2:
            # diffusers SD attention q/k/v are bias-free Linears
            nobias = t.split(".")[-1] in ("to_q", "to_k", "to_v")
            put(t, shape, "lin_nobias" if nobias else "lin")
        # 1-d biases of conv/linear handled by their weight entries above

    params = convert_sd_unet_state_dict(sd, cfg)
    got = {jax.tree_util.keystr(p): v.shape
           for p, v in jax.tree_util.tree_leaves_with_path(params)}
    want = {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(expected)}
    # attn q/k/v have no bias; the synthetic dict adds bias for all linears,
    # so compare on the intersection of keys plus require full coverage of want
    missing = set(want) - set(got)
    assert not missing, f"converter missed: {sorted(missing)[:10]}"
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])


def test_remat_matches_no_remat_through_pullback():
    """cfg.remat wraps every block in jax.checkpoint — the production memory
    knob for the z-space pullback at 512px, where the 4096-token attention
    levels otherwise pin ~5G of f32 logits as linearize residuals for the
    whole subspace iteration (measured OOM on a 16G chip,
    scripts/bench_t2i_basis.py). Checkpointing is recompute-only: the forward
    AND the iteration's tangent/cotangent numerics must be unchanged."""
    import dataclasses

    from loco_edit_tpu.editing import subspace_iteration

    m0 = SDUNet(TINY)
    x = jnp.zeros((1, 8, 8, 4))
    ctx = (jax.random.normal(jax.random.key(2),
                             (1, 7, TINY.cross_attention_dim)) * 0.1)
    params = jax.jit(m0.init)(jax.random.key(0), x, 500.0, ctx)
    z = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))

    def basis(m):
        return subspace_iteration(
            lambda zz: m.apply(params, zz, 300.0, ctx), z, jax.random.key(3),
            rank=2, min_iter=3, max_iter=3, tol=0.0)

    b0 = basis(m0)
    y0 = np.asarray(m0.apply(params, z, 300.0, ctx))
    # both policies: full recompute, and dots_no_batch (keeps projection
    # outputs, recomputes only the batched attention dots)
    for policy in (None, "dots_no_batch"):
        mr = SDUNet(dataclasses.replace(TINY, remat=True, remat_policy=policy))
        np.testing.assert_array_equal(
            y0, np.asarray(mr.apply(params, z, 300.0, ctx)))
        br = basis(mr)
        np.testing.assert_allclose(np.asarray(br.vT), np.asarray(b0.vT),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(br.s), np.asarray(b0.s),
                                   rtol=1e-5)


def test_vae_decoder_remat_matches_through_pullback():
    """VAEConfig.remat checkpoints every decoder block — together with the
    UNet's it is what lets the through-the-decoder pullback fit 16G at 512px
    (the probe_chunk=4 OOM was dominated by 128M-apiece f32 decoder jvp
    temps). Param tree, forward, and subspace-iteration numerics must all be
    unchanged."""
    import dataclasses

    from loco_edit_tpu.editing import subspace_iteration

    d0 = VAEDecoder(TINY_VAE)
    dr = VAEDecoder(dataclasses.replace(TINY_VAE, remat=True))
    z = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    params = jax.jit(d0.init)(jax.random.key(1), z)
    assert (jax.tree.structure(jax.jit(dr.init)(jax.random.key(1), z))
            == jax.tree.structure(params))
    np.testing.assert_array_equal(np.asarray(d0.apply(params, z)),
                                  np.asarray(dr.apply(params, z)))

    def basis(d):
        return subspace_iteration(
            lambda zz: d.apply(params, zz), z, jax.random.key(2),
            rank=2, min_iter=3, max_iter=3, tol=0.0)

    b0, br = basis(d0), basis(dr)
    np.testing.assert_allclose(np.asarray(br.vT), np.asarray(b0.vT), atol=1e-6)
    np.testing.assert_allclose(np.asarray(br.s), np.asarray(b0.s), rtol=1e-5)
