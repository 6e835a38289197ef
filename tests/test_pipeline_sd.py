"""SD edit engine E2E on tiny models (CPU): unsupervised + semantic + SEGA
paths, PMP-through-decoder pullback, mask in pixel space vs latent z_t."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.core.rng import seed_everything
from loco_edit_tpu.models.sd import SDUNet, VAEConfig, VAEDecoder, VAEEncoder, sd_preset
from loco_edit_tpu.models.sd.text import fake_prompt_encoder
from loco_edit_tpu.models.sd.vae import encode_sample
from loco_edit_tpu.pipelines.sd import SDEditConfig, SDEditPipeline

TINY = sd_preset("tiny")
TINY_VAE = VAEConfig(sample_size=16, block_out_channels=(32, 64), layers_per_block=1)


@pytest.fixture(scope="module")
def sd_pipe_factory(tmp_path_factory):
    unet = SDUNet(TINY)
    dec = VAEDecoder(TINY_VAE)
    enc = VAEEncoder(TINY_VAE)
    z = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, TINY.cross_attention_dim))
    pu = jax.jit(unet.init)(jax.random.key(0), z, 500.0, ctx)
    pu = jax.tree.map(lambda p: p + 0.01, pu)
    pd = jax.jit(dec.init)(jax.random.key(1), z)
    pe = jax.jit(enc.init)(jax.random.key(2), jnp.zeros((1, 16, 16, 3)))

    def make(**overrides):
        cfg = SDEditConfig(
            for_steps=8, inv_steps=8, edit_t=0.7, guidance_scale=5.0,
            pca_rank=2, pca_rank_null=2, min_iter=1, max_iter=2,
            x_space_guidance_num_step=2, vis_num=1, vis_num_pc=1,
            result_folder=str(tmp_path_factory.mktemp("sd")), **overrides)
        return SDEditPipeline(
            unet_apply=lambda zz, t, c: unet.apply(pu, zz, t, c),
            decode=lambda zz: dec.apply(pd, zz),
            encode=lambda x, key: encode_sample(*enc.apply(pe, x), key),
            prompt_encoder=fake_prompt_encoder(TINY.cross_attention_dim, seq=7),
            cfg=cfg, rng=seed_everything(3), latent_shape=(8, 8, 4))

    return make


def test_sd_unsupervised_edit_e2e(sd_pipe_factory):
    pipe = sd_pipe_factory(null_space_projection=False)
    out = pipe.run_edit_null_space_projection_zt(
        for_prompt="a cat", edit_prompt="", sample_name="s0")
    assert out["vT"].shape == (2, 8 * 8 * 4)
    img = out["strips"][0]
    assert img.shape[0] == 3 and img.shape[1] == 16  # decoded pixel strip
    assert np.all(np.isfinite(img))
    assert any(f.endswith(".png") for f in os.listdir(out["out_dir"]))


def test_sd_semantic_edit_with_pixel_mask(sd_pipe_factory):
    pipe = sd_pipe_factory(null_space_projection=True)
    mask = np.zeros((1, 16, 16, 3), bool)  # pixel-space mask (decoded res)
    mask[:, 4:12, 4:12] = True
    out = pipe.run_edit_null_space_projection_zt(
        for_prompt="a cat", edit_prompt="a cat with sunglasses",
        mask=mask, sample_name="s1", semantic=True)
    assert out["vT"].shape[0] == 1  # prompt-delta direction is rank 1
    np.testing.assert_allclose(np.linalg.norm(out["vT"], axis=1), 1.0, rtol=1e-3)


def test_sd_sega_branch(sd_pipe_factory):
    pipe = sd_pipe_factory(use_sega=True)
    out = pipe.run_edit_null_space_projection_zt(
        for_prompt="a cat", edit_prompt="smiling", sample_name="s2")
    assert "image" in out and np.all(np.isfinite(out["image"]))


def test_sd_inversion_of_real_image(sd_pipe_factory):
    pipe = sd_pipe_factory()
    x0 = np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32) * 0.4
    zT = pipe.invert(x0, inv_prompt="")
    assert zT.shape == (1, 8, 8, 4)
    assert bool(jnp.all(jnp.isfinite(zT)))
