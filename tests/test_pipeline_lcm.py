"""LCM scheduler + engine tests: grid selection vs diffusers semantics,
boundary scalings, and the few-step edit E2E on tiny models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.core.rng import seed_everything
from loco_edit_tpu.diffusion.lcm import lcm_denoised, lcm_grid
from loco_edit_tpu.models.sd import SDUNet, VAEConfig, VAEDecoder, sd_preset
from loco_edit_tpu.models.sd.text import fake_prompt_encoder
from loco_edit_tpu.pipelines.lcm import LCMEditConfig, LCMEditPipeline


def test_lcm_grid_timesteps_match_diffusers_selection():
    g = lcm_grid(4)
    # k=20, origin = [19,39,...,999]; reversed strided by 50//4=12
    np.testing.assert_array_equal(g.t, [999, 759, 519, 279])
    g2 = lcm_grid(2)
    np.testing.assert_array_equal(g2.t, [999, 499])


def test_lcm_boundary_scalings():
    g = lcm_grid(4)
    scaled = g.t * 10.0
    np.testing.assert_allclose(g.c_skip, 0.25 / (scaled**2 + 0.25), rtol=1e-5)
    np.testing.assert_allclose(g.c_out, scaled / np.sqrt(scaled**2 + 0.25),
                               rtol=1e-5)
    # near t=999, c_out ~ 1 and c_skip ~ 0: pure x0 prediction
    assert g.c_out[0] > 0.999 and g.c_skip[0] < 1e-6


def test_lcm_denoised_formula():
    g = lcm_grid(4)
    z = jnp.ones((1, 4, 4, 4))
    eps = jnp.full_like(z, 0.5)
    den = lcm_denoised(z, eps, g, 1)
    ab = g.alpha_bar[1]
    x0 = (1.0 - 0.5 * np.sqrt(1 - ab)) / np.sqrt(ab)
    expected = g.c_out[1] * x0 + g.c_skip[1] * 1.0
    np.testing.assert_allclose(np.asarray(den), expected, rtol=1e-5)


TINY = sd_preset("tiny")
TINY_LCM = TINY.__class__(**{**TINY.__dict__, "time_cond_proj_dim": 16})
TINY_VAE = VAEConfig(sample_size=16, block_out_channels=(32, 64), layers_per_block=1)


@pytest.fixture(scope="module")
def lcm_pipe_factory(tmp_path_factory):
    unet = SDUNet(TINY_LCM)
    dec = VAEDecoder(TINY_VAE)
    z = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, TINY_LCM.cross_attention_dim))
    pu = jax.jit(unet.init)(jax.random.key(0), z, 500.0, ctx, 6.5)
    pu = jax.tree.map(lambda p: p + 0.01, pu)
    pd = jax.jit(dec.init)(jax.random.key(1), z)

    def make(**overrides):
        cfg = LCMEditConfig(
            num_inference_steps=4, edit_t_idx=2, guidance_scale=7.5,
            pca_rank=1, pca_rank_null=2, min_iter=1, max_iter=2,
            x_space_guidance_num_step=1, vis_num=1,
            result_folder=str(tmp_path_factory.mktemp("lcm")), **overrides)
        return LCMEditPipeline(
            unet_apply=lambda zz, t, c, w: unet.apply(pu, zz, t, c, w),
            decode=lambda zz: dec.apply(pd, zz),
            prompt_encoder=fake_prompt_encoder(TINY_LCM.cross_attention_dim, seq=7),
            cfg=cfg, rng=seed_everything(5), latent_shape=(8, 8, 4))

    return make


def test_lcm_semantic_edit_e2e(lcm_pipe_factory):
    pipe = lcm_pipe_factory(null_space_projection=False)
    out = pipe.run_edit_null_space_projection_zt(
        for_prompt="a man", edit_prompt="a man with glasses", sample_name="s0")
    assert out["vT"].shape == (1, 8 * 8 * 4)
    assert out["image"].shape[0] == 3  # vis_num=1 strip: -end, center, +end
    assert np.all(np.isfinite(out["image"]))


def test_lcm_nonsemantic_with_null_projection(lcm_pipe_factory):
    pipe = lcm_pipe_factory(non_semantic=True, null_space_projection=True)
    mask = np.zeros((1, 16, 16, 3), bool)
    mask[:, 4:10, 4:10] = True
    out = pipe.run_edit_null_space_projection_zt(
        for_prompt="a man", edit_prompt="", mask=mask, sample_name="s1")
    np.testing.assert_allclose(np.linalg.norm(out["vT"], axis=1), 1.0, rtol=1e-3)


def test_lcm_sega(lcm_pipe_factory):
    pipe = lcm_pipe_factory(use_sega=True)
    out = pipe.run_edit_null_space_projection_zt(
        for_prompt="a man", edit_prompt="smiling", sample_name="s2")
    assert np.all(np.isfinite(out["image"]))


def test_noise_fn_hook_invalidates_jit_cache(lcm_pipe_factory):
    """The noise_fn hook's values are baked into the traced program as
    constants, so setting/clearing it with an otherwise-identical call
    signature must retrace, not replay the cached program."""
    pipe = lcm_pipe_factory()
    z = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 4))
                    .astype(np.float32))

    out_fresh = np.asarray(pipe.forward_steps(z, "p", 0, 2)[0])
    pipe.noise_fn = lambda i, shape, dtype: jnp.full(shape, 0.25, dtype)
    out_hooked = np.asarray(pipe.forward_steps(z, "p", 0, 2)[0])
    assert not np.allclose(out_fresh, out_hooked), \
        "hooked noise silently ignored (stale jit cache)"
    # deterministic hook -> repeat call is bit-identical
    np.testing.assert_array_equal(
        out_hooked, np.asarray(pipe.forward_steps(z, "p", 0, 2)[0]))
    # clearing the hook returns to the fresh-key stream (a different draw)
    pipe.noise_fn = None
    out_cleared = np.asarray(pipe.forward_steps(z, "p", 0, 2)[0])
    assert not np.allclose(out_hooked, out_cleared), \
        "cleared hook kept replaying the baked golden noise"
