"""DeepFloyd-IF engine E2E on a tiny learned-sigma conditional UNet (CPU):
direct directions, jacobian directions, diffedit masks, masked sampler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.core.rng import seed_everything
from loco_edit_tpu.models.sd import SDUNet, sd_preset
from loco_edit_tpu.models.sd.text import fake_prompt_encoder
from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline

TINY = sd_preset("tiny")
# IF stage-1 is pixel-space with learned sigma: in 3 / out 6
TINY_IF = TINY.__class__(**{**TINY.__dict__, "in_channels": 3, "out_channels": 6})


@pytest.fixture(scope="module")
def if_pipe_factory(tmp_path_factory):
    unet = SDUNet(TINY_IF)
    x = jnp.zeros((1, 8, 8, 3))
    ctx = jnp.zeros((1, 7, TINY_IF.cross_attention_dim))
    pu = jax.jit(unet.init)(jax.random.key(0), x, 500.0, ctx)
    pu = jax.tree.map(lambda p: p + 0.01, pu)

    def make(**overrides):
        cfg = IFEditConfig(
            for_steps=8, edit_t=0.75, guidance_scale=7.0,
            pca_rank=1, pca_rank_null=2, min_iter=1, max_iter=2,
            x_space_guidance_num_step=2, vis_num=1,
            result_folder=str(tmp_path_factory.mktemp("if")), **overrides)
        return IFEditPipeline(
            unet_apply=lambda xx, t, c: unet.apply(pu, xx, t, c),
            prompt_encoder=fake_prompt_encoder(TINY_IF.cross_attention_dim, seq=7),
            cfg=cfg, rng=seed_everything(9), sample_shape=(8, 8, 3))

    return make


@pytest.mark.parametrize("mode", ["(for-edit)-direct", "(edit-null)-direct",
                                  "proj_null[for-null](edit-null)-direct"])
def test_if_direct_directions(if_pipe_factory, mode):
    pipe = if_pipe_factory(null_space_projection=False, tilda_v_score_type=mode)
    out = pipe.run_edit_null_space_projection_xt(
        for_prompt="a dog", edit_prompt="a dog wearing a hat",
        sample_name=f"s-{mode[:8]}")
    assert out["vT"].shape == (1, 8 * 8 * 3)
    np.testing.assert_allclose(np.linalg.norm(out["vT"], axis=1), 1.0, rtol=1e-3)
    assert np.all(np.isfinite(out["image"]))


def test_if_jacobian_direction_with_nullproj(if_pipe_factory):
    pipe = if_pipe_factory(jacobian=True,
                           tilda_v_score_type="null+(for-null)+(edit-null)")
    mask = np.zeros((1, 8, 8, 3), bool)
    mask[:, 2:6, 2:6] = True
    out = pipe.run_edit_null_space_projection_xt(
        for_prompt="a dog", edit_prompt="a smiling dog", mask=mask,
        sample_name="s-jac")
    np.testing.assert_allclose(np.linalg.norm(out["vT"], axis=1), 1.0, rtol=1e-3)


def test_if_unsupervised_basis(if_pipe_factory):
    pipe = if_pipe_factory(null_space_projection=False)
    out = pipe.run_edit_null_space_projection_xt(
        for_prompt="a dog", edit_prompt="", sample_name="s-unsup",
        semantic=False)
    assert out["vT"].shape[0] == 1


def test_if_diffedit_mask_and_masked_sampler(if_pipe_factory):
    pipe = if_pipe_factory()
    prompts = pipe.prompt_set("a dog", "a cat")
    x0 = np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32) * 0.3
    mask = pipe.diffedit_mask(x0, prompts)
    assert mask.shape == (1, 8, 8, 1) and mask.dtype == bool
    out = pipe.run_edit_null_space_projection_xt(
        for_prompt="a dog", edit_prompt="a cat",
        mask=np.repeat(mask, 3, axis=-1), sample_name="s-de",
        ablation="diffedit")
    assert np.all(np.isfinite(out["image"]))


def test_sega_ablation_branch(if_pipe_factory):
    """IF SEGA ablation (reference edit.py:2000-2007): edit-guided tail
    denoise from edit_t, no basis machinery."""
    import numpy as np

    pipe = if_pipe_factory(save_images=False)
    out = pipe.run_edit_null_space_projection_xt(
        "a dog", "a cat", sample_name="sega", ablation="sega")
    assert set(out) == {"image"}
    assert np.all(np.isfinite(out["image"]))
