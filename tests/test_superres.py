"""IF stage-2 super-resolution sampler: shapes, conditioning sensitivity,
and integration as the IF engine's stage-2 hook."""

import numpy as np

import jax
import jax.numpy as jnp

from loco_edit_tpu.core.rng import seed_everything
from loco_edit_tpu.models.ifm import IFUNet, IFUNetConfig
from loco_edit_tpu.models.sd.text import fake_prompt_encoder
from loco_edit_tpu.pipelines.superres import SuperResSampler

SR_CFG = IFUNetConfig(sample_size=16, in_channels=6, out_channels=6,
                      block_out_channels=(32, 64), layers_per_block=1,
                      encoder_hid_dim=48, cross_attention_dim=32,
                      attention_head_dim=16, attn_levels=(False, True))


def _sampler():
    model = IFUNet(SR_CFG)
    x = jnp.zeros((1, 16, 16, 6))
    ctx = jnp.zeros((1, 5, 48))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0, ctx)
    params = jax.tree.map(lambda p: p + 0.01, params)
    return SuperResSampler(
        lambda xx, t, c: model.apply(params, xx, t, c),
        fake_prompt_encoder(48, seq=5), out_size=16, steps=6,
        guidance_scale=4.0, rng=seed_everything(7))


def test_superres_shapes_and_range():
    sr = _sampler()
    low = np.random.default_rng(0).normal(size=(2, 8, 8, 3)).astype(np.float32) * 0.3
    out = sr(low, "a dog")
    assert out.shape == (2, 16, 16, 3)
    assert float(jnp.min(out)) >= -1.0 and float(jnp.max(out)) <= 1.0


def test_superres_conditioning_matters():
    sr = _sampler()
    rng = np.random.default_rng(1)
    low1 = rng.normal(size=(1, 8, 8, 3)).astype(np.float32) * 0.3
    low2 = rng.normal(size=(1, 8, 8, 3)).astype(np.float32) * 0.3
    o1 = sr(low1, "a dog")
    o2 = sr(low2, "a dog")
    assert float(jnp.max(jnp.abs(o1 - o2))) > 0


def test_if_engine_with_stage2():
    from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline

    s1_cfg = IFUNetConfig(sample_size=8, in_channels=3, out_channels=6,
                          block_out_channels=(32, 64), layers_per_block=1,
                          encoder_hid_dim=48, cross_attention_dim=32,
                          attention_head_dim=16, attn_levels=(False, True))
    s1 = IFUNet(s1_cfg)
    x = jnp.zeros((1, 8, 8, 3))
    ctx = jnp.zeros((1, 5, 48))
    p1 = jax.jit(s1.init)(jax.random.key(1), x, 500.0, ctx)
    p1 = jax.tree.map(lambda p: p + 0.01, p1)

    cfg = IFEditConfig(for_steps=6, pca_rank=1, min_iter=1, max_iter=2,
                       x_space_guidance_num_step=1, vis_num=1,
                       null_space_projection=False,
                       result_folder="/tmp/sr_engine", save_images=False)
    pipe = IFEditPipeline(
        unet_apply=lambda xx, t, c: s1.apply(p1, xx, t, c),
        prompt_encoder=fake_prompt_encoder(48, seq=5),
        cfg=cfg, rng=seed_everything(9), sample_shape=(8, 8, 3),
        superres=_sampler())
    out = pipe.run_edit_null_space_projection_xt("a dog", "a cat",
                                                 sample_name="s")
    # stage-2 output replaces the stage-1 image in the result
    assert out["image"].shape[1] == 16
    assert np.all(np.isfinite(out["image"]))
