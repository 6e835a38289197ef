"""SuperRes / Encoder ADM variants + classifier guidance gradient."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.models.adm.presets import tiny_test_config
from loco_edit_tpu.models.adm.variants import (
    EncoderADMUNet,
    EncoderHeadConfig,
    SuperResADMUNet,
    classifier_grad_fn,
)


def test_superres_concat_conditioning():
    base = tiny_test_config()
    cfg = dataclasses.replace(base, in_channels=6)  # x + upsampled low-res
    model = SuperResADMUNet(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    low = jax.random.normal(jax.random.key(1), (1, 16, 16, 3))
    params = jax.jit(model.init)(jax.random.key(2), x, 500.0, low)
    eps = model.apply(params, x, 500.0, low)
    assert eps.shape == (1, 32, 32, 3)
    # conditioning matters
    params = jax.tree.map(lambda p: p + 0.02, params)
    e1 = model.apply(params, x, 500.0, low)
    e2 = model.apply(params, x, 500.0, low * 2.0)
    assert float(jnp.max(jnp.abs(e1 - e2))) > 0


def test_encoder_classifier_and_guidance_grad():
    cfg = tiny_test_config()
    enc = EncoderADMUNet(cfg, EncoderHeadConfig(pool="adaptive", out_dim=10))
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    params = jax.jit(enc.init)(jax.random.key(1), x, 300.0)
    params = jax.tree.map(lambda p: p + 0.01, params)
    logits = enc.apply(params, x, 300.0)
    assert logits.shape == (2, 10)

    grad_fn = classifier_grad_fn(lambda xx, t: enc.apply(params, xx, t),
                                 jnp.asarray([3, 7]))
    g = grad_fn(x, 300.0)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_encoder_attention_pool():
    cfg = tiny_test_config()
    enc = EncoderADMUNet(cfg, EncoderHeadConfig(pool="attention", out_dim=5))
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(enc.init)(jax.random.key(0), x, 10.0)
    assert enc.apply(params, x, 10.0).shape == (1, 5)
