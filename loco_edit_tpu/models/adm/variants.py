"""ADM variants: super-resolution U-Net and the half-UNet classifier encoder.

Counterparts of the reference's SuperResModel (guided_diffusion/unet.py:784-799:
concat bicubic-upsampled low-res conditioning on the channel axis) and
EncoderUNetModel (:801-1012: encoder trunk + attention/adaptive pooling head,
used for classifier guidance). Both reuse the ADM block zoo."""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from loco_edit_tpu.models.adm.config import ADMConfig, adm_layout
from loco_edit_tpu.models.adm.unet import (
    ADMUNet,
    GroupNorm32,
    _BlockSeq,
    timestep_embedding,
)


class SuperResADMUNet(nn.Module):
    """eps(x_t, t | low_res): the low-res conditioning image is resized to the
    model resolution and concatenated on channels (reference unet.py:794-799,
    which uses bilinear; in_channels of the wrapped UNet doubles)."""

    cfg: ADMConfig  # cfg.in_channels already counts the doubled channels

    @nn.compact
    def __call__(self, x, t, low_res, **kwargs):
        up = jax.image.resize(low_res, x.shape[:1] + x.shape[1:3]
                              + low_res.shape[-1:], method="bilinear")
        return ADMUNet(self.cfg, name="unet")(
            jnp.concatenate([x, up.astype(x.dtype)], axis=-1), t, **kwargs)


@dataclasses.dataclass(frozen=True)
class EncoderHeadConfig:
    pool: str = "adaptive"  # 'adaptive' | 'attention' | 'spatial'
    out_dim: int = 1000


class EncoderADMUNet(nn.Module):
    """Half-UNet classifier (the classifier-guidance model): ADM encoder trunk
    + middle block, pooled to logits (reference unet.py:801-1012)."""

    cfg: ADMConfig
    head: EncoderHeadConfig = EncoderHeadConfig()

    @nn.compact
    def __call__(self, x, t):
        cfg = self.cfg
        layout = adm_layout(cfg)
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(t)), (b,))
        emb = nn.Dense(cfg.time_embed_dim, param_dtype=jnp.float32,
                       name="time_dense1")(
            jax.nn.silu(nn.Dense(cfg.time_embed_dim, param_dtype=jnp.float32,
                                 name="time_dense0")(
                timestep_embedding(t, cfg.model_channels)))).astype(cfg.dtype)

        h = x.astype(cfg.dtype)
        for i, specs in enumerate(layout.input_blocks):
            h = _BlockSeq(specs, cfg, name=f"input_{i}")(h, emb)
        h = _BlockSeq(layout.middle_block, cfg, name="middle")(h, emb)

        ch = h.shape[-1]
        if self.head.pool == "adaptive":
            h = GroupNorm32(ch, name="out_norm")(h)
            h = jax.nn.silu(h)
            h = jnp.mean(h, axis=(1, 2))
        elif self.head.pool == "spatial":
            h = h.reshape(b, -1)
        else:  # attention-pool: mean-augmented softmax pooling
            tokens = h.reshape(b, -1, ch)
            q = jnp.mean(tokens, axis=1, keepdims=True)
            w = jax.nn.softmax(
                jnp.einsum("bqc,bkc->bqk", q, tokens) / jnp.sqrt(ch), axis=-1)
            h = jnp.einsum("bqk,bkc->bqc", w, tokens)[:, 0]
        return nn.Dense(self.head.out_dim, param_dtype=jnp.float32,
                        name="logits")(h.astype(jnp.float32))


def classifier_grad_fn(encoder_apply, y):
    """grad_x log p(y|x) for classifier guidance (reference
    gaussian_diffusion.py:356-402 + classifier usage in ADM)."""
    def grad_fn(x, t):
        def logp(xx):
            logits = encoder_apply(xx, t)
            logprobs = jax.nn.log_softmax(logits, axis=-1)
            return jnp.sum(logprobs[jnp.arange(xx.shape[0]), y])
        return jax.grad(logp)(x)

    return grad_fn
