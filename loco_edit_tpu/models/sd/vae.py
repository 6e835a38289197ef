"""AutoencoderKL (SD VAE), NHWC Flax.

The reference's engines differentiate THROUGH vae.decode (PMP through the
decoder, src/modules/edit.py:757-781), so the decoder must be a first-class
differentiable Flax module, not a host-side stage. Encoder provides the
latent_dist for DDIM inversion of real images (edit.py:596-599).

Structure (diffusers AutoencoderKL):
  encoder: conv_in -> 4 DownEncoderBlocks (2 resnets each, eps 1e-6, no temb;
           asymmetric-pad stride-2 conv downsample) -> mid(res, attn, res)
           -> GN/silu/conv_out (2*latent ch) -> quant_conv 1x1
  decoder: post_quant_conv 1x1 -> conv_in -> mid(res, attn, res)
           -> 4 UpDecoderBlocks (3 resnets, nearest-up + conv) -> GN/silu/conv_out
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from loco_edit_tpu.models.sd.config import VAEConfig
from loco_edit_tpu.ops import sdp_attention
from loco_edit_tpu.ops.norms import group_norm_f32


class _GN(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        return group_norm_f32(x, scale, bias, eps=1e-6)


def _conv(out_ch, kernel=3, stride=1, dtype=jnp.float32, name=None, padding=None):
    return nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride),
                   padding=kernel // 2 if padding is None else padding,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class VAEResnet(nn.Module):
    in_ch: int
    out_ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        h = jax.nn.silu(_GN(self.in_ch, name="norm1")(x))
        h = _conv(self.out_ch, dtype=self.dtype, name="conv1")(h)
        h = jax.nn.silu(_GN(self.out_ch, name="norm2")(h))
        h = _conv(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch:
            x = _conv(self.out_ch, kernel=1, dtype=self.dtype,
                      name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    ch: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _GN(c, name="group_norm")(x).reshape(b, hh * ww, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("to_q")(h), dense("to_k")(h), dense("to_v")(h)
        a = sdp_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        return x + dense("to_out_0")(a).reshape(b, hh, ww, c)


class VAEEncoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        chs = cfg.block_out_channels
        h = _conv(chs[0], dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        ch = chs[0]
        for i, out_ch in enumerate(chs):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, out_ch, cfg.dtype, name=f"down_{i}_res_{j}")(h)
                ch = out_ch
            if i != len(chs) - 1:
                hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = _conv(ch, stride=2, dtype=cfg.dtype, padding="VALID",
                          name=f"down_{i}_downsample")(hp)
        h = VAEResnet(ch, ch, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(ch, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(ch, ch, cfg.dtype, name="mid_res_1")(h)
        h = jax.nn.silu(_GN(ch, name="conv_norm_out")(h))
        h = _conv(2 * cfg.latent_channels, dtype=jnp.float32, name="conv_out")(h)
        h = _conv(2 * cfg.latent_channels, kernel=1, dtype=jnp.float32,
                  name="quant_conv")(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)


class VAEDecoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        chs = cfg.block_out_channels
        if cfg.remat:
            # lifted per-block checkpoint (same pattern as SDUNet): recompute
            # block internals in the pullback's tangent/cotangent passes
            # instead of pinning 512px f32 temps as linearize residuals
            _remat_call = nn.remat(lambda m, *a: m(*a))
            block = lambda m, *a: _remat_call(m, *a)  # noqa: E731
        else:
            block = lambda m, *a: m(*a)  # noqa: E731
        h = _conv(cfg.latent_channels, kernel=1, dtype=cfg.dtype,
                  name="post_quant_conv")(z.astype(cfg.dtype))
        h = _conv(chs[-1], dtype=cfg.dtype, name="conv_in")(h)
        ch = chs[-1]
        h = block(VAEResnet(ch, ch, cfg.dtype, name="mid_res_0"), h)
        h = block(VAEAttention(ch, cfg.dtype, name="mid_attn"), h)
        h = block(VAEResnet(ch, ch, cfg.dtype, name="mid_res_1"), h)
        for k, i in enumerate(reversed(range(len(chs)))):
            out_ch = chs[i]
            for j in range(cfg.layers_per_block + 1):
                h = block(VAEResnet(ch, out_ch, cfg.dtype,
                                    name=f"up_{i}_res_{j}"), h)
                ch = out_ch
            if k != len(chs) - 1:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = _conv(ch, dtype=cfg.dtype, name=f"up_{i}_upsample")(h)
        h = jax.nn.silu(_GN(ch, name="conv_norm_out")(h))
        return _conv(cfg.out_channels, dtype=jnp.float32, name="conv_out")(h)


def encode_sample(mean: jnp.ndarray, logvar: jnp.ndarray, key: jax.Array,
                  scaling_factor: float = 0.18215) -> jnp.ndarray:
    """latent_dist.sample() * scaling_factor (reference edit.py:597-599)."""
    std = jnp.exp(0.5 * logvar)
    return (mean + std * jax.random.normal(key, mean.shape, mean.dtype)) * scaling_factor
