"""DeepFloyd-IF-style pixel-space conditional U-Net (added-KV attention).

The IF stage-1/2 checkpoints (reference loads them via diffusers pipelines,
src/utils/utils.py:260-293) use a UNet2DConditionModel variant that differs
from SD:

  - attention blocks are "simple" added-KV attention: q/k/v all come from the
    image tokens, and the text conditioning contributes EXTRA key/value tokens
    through add_k_proj/add_v_proj, concatenated before softmax (diffusers
    AttnAddedKVProcessor); a GroupNorm precedes attention and the text states
    are LayerNorm-ed (cross_attention_norm).
  - res blocks use scale-shift time conditioning, and up/downsampling is done
    by resnet blocks (ResnetDown/UpsampleBlock2D), like ADM's resblock_updown.
  - the T5 hidden states (4096-d) pass through encoder_hid_proj.
  - learned-sigma output (out = 2 * in channels).

This module implements that block zoo faithfully. The published IF-I-M/L/XL
width/depth hyperparameters are NOT reproducible in this offline environment
(no config access); `IFUNetConfig` carries them as plain fields so real
checkpoints can be loaded once their configs are known — tracked as a round-2
item in docs/PARITY.md. The optional attention-pooled "addition" text
embedding is simplified to LayerNorm + masked-mean + Dense (flagged in the
config; converter support pending the same config access).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from loco_edit_tpu.models.adm.unet import timestep_embedding
from loco_edit_tpu.ops import sdp_attention
from loco_edit_tpu.ops.norms import group_norm_f32


@dataclasses.dataclass(frozen=True)
class IFUNetConfig:
    sample_size: int = 64
    in_channels: int = 3
    out_channels: int = 6                # eps | sigma
    block_out_channels: tuple[int, ...] = (64, 128, 256, 512)
    layers_per_block: int = 2
    encoder_hid_dim: int = 4096          # T5-XXL hidden size
    cross_attention_dim: int = 512
    attention_head_dim: int = 64
    # level 0 is a pure resnet block (no attention), matching IF's
    # (ResnetDownsampleBlock2D, SimpleCrossAttn...) layout
    attn_levels: tuple[bool, ...] = (False, True, True, True)
    use_addition_text_embed: bool = False  # simplified pooling; see docstring
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


class _GN(nn.Module):
    ch: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        return group_norm_f32(x, scale, bias, eps=self.eps)


def _conv(out_ch, kernel=3, stride=1, dtype=jnp.float32, name=None):
    return nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride),
                   padding=kernel // 2, dtype=dtype, param_dtype=jnp.float32,
                   name=name)


def _dense(out, dtype, name, use_bias=True):
    return nn.Dense(out, dtype=dtype, param_dtype=jnp.float32, name=name,
                    use_bias=use_bias)


class IFResBlock(nn.Module):
    """Scale-shift resnet block with optional in-block up/downsampling
    (diffusers ResnetBlock2D with time_scale_shift='scale_shift' + the
    Resnet{Down,Up}sampleBlock2D sampling placement)."""

    in_ch: int
    out_ch: int
    cfg: IFUNetConfig
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, temb):
        h = jax.nn.silu(_GN(self.in_ch, name="norm1")(x))
        if self.up:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv1")(h)
        e = _dense(2 * self.out_ch, self.cfg.dtype,
                   "time_emb_proj")(jax.nn.silu(temb))
        scale, shift = jnp.split(e[:, None, None, :].astype(h.dtype), 2, axis=-1)
        h = _GN(self.out_ch, name="norm2")(h) * (1 + scale) + shift
        h = jax.nn.silu(h)
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch or self.up or self.down:
            x = _conv(self.out_ch, kernel=1, dtype=self.cfg.dtype,
                      name="conv_shortcut")(x)
        return x + h


class IFAttention(nn.Module):
    """Added-KV attention: image tokens provide q/k/v, LayerNorm-ed text
    states contribute extra k/v tokens via add_k_proj/add_v_proj, concatenated
    on the sequence axis before a single softmax (AttnAddedKVProcessor)."""

    ch: int
    cfg: IFUNetConfig

    @nn.compact
    def __call__(self, x, ctx):
        b, hh, ww, c = x.shape
        heads = max(c // self.cfg.attention_head_dim, 1)
        d = c // heads
        tokens = _GN(c, name="group_norm")(x).reshape(b, hh * ww, c)
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           param_dtype=jnp.float32, name="norm_cross")(ctx)
        ctx = ctx.astype(self.cfg.dtype)

        q = _dense(c, self.cfg.dtype, "to_q")(tokens)
        k = _dense(c, self.cfg.dtype, "to_k")(tokens)
        v = _dense(c, self.cfg.dtype, "to_v")(tokens)
        add_k = _dense(c, self.cfg.dtype, "add_k_proj")(ctx)
        add_v = _dense(c, self.cfg.dtype, "add_v_proj")(ctx)
        k = jnp.concatenate([add_k, k], axis=1)
        v = jnp.concatenate([add_v, v], axis=1)

        def split(t):
            return t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)

        a = sdp_attention(split(q), split(k), split(v))
        a = a.transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        a = _dense(c, self.cfg.dtype, "to_out_0")(a)
        return x + a.reshape(b, hh, ww, c)


class IFUNet(nn.Module):
    """x: (B, H, W, C) pixels; t scalar/(B,); ctx: (B, seq, encoder_hid_dim)
    T5 states. Returns (B, H, W, out_channels) = [eps | sigma]."""

    cfg: IFUNetConfig

    @nn.compact
    def __call__(self, x, t, ctx):
        cfg = self.cfg
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(t)), (b,))
        ctx = jnp.broadcast_to(ctx, (b,) + tuple(ctx.shape[-2:]))

        temb = timestep_embedding(t, cfg.block_out_channels[0])
        temb = _dense(cfg.time_embed_dim, jnp.float32, "time_dense0")(temb)
        temb = _dense(cfg.time_embed_dim, jnp.float32,
                      "time_dense1")(jax.nn.silu(temb))
        if cfg.use_addition_text_embed:
            pooled = nn.LayerNorm(name="add_norm")(jnp.mean(ctx, axis=1))
            temb = temb + _dense(cfg.time_embed_dim, jnp.float32,
                                 "add_proj")(pooled)
        temb = temb.astype(cfg.dtype)

        ctx_proj = _dense(cfg.cross_attention_dim, cfg.dtype,
                          "encoder_hid_proj")(ctx.astype(cfg.dtype))

        ch0 = cfg.block_out_channels[0]
        h = _conv(ch0, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        skips = [h]
        n = len(cfg.block_out_channels)
        ch = ch0
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = IFResBlock(ch, out_ch, cfg, name=f"down_{i}_res_{j}")(h, temb)
                ch = out_ch
                if cfg.attn_levels[i]:
                    h = IFAttention(ch, cfg, name=f"down_{i}_attn_{j}")(h, ctx_proj)
                skips.append(h)
            if i != n - 1:
                h = IFResBlock(ch, ch, cfg, down=True,
                               name=f"down_{i}_downsample")(h, temb)
                skips.append(h)

        h = IFResBlock(ch, ch, cfg, name="mid_res_0")(h, temb)
        h = IFAttention(ch, cfg, name="mid_attn")(h, ctx_proj)
        h = IFResBlock(ch, ch, cfg, name="mid_res_1")(h, temb)

        for k in range(n):
            i = n - 1 - k
            out_ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = IFResBlock(ch + skip.shape[-1], out_ch, cfg,
                               name=f"up_{i}_res_{j}")(
                    jnp.concatenate([h, skip], axis=-1), temb)
                ch = out_ch
                if cfg.attn_levels[i]:
                    h = IFAttention(ch, cfg, name=f"up_{i}_attn_{j}")(h, ctx_proj)
            if i != 0:
                h = IFResBlock(ch, ch, cfg, up=True,
                               name=f"up_{i}_upsample")(h, temb)

        h = jax.nn.silu(_GN(ch, name="conv_norm_out")(h))
        return _conv(cfg.out_channels, dtype=jnp.float32,
                     name="conv_out")(h.astype(x.dtype))
