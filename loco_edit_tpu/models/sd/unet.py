"""SD-family conditional U-Net (UNet2DConditionModel-equivalent), NHWC Flax.

Drives the reference's three latent/cascade T2I engines
(src/modules/edit.py:483-2028) in place of the diffusers torch UNet. Structure
follows the SD checkpoint format exactly for conversion parity:

  conv_in -> [CrossAttnDownBlock2D x3, DownBlock2D] -> mid(res, xattn, res)
          -> [UpBlock2D, CrossAttnUpBlock2D x3] -> GN/silu/conv_out

  - ResnetBlock2D: GN(32, eps 1e-5) + silu + conv; silu(temb)->Dense added;
    1x1 conv shortcut on channel change.
  - Transformer2DModel: GN(32, eps 1e-6), linear (SD 2.x) or 1x1-conv (SD 1.x)
    proj in/out, BasicTransformerBlock = self-attn, cross-attn (context =
    CLIP hidden states), GEGLU feed-forward, pre-LayerNorm residuals.
  - timestep embedding: [cos|sin], exponent /half (diffusers flip_sin_to_cos,
    freq_shift 0) — same formula as the ADM embedding here.
  - LCM variant: guidance-scale embedding added into the time embedding MLP
    input via a bias-free cond projection (reference w-embedding,
    src/modules/edit.py:118-121).

TPU-first: NHWC, f32 GroupNorm, f32-softmax attention via ops.sdp_attention
(Pallas flash path for the 4096-token level), optional per-block remat.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from loco_edit_tpu.models.adm.unet import timestep_embedding
from loco_edit_tpu.models.sd.config import SDUNetConfig
from loco_edit_tpu.ops import sdp_attention
from loco_edit_tpu.ops.norms import group_norm_f32


class GroupNormF32(nn.Module):
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


class ResnetBlock2D(nn.Module):
    in_ch: int
    out_ch: int
    cfg: SDUNetConfig
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb):
        h = jax.nn.silu(GroupNormF32(self.in_ch, self.eps, name="norm1")(x))
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv1")(h)
        e = _dense(self.out_ch, self.cfg.dtype, "time_emb_proj")(jax.nn.silu(temb))
        h = h + e[:, None, None, :].astype(h.dtype)
        h = jax.nn.silu(GroupNormF32(self.out_ch, self.eps, name="norm2")(h))
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch:
            x = _conv(self.out_ch, kernel=1, dtype=self.cfg.dtype,
                      name="conv_shortcut")(x)
        return x + h


class CrossAttention(nn.Module):
    query_dim: int
    context_dim: int
    heads: int
    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.query_dim
        d = inner // self.heads
        q = _dense(inner, self.cfg.dtype, "to_q", use_bias=False)(x)
        k = _dense(inner, self.cfg.dtype, "to_k", use_bias=False)(context)
        v = _dense(inner, self.cfg.dtype, "to_v", use_bias=False)(context)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, d).transpose(0, 2, 1, 3)

        a = sdp_attention(split(q), split(k), split(v))
        b, _, n, _ = a.shape
        a = a.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return _dense(self.query_dim, self.cfg.dtype, "to_out_0")(a)


class GEGLU(nn.Module):
    dim_out: int
    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x):
        h = _dense(2 * self.dim_out, self.cfg.dtype, "proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # torch F.gelu (diffusers GEGLU) is the exact erf form; jax.nn.gelu
        # defaults to the tanh approximation, which diverges ~1e-3 on
        # converted real weights
        return h * jax.nn.gelu(gate, approximate=False)


class BasicTransformerBlock(nn.Module):
    ch: int
    heads: int
    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, context):
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        x = x + CrossAttention(self.ch, self.ch, self.heads, self.cfg,
                               name="attn1")(ln("norm1")(x))
        x = x + CrossAttention(self.ch, self.cfg.cross_attention_dim,
                               self.heads, self.cfg,
                               name="attn2")(ln("norm2")(x), context)
        h = ln("norm3")(x)
        h = GEGLU(4 * self.ch, self.cfg, name="ff_net_0")(h)
        x = x + _dense(self.ch, self.cfg.dtype, "ff_net_2")(h)
        return x


class Transformer2D(nn.Module):
    ch: int
    heads: int
    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, context):
        b, hh, ww, c = x.shape
        res = x
        h = GroupNormF32(c, 1e-6, name="norm")(x)
        if self.cfg.use_linear_projection:
            h = h.reshape(b, hh * ww, c)
            h = _dense(self.ch, self.cfg.dtype, "proj_in")(h)
        else:
            h = _conv(self.ch, kernel=1, dtype=self.cfg.dtype, name="proj_in")(h)
            h = h.reshape(b, hh * ww, self.ch)
        for i in range(self.cfg.transformer_layers):
            h = BasicTransformerBlock(self.ch, self.heads, self.cfg,
                                      name=f"block_{i}")(h, context)
        if self.cfg.use_linear_projection:
            h = _dense(c, self.cfg.dtype, "proj_out")(h)
            h = h.reshape(b, hh, ww, c)
        else:
            h = h.reshape(b, hh, ww, self.ch)
            h = _conv(c, kernel=1, dtype=self.cfg.dtype, name="proj_out")(h)
        return res + h


class SDUNet(nn.Module):
    """x: (B, H, W, C_lat) NHWC latents; t scalar or (B,); context:
    (B, seq, cross_attention_dim) text-encoder hidden states; w: optional (B,)
    LCM guidance scales."""

    cfg: SDUNetConfig

    @nn.compact
    def __call__(self, x, t, context, w=None):
        cfg = self.cfg
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(t)), (b,))
        context = jnp.broadcast_to(
            context, (b,) + tuple(context.shape[-2:])).astype(cfg.dtype)

        ch0 = cfg.block_out_channels[0]
        temb = timestep_embedding(t, ch0)
        if cfg.time_cond_proj_dim is not None:
            if w is None:
                raise ValueError("this UNet is guidance-embedding conditioned; pass w")
            # LCM guidance embedding: [sin|cos], /(half-1) exponent, w*1000
            # (diffusers get_guidance_scale_embedding; reference edit.py:118-121)
            from loco_edit_tpu.models.ddpm.unet import ddpm_timestep_embedding

            w_emb = ddpm_timestep_embedding(
                jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(w)), (b,)) * 1000.0,
                cfg.time_cond_proj_dim)
            temb = temb + _dense(ch0, jnp.float32, "cond_proj",
                                 use_bias=False)(w_emb)
        temb = _dense(cfg.time_embed_dim, jnp.float32, "time_dense0")(temb)
        temb = _dense(cfg.time_embed_dim, jnp.float32,
                      "time_dense1")(jax.nn.silu(temb))
        temb = temb.astype(cfg.dtype)

        if cfg.remat:
            # flax's LIFTED remat (raw jax.checkpoint around a bound method
            # leaks tracers out of init's scope). Per-block checkpointing is
            # what lets the z-space pullback fit a 16G chip at production
            # width: without it the 4096-token attention levels pin ~5G of
            # f32 logits as linearize residuals (BENCH.md round 3).
            policy = None
            if cfg.remat_policy == "dots_no_batch":
                # keep weight-matmul outputs (projections — a few MB/block),
                # recompute only batched dots (attention logits/attn@v): less
                # recompute in the pullback's tangent/cotangent passes at a
                # small fraction of the memory the full residuals would pin
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif cfg.remat_policy is not None:
                raise ValueError(f"unknown remat_policy {cfg.remat_policy!r}")
            _remat_call = nn.remat(lambda m, *a: m(*a), policy=policy)
            block = lambda m, *a: _remat_call(m, *a)  # noqa: E731
        else:
            block = lambda m, *a: m(*a)  # noqa: E731

        h = _conv(ch0, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        skips = [h]
        n_levels = len(cfg.block_out_channels)
        ch = ch0
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = block(ResnetBlock2D(ch, out_ch, cfg,
                                        name=f"down_{i}_res_{j}"), h, temb)
                ch = out_ch
                if cfg.cross_attn_levels[i]:
                    h = block(Transformer2D(ch, cfg.attention_head_dim[i], cfg,
                                            name=f"down_{i}_attn_{j}"),
                              h, context)
                skips.append(h)
            if i != n_levels - 1:
                h = _conv(ch, stride=2, dtype=cfg.dtype,
                          name=f"down_{i}_downsample")(h)
                skips.append(h)

        h = block(ResnetBlock2D(ch, ch, cfg, name="mid_res_0"), h, temb)
        h = block(Transformer2D(ch, cfg.attention_head_dim[-1], cfg,
                                name="mid_attn"), h, context)
        h = block(ResnetBlock2D(ch, ch, cfg, name="mid_res_1"), h, temb)

        for k in range(n_levels):
            i = n_levels - 1 - k
            out_ch = cfg.block_out_channels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = block(ResnetBlock2D(ch + skip.shape[-1], out_ch, cfg,
                                        name=f"up_{i}_res_{j}"),
                          jnp.concatenate([h, skip], axis=-1), temb)
                ch = out_ch
                if cfg.cross_attn_levels[i]:
                    h = block(Transformer2D(ch, cfg.attention_head_dim[i], cfg,
                                            name=f"up_{i}_attn_{j}"),
                              h, context)
            if i != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = _conv(ch, dtype=cfg.dtype, name=f"up_{i}_upsample")(h)

        h = jax.nn.silu(GroupNormF32(ch, 1e-5, name="conv_norm_out")(h))
        return _conv(cfg.out_channels, dtype=jnp.float32,
                     name="conv_out")(h.astype(x.dtype))
