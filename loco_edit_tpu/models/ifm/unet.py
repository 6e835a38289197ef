"""DeepFloyd-IF-style pixel-space conditional U-Net (added-KV attention).

The IF stage-1/2 checkpoints (reference loads them via diffusers pipelines,
src/utils/utils.py:260-293) are diffusers `UNet2DConditionModel`s with:

  - "simple" added-KV attention (AttnAddedKVProcessor): q/k/v all come from the
    GroupNorm-ed image tokens; the text conditioning contributes EXTRA
    key/value tokens through add_k_proj/add_v_proj concatenated (text first)
    before one softmax. The text states are normalized by `norm_cross`
    (cross_attention_norm="group_norm" in the IF configs).
  - scale-shift time conditioning in the res blocks
    (resnet_time_scale_shift="scale_shift"), and up/downsampling done BY
    resnet blocks (Resnet{Down,Up}sampleBlock2D / SimpleCrossAttn*Block2D
    samplers: the h-path and the residual are avg-pooled / nearest-upsampled
    inside the block; no 1x1 shortcut when in_ch == out_ch, matching
    diffusers' use_in_shortcut rule).
  - exact-erf GELU activations (config act_fn="gelu") in resnets, the time
    embedding MLP, and the output head; the stage-2 class (aug-level)
    embedding MLP keeps diffusers' default SiLU.
  - T5-XXL hidden states (4096-d) projected by encoder_hid_proj to
    cross_attention_dim, and an "addition" text embedding
    (addition_embed_type="text"): attention-pooled raw T5 states
    (TextTimeEmbedding = LayerNorm -> AttentionPooling -> Linear -> LayerNorm)
    added to the time embedding.
  - stage 2 (the 64->256 upscaler) concatenates the noise-augmented upsampled
    stage-1 image on channels (in_channels = 6) and conditions on the
    augmentation level via class_embed_type="timestep" (a second sinusoidal
    embedding + MLP added to temb).
  - learned-sigma output (out_channels = 2 * image channels).

The sinusoidal timestep embedding is the ADM [cos|sin] convention, which is
bit-identical to diffusers' flip_sin_to_cos=True / freq_shift=0 used by IF.
Geometry (block_out_channels / layers_per_block / attention placement) is
config-driven; real checkpoints carry their own geometry, recovered by
`models.ifm.convert.infer_if_config`, so presets never gate loading.
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
    layers_per_block: int | tuple[int, ...] = 2
    encoder_hid_dim: int = 4096          # T5-XXL hidden size
    cross_attention_dim: int = 512
    attention_head_dim: int = 64
    # level 0 is a pure resnet block (no attention), matching IF's
    # (ResnetDownsampleBlock2D, SimpleCrossAttn...) layout
    attn_levels: tuple[bool, ...] = (False, True, True, True)
    act_fn: str = "silu"                 # IF presets: "gelu" (exact erf)
    cross_attention_norm: str = "layer_norm"  # IF presets: "group_norm"
    use_addition_text_embed: bool = False
    addition_embed_num_heads: int = 64   # addition_embed_type_num_heads
    class_embed_timestep: bool = False   # IF-II aug-level conditioning
    dtype: jnp.dtype = jnp.float32

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def lpb(self, level: int) -> int:
        if isinstance(self.layers_per_block, int):
            return self.layers_per_block
        return self.layers_per_block[level]


def _act(cfg: IFUNetConfig):
    if cfg.act_fn == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    return jax.nn.silu


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
    Resnet{Down,Up}sampleBlock2D sampling placement). The 1x1 shortcut exists
    only when in_ch != out_ch (diffusers use_in_shortcut); the up/down
    samplers (in == out) add the pooled/upsampled input directly."""

    in_ch: int
    out_ch: int
    cfg: IFUNetConfig
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x, temb):
        act = _act(self.cfg)
        h = act(_GN(self.in_ch, name="norm1")(x))
        if self.up:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv1")(h)
        e = _dense(2 * self.out_ch, self.cfg.dtype,
                   "time_emb_proj")(act(temb))
        scale, shift = jnp.split(e[:, None, None, :].astype(h.dtype), 2, axis=-1)
        h = _GN(self.out_ch, name="norm2")(h) * (1 + scale) + shift
        h = act(h)
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch:
            x = _conv(self.out_ch, kernel=1, dtype=self.cfg.dtype,
                      name="conv_shortcut")(x)
        return x + h


class IFAttention(nn.Module):
    """Added-KV attention: image tokens provide q/k/v, norm_cross-ed text
    states contribute extra k/v tokens via add_k_proj/add_v_proj, concatenated
    (text first) on the sequence axis before a single softmax
    (AttnAddedKVProcessor). norm_cross is GroupNorm(32) over the embedding
    axis in the IF configs (cross_attention_norm="group_norm"); LayerNorm is
    kept as an option."""

    ch: int
    cfg: IFUNetConfig

    @nn.compact
    def __call__(self, x, ctx):
        b, hh, ww, c = x.shape
        heads = max(c // self.cfg.attention_head_dim, 1)
        d = c // heads
        tokens = _GN(c, name="group_norm")(x).reshape(b, hh * ww, c)
        if self.cfg.cross_attention_norm == "group_norm":
            # diffusers norm_encoder_hidden_states: GN over the embedding
            # channels with stats pooled over (channels/32, seq) per group —
            # group_norm_f32 on (B, seq, dim) computes exactly that.
            ctx = _GN(ctx.shape[-1], name="norm_cross")(ctx)
        else:
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


class TextTimeEmbedding(nn.Module):
    """diffusers TextTimeEmbedding (addition_embed_type="text"):
    LayerNorm -> AttentionPooling -> Linear -> LayerNorm, applied to the RAW
    T5 states (encoder_hid_dim wide). AttentionPooling uses one query — the
    mean token plus a learned positional embedding — attending over
    [query token; tokens], multi-head with dim-per-head scaling split as
    1/sqrt(sqrt(d)) on both q and k (the unCLIP/DALLE-2 pooling)."""

    cfg: IFUNetConfig

    @nn.compact
    def __call__(self, ctx):
        b, s, e = ctx.shape
        heads = self.cfg.addition_embed_num_heads
        d = e // heads
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm1")(
            ctx.astype(jnp.float32))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(e ** -0.5), (1, e), jnp.float32)
        cls = jnp.mean(x, axis=1, keepdims=True) + pos
        cat = jnp.concatenate([cls, x], axis=1)          # (B, S+1, E)
        q = _dense(e, jnp.float32, "q_proj")(cls)        # (B, 1, E)
        k = _dense(e, jnp.float32, "k_proj")(cat)
        v = _dense(e, jnp.float32, "v_proj")(cat)

        def split(t):  # (B, n, E) -> (B, heads, n, d)
            return t.reshape(b, t.shape[1], heads, d).transpose(0, 2, 1, 3)

        sc = d ** -0.25
        logits = jnp.einsum("bhqd,bhkd->bhqk", split(q) * sc, split(k) * sc)
        w = jax.nn.softmax(logits, axis=-1)
        a = jnp.einsum("bhqk,bhkd->bhqd", w, split(v))   # (B, heads, 1, d)
        a = a.transpose(0, 2, 1, 3).reshape(b, e)
        a = _dense(self.cfg.time_embed_dim, jnp.float32, "proj")(a)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                            param_dtype=jnp.float32, name="norm2")(a)


class IFUNet(nn.Module):
    """x: (B, H, W, C) pixels; t scalar/(B,); ctx: (B, seq, encoder_hid_dim)
    T5 states; aug_t: stage-2 noise-augmentation level (scalar/(B,), used when
    cfg.class_embed_timestep). Returns (B, H, W, out_channels) = [eps | sigma]."""

    cfg: IFUNetConfig

    @nn.compact
    def __call__(self, x, t, ctx, aug_t=None):
        cfg = self.cfg
        act = _act(cfg)
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(t)), (b,))
        ctx = jnp.broadcast_to(ctx, (b,) + tuple(ctx.shape[-2:]))

        temb = timestep_embedding(t, cfg.block_out_channels[0])
        temb = _dense(cfg.time_embed_dim, jnp.float32, "time_dense0")(temb)
        temb = _dense(cfg.time_embed_dim, jnp.float32,
                      "time_dense1")(act(temb))
        if cfg.class_embed_timestep:
            # IF-II class_embed_type="timestep": the aug level goes through the
            # same sinusoidal proj + its own MLP (diffusers keeps SiLU here).
            aug = jnp.zeros((b,)) if aug_t is None else jnp.broadcast_to(
                jnp.atleast_1d(jnp.asarray(aug_t)), (b,))
            cemb = timestep_embedding(aug, cfg.block_out_channels[0])
            cemb = _dense(cfg.time_embed_dim, jnp.float32, "class_dense0")(cemb)
            cemb = _dense(cfg.time_embed_dim, jnp.float32,
                          "class_dense1")(jax.nn.silu(cemb))
            temb = temb + cemb
        if cfg.use_addition_text_embed:
            temb = temb + TextTimeEmbedding(cfg, name="add_embedding")(ctx)
        temb = temb.astype(cfg.dtype)

        ctx_proj = _dense(cfg.cross_attention_dim, cfg.dtype,
                          "encoder_hid_proj")(ctx.astype(cfg.dtype))

        ch0 = cfg.block_out_channels[0]
        h = _conv(ch0, dtype=cfg.dtype, name="conv_in")(x.astype(cfg.dtype))
        skips = [h]
        n = len(cfg.block_out_channels)
        ch = ch0
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.lpb(i)):
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
            for j in range(cfg.lpb(i) + 1):
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

        h = act(_GN(ch, name="conv_norm_out")(h))
        return _conv(cfg.out_channels, dtype=jnp.float32,
                     name="conv_out")(h.astype(x.dtype))
