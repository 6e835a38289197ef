"""ADM (guided-diffusion) U-Net, redesigned for TPU.

Same function as the reference UNetModel (src/models/guided_diffusion/unet.py:398-684):
sinusoidal time embedding -> MLP; residual blocks with scale-shift GroupNorm
conditioning; self-attention at configured downsample ratios; skip-concat
decoder; learned-sigma channel split. TPU-first differences:

  - NHWC layout (channels on the 128-lane axis; convs map onto the MXU).
  - GroupNorm in float32 regardless of compute dtype (parity with GroupNorm32,
    reference nn.py:17-19), everything else in cfg.dtype (bf16 on TPU).
  - attention numerics follow the ADM double-sqrt scaling with f32 softmax
    (reference unet.py:339-356) via ops.sdp_attention (Pallas on TPU for long
    token counts).
  - nearest-neighbor up/down sampling as repeat/avg_pool (fusable, static).
  - optional jax.checkpoint per block for JVP/VJP memory in the edit algebra.

The parameter tree is generated from `adm_layout`, so torch checkpoints map
structurally (see convert.py).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from loco_edit_tpu.models.adm.config import (
    ADMConfig,
    ADMLayout,
    AttnSpec,
    ConvSpec,
    ResSpec,
    SampleSpec,
    adm_layout,
)
from loco_edit_tpu.ops import group_norm_f32, sdp_attention


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding of (possibly fractional) timesteps; [cos|sin]
    ordering per the reference (nn.py:103-121). Always float32."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in f32, params f32, output in input dtype."""

    ch: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        return group_norm_f32(x, scale, bias)


def _conv(out_ch: int, kernel: int = 3, stride: int = 1, zero_init: bool = False,
          dtype=jnp.float32, name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(
        out_ch, (kernel, kernel), strides=(stride, stride), padding=kernel // 2,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


def _upsample_nearest(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """Residual block with (optional) scale-shift time conditioning and
    in-block up/downsampling (reference unet.py:145-258)."""

    spec: ResSpec
    cfg: ADMConfig

    @nn.compact
    def __call__(self, x, emb, *, train: bool = False):
        cfg, spec = self.cfg, self.spec
        h = GroupNorm32(spec.in_ch, name="in_norm")(x)
        h = jax.nn.silu(h)
        if spec.up:
            h = _upsample_nearest(h)
            x = _upsample_nearest(x)
        elif spec.down:
            h = _avg_pool2(h)
            x = _avg_pool2(x)
        h = _conv(spec.out_ch, dtype=cfg.dtype, name="in_conv")(h)

        e = jax.nn.silu(emb)
        e_dim = 2 * spec.out_ch if cfg.use_scale_shift_norm else spec.out_ch
        e = nn.Dense(e_dim, dtype=cfg.dtype, param_dtype=jnp.float32,
                     name="emb_dense")(e)
        e = e[:, None, None, :].astype(h.dtype)

        if cfg.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm32(spec.out_ch, name="out_norm")(h) * (1 + scale) + shift
        else:
            h = GroupNorm32(spec.out_ch, name="out_norm")(h + e)
        h = jax.nn.silu(h)
        if cfg.dropout > 0:
            h = nn.Dropout(cfg.dropout, deterministic=not train)(h)
        h = _conv(spec.out_ch, zero_init=True, dtype=cfg.dtype, name="out_conv")(h)

        if spec.out_ch != spec.in_ch:
            x = _conv(spec.out_ch, kernel=1, dtype=cfg.dtype, name="skip_conv")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over H*W tokens (reference unet.py:261-307).
    QKV packed q|k|v contiguously; the converter reorders legacy torch
    head-interleaved packing."""

    spec: AttnSpec
    cfg: ADMConfig

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        heads = self.spec.num_heads
        tokens = GroupNorm32(c, name="norm")(x).reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, dtype=self.cfg.dtype, param_dtype=jnp.float32,
                       name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(b, hh * ww, heads, c // heads).transpose(0, 2, 1, 3)

        a = sdp_attention(heads_split(q), heads_split(k), heads_split(v))
        a = a.transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        a = nn.Dense(c, kernel_init=nn.initializers.zeros, dtype=self.cfg.dtype,
                     param_dtype=jnp.float32, name="proj_out")(a)
        return x + a.reshape(b, hh, ww, c)


class _BlockSeq(nn.Module):
    """One entry of input/middle/output blocks: a short sequence of layers
    sharing the time embedding (the reference's TimestepEmbedSequential)."""

    specs: tuple
    cfg: ADMConfig

    @nn.compact
    def __call__(self, h, emb, *, train: bool = False):
        for i, spec in enumerate(self.specs):
            if isinstance(spec, ConvSpec):
                h = _conv(spec.out_ch, dtype=self.cfg.dtype, name=f"conv_{i}")(h)
            elif isinstance(spec, ResSpec):
                h = ResBlock(spec, self.cfg, name=f"res_{i}")(h, emb, train=train)
            elif isinstance(spec, AttnSpec):
                h = AttentionBlock(spec, self.cfg, name=f"attn_{i}")(h)
            elif isinstance(spec, SampleSpec):
                if spec.up:
                    h = _upsample_nearest(h)
                    if spec.use_conv:
                        h = _conv(spec.out_ch, dtype=self.cfg.dtype, name=f"sample_{i}")(h)
                else:
                    if spec.use_conv:
                        h = _conv(spec.out_ch, stride=2, dtype=self.cfg.dtype,
                                  name=f"sample_{i}")(h)
                    else:
                        h = _avg_pool2(h)
            else:
                raise TypeError(spec)
        return h


class ADMUNet(nn.Module):
    """x: (B, H, W, C) NHWC; t: scalar or (B,) fractional timesteps.

    Returns eps (B, H, W, C_in); with cfg.learn_sigma and return_sigma=True,
    returns (eps, logvar) from the channel split (reference unet.py:680-684).
    """

    cfg: ADMConfig

    def setup(self):
        self.layout: ADMLayout = adm_layout(self.cfg)
        self.in_blocks = [
            _BlockSeq(specs, self.cfg, name=f"input_{i}")
            for i, specs in enumerate(self.layout.input_blocks)
        ]
        self.middle = _BlockSeq(self.layout.middle_block, self.cfg, name="middle")
        self.out_blocks = [
            _BlockSeq(specs, self.cfg, name=f"output_{i}")
            for i, specs in enumerate(self.layout.output_blocks)
        ]
        self.time_dense0 = nn.Dense(self.cfg.time_embed_dim, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name="time_dense0")
        self.time_dense1 = nn.Dense(self.cfg.time_embed_dim, dtype=jnp.float32,
                                    param_dtype=jnp.float32, name="time_dense1")
        if self.cfg.num_classes is not None:
            self.label_emb = nn.Embed(self.cfg.num_classes, self.cfg.time_embed_dim,
                                      param_dtype=jnp.float32, name="label_emb")
        self.out_norm = GroupNorm32(self.layout.out_ch_final, name="out_norm")
        # the output head follows the compute dtype: in bf16 mode an f32 head
        # forces f32 im2col/relayout buffers around the final 256px conv in
        # BOTH the forward and the linearized tangent/cotangent passes
        # (profiled at ~5-7% of a basis extraction); output is cast to the
        # input dtype after the conv. f32 presets are bit-unchanged.
        self.out_conv = _conv(self.cfg.out_channels, zero_init=True,
                              dtype=self.cfg.dtype, name="out_conv")

    def __call__(self, x, t, y=None, *, train: bool = False,
                 return_sigma: bool = False, return_h: bool = False,
                 h_inject: jnp.ndarray | None = None):
        """return_h: also return the mid-block bottleneck feature (the
        reference's h-space tap, get_h at guided_diffusion/unet.py:686-702);
        h_inject: add an offset to the bottleneck before decoding (the
        PullBackDDPM h-injection forward, ddpm/diffusion.py:145-200)."""
        cfg = self.cfg
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(t)), (b,))

        emb = self.time_dense1(jax.nn.silu(
            self.time_dense0(timestep_embedding(t, cfg.model_channels))))
        if cfg.num_classes is not None:
            if y is None:
                # reference forward hardcodes class 0 for editing runs
                # (unet.py:645-647)
                y = jnp.zeros((b,), jnp.int32)
            emb = emb + self.label_emb(y)
        emb = emb.astype(cfg.dtype)

        h = x.astype(cfg.dtype)
        block = (lambda m, *a, **kw: jax.checkpoint(
            lambda hh, ee: m(hh, ee, **kw))(*a)) if cfg.remat else \
            (lambda m, *a, **kw: m(*a, **kw))

        skips = []
        for m in self.in_blocks:
            h = block(m, h, emb, train=train)
            skips.append(h)
        h = block(self.middle, h, emb, train=train)
        h_mid = h
        if h_inject is not None:
            h = h + h_inject.reshape(h.shape[1:])[None].astype(h.dtype)
        for m in self.out_blocks:
            h = jnp.concatenate([h, skips.pop()], axis=-1)
            h = block(m, h, emb, train=train)

        h = self.out_conv(jax.nn.silu(self.out_norm(h))).astype(x.dtype)

        if cfg.learn_sigma:
            eps, logvar = jnp.split(h, 2, axis=-1)
            out = (eps, logvar) if return_sigma else eps
        else:
            out = (h, None) if return_sigma else h
        if return_h:
            return (out if isinstance(out, tuple) else (out,)) + (h_mid,)
        return out
