"""Classic DDPM (Ho et al. / SDEdit) U-Net, NHWC Flax.

Same function as the reference's `DDPM` (src/models/ddpm/diffusion.py:22-130,
blocks at :806-960) and as the HF `google/ddpm-ema-*` checkpoints the live
*_HF model names load (src/utils/utils.py:77-146). Architectural fingerprints
preserved exactly for checkpoint parity:

  - GroupNorm(32, eps=1e-6)  (diffusion.py:810-811)
  - [sin|cos] timestep embedding with exp(-log(1e4) * i/(half-1))
    (diffusion.py:783-804 — note the /(half-1) and the sin-first order,
    both different from ADM's embedding)
  - swish nonlinearity; temb projected and ADDED after conv1
  - single-head attention, separate q/k/v 1x1 convs, scale c^-0.5 on the
    logits (algebraically identical to the shared sdp_attention scaling)
  - downsample: stride-2 conv with asymmetric (0,1,0,1) padding
    (diffusion.py:836-852); upsample: nearest x2 + conv
  - attention applied after each res block at matching resolutions; skip
    stack includes conv_in and downsample outputs.
"""

from __future__ import annotations

import dataclasses
import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from loco_edit_tpu.ops import sdp_attention
from loco_edit_tpu.ops.norms import group_norm_f32


@dataclasses.dataclass(frozen=True)
class DDPMConfig:
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: tuple[int, ...] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def temb_ch(self) -> int:
        return self.ch * 4


def ddpm_timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                    * -(math.log(10000.0) / (half - 1)))
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class _Norm(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.ch,), jnp.float32)
        return group_norm_f32(x, scale, bias, eps=1e-6)


def _conv(out_ch, kernel=3, stride=1, dtype=jnp.float32, name=None,
          padding=None):
    return nn.Conv(out_ch, (kernel, kernel), strides=(stride, stride),
                   padding=kernel // 2 if padding is None else padding,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    in_ch: int
    out_ch: int
    cfg: DDPMConfig

    @nn.compact
    def __call__(self, x, temb, *, train: bool = False):
        h = jax.nn.silu(_Norm(self.in_ch, name="norm1")(x))
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv1")(h)
        e = nn.Dense(self.out_ch, dtype=self.cfg.dtype, param_dtype=jnp.float32,
                     name="temb_proj")(jax.nn.silu(temb))
        h = h + e[:, None, None, :].astype(h.dtype)
        h = jax.nn.silu(_Norm(self.out_ch, name="norm2")(h))
        if self.cfg.dropout > 0:
            h = nn.Dropout(self.cfg.dropout, deterministic=not train)(h)
        h = _conv(self.out_ch, dtype=self.cfg.dtype, name="conv2")(h)
        if self.in_ch != self.out_ch:
            x = _conv(self.out_ch, kernel=1, dtype=self.cfg.dtype,
                      name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    ch: int
    cfg: DDPMConfig

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _Norm(c, name="norm")(x).reshape(b, hh * ww, c)
        dense = lambda name: nn.Dense(  # noqa: E731
            c, dtype=self.cfg.dtype, param_dtype=jnp.float32, name=name)
        q, k, v = dense("q")(h), dense("k")(h), dense("v")(h)
        a = sdp_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        a = dense("proj_out")(a)
        return x + a.reshape(b, hh, ww, c)


class DDPMUNet(nn.Module):
    cfg: DDPMConfig

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        cfg = self.cfg
        b = x.shape[0]
        t = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(t)), (b,))
        temb = ddpm_timestep_embedding(t, cfg.ch)
        temb = nn.Dense(cfg.temb_ch, param_dtype=jnp.float32, name="temb_dense0")(temb)
        temb = nn.Dense(cfg.temb_ch, param_dtype=jnp.float32,
                        name="temb_dense1")(jax.nn.silu(temb))
        temb = temb.astype(cfg.dtype)

        h = x.astype(cfg.dtype)
        num_res = len(cfg.ch_mult)
        in_mult = (1,) + tuple(cfg.ch_mult)
        curr_res = cfg.resolution

        hs = [_conv(cfg.ch, dtype=cfg.dtype, name="conv_in")(h)]
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            block_in = cfg.ch * in_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_in, block_out, cfg,
                                name=f"down_{i_level}_block_{i_block}")(
                    hs[-1], temb, train=train)
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_in, cfg,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_res - 1:
                if cfg.resamp_with_conv:
                    # asymmetric (0,1,0,1) pad + VALID stride-2 conv
                    hp = jnp.pad(hs[-1], ((0, 0), (0, 1), (0, 1), (0, 0)))
                    h = _conv(block_in, stride=2, dtype=cfg.dtype,
                              padding="VALID",
                              name=f"down_{i_level}_downsample")(hp)
                else:
                    h = nn.avg_pool(hs[-1], (2, 2), strides=(2, 2))
                hs.append(h)
                curr_res //= 2

        h = hs[-1]
        h = ResnetBlock(block_in, block_in, cfg, name="mid_block_1")(h, temb, train=train)
        h = AttnBlock(block_in, cfg, name="mid_attn_1")(h)
        h = ResnetBlock(block_in, block_in, cfg, name="mid_block_2")(h, temb, train=train)

        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            skip_in = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                if i_block == cfg.num_res_blocks:
                    skip_in = cfg.ch * in_mult[i_level]
                h = ResnetBlock(block_in + skip_in, block_out, cfg,
                                name=f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train=train)
                block_in = block_out
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(block_in, cfg,
                                  name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                if cfg.resamp_with_conv:
                    h = _conv(block_in, dtype=cfg.dtype,
                              name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = jax.nn.silu(_Norm(block_in, name="norm_out")(h))
        h = _conv(cfg.out_ch, dtype=jnp.float32, name="conv_out")(h.astype(x.dtype))
        return h
