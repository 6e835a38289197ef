"""ADM U-Net configuration + structural layout.

The layout builder enumerates the exact block sequence of the ADM
architecture (reference src/models/guided_diffusion/unet.py:482-618) as plain
data. Both the Flax model and the torch-checkpoint converter consume it, so
parameter trees line up by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ADMConfig:
    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 6            # 3, or 6 with learn_sigma
    num_res_blocks: int = 1
    attention_ds: tuple[int, ...] = (16,)   # downsample ratios with attention
    dropout: float = 0.0
    channel_mult: tuple[float, ...] = (1, 1, 2, 2, 4, 4)
    num_classes: int | None = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    conv_resample: bool = True
    learn_sigma: bool = True
    dtype: jnp.dtype = jnp.float32   # compute dtype (params stay float32)
    remat: bool = False              # jax.checkpoint each block (memory/FLOPs trade)

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * 4

    def heads_for(self, ch: int, upsample: bool = False) -> int:
        if self.num_head_channels == -1:
            h = self.num_heads_upsample if (upsample and self.num_heads_upsample != -1) \
                else self.num_heads
            return h
        assert ch % self.num_head_channels == 0
        return ch // self.num_head_channels


# -- block descriptors ---------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvSpec:
    in_ch: int
    out_ch: int


@dataclasses.dataclass(frozen=True)
class ResSpec:
    in_ch: int
    out_ch: int
    up: bool = False
    down: bool = False


@dataclasses.dataclass(frozen=True)
class AttnSpec:
    ch: int
    num_heads: int


@dataclasses.dataclass(frozen=True)
class SampleSpec:      # standalone Upsample / Downsample (resblock_updown=False)
    in_ch: int
    out_ch: int
    use_conv: bool
    up: bool


BlockSpec = Union[ConvSpec, ResSpec, AttnSpec, SampleSpec]


@dataclasses.dataclass(frozen=True)
class ADMLayout:
    input_blocks: tuple[tuple[BlockSpec, ...], ...]
    middle_block: tuple[BlockSpec, ...]
    output_blocks: tuple[tuple[BlockSpec, ...], ...]
    out_ch_final: int


def adm_layout(cfg: ADMConfig) -> ADMLayout:
    """Enumerate the ADM block sequence for a config."""
    mc = cfg.model_channels
    ch = int(cfg.channel_mult[0] * mc)
    input_blocks: list[tuple[BlockSpec, ...]] = [(ConvSpec(cfg.in_channels, ch),)]
    skip_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers: list[BlockSpec] = [ResSpec(ch, int(mult * mc))]
            ch = int(mult * mc)
            if ds in cfg.attention_ds:
                layers.append(AttnSpec(ch, cfg.heads_for(ch)))
            input_blocks.append(tuple(layers))
            skip_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                input_blocks.append((ResSpec(ch, ch, down=True),))
            else:
                input_blocks.append((SampleSpec(ch, ch, cfg.conv_resample, up=False),))
            skip_chans.append(ch)
            ds *= 2

    middle = (
        ResSpec(ch, ch),
        AttnSpec(ch, cfg.heads_for(ch)),
        ResSpec(ch, ch),
    )

    output_blocks: list[tuple[BlockSpec, ...]] = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = skip_chans.pop()
            layers = [ResSpec(ch + ich, int(mult * mc))]
            ch = int(mult * mc)
            if ds in cfg.attention_ds:
                layers.append(AttnSpec(ch, cfg.heads_for(ch, upsample=True)))
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    layers.append(ResSpec(ch, ch, up=True))
                else:
                    layers.append(SampleSpec(ch, ch, cfg.conv_resample, up=True))
                ds //= 2
            output_blocks.append(tuple(layers))

    return ADMLayout(
        input_blocks=tuple(input_blocks),
        middle_block=middle,
        output_blocks=tuple(output_blocks),
        out_ch_final=ch,
    )
