"""Stable-Diffusion-family configs.

Covers the three latent/cascade T2I checkpoints the reference drives
(src/utils/utils.py:215-293): SD 2.1-base (EditStableDiffusion), LCM
Dreamshaper v7 (SD 1.5 arch + guidance-scale conditioning), and the
DeepFloyd-IF stages (pixel-space UNet2DCondition variants).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SDUNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: tuple[int, ...] = (5, 10, 20, 20)  # heads per level
    transformer_layers: int = 1
    use_linear_projection: bool = True   # SD 2.x; SD 1.x uses 1x1 convs
    # which levels have cross-attn transformers (SD: all but the last down /
    # first up level)
    cross_attn_levels: tuple[bool, ...] = (True, True, True, False)
    time_cond_proj_dim: int | None = None  # LCM guidance-embedding input dim
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    # remat policy: None recomputes everything inside each block (max memory
    # saving); "dots_no_batch" keeps weight-matmul outputs (qkv/out/mlp
    # projections — small) and recomputes only batched dots (the 4096-token
    # attention logits that pin ~5G as linearize residuals, BENCH.md round 3)
    remat_policy: str | None = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    sample_size: int = 512
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.float32
    # per-block jax.checkpoint in the DECODER (the module the z-space pullback
    # differentiates through, reference get_x0 edit.py:757-781): at 512px the
    # tangent/cotangent passes otherwise pin ~128M-apiece f32 resnet temps as
    # linearize residuals (the chunk=4 OOM dump, BENCH.md round 3). Recompute-
    # only — equivalence pinned in tests/test_sd_models.py.
    remat: bool = False


_PRESETS = {
    # stabilityai/stable-diffusion-2-1-base
    "sd21-base": SDUNetConfig(),
    # runwayml/stable-diffusion-v1-5 (also the LCM Dreamshaper v7 backbone)
    "sd15": SDUNetConfig(
        cross_attention_dim=768,
        attention_head_dim=(8, 8, 8, 8),
        use_linear_projection=False,
    ),
    # SimianLuo/LCM_Dreamshaper_v7: SD 1.5 + guidance-scale embedding
    "lcm-dreamshaper-v7": SDUNetConfig(
        cross_attention_dim=768,
        attention_head_dim=(8, 8, 8, 8),
        use_linear_projection=False,
        time_cond_proj_dim=256,
    ),
    # tiny CPU-test config (all block types exercised)
    "tiny": SDUNetConfig(
        sample_size=8,
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_attention_dim=32,
        attention_head_dim=(2, 4),
        cross_attn_levels=(True, False),
    ),
}


def sd_preset(name: str, dtype=jnp.float32) -> SDUNetConfig:
    if name not in _PRESETS:
        raise ValueError(f"unknown SD preset {name!r}; have {sorted(_PRESETS)}")
    return dataclasses.replace(_PRESETS[name], dtype=dtype)
