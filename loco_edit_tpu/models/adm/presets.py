"""ADM model presets — the reference's per-dataset hyperparameter dictionaries
(src/models/guided_diffusion/script_util.py:10-234) expressed as ADMConfigs.

`adm_preset(name)` is the TPU-side counterpart of the reference's `g_DDPM`
factory (script_util.py:236-259): every model the reference can load by name
resolves here. channel_mult defaults per image size follow
script_util.py:380-395; attention_resolutions strings are divided into
downsample ratios (script_util.py:397-399).
"""

from __future__ import annotations

import jax.numpy as jnp

from loco_edit_tpu.models.adm.config import ADMConfig

_DEFAULT_CHANNEL_MULT = {
    512: (0.5, 1, 1, 2, 2, 4, 4),
    256: (1, 1, 2, 2, 4, 4),
    128: (1, 1, 2, 3, 4),
    64: (1, 2, 3, 4),
    32: (1, 2, 2, 2),
}


def _cfg(image_size, num_channels, num_res_blocks, attention_resolutions="16",
         channel_mult=None, learn_sigma=True, class_cond=False, num_heads=1,
         num_head_channels=-1, num_heads_upsample=-1, use_scale_shift_norm=True,
         resblock_updown=True, dropout=0.0, dtype=jnp.float32) -> ADMConfig:
    if channel_mult is None:
        channel_mult = _DEFAULT_CHANNEL_MULT[image_size]
    attention_ds = tuple(
        image_size // int(r) for r in str(attention_resolutions).split(",") if r
    )
    return ADMConfig(
        image_size=image_size,
        in_channels=3,
        model_channels=num_channels,
        out_channels=6 if learn_sigma else 3,
        num_res_blocks=num_res_blocks,
        attention_ds=attention_ds,
        dropout=dropout,
        channel_mult=tuple(channel_mult),
        num_classes=1000 if class_cond else None,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown,
        learn_sigma=learn_sigma,
        dtype=dtype,
    )


# P2-weighting checkpoints: FFHQ/AFHQ/Flower/Cub/Metface, all 256px
# (reference P2_DICT, script_util.py:166-190)
_P2 = dict(image_size=256, num_channels=128, num_res_blocks=1,
           attention_resolutions="16", num_head_channels=64)

_PRESET_KWARGS: dict[str, dict] = {
    "FFHQ_P2": _P2,
    "AFHQ_P2": _P2,
    "Flower_P2": _P2,
    "Cub_P2": _P2,
    "Metface_P2": _P2,
    # ImageNet family (script_util.py:10-120)
    "ImageNet256Uncond": dict(image_size=256, num_channels=256, num_res_blocks=2,
                              attention_resolutions="32,16,8", num_head_channels=64),
    "ImageNet256Cond": dict(image_size=256, num_channels=256, num_res_blocks=2,
                            attention_resolutions="32,16,8", num_head_channels=64,
                            class_cond=True),
    "ImageNet128Cond": dict(image_size=128, num_channels=256, num_res_blocks=2,
                            attention_resolutions="32,16,8", num_heads=4,
                            class_cond=True),
    "ImageNet64Cond": dict(image_size=64, num_channels=192, num_res_blocks=3,
                           attention_resolutions="32,16,8", class_cond=True),
    # LSUN (script_util.py:145-164)
    "LSUN_bedroom": dict(image_size=256, num_channels=256, num_res_blocks=2,
                         attention_resolutions="32,16,8", num_head_channels=64),
    "LSUN_cat": dict(image_size=256, num_channels=256, num_res_blocks=2,
                     attention_resolutions="32,16,8", num_head_channels=64),
    "LSUN_horse": dict(image_size=256, num_channels=256, num_res_blocks=2,
                       attention_resolutions="32,16,8", num_head_channels=64),
    # improved-diffusion vintage (reference script_util IMAGENET_64_UNCOND /
    # CIFAR10 dicts; cosine-schedule checkpoints; the live edit path never
    # loads them but g_DDPM can, script_util.py:238-244)
    "ImageNet64Uncond": dict(image_size=64, num_channels=128, num_res_blocks=3,
                             attention_resolutions="16,8", num_heads=4,
                             use_scale_shift_norm=True, resblock_updown=False),
    "CIFAR10Uncond": dict(image_size=32, num_channels=128, num_res_blocks=3,
                          attention_resolutions="16,8", num_heads=4,
                          use_scale_shift_norm=True, resblock_updown=False,
                          dropout=0.3),
}

PRESETS = tuple(sorted(_PRESET_KWARGS))


def adm_preset(name: str, dtype=jnp.float32) -> ADMConfig:
    try:
        kwargs = _PRESET_KWARGS[name]
    except KeyError:
        raise ValueError(f"unknown ADM preset {name!r}; available: {PRESETS}") from None
    return _cfg(dtype=dtype, **kwargs)


def tiny_test_config(image_size: int = 32, dtype=jnp.float32, **overrides) -> ADMConfig:
    """A miniature ADM config for CPU tests (full block zoo, tiny widths)."""
    kwargs = dict(
        image_size=image_size,
        in_channels=3,
        model_channels=32,  # GroupNorm uses 32 groups; channels must be >= 32
        out_channels=6,
        num_res_blocks=1,
        attention_ds=(2,),
        channel_mult=(1, 2),
        num_head_channels=16,
        use_scale_shift_norm=True,
        resblock_updown=True,
        learn_sigma=True,
        dtype=dtype,
    )
    kwargs.update(overrides)
    return ADMConfig(**kwargs)
