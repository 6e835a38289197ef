"""Model registry: model_name -> bound Denoiser.

The TPU counterpart of the reference's loader layer
(src/utils/utils.py:52-293): P2/ImageNet/LSUN names resolve to ADM presets
(+ torch-checkpoint conversion); the *_HF names resolve to the SDEdit-style
DDPM U-Net family; SD/LCM/IF resolve to their engines' loaders. Checkpoints
are local files (this environment has no hub egress); with no checkpoint the
model is randomly initialized (smoke/perf runs).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.models.base import Denoiser

ADM_NAMES = ("FFHQ_P2", "AFHQ_P2", "Flower_P2", "Cub_P2", "Metface_P2",
             "ImageNet256Uncond", "ImageNet256Cond", "ImageNet128Cond",
             "ImageNet64Cond", "LSUN_bedroom", "LSUN_cat", "LSUN_horse")
DDPM_HF_NAMES = ("CelebA_HQ_HF", "LSUN_church_HF", "LSUN_bedroom_HF", "FFHQ_HF")


def load_adm_denoiser(model_name: str, checkpoint_path: str = "",
                      dtype=jnp.float32, remat: bool = False) -> Denoiser:
    from loco_edit_tpu.models.adm import ADMUNet, adm_preset

    cfg = adm_preset(model_name, dtype=dtype)
    if remat:
        import dataclasses

        cfg = dataclasses.replace(cfg, remat=True)
    model = ADMUNet(cfg)
    if checkpoint_path:
        params = _load_params(checkpoint_path, cfg)
    else:
        x = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
        params = jax.jit(model.init)(jax.random.key(0), x, 500.0)

    def eps_fn(x, t):
        return model.apply(params, x, t)

    return Denoiser(eps_fn=eps_fn,
                    sample_shape=(cfg.image_size, cfg.image_size, cfg.in_channels),
                    learn_sigma=cfg.learn_sigma, meta={"cfg": cfg, "params": params})


def _load_params(path: str, cfg):
    if path.endswith((".pt", ".pth", ".ckpt", ".safetensors")):
        from loco_edit_tpu.models.adm.convert import (
            convert_adm_state_dict,
            load_torch_checkpoint,
        )

        sd = load_torch_checkpoint(path)
        return jax.tree.map(jnp.asarray, convert_adm_state_dict(sd, cfg))
    if path.endswith(".npz"):
        import flax

        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        return flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
    raise ValueError(f"unsupported checkpoint format: {path}")


def save_params_npz(path: str, params) -> None:
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{"/".join(k): np.asarray(v) for k, v in flat.items()})


def load_tiny_denoiser(dtype=jnp.float32) -> Denoiser:
    """32px tiny ADM — CI/smoke runs of the full CLI without real weights."""
    from loco_edit_tpu.models.adm import ADMUNet
    from loco_edit_tpu.models.adm.presets import tiny_test_config

    cfg = tiny_test_config(dtype=dtype)
    model = ADMUNet(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0)
    params = jax.tree.map(lambda p: p + 0.02, params)
    return Denoiser(eps_fn=lambda z, t: model.apply(params, z, t),
                    sample_shape=(32, 32, 3), learn_sigma=True,
                    meta={"cfg": cfg, "params": params})


def load_denoiser(args) -> Denoiser:
    """CLI entry: resolve args.model_name to a bound Denoiser."""
    dtype = jnp.bfloat16 if args.dtype in ("bf16", "fp16") else jnp.float32
    if args.model_name == "TinyTest":
        return load_tiny_denoiser(dtype)
    if args.model_name in ADM_NAMES:
        return load_adm_denoiser(args.model_name, args.checkpoint_path, dtype)
    if args.model_name in DDPM_HF_NAMES:
        from loco_edit_tpu.models.ddpm import load_ddpm_denoiser

        return load_ddpm_denoiser(args.model_name, args.checkpoint_path, dtype)
    raise NotImplementedError(
        f"model family for {args.model_name!r} not wired into the registry yet")
