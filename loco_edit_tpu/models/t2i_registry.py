"""T2I model bundles for the CLI: SD 2.1 / LCM / DeepFloyd-IF stage 1.

Local checkpoint paths (no hub egress): --checkpoint_path for the UNet
(.pt/.bin diffusers state_dict or .npz flax), --vae_path, --text_encoder_path
(a transformers directory). Missing paths fall back to random init and the
deterministic fake prompt encoder — enough to exercise the full engines.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from loco_edit_tpu.models.sd import SDUNet, VAEConfig, VAEDecoder, VAEEncoder, sd_preset
from loco_edit_tpu.models.sd.text import (
    clip_prompt_encoder,
    fake_prompt_encoder,
    t5_prompt_encoder,
)
from loco_edit_tpu.models.sd.vae import encode_sample


def _load_unet_params(model, path, example_args):
    if path and path.endswith((".pt", ".pth", ".bin", ".ckpt", ".safetensors")):
        from loco_edit_tpu.models.adm.convert import load_torch_checkpoint
        from loco_edit_tpu.models.sd.convert import convert_sd_unet_state_dict

        sd = load_torch_checkpoint(path)
        return jax.tree.map(jnp.asarray,
                            convert_sd_unet_state_dict(sd, model.cfg))
    return jax.jit(model.init)(jax.random.key(0), *example_args)


def _load_vae(vae_cfg: VAEConfig, path):
    enc = VAEEncoder(vae_cfg)
    dec = VAEDecoder(vae_cfg)
    s = vae_cfg.sample_size
    lat = s // (2 ** (len(vae_cfg.block_out_channels) - 1))
    if path and path.endswith((".pt", ".pth", ".bin", ".ckpt", ".safetensors")):
        from loco_edit_tpu.models.adm.convert import load_torch_checkpoint
        from loco_edit_tpu.models.sd.convert import convert_vae_state_dict

        sd = load_torch_checkpoint(path)
        pe, pd = convert_vae_state_dict(sd, vae_cfg)
        pe = jax.tree.map(jnp.asarray, pe)
        pd = jax.tree.map(jnp.asarray, pd)
    else:
        pe = jax.jit(enc.init)(jax.random.key(1), jnp.zeros((1, s, s, 3)))
        pd = jax.jit(dec.init)(jax.random.key(2),
                               jnp.zeros((1, lat, lat, vae_cfg.latent_channels)))
    return enc, pe, dec, pd


def _prompt_encoder(args, kind: str, dim: int):
    path = getattr(args, "text_encoder_path", "")
    if path:
        return (t5_prompt_encoder if kind == "t5" else clip_prompt_encoder)(path)
    return fake_prompt_encoder(dim)


def load_sd_bundle(args, lcm: bool = False):
    import os

    dtype = jnp.bfloat16 if args.dtype in ("bf16", "fp16") else jnp.float32
    # LOCO_SD_PRESET=tiny lets CPU smoke runs exercise the full CLI path
    # without eagerly initializing a production-width UNet
    preset = os.environ.get("LOCO_SD_PRESET") or (
        "lcm-dreamshaper-v7" if lcm else "sd21-base")
    cfg = sd_preset(preset, dtype=dtype)
    # remat: per-block jax.checkpoint. Semantically a no-op (pinned by
    # tests/test_sd_models.py::test_remat_matches_no_remat_through_pullback)
    # and free on the sampling path, but REQUIRED for the z-space pullback at
    # production width on 16G chips: without it the 4096-token attention
    # levels pin ~5G of f32 logits as linearize residuals across the whole
    # subspace iteration (measured 21.5G/15.75G OOM, scripts/bench_t2i_basis.py)
    # dots_no_batch keeps weight-matmul outputs (a few MB/block) and
    # recomputes only batched dots: measured 8.73 s vs 8.91 s (1.02x) on the
    # rank-5 0.7T basis with no memory regression
    # (scripts/bench_sd_remat_policy.py, BENCH.md round 5)
    cfg = dataclasses.replace(cfg, remat=True, remat_policy="dots_no_batch")
    model = SDUNet(cfg)
    ctx0 = jnp.zeros((1, 77, cfg.cross_attention_dim))
    z0 = jnp.zeros((1, cfg.sample_size, cfg.sample_size, 4))
    ex = (z0, 500.0, ctx0, 7.5) if lcm else (z0, 500.0, ctx0)
    params = _load_unet_params(model, args.checkpoint_path, ex)

    # the VAE follows the compute dtype like the reference's fp16 T2I pipes
    # (torch_dtype=float16 end to end, utils.py:138-176): an f32 512px decoder
    # inside the pullback's 8-probe VJP needs >10G of HLO temps on its own and
    # OOMs a 16G chip (measured, scripts/bench_t2i_basis.py)
    # remat=True: decoder per-block checkpoint, required (with the UNet's) for
    # the through-the-decoder pullback to fit 16G at 512px; no-op numerics
    vae_cfg = VAEConfig(sample_size=cfg.sample_size * 8, dtype=dtype,
                        remat=True)
    enc, pe, dec, pd = _load_vae(vae_cfg, getattr(args, "vae_path", ""))

    bundle = {
        "decode": lambda z: dec.apply(pd, z),
        "encode": lambda x, key: encode_sample(*enc.apply(pe, x), key),
        "prompt_encoder": _prompt_encoder(args, "clip", cfg.cross_attention_dim),
        "latent_shape": (cfg.sample_size, cfg.sample_size, 4),
    }
    if lcm:
        bundle["unet_apply"] = lambda z, t, c, w: model.apply(params, z, t, c, w)
    else:
        bundle["unet_apply"] = lambda z, t, c: model.apply(params, z, t, c)
    return bundle


def _load_if_model(path, dtype, stage2: bool = False):
    """Build an IFUNet + params from a diffusers checkpoint (geometry inferred
    from the state_dict shapes — presets never gate loading) or a random-init
    miniature when no checkpoint is given (enough to exercise the engines)."""
    from loco_edit_tpu.models.ifm import (
        IFUNet,
        convert_if_state_dict,
        infer_if_config,
        tiny_if_config,
    )

    if path and path.endswith((".pt", ".pth", ".bin", ".ckpt", ".safetensors")):
        from loco_edit_tpu.models.adm.convert import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        cfg = infer_if_config(sd, dtype=dtype)
        model = IFUNet(cfg)
        params = jax.tree.map(jnp.asarray, convert_if_state_dict(sd, cfg))
        return model, params, cfg
    cfg = tiny_if_config(stage2=stage2, dtype=dtype)
    model = IFUNet(cfg)
    x0 = jnp.zeros((1, cfg.sample_size, cfg.sample_size, cfg.in_channels))
    ctx0 = jnp.zeros((1, 77, cfg.encoder_hid_dim))
    params = jax.jit(model.init)(jax.random.key(0), x0, 500.0, ctx0)
    return model, params, cfg


def load_if_bundle(args):
    """DeepFloyd-IF: stage-1 UNet (added-KV attention, resnet up/downsampling,
    T5 conditioning through encoder_hid_proj, attention-pooled addition
    embedding) from --checkpoint_path, plus the stage-2 upscaler sampler from
    --stage2_checkpoint_path (reference loads IF-I-M + IF-II-L,
    src/utils/utils.py:260-293)."""
    dtype = jnp.bfloat16 if args.dtype in ("bf16", "fp16") else jnp.float32

    model, params, cfg = _load_if_model(args.checkpoint_path, dtype)
    prompt_encoder = _prompt_encoder(args, "t5", cfg.encoder_hid_dim)
    bundle = {
        "unet_apply": lambda x, t, c: model.apply(params, x, t, c),
        "prompt_encoder": prompt_encoder,
        "sample_shape": (cfg.sample_size, cfg.sample_size, 3),
        "superres": None,
    }

    s2_path = getattr(args, "stage2_checkpoint_path", "")
    if s2_path:
        from loco_edit_tpu.core.rng import RngStream
        from loco_edit_tpu.pipelines.superres import SuperResSampler

        m2, p2, cfg2 = _load_if_model(s2_path, dtype, stage2=True)
        bundle["superres"] = SuperResSampler(
            lambda x, t, c, aug_t: m2.apply(p2, x, t, c, aug_t),
            prompt_encoder, out_size=cfg2.sample_size,
            # stage-2 CFG is its own knob: the reference upscales at the
            # diffusers IFSuperResolutionPipeline default (4.0), not at the
            # stage-1 --guidance_scale
            guidance_scale=getattr(args, "stage2_guidance_scale", 4.0),
            aug_level=250,  # diffusers IFSuperResolutionPipeline default
            rng=RngStream.from_seed(args.seed))
    return bundle
