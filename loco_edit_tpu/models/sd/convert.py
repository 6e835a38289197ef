"""diffusers SD checkpoints -> Flax trees (UNet2DConditionModel, AutoencoderKL).

Name mapping is mechanical; layout conversions are the standard
torch->Flax rules (Linear transposed, Conv OIHW->HWIO, 1x1 convs to Dense
where the Flax module uses Dense). Handles both the old (query/key/value/
proj_attn) and new (to_q/to_k/to_v/to_out.0) VAE attention namings and both
linear/conv transformer projections (SD 2.x vs 1.x).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from loco_edit_tpu.models.convert_util import KeyTracker
from loco_edit_tpu.models.sd.config import SDUNetConfig, VAEConfig


def _lin(sd, name, bias=True):
    out = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gn(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _res(sd, base):
    out = {
        "norm1": _gn(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "norm2": _gn(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if f"{base}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{base}.time_emb_proj")
    if f"{base}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
    return out


def _xattn(sd, base):
    return {
        "to_q": _lin(sd, f"{base}.to_q", bias=False),
        "to_k": _lin(sd, f"{base}.to_k", bias=False),
        "to_v": _lin(sd, f"{base}.to_v", bias=False),
        "to_out_0": _lin(sd, f"{base}.to_out.0"),
    }


def _transformer(sd, base, cfg: SDUNetConfig):
    proj = _lin if cfg.use_linear_projection else _conv
    out = {
        "norm": _gn(sd, f"{base}.norm"),
        "proj_in": proj(sd, f"{base}.proj_in"),
        "proj_out": proj(sd, f"{base}.proj_out"),
    }
    for i in range(cfg.transformer_layers):
        tb = f"{base}.transformer_blocks.{i}"
        out[f"block_{i}"] = {
            "norm1": _gn(sd, f"{tb}.norm1"),
            "attn1": _xattn(sd, f"{tb}.attn1"),
            "norm2": _gn(sd, f"{tb}.norm2"),
            "attn2": _xattn(sd, f"{tb}.attn2"),
            "norm3": _gn(sd, f"{tb}.norm3"),
            "ff_net_0": {"proj": _lin(sd, f"{tb}.ff.net.0.proj")},
            "ff_net_2": _lin(sd, f"{tb}.ff.net.2"),
        }
    return out


def convert_sd_unet_state_dict(sd: Mapping[str, np.ndarray],
                               cfg: SDUNetConfig, strict: bool = True) -> dict:
    """With strict=True (default) every checkpoint key must be consumed."""
    sd = KeyTracker(sd)
    p: dict = {
        "time_dense0": _lin(sd, "time_embedding.linear_1"),
        "time_dense1": _lin(sd, "time_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_res_0": _res(sd, "mid_block.resnets.0"),
        "mid_attn": _transformer(sd, "mid_block.attentions.0", cfg),
        "mid_res_1": _res(sd, "mid_block.resnets.1"),
    }
    if cfg.time_cond_proj_dim is not None:
        p["cond_proj"] = _lin(sd, "time_embedding.cond_proj", bias=False)
    n = len(cfg.block_out_channels)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_res_{j}"] = _res(sd, f"down_blocks.{i}.resnets.{j}")
            if cfg.cross_attn_levels[i]:
                p[f"down_{i}_attn_{j}"] = _transformer(
                    sd, f"down_blocks.{i}.attentions.{j}", cfg)
        if i != n - 1:
            p[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv")
    for k in range(n):
        i = n - 1 - k
        for j in range(cfg.layers_per_block + 1):
            p[f"up_{i}_res_{j}"] = _res(sd, f"up_blocks.{k}.resnets.{j}")
            if cfg.cross_attn_levels[i]:
                p[f"up_{i}_attn_{j}"] = _transformer(
                    sd, f"up_blocks.{k}.attentions.{j}", cfg)
        if i != 0:
            p[f"up_{i}_upsample"] = _conv(sd, f"up_blocks.{k}.upsamplers.0.conv")
    if strict:
        sd.check("SD UNet")
    return {"params": p}


def _vae_attn(sd, base):
    names = (("group_norm", "to_q", "to_k", "to_v", "to_out.0")
             if f"{base}.to_q.weight" in sd else
             ("group_norm", "query", "key", "value", "proj_attn"))
    gn, q, k, v, o = names

    def lin1x1(nm):
        w = np.asarray(sd[f"{base}.{nm}.weight"])
        if w.ndim == 4:
            w = w[:, :, 0, 0]
        return {"kernel": np.ascontiguousarray(w.T),
                "bias": np.asarray(sd[f"{base}.{nm}.bias"])}

    return {"group_norm": _gn(sd, f"{base}.{gn}"), "to_q": lin1x1(q),
            "to_k": lin1x1(k), "to_v": lin1x1(v), "to_out_0": lin1x1(o)}


def convert_vae_state_dict(sd: Mapping[str, np.ndarray], cfg: VAEConfig,
                           strict: bool = True) -> tuple[dict, dict]:
    """Returns (encoder_params, decoder_params). With strict=True every
    checkpoint key must be consumed."""
    sd = KeyTracker(sd)
    n = len(cfg.block_out_channels)
    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_res_0": _res(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_res_1": _res(sd, "encoder.mid_block.resnets.1"),
        "conv_norm_out": _gn(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "quant_conv": _conv(sd, "quant_conv"),
    }
    for i in range(n):
        for j in range(cfg.layers_per_block):
            enc[f"down_{i}_res_{j}"] = _res(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i != n - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")

    dec: dict = {
        "post_quant_conv": _conv(sd, "post_quant_conv"),
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_res_0": _res(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res_1": _res(sd, "decoder.mid_block.resnets.1"),
        "conv_norm_out": _gn(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for k in range(n):
        i = n - 1 - k
        for j in range(cfg.layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _res(sd, f"decoder.up_blocks.{k}.resnets.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{k}.upsamplers.0.conv")
    # VAE resnets have no time embedding and VAE norms use the same GN names
    # as the UNet resnets, so _res works unchanged (time_emb_proj absent).
    if strict:
        sd.check("VAE")
    return {"params": enc}, {"params": dec}
