"""Checkpoint converters for the classic DDPM U-Net.

Two source formats feed the same Flax tree:
  - SDEdit/original DDPM naming (temb.dense.*, down.{i}.block.{j}, ...) — the
    reference's YAML-configured `DDPM` (src/models/ddpm/diffusion.py:22-130).
  - diffusers UNet2DModel naming (time_embedding.linear_*, down_blocks...,
    AttnBlock as Linear q/k/v) — the HF `google/ddpm-ema-*` checkpoints the
    live *_HF names load (src/utils/utils.py:77-146). Note diffusers orders
    up_blocks deepest-first, the original orders up.{i} shallowest-first.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from loco_edit_tpu.models.ddpm.unet import DDPMConfig


def _lin(sd, name):
    return {"kernel": np.ascontiguousarray(np.asarray(sd[f"{name}.weight"]).T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _gn(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _conv1x1_as_dense(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return {"kernel": np.ascontiguousarray(w.T),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _res(sd, base, shortcut_key=None):
    out = {
        "norm1": _gn(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "temb_proj": _lin(sd, f"{base}.temb_proj"),
        "norm2": _gn(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if shortcut_key and f"{base}.{shortcut_key}.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{base}.{shortcut_key}")
    return out


def _attn(sd, base, names=("norm", "q", "k", "v", "proj_out")):
    n_norm, n_q, n_k, n_v, n_p = names
    return {
        "norm": _gn(sd, f"{base}.{n_norm}"),
        "q": _conv1x1_as_dense(sd, f"{base}.{n_q}"),
        "k": _conv1x1_as_dense(sd, f"{base}.{n_k}"),
        "v": _conv1x1_as_dense(sd, f"{base}.{n_v}"),
        "proj_out": _conv1x1_as_dense(sd, f"{base}.{n_p}"),
    }


def convert_ddpm_state_dict(sd: Mapping[str, np.ndarray], cfg: DDPMConfig) -> dict:
    """SDEdit/original DDPM naming -> Flax tree."""
    p: dict = {
        "temb_dense0": _lin(sd, "temb.dense.0"),
        "temb_dense1": _lin(sd, "temb.dense.1"),
        "conv_in": _conv(sd, "conv_in"),
        "norm_out": _gn(sd, "norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_block_1": _res(sd, "mid.block_1", "nin_shortcut"),
        "mid_attn_1": _attn(sd, "mid.attn_1"),
        "mid_block_2": _res(sd, "mid.block_2", "nin_shortcut"),
    }
    num_res = len(cfg.ch_mult)
    curr_res = cfg.resolution
    for i in range(num_res):
        for j in range(cfg.num_res_blocks):
            p[f"down_{i}_block_{j}"] = _res(sd, f"down.{i}.block.{j}", "nin_shortcut")
            if curr_res in cfg.attn_resolutions:
                p[f"down_{i}_attn_{j}"] = _attn(sd, f"down.{i}.attn.{j}")
        if i != num_res - 1:
            if cfg.resamp_with_conv:
                p[f"down_{i}_downsample"] = _conv(sd, f"down.{i}.downsample.conv")
            curr_res //= 2
    for i in reversed(range(num_res)):
        for j in range(cfg.num_res_blocks + 1):
            p[f"up_{i}_block_{j}"] = _res(sd, f"up.{i}.block.{j}", "nin_shortcut")
            if curr_res in cfg.attn_resolutions:
                p[f"up_{i}_attn_{j}"] = _attn(sd, f"up.{i}.attn.{j}")
        if i != 0:
            if cfg.resamp_with_conv:
                p[f"up_{i}_upsample"] = _conv(sd, f"up.{i}.upsample.conv")
            curr_res *= 2
    return {"params": p}


def convert_diffusers_unet2d_state_dict(sd: Mapping[str, np.ndarray],
                                        cfg: DDPMConfig) -> dict:
    """diffusers UNet2DModel naming -> Flax tree (old `query/key/value` and new
    `to_q/to_k/to_v/to_out.0` attention namings both handled)."""
    def attn(base):
        if f"{base}.query.weight" in sd:
            return _attn(sd, base, ("group_norm", "query", "key", "value",
                                    "proj_attn"))
        return _attn(sd, base, ("group_norm", "to_q", "to_k", "to_v", "to_out.0"))

    p: dict = {
        "temb_dense0": _lin(sd, "time_embedding.linear_1"),
        "temb_dense1": _lin(sd, "time_embedding.linear_2"),
        "conv_in": _conv(sd, "conv_in"),
        "norm_out": _gn(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_attn_1": attn("mid_block.attentions.0"),
    }
    # rename time_emb_proj -> temb_proj inside diffusers resnets
    def res(base):
        out = {
            "norm1": _gn(sd, f"{base}.norm1"),
            "conv1": _conv(sd, f"{base}.conv1"),
            "temb_proj": _lin(sd, f"{base}.time_emb_proj"),
            "norm2": _gn(sd, f"{base}.norm2"),
            "conv2": _conv(sd, f"{base}.conv2"),
        }
        if f"{base}.conv_shortcut.weight" in sd:
            out["nin_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
        return out

    p["mid_block_1"] = res("mid_block.resnets.0")
    p["mid_block_2"] = res("mid_block.resnets.1")

    num_res = len(cfg.ch_mult)
    curr_res = cfg.resolution
    for i in range(num_res):
        for j in range(cfg.num_res_blocks):
            p[f"down_{i}_block_{j}"] = res(f"down_blocks.{i}.resnets.{j}")
            if curr_res in cfg.attn_resolutions:
                p[f"down_{i}_attn_{j}"] = attn(f"down_blocks.{i}.attentions.{j}")
        if i != num_res - 1:
            if cfg.resamp_with_conv:
                p[f"down_{i}_downsample"] = _conv(
                    sd, f"down_blocks.{i}.downsamplers.0.conv")
            curr_res //= 2
    # diffusers up_blocks.k == original level num_res-1-k
    res_at_level = [cfg.resolution // (2 ** min(l, num_res - 1)) for l in range(num_res)]
    for k in range(num_res):
        i = num_res - 1 - k
        level_res = res_at_level[i]
        for j in range(cfg.num_res_blocks + 1):
            p[f"up_{i}_block_{j}"] = res(f"up_blocks.{k}.resnets.{j}")
            if level_res in cfg.attn_resolutions:
                p[f"up_{i}_attn_{j}"] = attn(f"up_blocks.{k}.attentions.{j}")
        if i != 0 and cfg.resamp_with_conv:
            p[f"up_{i}_upsample"] = _conv(sd, f"up_blocks.{k}.upsamplers.0.conv")
    return {"params": p}
