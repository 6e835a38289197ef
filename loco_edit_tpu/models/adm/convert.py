"""torch ADM checkpoint -> Flax parameter tree.

Maps guided-diffusion UNetModel state_dicts (the P2/LSUN/ImageNet checkpoints
the reference loads via g_DDPM, src/models/guided_diffusion/script_util.py:236)
onto the ADMUNet tree generated from the same `adm_layout`. Conversion rules:

  torch Linear  (O, I)        -> Dense kernel (I, O)
  torch Conv2d  (O, I, kh, kw)-> Conv kernel HWIO (kh, kw, I, O)
  torch Conv1d  (O, I, 1)     -> Dense kernel (I, O)
  GroupNorm weight/bias       -> scale/bias
  qkv conv1d, legacy packing  -> Dense with q|k|v-contiguous packing: the
    legacy ADM attention packs channels per-head [h0:(q,k,v), h1:(q,k,v), ...]
    (reference unet.py:339-349 reshapes (B, 3C, T) -> (B*H, 3d, T)); our
    attention expects [q:(h0..hH), k:(...), v:(...)], so channels are permuted.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from loco_edit_tpu.models.adm.config import (
    ADMConfig,
    AttnSpec,
    ConvSpec,
    ResSpec,
    SampleSpec,
    adm_layout,
)


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


def _qkv_legacy_to_packed(w: np.ndarray, b: np.ndarray, heads: int):
    """(3C, C, 1) legacy head-interleaved conv1d -> (C, 3C) Dense with
    q|k|v contiguous channels."""
    three_c, c, _ = w.shape
    assert three_c == 3 * c
    d = c // heads
    w2 = w[:, :, 0]                       # (3C, C)
    # legacy output channel (h, p, j) lives at h*3d + p*d + j; ours at p*C + h*d + j
    perm = np.empty(3 * c, np.int64)
    for p in range(3):
        for h in range(heads):
            src = h * 3 * d + p * d
            dst = p * c + h * d
            perm[dst:dst + d] = np.arange(src, src + d)
    return {"kernel": np.ascontiguousarray(w2[perm].T), "bias": b[perm]}


def _attn(sd, name, heads: int, new_order: bool = False):
    w = np.asarray(sd[f"{name}.qkv.weight"])
    b = np.asarray(sd[f"{name}.qkv.bias"])
    if new_order:
        qkv = {"kernel": np.ascontiguousarray(w[:, :, 0].T), "bias": b}
    else:
        qkv = _qkv_legacy_to_packed(w, b, heads)
    pw = np.asarray(sd[f"{name}.proj_out.weight"])
    return {
        "norm": _gn(sd, f"{name}.norm"),
        "qkv": qkv,
        "proj_out": {"kernel": np.ascontiguousarray(pw[:, :, 0].T),
                     "bias": np.asarray(sd[f"{name}.proj_out.bias"])},
    }


def _res(sd, name, spec: ResSpec):
    out = {
        "in_norm": _gn(sd, f"{name}.in_layers.0"),
        "in_conv": _conv(sd, f"{name}.in_layers.2"),
        "emb_dense": _lin(sd, f"{name}.emb_layers.1"),
        "out_norm": _gn(sd, f"{name}.out_layers.0"),
        "out_conv": _conv(sd, f"{name}.out_layers.3"),
    }
    if spec.out_ch != spec.in_ch:
        out["skip_conv"] = _conv(sd, f"{name}.skip_connection")
    return out


def convert_adm_state_dict(sd: Mapping[str, np.ndarray], cfg: ADMConfig,
                           use_new_attention_order: bool = False) -> dict:
    """Build the full {'params': ...} tree for ADMUNet(cfg) from a torch
    guided-diffusion state_dict."""
    layout = adm_layout(cfg)
    p: dict = {}
    p["time_dense0"] = _lin(sd, "time_embed.0")
    p["time_dense1"] = _lin(sd, "time_embed.2")
    if cfg.num_classes is not None:
        p["label_emb"] = {"embedding": np.asarray(sd["label_emb.weight"])}

    def seq(prefix_t: str, specs, dst: dict):
        for j, spec in enumerate(specs):
            t = f"{prefix_t}.{j}"
            if isinstance(spec, ConvSpec):
                dst[f"conv_{j}"] = _conv(sd, t)
            elif isinstance(spec, ResSpec):
                dst[f"res_{j}"] = _res(sd, t, spec)
            elif isinstance(spec, AttnSpec):
                dst[f"attn_{j}"] = _attn(sd, t, spec.num_heads,
                                         use_new_attention_order)
            elif isinstance(spec, SampleSpec):
                if spec.use_conv:
                    key = f"{t}.conv" if spec.up else f"{t}.op"
                    dst[f"sample_{j}"] = _conv(sd, key)
            else:
                raise TypeError(spec)

    for i, specs in enumerate(layout.input_blocks):
        block: dict = {}
        seq(f"input_blocks.{i}", specs, block)
        p[f"input_{i}"] = block
    mid: dict = {}
    seq("middle_block", layout.middle_block, mid)
    p["middle"] = mid
    for i, specs in enumerate(layout.output_blocks):
        block = {}
        seq(f"output_blocks.{i}", specs, block)
        p[f"output_{i}"] = block

    p["out_norm"] = _gn(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")
    return {"params": p}


def load_torch_checkpoint(path: str) -> dict[str, np.ndarray]:
    """Read a .pt/.bin/.ckpt (torch pickle) or .safetensors state_dict into
    numpy (torch needed only here; safetensors goes through the torch backend
    so bf16/fp16 tensors upcast correctly)."""
    import torch

    if path.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(path)
    else:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}
