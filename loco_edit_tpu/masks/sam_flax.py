"""Flax SAM vision encoder (the TPU-heavy stage of mask extraction).

The reference runs HF's mask-generation pipeline on facebook/sam-vit-large
entirely host-side (src/modules/mask_segmentation.py:11). The pipeline's cost
is dominated by the ViT image encoder (~308M params at 64x64 patches); this
module is that encoder as an NHWC Flax model + converter from the HF SAM
checkpoint (`vision_encoder.*` keys), golden-tested against the torch
implementation (tests/test_sam_flax.py). The lightweight prompt encoder /
mask decoder stage stays host-side: `transformers.SamModel` accepts
precomputed `image_embeddings`, so the TPU encoder output drops straight into
the existing host pipeline (masks/sam.py keeps the all-torch fallback).

Faithful to transformers' SamVisionEncoder:
  - 16x16 patch conv -> (B, H', W', C) + absolute positional embedding
  - pre-LN blocks: windowed attention (window 14, zero-pad partition) except
    the global_attn_indexes layers; decomposed relative position bias
    (MViTv2-style rel_pos_h/rel_pos_w gathers added to logits); exact-erf
    GELU MLP
  - neck: 1x1 conv (no bias) -> channel LayerNorm -> 3x3 conv -> LayerNorm,
    output (B, H', W', output_channels)
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SamViTConfig:
    image_size: int = 1024
    patch_size: int = 16
    hidden_size: int = 1024            # vit-large
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    window_size: int = 14
    global_attn_indexes: tuple[int, ...] = (5, 11, 17, 23)
    output_channels: int = 256
    layer_norm_eps: float = 1e-6
    # scan over the repeated [windowed x K, global] blocks instead of
    # unrolling all layers: the compiled HLO contains ONE block body, so
    # compile time/size stays flat with depth (the 24-layer unrolled
    # vit-large graph overwhelms slow compile services). Identical numerics
    # (tested); requires the uniform block structure all SAM ViTs have.
    scan_blocks: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def block_structure(self) -> tuple[int, int] | None:
        """(n_blocks, windowed_per_block) when layers form uniform
        [windowed*K, global] blocks (true for SAM vit-base/large/huge),
        else None."""
        g = self.global_attn_indexes
        if not g or self.num_layers % len(g):
            return None
        block = self.num_layers // len(g)
        if block < 2:  # all-global: no windowed layers to scan over
            return None
        if tuple((i + 1) * block - 1 for i in range(len(g))) != tuple(g):
            return None
        return len(g), block - 1


VIT_LARGE = SamViTConfig()
VIT_BASE = SamViTConfig(hidden_size=768, num_layers=12, num_heads=12,
                        global_attn_indexes=(2, 5, 8, 11))
VIT_HUGE = SamViTConfig(hidden_size=1280, num_layers=32, num_heads=16,
                        global_attn_indexes=(7, 15, 23, 31))


def _ln(eps, name):
    return nn.LayerNorm(epsilon=eps, dtype=jnp.float32, param_dtype=jnp.float32,
                        name=name)


def _rel_pos_table(rel_pos: jnp.ndarray, size: int) -> jnp.ndarray:
    """(L, d) learned table -> (size, size, d) gathered by relative coords
    (HF get_rel_pos for equal q/k sizes; linear interpolation when the stored
    table length != 2*size-1)."""
    max_rel = 2 * size - 1
    if rel_pos.shape[0] != max_rel:
        # torch F.interpolate(mode="linear", align_corners=False) semantics:
        # half-pixel centers, NO antialiasing on downscale (jax.image.resize
        # antialiases, so it is not equivalent)
        n = rel_pos.shape[0]
        pos = (jnp.arange(max_rel) + 0.5) * (n / max_rel) - 0.5
        pos = jnp.clip(pos, 0.0, n - 1.0)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        frac = (pos - lo)[:, None]
        rel_pos = rel_pos[lo] * (1 - frac) + rel_pos[hi] * frac
    coords = jnp.arange(size)[:, None] - jnp.arange(size)[None, :] + size - 1
    return rel_pos[coords]


class SamAttention(nn.Module):
    cfg: SamViTConfig
    size: int   # spatial side of the attention grid (window or full)

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        heads = cfg.num_heads
        d = c // heads
        qkv = nn.Dense(3 * c, dtype=cfg.dtype, param_dtype=jnp.float32,
                       name="qkv")(x.reshape(b, hh * ww, c))
        qkv = qkv.reshape(b, hh * ww, 3, heads, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]          # (b, heads, n, d)

        logits = jnp.einsum("bhnd,bhmd->bhnm", q * (d ** -0.5), k,
                            preferred_element_type=jnp.float32)

        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.size - 1, d), jnp.float32)
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.size - 1, d), jnp.float32)
        Rh = _rel_pos_table(rel_h, hh).astype(q.dtype)
        Rw = _rel_pos_table(rel_w, ww).astype(q.dtype)
        rq = q.reshape(b, heads, hh, ww, d)
        bias_h = jnp.einsum("bzhwc,hkc->bzhwk", rq, Rh)
        bias_w = jnp.einsum("bzhwc,wkc->bzhwk", rq, Rw)
        bias = (bias_h[..., :, None] + bias_w[..., None, :]).reshape(
            b, heads, hh * ww, hh * ww)
        logits = logits + bias

        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        a = jnp.einsum("bhnm,bhmd->bhnd", w, v)
        a = a.transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        return nn.Dense(c, dtype=cfg.dtype, param_dtype=jnp.float32,
                        name="proj")(a)


class SamVisionLayer(nn.Module):
    cfg: SamViTConfig
    windowed: bool

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, hh, ww, c = x.shape
        res = x
        h = _ln(cfg.layer_norm_eps, "layer_norm1")(x)
        if self.windowed:
            w = cfg.window_size
            ph = (w - hh % w) % w
            pw = (w - ww % w) % w
            h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
            H, W = hh + ph, ww + pw
            h = h.reshape(b, H // w, w, W // w, w, c).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(-1, w, w, c)
            h = SamAttention(cfg, w, name="attn")(h)
            h = h.reshape(b, H // w, W // w, w, w, c).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(b, H, W, c)[:, :hh, :ww]
        else:
            h = SamAttention(cfg, cfg.grid, name="attn")(h)
        x = res + h
        h = _ln(cfg.layer_norm_eps, "layer_norm2")(x)
        h = nn.Dense(int(c * cfg.mlp_ratio), dtype=cfg.dtype,
                     param_dtype=jnp.float32, name="mlp_lin1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=cfg.dtype, param_dtype=jnp.float32,
                     name="mlp_lin2")(h)
        return x + h


class _ScanLayer(nn.Module):
    """(carry, _) adapter around SamVisionLayer for nn.scan."""

    cfg: SamViTConfig
    windowed: bool

    @nn.compact
    def __call__(self, x, _):
        return SamVisionLayer(self.cfg, self.windowed, name="layer")(x), None


class _ScanBlock(nn.Module):
    """One [windowed x K, global] block: the K identical windowed layers run
    as a single-level nn.scan (one compiled body), the global layer unrolled.
    The encoder python-loops over blocks, so the HLO holds n_blocks windowed
    bodies + n_blocks global layers (8 for vit-large) instead of 24 unrolled
    layers. Deliberately NOT an outer nn.scan over blocks: the nested-scan
    program stalls some remote-compile services (measured in this
    environment) while the single-level form compiles fine, and local XLA
    compiles both."""

    cfg: SamViTConfig
    windowed_per_block: int

    @nn.compact
    def __call__(self, x):
        inner = nn.scan(_ScanLayer, variable_axes={"params": 0},
                        split_rngs={"params": True},
                        length=self.windowed_per_block)
        x, _ = inner(self.cfg, True, name="windowed")(x, None)
        return SamVisionLayer(self.cfg, False, name="global")(x)


class SamViTEncoder(nn.Module):
    """pixel_values: (B, image_size, image_size, 3), SAM-normalized.
    Returns (B, grid, grid, output_channels) image embeddings."""

    cfg: SamViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
                    dtype=cfg.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x.astype(cfg.dtype))
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.grid, cfg.grid, cfg.hidden_size), jnp.float32)
        h = h + pos.astype(h.dtype)
        if cfg.scan_blocks:
            struct = cfg.block_structure
            if struct is None:
                raise ValueError(
                    "scan_blocks requires uniform [windowed*K, global] "
                    f"blocks; got {cfg.num_layers} layers with globals at "
                    f"{cfg.global_attn_indexes}")
            n_blocks, per_w = struct
            for b in range(n_blocks):
                h = _ScanBlock(cfg, per_w, name=f"block_{b}")(h)
        else:
            for i in range(cfg.num_layers):
                h = SamVisionLayer(
                    cfg, windowed=i not in cfg.global_attn_indexes,
                    name=f"layer_{i}")(h)
        # neck (convs bias-free, channel LayerNorms)
        h = nn.Conv(cfg.output_channels, (1, 1), use_bias=False,
                    dtype=cfg.dtype, param_dtype=jnp.float32,
                    name="neck_conv1")(h)
        h = _ln(1e-6, "neck_ln1")(h)
        h = nn.Conv(cfg.output_channels, (3, 3), padding=1, use_bias=False,
                    dtype=cfg.dtype, param_dtype=jnp.float32,
                    name="neck_conv2")(h)
        return _ln(1e-6, "neck_ln2")(h)


# --------------------------------------------------------------- conversion


def config_from_hf(hf_cfg) -> SamViTConfig:
    return SamViTConfig(
        image_size=hf_cfg.image_size, patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size, num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads, mlp_ratio=hf_cfg.mlp_ratio,
        window_size=hf_cfg.window_size,
        global_attn_indexes=tuple(hf_cfg.global_attn_indexes),
        output_channels=hf_cfg.output_channels,
        layer_norm_eps=hf_cfg.layer_norm_eps)


def convert_sam_vision_state_dict(sd: Mapping[str, np.ndarray],
                                  cfg: SamViTConfig) -> dict:
    """HF SamModel (or SamVisionModel) state_dict -> SamViTEncoder params.
    Accepts keys with or without the `vision_encoder.` prefix; non-vision
    keys (prompt encoder / mask decoder) are ignored — they stay host-side."""
    from loco_edit_tpu.models.convert_util import KeyTracker

    sd = {k.removeprefix("vision_encoder."): np.asarray(v)
          for k, v in sd.items()
          if not k.startswith(("prompt_encoder.", "mask_decoder.",
                               "shared_image_embedding."))}
    tr = KeyTracker(sd)

    def lin(name, bias=True):
        out = {"kernel": np.ascontiguousarray(tr[f"{name}.weight"].T)}
        if bias:
            out["bias"] = tr[f"{name}.bias"]
        return out

    def lnp(name):
        return {"scale": tr[f"{name}.weight"], "bias": tr[f"{name}.bias"]}

    p: dict = {
        "patch_embed": {
            "kernel": np.ascontiguousarray(
                tr["patch_embed.projection.weight"].transpose(2, 3, 1, 0)),
            "bias": tr["patch_embed.projection.bias"],
        },
        "pos_embed": tr["pos_embed"],
        "neck_conv1": {"kernel": np.ascontiguousarray(
            tr["neck.conv1.weight"].transpose(2, 3, 1, 0))},
        "neck_ln1": lnp("neck.layer_norm1"),
        "neck_conv2": {"kernel": np.ascontiguousarray(
            tr["neck.conv2.weight"].transpose(2, 3, 1, 0))},
        "neck_ln2": lnp("neck.layer_norm2"),
    }
    def layer_params(i: int) -> dict:
        b = f"layers.{i}"
        return {
            "layer_norm1": lnp(f"{b}.layer_norm1"),
            "layer_norm2": lnp(f"{b}.layer_norm2"),
            "attn": {
                "qkv": lin(f"{b}.attn.qkv"),
                "proj": lin(f"{b}.attn.proj"),
                "rel_pos_h": tr[f"{b}.attn.rel_pos_h"],
                "rel_pos_w": tr[f"{b}.attn.rel_pos_w"],
            },
            "mlp_lin1": lin(f"{b}.mlp.lin1"),
            "mlp_lin2": lin(f"{b}.mlp.lin2"),
        }

    if cfg.scan_blocks:
        struct = cfg.block_structure
        if struct is None:
            raise ValueError("scan_blocks conversion needs uniform blocks")
        n_blocks, per_w = struct
        import jax

        def stack(trees):
            return jax.tree.map(lambda *xs: np.stack(xs), *trees)

        for b in range(n_blocks):
            p[f"block_{b}"] = {
                # (per_w, ...) stacked windowed layers + the unrolled global
                "windowed": {"layer": stack(
                    [layer_params(b * (per_w + 1) + j) for j in range(per_w)])},
                "global": layer_params((b + 1) * (per_w + 1) - 1),
            }
    else:
        for i in range(cfg.num_layers):
            p[f"layer_{i}"] = layer_params(i)
    tr.check("SAM vision encoder")
    return {"params": p}
