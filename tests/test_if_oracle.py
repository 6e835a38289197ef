"""Full-forward numpy oracle for the converted DeepFloyd-IF U-Net: a synthetic
diffusers-named state_dict goes through convert_if_state_dict, and the Flax
model's output must match a from-scratch numpy implementation of the IF
semantics (scale-shift resnets with in-block avg-pool/nearest-up sampling,
added-KV attention with group-norm cross normalization, attention-pooled
TextTimeEmbedding, stage-2 aug-level class embedding, exact-erf GELU) over the
entire down-mid-up slice. This puts the IF weights path at the same
confidence tier as the ADM/DDPM golden tests and the SD numpy oracle."""

import numpy as np

import jax
import jax.numpy as jnp
from _oracle_utils import (
    conv2d,
    gelu_exact,
    group_norm,
    layer_norm,
    mha,
    silu,
    timestep_embedding,
)

from loco_edit_tpu.models.ifm import IFUNet, convert_if_state_dict, infer_if_config
from test_if_convert import synthetic_if_state_dict

TEMB = 128


def _oracle_resnet(sd, base, x, temb, up=False, down=False):
    cin = x.shape[-1]
    h = gelu_exact(group_norm(x, sd[f"{base}.norm1.weight"],
                              sd[f"{base}.norm1.bias"]))
    if up:
        h = np.repeat(np.repeat(h, 2, 0), 2, 1)
        x = np.repeat(np.repeat(x, 2, 0), 2, 1)
    elif down:
        h = h.reshape(h.shape[0] // 2, 2, h.shape[1] // 2, 2, -1).mean((1, 3))
        x = x.reshape(x.shape[0] // 2, 2, x.shape[1] // 2, 2, -1).mean((1, 3))
    h = conv2d(h, sd[f"{base}.conv1.weight"], sd[f"{base}.conv1.bias"])
    e = gelu_exact(temb) @ sd[f"{base}.time_emb_proj.weight"].T + \
        sd[f"{base}.time_emb_proj.bias"]
    scale, shift = np.split(e, 2)
    h = group_norm(h, sd[f"{base}.norm2.weight"], sd[f"{base}.norm2.bias"])
    h = h * (1 + scale) + shift
    h = gelu_exact(h)
    h = conv2d(h, sd[f"{base}.conv2.weight"], sd[f"{base}.conv2.bias"])
    if f"{base}.conv_shortcut.weight" in sd and cin != h.shape[-1]:
        x = conv2d(x, sd[f"{base}.conv_shortcut.weight"],
                   sd[f"{base}.conv_shortcut.bias"])
    return x + h


def _oracle_attn(sd, base, x, ctx_proj, heads):
    hh, ww, c = x.shape
    tokens = group_norm(x, sd[f"{base}.group_norm.weight"],
                        sd[f"{base}.group_norm.bias"]).reshape(hh * ww, c)
    # cross_attention_norm="group_norm" over the embedding axis, stats pooled
    # over (channels/32, seq)
    ctxn = group_norm(ctx_proj, sd[f"{base}.norm_cross.weight"],
                      sd[f"{base}.norm_cross.bias"])
    q = tokens @ sd[f"{base}.to_q.weight"].T + sd[f"{base}.to_q.bias"]
    k = tokens @ sd[f"{base}.to_k.weight"].T + sd[f"{base}.to_k.bias"]
    v = tokens @ sd[f"{base}.to_v.weight"].T + sd[f"{base}.to_v.bias"]
    ak = ctxn @ sd[f"{base}.add_k_proj.weight"].T + sd[f"{base}.add_k_proj.bias"]
    av = ctxn @ sd[f"{base}.add_v_proj.weight"].T + sd[f"{base}.add_v_proj.bias"]
    k = np.concatenate([ak, k])
    v = np.concatenate([av, v])
    a = mha(q, k, v, sd[f"{base}.to_out.0.weight"], sd[f"{base}.to_out.0.bias"],
            heads)
    return x + a.reshape(hh, ww, c)


def _oracle_add_embedding(sd, ctx):
    w = lambda n: sd[f"add_embedding.{n}"]  # noqa: E731
    x = layer_norm(ctx, w("norm1.weight"), w("norm1.bias"))
    cls = x.mean(0, keepdims=True) + w("pool.positional_embedding")
    cat = np.concatenate([cls, x])
    q = cls @ w("pool.q_proj.weight").T + w("pool.q_proj.bias")
    k = cat @ w("pool.k_proj.weight").T + w("pool.k_proj.bias")
    v = cat @ w("pool.v_proj.weight").T + w("pool.v_proj.bias")
    heads, e = 16, 48  # infer_if_config: gcd(48, 64) = 16
    d = e // heads
    pooled = np.zeros((e,), np.float32)
    sc = d ** -0.25
    for h in range(heads):
        qs = q[:, h * d:(h + 1) * d] * sc
        ks = k[:, h * d:(h + 1) * d] * sc
        vs = v[:, h * d:(h + 1) * d]
        logits = qs @ ks.T
        wts = np.exp(logits - logits.max(-1, keepdims=True))
        wts /= wts.sum(-1, keepdims=True)
        pooled[h * d:(h + 1) * d] = (wts @ vs)[0]
    out = pooled @ w("proj.weight").T + w("proj.bias")
    return layer_norm(out, w("norm2.weight"), w("norm2.bias"))


def _oracle_if_forward(sd, x, t, ctx, aug_t=None):
    """Batch-1 full forward of the tiny synthetic IF config (blocks (32, 64),
    layers (1, 2), attention at level 1 + mid, head_dim 16)."""
    temb = timestep_embedding(t, 32) @ sd["time_embedding.linear_1.weight"].T \
        + sd["time_embedding.linear_1.bias"]
    temb = gelu_exact(temb) @ sd["time_embedding.linear_2.weight"].T + \
        sd["time_embedding.linear_2.bias"]
    if aug_t is not None:
        cemb = timestep_embedding(aug_t, 32) @ \
            sd["class_embedding.linear_1.weight"].T + \
            sd["class_embedding.linear_1.bias"]
        cemb = silu(cemb) @ sd["class_embedding.linear_2.weight"].T + \
            sd["class_embedding.linear_2.bias"]
        temb = temb + cemb
    temb = temb + _oracle_add_embedding(sd, ctx)
    ctx_proj = ctx @ sd["encoder_hid_proj.weight"].T + sd["encoder_hid_proj.bias"]

    h = conv2d(x, sd["conv_in.weight"], sd["conv_in.bias"])
    skips = [h]
    h = _oracle_resnet(sd, "down_blocks.0.resnets.0", h, temb)
    skips.append(h)
    h = _oracle_resnet(sd, "down_blocks.0.downsamplers.0", h, temb, down=True)
    skips.append(h)
    for j in range(2):
        h = _oracle_resnet(sd, f"down_blocks.1.resnets.{j}", h, temb)
        h = _oracle_attn(sd, f"down_blocks.1.attentions.{j}", h, ctx_proj,
                         heads=4)
        skips.append(h)

    h = _oracle_resnet(sd, "mid_block.resnets.0", h, temb)
    h = _oracle_attn(sd, "mid_block.attentions.0", h, ctx_proj, heads=4)
    h = _oracle_resnet(sd, "mid_block.resnets.1", h, temb)

    for j in range(3):
        h = _oracle_resnet(sd, f"up_blocks.0.resnets.{j}",
                           np.concatenate([h, skips.pop()], -1), temb)
        h = _oracle_attn(sd, f"up_blocks.0.attentions.{j}", h, ctx_proj,
                         heads=4)
    h = _oracle_resnet(sd, "up_blocks.0.upsamplers.0", h, temb, up=True)
    for j in range(2):
        h = _oracle_resnet(sd, f"up_blocks.1.resnets.{j}",
                           np.concatenate([h, skips.pop()], -1), temb)

    h = gelu_exact(group_norm(h, sd["conv_norm_out.weight"],
                              sd["conv_norm_out.bias"]))
    return conv2d(h, sd["conv_out.weight"], sd["conv_out.bias"])


def test_if_unet_conversion_matches_numpy_oracle():
    sd = synthetic_if_state_dict()
    cfg = infer_if_config(sd, sample_size=16, attention_head_dim=16)
    params = jax.tree.map(jnp.asarray, convert_if_state_dict(sd, cfg))
    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    ctx = rng.normal(size=(1, 5, 48)).astype(np.float32)
    got = np.asarray(IFUNet(cfg).apply(params, jnp.asarray(x), 431.0,
                                       jnp.asarray(ctx)))
    want = _oracle_if_forward(sd, x[0], 431.0, ctx[0])
    np.testing.assert_allclose(got[0], want, atol=1e-4, rtol=1e-4)


def test_if_stage2_conversion_matches_numpy_oracle():
    """Stage-2 variant: 6 input channels + aug-level class embedding."""
    sd = synthetic_if_state_dict(stage2=True, seed=4)
    cfg = infer_if_config(sd, sample_size=16, attention_head_dim=16)
    params = jax.tree.map(jnp.asarray, convert_if_state_dict(sd, cfg))
    rng = np.random.default_rng(12)
    x = rng.normal(size=(1, 16, 16, 6)).astype(np.float32)
    ctx = rng.normal(size=(1, 5, 48)).astype(np.float32)
    got = np.asarray(IFUNet(cfg).apply(params, jnp.asarray(x), 377.0,
                                       jnp.asarray(ctx), 250.0))
    want = _oracle_if_forward(sd, x[0], 377.0, ctx[0], aug_t=250.0)
    np.testing.assert_allclose(got[0], want, atol=1e-4, rtol=1e-4)
