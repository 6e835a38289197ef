"""IF-style U-Net: added-KV attention semantics + full forward through the
IF engine."""

import numpy as np

import jax
import jax.numpy as jnp

from loco_edit_tpu.models.ifm import IFUNet, IFUNetConfig

TINY = IFUNetConfig(sample_size=16, block_out_channels=(32, 64),
                    layers_per_block=1, encoder_hid_dim=48,
                    cross_attention_dim=32, attention_head_dim=16,
                    attn_levels=(False, True))


def _init():
    model = IFUNet(TINY)
    x = jnp.zeros((2, 16, 16, 3))
    ctx = jnp.zeros((2, 5, 48))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0, ctx)
    return model, jax.tree.map(lambda p: p + 0.01, params)


def test_forward_shapes_and_sigma_split():
    model, params = _init()
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))
    ctx = jax.random.normal(jax.random.key(2), (2, 5, 48))
    out = model.apply(params, x, 432.1, ctx)
    assert out.shape == (2, 16, 16, 6)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_text_conditioning_flows_through_added_kv():
    model, params = _init()
    x = jax.random.normal(jax.random.key(3), (1, 16, 16, 3))
    c1 = jax.random.normal(jax.random.key(4), (1, 5, 48))
    c2 = jax.random.normal(jax.random.key(5), (1, 5, 48))
    o1 = model.apply(params, x, 100.0, c1)
    o2 = model.apply(params, x, 100.0, c2)
    assert float(jnp.max(jnp.abs(o1 - o2))) > 0


def test_added_kv_attention_math():
    """With text contributions zeroed (add_k/add_v kernels = 0 and zero bias),
    added-KV attention must NOT reduce to pure self-attention — the extra
    zero-k tokens still receive softmax mass. Verify against a numpy oracle."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    from loco_edit_tpu.models.ifm.unet import IFAttention

    attn = IFAttention(32, TINY)
    x = jax.random.normal(jax.random.key(0), (1, 4, 4, 32))
    ctx = jax.random.normal(jax.random.key(1), (1, 3, 32))
    params = attn.init(jax.random.key(2), x, ctx)
    params = jax.tree.map(lambda p: p + 0.03, params)
    got = np.asarray(attn.apply(params, x, ctx))

    p = {"/".join(k): np.asarray(v)
         for k, v in flatten_dict(params["params"]).items()}
    xa = np.asarray(x)[0].reshape(16, 32)
    # group norm (32 groups of 1 channel -> per-channel standardization is NOT
    # what GN(32) does for c=32: group size 1 -> zero variance; instead compute
    # with the same formula as ops.group_norm_f32
    g, c = 32, 32
    cg = c // g
    n = xa.shape[0] * cg
    s = xa.sum(0)
    ss = (xa**2).sum(0)
    sg = s.reshape(g, cg).sum(-1)
    ssg = ss.reshape(g, cg).sum(-1)
    mean = np.repeat(sg / n, cg)
    var = np.maximum(ssg / n - (sg / n) ** 2, 0)
    tokens = (xa - mean) / np.sqrt(var + 1e-5)
    tokens = tokens * p["group_norm/scale"] + p["group_norm/bias"]

    ca = np.asarray(ctx)[0]
    mu = ca.mean(-1, keepdims=True)
    sd = np.sqrt(ca.var(-1, keepdims=True) + 1e-5)
    can = (ca - mu) / sd * p["norm_cross/scale"] + p["norm_cross/bias"]

    q = tokens @ p["to_q/kernel"] + p["to_q/bias"]
    k = np.concatenate([can @ p["add_k_proj/kernel"] + p["add_k_proj/bias"],
                        tokens @ p["to_k/kernel"] + p["to_k/bias"]])
    v = np.concatenate([can @ p["add_v_proj/kernel"] + p["add_v_proj/bias"],
                        tokens @ p["to_v/kernel"] + p["to_v/bias"]])
    heads, d = 2, 16
    out = np.zeros_like(q)
    sc = 1 / np.sqrt(np.sqrt(d))
    for h in range(heads):
        qs, ks, vs = (t[:, h * d:(h + 1) * d] for t in (q, k, v))
        logits = (qs * sc) @ (ks * sc).T
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        out[:, h * d:(h + 1) * d] = w @ vs
    out = out @ p["to_out_0/kernel"] + p["to_out_0/bias"]
    expected = np.asarray(x)[0] + out.reshape(4, 4, 32)
    np.testing.assert_allclose(got[0], expected, atol=3e-5)


def test_if_engine_on_if_unet():
    """The IF edit engine runs end-to-end on the IF-architecture UNet."""
    from loco_edit_tpu.core.rng import seed_everything
    from loco_edit_tpu.models.sd.text import fake_prompt_encoder
    from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline

    model, params = _init()
    cfg = IFEditConfig(for_steps=6, pca_rank=1, pca_rank_null=1,
                       min_iter=1, max_iter=2, x_space_guidance_num_step=1,
                       vis_num=1, null_space_projection=False,
                       result_folder="/tmp/ifm_engine", save_images=False)
    pipe = IFEditPipeline(
        unet_apply=lambda x, t, c: model.apply(params, x, t, c),
        prompt_encoder=fake_prompt_encoder(48, seq=5),
        cfg=cfg, rng=seed_everything(13), sample_shape=(16, 16, 3))
    out = pipe.run_edit_null_space_projection_xt(
        "a dog", "a cat", sample_name="s")
    assert np.all(np.isfinite(out["image"]))
