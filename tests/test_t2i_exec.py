"""Round-5 T2I execution-standard paths on tiny models (CPU): fused dual
modify+null basis equivalence vs the two solo programs, --vT_path direction
transfer (reference exposes it on the uncond engine, edit.py:2333-2336 —
here rounded out to all engines), pixel_output uint8 strips, and the SD/LCM
run_edit_batch throughput form.

The dual/solo probe keys are derived from the same named rng forks, so the
fused program must reproduce the solo subspaces to float tolerance (the
same property the 8-device dryrun asserts for the sharded SD engine)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.core.rng import seed_everything
from loco_edit_tpu.models.sd import (SDUNet, VAEConfig, VAEDecoder,
                                     VAEEncoder, sd_preset)
from loco_edit_tpu.models.sd.text import fake_prompt_encoder
from loco_edit_tpu.models.sd.vae import encode_sample
from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline
from loco_edit_tpu.pipelines.lcm import LCMEditConfig, LCMEditPipeline
from loco_edit_tpu.pipelines.sd import SDEditConfig, SDEditPipeline

TINY = sd_preset("tiny")
TINY_VAE = VAEConfig(sample_size=16, block_out_channels=(32, 64),
                     layers_per_block=1)
TINY_LCM = TINY.__class__(**{**TINY.__dict__, "time_cond_proj_dim": 16})
TINY_IF = TINY.__class__(**{**TINY.__dict__, "in_channels": 3,
                            "out_channels": 6})


def _subspace_close(vT_a, vT_b, atol=1e-3):
    a, b = np.asarray(vT_a, np.float64), np.asarray(vT_b, np.float64)
    overlap = np.linalg.svd(a @ b.T, compute_uv=False)
    np.testing.assert_allclose(overlap, 1.0, atol=atol)


def _sd_mask():
    mask = np.zeros((1, 16, 16, 3), bool)
    mask[:, :8, :8] = True
    return mask


# -- SD ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def sd_make(tmp_path_factory):
    unet, dec, enc = SDUNet(TINY), VAEDecoder(TINY_VAE), VAEEncoder(TINY_VAE)
    z = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, TINY.cross_attention_dim))
    pu = jax.jit(unet.init)(jax.random.key(0), z, 500.0, ctx)
    pu = jax.tree.map(lambda p: p + 0.01, pu)
    pd = jax.jit(dec.init)(jax.random.key(1), z)
    pe = jax.jit(enc.init)(jax.random.key(2), jnp.zeros((1, 16, 16, 3)))

    def make(**overrides):
        cfg = SDEditConfig(
            for_steps=8, inv_steps=8, edit_t=0.7, guidance_scale=5.0,
            pca_rank=2, pca_rank_null=2, min_iter=1, max_iter=2,
            convergence_threshold=0.0, x_space_guidance_num_step=2,
            vis_num=1, vis_num_pc=2, save_images=False,
            result_folder=str(tmp_path_factory.mktemp("sd")), **overrides)
        return SDEditPipeline(
            unet_apply=lambda zz, t, c: unet.apply(pu, zz, t, c),
            decode=lambda zz: dec.apply(pd, zz),
            encode=lambda x, key: encode_sample(*enc.apply(pe, x), key),
            prompt_encoder=fake_prompt_encoder(TINY.cross_attention_dim,
                                               seq=7),
            cfg=cfg, rng=seed_everything(3), latent_shape=(8, 8, 4))

    return make


def test_sd_dual_basis_matches_solo(sd_make):
    pipe = sd_make(null_space_projection=True)
    prompts = pipe.prompt_set("a cat", "")
    zt = jax.random.normal(jax.random.key(5), (1, 8, 8, 4))
    mask = _sd_mask()
    b_mod = pipe.extract_basis(zt, prompts, "null+(for-null)", mask, 2)
    b_nul = pipe.extract_basis(zt, prompts, "null+(for-null)", ~mask, 2)
    d_mod, d_nul = pipe.extract_dual_basis(zt, prompts, "null+(for-null)",
                                           mask, 2, 2)
    _subspace_close(d_mod.vT, b_mod.vT)
    _subspace_close(d_nul.vT, b_nul.vT)
    np.testing.assert_allclose(np.asarray(d_mod.s), np.asarray(b_mod.s),
                               rtol=1e-4)


def test_sd_unsup_fused_path_and_vt_transfer(sd_make, monkeypatch):
    """The unsupervised masked edit takes the fused dual path; a second run
    with --vT_path reuses the saved directions without ANY basis program."""
    pipe = sd_make(null_space_projection=True)
    mask = _sd_mask()
    called = {"dual": 0}
    orig = pipe.extract_dual_basis

    def spy(*a, **k):
        called["dual"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pipe, "extract_dual_basis", spy)
    out = pipe.run_edit_null_space_projection_zt(
        "a cat", "", mask=mask, sample_name="s0", semantic=False)
    assert called["dual"] == 1   # fused, not two solos
    vt_path = os.path.join(out["out_dir"], "basis", "vT.npz")
    assert os.path.exists(vt_path)

    def boom(*a, **k):
        raise AssertionError("basis recomputed despite vT_path")

    monkeypatch.setattr(pipe, "extract_basis", boom)
    monkeypatch.setattr(pipe, "extract_dual_basis", boom)
    out2 = pipe.run_edit_null_space_projection_zt(
        "a cat", "", mask=mask, sample_name="s0-transfer", vT_path=vt_path)
    np.testing.assert_allclose(out2["vT"], out["vT"], rtol=1e-6)
    for pc in out["strips"]:
        np.testing.assert_allclose(out2["strips"][pc], out["strips"][pc],
                                   atol=1e-5)


def test_sd_pixel_output_uint8(sd_make):
    from loco_edit_tpu.utils.io import to_uint8

    pipe = sd_make(null_space_projection=False, pixel_output=True)
    out = pipe.run_edit_null_space_projection_zt(
        "a cat", "", sample_name="px", semantic=False)
    for s in out["strips"].values():
        assert s.dtype == np.uint8 and s.shape[1:] == (16, 16, 3)
    pipe_f = sd_make(null_space_projection=False, pixel_output=False)
    out_f = pipe_f.run_edit_null_space_projection_zt(
        "a cat", "", sample_name="pxf", semantic=False)
    for pc in out["strips"]:
        # on-device conversion == host to_uint8 of the float strips
        np.testing.assert_array_equal(out["strips"][pc],
                                      to_uint8(out_f["strips"][pc]))


def test_sd_batch_matches_solo_runs(sd_make):
    """run_edit_batch == N independent runs. Tolerances allow XLA's batch-2
    vs batch-1 conv accumulation-order float differences (measured ~6e-5 on
    zt values of magnitude ~8 over the 8 CFG steps); what the test pins is
    the plumbing — sample pairing, per-sample bases, strip split offsets."""
    pipe = sd_make(null_space_projection=True)
    zTs = np.asarray(jax.random.normal(jax.random.key(9), (2, 8, 8, 4)))
    masks = np.broadcast_to(_sd_mask(), (2, 16, 16, 3))
    res = pipe.run_edit_batch("a cat", "", zTs=zTs, masks=masks,
                              sample_names=["b0", "b1"])
    solo = [pipe.run_edit_null_space_projection_zt(
        "a cat", "", zT=zTs[i:i + 1], mask=masks[i:i + 1],
        sample_name=f"solo{i}", semantic=False) for i in range(2)]
    for i in range(2):
        np.testing.assert_allclose(res[i]["zt"], solo[i]["zt"], atol=5e-4)
        # projected vT rows are normalized but NOT orthonormal, so compare
        # element-wise (probe-aligned signs are deterministic), not by
        # cross-Gram subspace overlap
        np.testing.assert_allclose(res[i]["vT"], solo[i]["vT"], atol=5e-3)
        for pc in solo[i]["strips"]:
            np.testing.assert_allclose(res[i]["strips"][pc],
                                       solo[i]["strips"][pc], atol=5e-3)


# -- LCM ----------------------------------------------------------------------

@pytest.fixture(scope="module")
def lcm_make(tmp_path_factory):
    unet, dec = SDUNet(TINY_LCM), VAEDecoder(TINY_VAE)
    z = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, TINY_LCM.cross_attention_dim))
    pu = jax.jit(unet.init)(jax.random.key(0), z, 500.0, ctx, 6.5)
    pu = jax.tree.map(lambda p: p + 0.01, pu)
    pd = jax.jit(dec.init)(jax.random.key(1), z)

    def make(**overrides):
        cfg = LCMEditConfig(
            num_inference_steps=4, edit_t_idx=2, pca_rank=2, pca_rank_null=2,
            min_iter=1, max_iter=2, convergence_threshold=0.0,
            x_space_guidance_num_step=2, vis_num=1, non_semantic=True,
            save_images=False,
            result_folder=str(tmp_path_factory.mktemp("lcm")), **overrides)
        return LCMEditPipeline(
            unet_apply=lambda zz, t, c, w: unet.apply(pu, zz, t, c, w),
            decode=lambda zz: dec.apply(pd, zz),
            prompt_encoder=fake_prompt_encoder(TINY_LCM.cross_attention_dim,
                                               seq=7),
            cfg=cfg, rng=seed_everything(4), latent_shape=(8, 8, 4))

    return make


def test_lcm_dual_basis_matches_solo(lcm_make):
    pipe = lcm_make(null_space_projection=True)
    zt = jax.random.normal(jax.random.key(6), (1, 8, 8, 4))
    mask = _sd_mask()
    b_mod = pipe.extract_basis(zt, "a man", mask, 2)
    b_nul = pipe.extract_basis(zt, "a man", ~mask, 2)
    d_mod, d_nul = pipe.extract_dual_basis(zt, "a man", mask, 2, 2)
    _subspace_close(d_mod.vT, b_mod.vT)
    _subspace_close(d_nul.vT, b_nul.vT)


def test_lcm_vt_transfer(lcm_make, monkeypatch):
    pipe = lcm_make(null_space_projection=True)
    # pin the (by-design fresh-per-call) inter-step noise so two runs of the
    # completion sampler are comparable
    pipe.noise_fn = lambda step, shape, dtype: jnp.zeros(shape, dtype)
    mask = _sd_mask()
    out = pipe.run_edit_null_space_projection_zt(
        "a man", "", mask=mask, sample_name="s0")
    vt_path = os.path.join(out["out_dir"], "basis", "vT.npz")

    def boom(*a, **k):
        raise AssertionError("basis recomputed despite vT_path")

    monkeypatch.setattr(pipe, "extract_basis", boom)
    monkeypatch.setattr(pipe, "extract_dual_basis", boom)
    out2 = pipe.run_edit_null_space_projection_zt(
        "a man", "", mask=mask, sample_name="s0t", vT_path=vt_path)
    np.testing.assert_allclose(out2["image"], out["image"], atol=1e-5)


def test_lcm_batch_matches_solo(lcm_make):
    pipe = lcm_make(null_space_projection=False)
    # pin the fresh-per-call inter-step noise (see test_lcm_vt_transfer)
    pipe.noise_fn = lambda step, shape, dtype: jnp.zeros(shape, dtype)
    zTs = np.asarray(jax.random.normal(jax.random.key(10), (2, 8, 8, 4)))
    res = pipe.run_edit_batch("a man", "", zTs=zTs,
                              sample_names=["b0", "b1"])
    solo = [pipe.run_edit_null_space_projection_zt(
        "a man", "", zT=zTs[i:i + 1], sample_name=f"s{i}")
        for i in range(2)]
    for i in range(2):
        np.testing.assert_allclose(res[i]["image"], solo[i]["image"],
                                   atol=5e-3)


# -- IF -----------------------------------------------------------------------

@pytest.fixture(scope="module")
def if_make(tmp_path_factory):
    unet = SDUNet(TINY_IF)
    x = jnp.zeros((1, 8, 8, 3))
    ctx = jnp.zeros((1, 7, TINY_IF.cross_attention_dim))
    pu = jax.jit(unet.init)(jax.random.key(0), x, 500.0, ctx)
    pu = jax.tree.map(lambda p: p + 0.01, pu)

    def make(**overrides):
        cfg = IFEditConfig(
            for_steps=8, edit_t=0.7, pca_rank=2, pca_rank_null=2,
            min_iter=1, max_iter=2, convergence_threshold=0.0,
            x_space_guidance_num_step=2, vis_num=1, save_images=False,
            result_folder=str(tmp_path_factory.mktemp("if")), **overrides)
        return IFEditPipeline(
            unet_apply=lambda xx, t, c: unet.apply(pu, xx, t, c),
            prompt_encoder=fake_prompt_encoder(TINY_IF.cross_attention_dim,
                                               seq=7),
            cfg=cfg, rng=seed_everything(5), sample_shape=(8, 8, 3))

    return make


def _if_mask():
    mask = np.zeros((1, 8, 8, 3), bool)
    mask[:, :4, :4] = True
    return mask


def test_if_dual_basis_matches_solo(if_make):
    pipe = if_make(null_space_projection=True)
    xt = jax.random.normal(jax.random.key(7), (1, 8, 8, 3))
    mask = _if_mask()
    prompts = pipe.prompt_set("a cat", "")
    b_mod = pipe.extract_basis(xt, prompts, "null+(for-null)", mask, 2)
    b_nul = pipe.extract_basis(xt, prompts, "null+(for-null)", ~mask, 2)
    d_mod, d_nul = pipe.extract_dual_basis(xt, prompts, "null+(for-null)",
                                           mask, 2, 2)
    _subspace_close(d_mod.vT, b_mod.vT)
    _subspace_close(d_nul.vT, b_nul.vT)


def test_if_vt_transfer(if_make, monkeypatch):
    pipe = if_make(null_space_projection=True)
    mask = _if_mask()
    out = pipe.run_edit_null_space_projection_xt(
        "a cat", "", mask=mask, sample_name="s0", semantic=False)
    vt_path = os.path.join(out["out_dir"], "basis", "vT.npz")

    def boom(*a, **k):
        raise AssertionError("basis recomputed despite vT_path")

    monkeypatch.setattr(pipe, "extract_basis", boom)
    monkeypatch.setattr(pipe, "extract_dual_basis", boom)
    out2 = pipe.run_edit_null_space_projection_xt(
        "a cat", "", mask=mask, sample_name="s0t", semantic=False,
        vT_path=vt_path)
    np.testing.assert_allclose(out2["image"], out["image"], atol=1e-5)


def test_auto_probe_chunk_defaults(monkeypatch):
    """bf16 TPU default rises to a 16-probe chunk under the lean attention
    JVP (measured 1.10x on the fused dual, scripts/bench_sd_probe_chunk.py);
    LOCO_ATTN_JVP=ad restores the plain-autodiff 8-probe HBM cap."""
    from loco_edit_tpu.pipelines import sd

    monkeypatch.setattr(sd.jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("LOCO_ATTN_JVP", raising=False)
    assert sd._auto_probe_chunk(None, "bf16") == 16
    assert sd._auto_probe_chunk(None, "fp16") == 16
    assert sd._auto_probe_chunk(None, "fp32") == 2
    assert sd._auto_probe_chunk(4, "bf16") == 4
    monkeypatch.setenv("LOCO_ATTN_JVP", "ad")
    assert sd._auto_probe_chunk(None, "bf16") == 8
    monkeypatch.setattr(sd.jax, "default_backend", lambda: "cpu")
    monkeypatch.delenv("LOCO_ATTN_JVP", raising=False)
    assert sd._auto_probe_chunk(None, "bf16") is None
