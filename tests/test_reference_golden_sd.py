"""Whole-pipeline cross-implementation golden for the SD (z-space T-LOCO)
engine: the reference `EditStableDiffusion` (src/modules/edit.py:483-1194) is
executed END TO END on CPU — real class, real methods, real free-function
scheduler (utils.py:146-214) — against `SDEditPipeline`, with BOTH sides
driving one shared tiny conditional denoiser + VAE (torch and JAX twins of
the same weights, parity pinned by its own test below).

What this pins that the per-component goldens cannot (the composition):

  1. the scaled_linear timestep grid + CFG denoising loop
     (DDIMforwardsteps, edit.py:676-754) from zT to z0 and to edit_t
  2. the PMP *through the VAE decoder* incl. the 1/0.18215 rescale
     (get_x0, edit.py:757-781)
  3. the masked Jacobian subspace iteration at z_t with matched probes
     (local_encoder_decoder_pullback_zt, edit.py:830-915)
  4. the text-supervised prompt-delta direction
     (get_delta_zt_via_grad, edit.py:783-828)
  5. the full run_edit_null_space_projection_zt composition through the
     cached-basis branch (edit.py:966-999): null projection -> normalize ->
     x-space-guidance walk -> mirrored strip -> completion denoise
  6. DDIM inversion through the VAE encoder (run_DDIMinversion,
     edit.py:567-633)

The real diffusers UNet/VAE are absent offline; their *numerics* are covered
by the component goldens (tests/test_sd_golden.py). Here the oracle value is
the reference's orchestration code itself, imported from /root/reference and
run unmodified (engine constructed attribute-by-attribute, bypassing the
HF-downloading __init__)."""

import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from _ref_stubs import install_reference_path  # noqa: E402

install_reference_path()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from loco_edit_tpu.core.rng import seed_everything  # noqa: E402
from loco_edit_tpu.diffusion import LinspaceDDIM  # noqa: E402
from loco_edit_tpu.editing import mask_cache_tag, save_directions, subspace_iteration  # noqa: E402
from loco_edit_tpu.pipelines.sd import SDEditConfig, SDEditPipeline  # noqa: E402

C = 8          # twin-net width
CTX = 8        # prompt-embedding dim
LAT = 64       # the reference hardcodes zT = randn(1, 4, 64, 64) (edit.py:968)
IMG = 2 * LAT  # tiny "VAE" upsamples x2
FOR_STEPS = 6
EDIT_T = 0.6
GS = 3.0       # guidance_scale > 1 -> CFG on, doubled batches
GS_EDIT = 2.0
SCALE = 0.3
NUM_STEP = 4
VIS_NUM = 2
RANK, RANK_NULL = 3, 2

_ns = types.SimpleNamespace


def _np(p):
    return np.asarray(p.detach())


def _hwio(w):
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _nchw_to_nhwc(a):
    return np.asarray(a).transpose(0, 2, 3, 1)


def _flat_chw_to_hwc(v, c, h, w):
    return np.asarray(v).reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(
        -1, c * h * w)


class _TorchUNet(torch.nn.Module):
    """Tiny conditional eps-net: conv -> (+ t/ctx embedding) -> silu -> conv
    -> silu -> conv. Exactly twinned in JAX below; diffusers-free stand-in
    for pipe.unet so the reference engine's own loops can run offline."""

    def __init__(self, gen):
        super().__init__()

        def P(*s, scale=0.2):
            return torch.nn.Parameter(torch.randn(*s, generator=gen) * scale)

        self.w1, self.b1 = P(C, 4, 3, 3), P(C, scale=0.05)
        self.w2, self.b2 = P(C, C, 3, 3), P(C, scale=0.05)
        self.w3, self.b3 = P(4, C, 3, 3), P(4, scale=0.05)
        self.wt, self.bt = P(C, 1), P(C, scale=0.05)
        self.wc, self.bc = P(C, CTX), P(C, scale=0.05)

    def forward(self, z, t, encoder_hidden_states=None):
        tt = torch.as_tensor(t, dtype=z.dtype).reshape(1, 1) / 1000.0
        temb = F.silu(tt @ self.wt.T + self.bt)
        cemb = F.silu(encoder_hidden_states.mean(dim=1) @ self.wc.T + self.bc)
        h = F.conv2d(z, self.w1, self.b1, padding=1)
        h = F.silu(h + (temb + cemb)[:, :, None, None])
        h = F.silu(F.conv2d(h, self.w2, self.b2, padding=1))
        return _ns(sample=F.conv2d(h, self.w3, self.b3, padding=1))


class _TorchVAE(torch.nn.Module):
    """decode: repeat-x2 upsample -> conv -> silu -> conv (4->3ch);
    encode: stride-2 conv (3->4ch), deterministic latent_dist.sample()."""

    def __init__(self, gen):
        super().__init__()

        def P(*s, scale=0.2):
            return torch.nn.Parameter(torch.randn(*s, generator=gen) * scale)

        self.wd1, self.bd1 = P(8, 4, 3, 3), P(8, scale=0.05)
        self.wd2, self.bd2 = P(3, 8, 3, 3), P(3, scale=0.05)
        self.we, self.be = P(4, 3, 3, 3), P(4, scale=0.05)

    def decode(self, z):
        h = z.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)
        h = F.silu(F.conv2d(h, self.wd1, self.bd1, padding=1))
        return _ns(sample=F.conv2d(h, self.wd2, self.bd2, padding=1))

    def encode(self, x):
        z = F.conv2d(x, self.we, self.be, stride=2, padding=1)
        return _ns(latent_dist=_ns(sample=lambda: z))


def _jconv(x, w, b, stride=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _jax_twins(tu, tv):
    w1, w2, w3 = _hwio(tu.w1), _hwio(tu.w2), _hwio(tu.w3)
    b1, b2, b3 = map(lambda p: jnp.asarray(_np(p)), (tu.b1, tu.b2, tu.b3))
    wt, bt = jnp.asarray(_np(tu.wt)), jnp.asarray(_np(tu.bt))
    wc, bc = jnp.asarray(_np(tu.wc)), jnp.asarray(_np(tu.bc))
    wd1, wd2, we = _hwio(tv.wd1), _hwio(tv.wd2), _hwio(tv.we)
    bd1, bd2, be = map(lambda p: jnp.asarray(_np(p)), (tv.bd1, tv.bd2, tv.be))

    def unet_apply(z, t, ctx):
        tt = jnp.reshape(jnp.asarray(t, z.dtype), (1, 1)) / 1000.0
        temb = jax.nn.silu(tt @ wt.T + bt)
        cemb = jax.nn.silu(jnp.mean(ctx, axis=1) @ wc.T + bc)
        h = _jconv(z, w1, b1)
        h = jax.nn.silu(h + (temb + cemb)[:, None, None, :])
        h = jax.nn.silu(_jconv(h, w2, b2))
        return _jconv(h, w3, b3)

    def decode(z):
        h = jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)
        h = jax.nn.silu(_jconv(h, wd1, bd1))
        return _jconv(h, wd2, bd2)

    def encode(x, key=None):
        return _jconv(x, we, be, stride=2) * 0.18215

    return unet_apply, decode, encode


def _sd_tables():
    betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                           dtype=torch.float32) ** 2
    return betas, torch.cumprod(1.0 - betas, dim=0)


@pytest.fixture(scope="module")
def shared(tmp_path_factory):
    try:
        from modules.edit import EditStableDiffusion  # noqa: F401
        from utils import utils as ref_utils  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    gen = torch.Generator().manual_seed(21)
    tu, tv = _TorchUNet(gen), _TorchVAE(gen)
    tu.eval(), tv.eval()
    unet_apply, decode, encode = _jax_twins(tu, tv)

    rng = np.random.default_rng(33)
    embs = {name: (rng.normal(size=(1, 77, CTX)) * 0.3).astype(np.float32)
            for name in ("a photo of a cat", "a smiling cat", "")}
    zT = (rng.normal(size=(1, 4, LAT, LAT)) * 1.0).astype(np.float32)
    mask = np.zeros((1, 1, IMG, IMG), bool)
    mask[..., 40:90, 30:100] = True
    x0_img = (rng.normal(size=(1, 3, IMG, IMG)) * 0.4).astype(np.float32)

    return _ns(tu=tu, tv=tv, unet_apply=unet_apply, decode=decode,
               encode=encode, embs=embs, zT=zT, mask=mask, x0_img=x0_img)


def _make_ref_engine(shared, folder):
    from modules.edit import EditStableDiffusion
    from utils import utils as ref_utils

    os.makedirs(folder, exist_ok=True)
    betas, abar = _sd_tables()
    sch = _ns(t_max=999, betas=betas, alphas_cumprod=abar)
    sch.set_timesteps = types.MethodType(ref_utils.set_timesteps, sch)
    sch.step = types.MethodType(ref_utils.step, sch)
    sch.scale_model_input = lambda x, t: x

    eng = object.__new__(EditStableDiffusion)
    eng.seed = 0
    eng.pca_device = torch.device("cpu")
    eng.buffer_device = torch.device("cpu")
    eng.memory_bound = 2   # CFG halves it to 1 -> per-sample chunks
    eng.result_folder = str(folder)
    eng.obs_folder = str(folder)
    eng.vae = shared.tv
    eng.unet = shared.tu
    eng.sam = None
    eng.dtype = torch.float32
    eng.device = torch.device("cpu")
    eng.scheduler = sch
    eng.for_steps = FOR_STEPS
    eng.inv_steps = FOR_STEPS
    eng.use_yh_custom_scheduler = True
    eng.c_in = 4
    eng.image_size = IMG
    eng.dataset = [torch.from_numpy(shared.x0_img)]
    eng.dataset_name = "Random"
    eng.for_prompt = "a photo of a cat"
    eng.neg_prompt = ""
    eng.null_prompt = ""
    eng.inv_prompt = ""
    eng.for_prompt_emb = torch.from_numpy(shared.embs["a photo of a cat"])
    eng.neg_prompt_emb = torch.from_numpy(shared.embs[""])
    eng.null_prompt_emb = torch.from_numpy(shared.embs[""])
    eng.inv_prompt_emb = torch.from_numpy(shared.embs[""])
    eng.guidance_scale = GS
    eng.guidance_scale_edit = GS_EDIT
    eng.edit_prompt = "a smiling cat"
    eng.edit_prompt_emb = torch.from_numpy(shared.embs["a smiling cat"])
    eng.x_edit_step_size = 1.0
    eng.x_space_guidance_edit_step = 1.0
    eng.x_space_guidance_scale = SCALE
    eng.x_space_guidance_num_step = NUM_STEP
    eng.x_space_guidance_use_edit_prompt = False
    eng.scheduler.set_timesteps(FOR_STEPS)
    eng.edit_t = EDIT_T
    eng.edit_t_idx = int((eng.scheduler.timesteps - EDIT_T * 1000).abs().argmin())
    eng.sampling_mode = False
    eng.use_sega = False
    eng.tilda_v_score_type = "null+(for-null)+(edit-null)"
    eng.EXP_NAME = "golden"
    return eng


def _make_ours(shared, folder, **over):
    cfg = SDEditConfig(
        for_steps=FOR_STEPS, inv_steps=FOR_STEPS, edit_t=EDIT_T,
        guidance_scale=GS, guidance_scale_edit=GS_EDIT,
        x_space_guidance_scale=SCALE, x_space_guidance_edit_step=1.0,
        x_space_guidance_num_step=NUM_STEP, vis_num=VIS_NUM, vis_num_pc=1,
        pca_rank=RANK, pca_rank_null=RANK_NULL, null_space_projection=True,
        probe_chunk=None, memory_bound=0, result_folder=str(folder),
        save_images=False, **over)
    enc = lambda p: jnp.asarray(shared.embs[p])  # noqa: E731
    return SDEditPipeline(shared.unet_apply, shared.decode, shared.encode,
                          enc, cfg, seed_everything(7),
                          latent_shape=(LAT, LAT, 4))


def _prompts(pipe):
    return pipe.prompt_set("a photo of a cat", "a smiling cat")


def test_twin_denoiser_and_vae_parity(shared):
    """The shared tiny denoiser's torch and JAX forms agree pointwise —
    the precondition for every cross-implementation test below."""
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 4, LAT, LAT)).astype(np.float32)
    ctx = rng.normal(size=(2, 77, CTX)).astype(np.float32)
    with torch.no_grad():
        e_t = shared.tu(torch.from_numpy(z), torch.tensor(432.1),
                        encoder_hidden_states=torch.from_numpy(ctx)).sample
        d_t = shared.tv.decode(torch.from_numpy(z)).sample
        enc_t = shared.tv.encode(torch.from_numpy(
            np.asarray(rng.normal(size=(1, 3, IMG, IMG)), np.float32)))
    e_j = shared.unet_apply(jnp.asarray(_nchw_to_nhwc(z)), 432.1,
                            jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(e_j), _nchw_to_nhwc(e_t.numpy()),
                               atol=1e-5)
    d_j = shared.decode(jnp.asarray(_nchw_to_nhwc(z)))
    np.testing.assert_allclose(np.asarray(d_j), _nchw_to_nhwc(d_t.numpy()),
                               atol=1e-5)
    assert enc_t.latent_dist.sample().shape == (1, 4, LAT, LAT)


def test_cfg_forward_full_and_to_edit_t(shared, tmp_path):
    eng = _make_ref_engine(shared, tmp_path / "ref")
    zT_t = torch.from_numpy(shared.zT)
    with torch.no_grad():
        z0_ref, _x0img = eng.DDIMforwardsteps(
            zT_t.clone(), t_start_idx=0, t_end_idx=-1,
            for_prompt_emb=eng.for_prompt_emb, edit_prompt_emb=eng.edit_prompt_emb,
            null_prompt_emb=eng.null_prompt_emb, mode="null+(for-null)")
        zt_ref, t_ref, t_idx = eng.DDIMforwardsteps(
            zT_t.clone(), t_start_idx=0, t_end_idx=eng.edit_t_idx,
            for_prompt_emb=eng.for_prompt_emb, edit_prompt_emb=eng.edit_prompt_emb,
            null_prompt_emb=eng.null_prompt_emb, mode="null+(for-null)")

    pipe = _make_ours(shared, tmp_path / "ours")
    assert pipe.edit_t_idx == eng.edit_t_idx
    prompts = _prompts(pipe)
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    z0 = np.asarray(pipe.generate(zT_j, prompts, "null+(for-null)", 0, None))
    # reference quirk: the full forward rescales latents by 1/0.18215 IN
    # PLACE before the VAE decode and returns the scaled tensor
    # (edit.py:749-754) — undo it to compare actual z0 latents
    np.testing.assert_allclose(z0, _nchw_to_nhwc(z0_ref.numpy()) * 0.18215,
                               atol=2e-3)
    zt = np.asarray(pipe.generate(zT_j, prompts, "null+(for-null)", 0,
                                  pipe.edit_t_idx))
    np.testing.assert_allclose(zt, _nchw_to_nhwc(zt_ref.numpy()), atol=2e-3)
    assert float(t_ref) == float(pipe.gen_grid.t[pipe.edit_t_idx])


def test_pmp_through_decoder_pointwise(shared, tmp_path):
    """get_x0 (edit.py:757-781): CFG eps -> PMP -> 1/0.18215 -> vae.decode."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt = pipe.generate(zT_j, prompts, "null+(for-null)", 0, pipe.edit_t_idx)
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]
    zt_t = torch.from_numpy(np.asarray(zt).transpose(0, 3, 1, 2)).contiguous()
    with torch.no_grad():
        x0_ref = eng.get_x0(zt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb,
                            eng.edit_prompt_emb, eng.null_prompt_emb,
                            mask=None, mode="null+(for-null)")
    f = pipe.pmp_through_decoder(prompts, "null+(for-null)")
    # the amplifying tiny net puts |x0| in the hundreds: rtol carries the
    # comparison (observed cross-impl fp drift ~1e-6 relative)
    np.testing.assert_allclose(np.asarray(f(zt)),
                               _nchw_to_nhwc(x0_ref.numpy()),
                               rtol=2e-5, atol=2e-3)


def test_basis_subspace_matched_probes(shared, tmp_path):
    """Masked z-space subspace iteration with identical starting probes and a
    fixed iteration budget (local_encoder_decoder_pullback_zt,
    edit.py:830-915, vs subspace_iteration with v_init)."""
    iters = 4
    d = 4 * LAT * LAT
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt = pipe.generate(zT_j, prompts, "null+(for-null)", 0, pipe.edit_t_idx)
    zt_t = torch.from_numpy(np.asarray(zt).transpose(0, 3, 1, 2)).contiguous()
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    g0 = torch.randn(d, RANK, generator=torch.Generator().manual_seed(4))
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (d, RANK):
            return g0.clone()
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        u_ref, s_ref, vT_ref = eng.local_encoder_decoder_pullback_zt(
            zt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb,
            eng.edit_prompt_emb, eng.null_prompt_emb, op="mid", block_idx=0,
            pca_rank=RANK, chunk_size=25, min_iter=iters, max_iter=iters,
            convergence_threshold=0.0, mask=mask_t, mode="null+(for-null)")
    finally:
        torch.randn = orig_randn

    q, _ = torch.linalg.qr(g0)
    v_init = jnp.asarray(_flat_chw_to_hwc(q.T.numpy(), 4, LAT, LAT))
    f = pipe.pmp_through_decoder(prompts, "null+(for-null)")
    mask_j = jnp.asarray(
        np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                        (1, IMG, IMG, 3)).astype(np.float32))
    basis = subspace_iteration(
        f, jnp.asarray(zt), jax.random.key(0), rank=RANK, mask=mask_j,
        min_iter=iters, max_iter=iters, tol=0.0, pad_probes=False,
        v_init=v_init)
    v_ours = np.asarray(basis.vT)
    v_ref = _flat_chw_to_hwc(vT_ref.numpy(), 4, LAT, LAT)
    overlap = np.linalg.svd(v_ours @ v_ref.T, compute_uv=False)
    np.testing.assert_allclose(overlap, 1.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(basis.s), s_ref.numpy(), rtol=3e-3)


def test_semantic_prompt_delta_direction(shared, tmp_path):
    """get_delta_zt_via_grad (edit.py:783-828): masked <delta_x0, PMP(z)> VJP
    under the 3-prompt CFG mode, rows normalized."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt = pipe.generate(zT_j, prompts, "null+(for-null)", 0, pipe.edit_t_idx)
    zt_t = torch.from_numpy(np.asarray(zt).transpose(0, 3, 1, 2)).contiguous()
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    v_ref = eng.get_delta_zt_via_grad(
        zt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb, eng.edit_prompt_emb,
        eng.null_prompt_emb, mask=mask_t, mode="null+(for-null)+(edit-null)")

    mask_j = np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                             (1, IMG, IMG, 3)).astype(np.float32)
    v_ours = np.asarray(pipe.delta_zt_via_grad(
        jnp.asarray(zt), prompts, mask_j, "null+(for-null)+(edit-null)"))
    v_ref_hwc = _flat_chw_to_hwc(v_ref.detach().numpy(), 4, LAT, LAT)
    # normalized rows: compare up to fp via cosine, then pointwise
    cos = float(np.sum(v_ours * v_ref_hwc))
    assert cos > 1 - 1e-5
    np.testing.assert_allclose(v_ours, v_ref_hwc, atol=2e-4)


def test_full_edit_strip_parity_cached_basis(shared, tmp_path):
    """run_edit_null_space_projection_zt end to end through the cached-basis
    branch (edit.py:966-999): both sides load the SAME vT-modify / vT-null
    rows, then null-project, normalize, walk, assemble the mirrored strip and
    complete the denoise — final latents must match."""
    rng = np.random.default_rng(17)
    d = 4 * LAT * LAT
    vT_modify = rng.normal(size=(RANK, d)).astype(np.float32)
    vT_null = rng.normal(size=(RANK_NULL, d)).astype(np.float32)

    # reference cache layout (edit.py:959-975)
    ref_dir = tmp_path / "ref"
    save_dir = ref_dir / "basis" / (
        f"local_basis-{EDIT_T}T-pca-rank-{RANK}-select-mask0")
    os.makedirs(save_dir, exist_ok=True)
    torch.save(torch.zeros(4, RANK), save_dir / "u-modify.pt")
    torch.save(torch.from_numpy(vT_modify), save_dir / "vT-modify.pt")
    torch.save(torch.zeros(4, RANK_NULL),
               save_dir / f"u-null-null_space_rank_{RANK_NULL}.pt")
    torch.save(torch.from_numpy(vT_null),
               save_dir / f"vT-null-null_space_rank_{RANK_NULL}.pt")
    # mask + original.png so the engine takes the load-mask branch
    os.makedirs(ref_dir / "mask", exist_ok=True)
    torch.save(torch.from_numpy(shared.mask), ref_dir / "mask" / "mask.pt")
    (ref_dir / "original.png").touch()

    eng = _make_ref_engine(shared, ref_dir)
    captured = {}
    orig_fwd = eng.DDIMforwardsteps

    def _fwd(zt, t_start_idx, t_end_idx, **kw):
        out = orig_fwd(zt, t_start_idx=t_start_idx, t_end_idx=t_end_idx, **kw)
        if t_end_idx == -1 and zt.size(0) > 1:
            captured["strip"] = out[0].clone()
        return out

    eng.DDIMforwardsteps = _fwd
    zT_fixed = torch.from_numpy(shared.zT)
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (1, 4, LAT, LAT):
            return zT_fixed.clone()
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        with torch.no_grad():
            eng.run_edit_null_space_projection_zt(
                op="mid", block_idx=0, vis_num=VIS_NUM, mask_index=0,
                vis_num_pc=1, pca_rank=RANK, null_space_projection=True,
                pca_rank_null=RANK_NULL)
    finally:
        torch.randn = orig_randn
    assert "strip" in captured

    # our cache layout (pipelines/sd.py run_edit_null_space_projection_zt)
    ours_dir = tmp_path / "ours"
    out_dir = ours_dir / "golden"
    mask_j = np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                             (1, IMG, IMG, 3)).astype(bool)
    tag = mask_cache_tag(mask_j)
    save_directions(str(out_dir / "basis" /
                        f"vT-modify-{EDIT_T}T-rank{RANK}-{tag}.npz"),
                    _flat_chw_to_hwc(vT_modify, 4, LAT, LAT), edit_t=EDIT_T)
    save_directions(str(out_dir / "basis" /
                        f"vT-null-{EDIT_T}T-rank{RANK_NULL}-{tag}.npz"),
                    _flat_chw_to_hwc(vT_null, 4, LAT, LAT), edit_t=EDIT_T)

    pipe = _make_ours(shared, ours_dir)
    out = pipe.run_edit_null_space_projection_zt(
        "a photo of a cat", "a smiling cat",
        zT=jnp.asarray(_nchw_to_nhwc(shared.zT)), mask=mask_j,
        sample_name="golden")

    # the captured latents carry the reference full-forward's in-place
    # 1/0.18215 pre-decode rescale (edit.py:749-754) — undo to compare z0
    strip_ref = _nchw_to_nhwc(captured["strip"].numpy()) * 0.18215
    strip_ours = out["z0_strips"][0]
    assert strip_ours.shape == strip_ref.shape
    np.testing.assert_allclose(strip_ours, strip_ref, rtol=2e-5, atol=3e-3)


def test_ddim_inversion_through_vae_encoder(shared, tmp_path):
    """run_DDIMinversion (edit.py:567-633): encode -> 0.18215 scale ->
    ascending no-CFG DDIM under the inv prompt."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    with torch.no_grad():
        zT_ref = eng.run_DDIMinversion(idx=0).numpy()
    pipe = _make_ours(shared, tmp_path / "ours")
    zT = np.asarray(pipe.invert(jnp.asarray(_nchw_to_nhwc(shared.x0_img)),
                                inv_prompt=""))
    np.testing.assert_allclose(zT, _nchw_to_nhwc(zT_ref), atol=2e-3)
