"""Whole-pipeline cross-implementation golden for the LCM (few-step z-space
T-LOCO) engine: the reference `EditLatentConsistency`
(src/modules/edit.py:42-479) executed END TO END on CPU against
`LCMEditPipeline`, both driving one shared tiny guidance-embedding-conditioned
denoiser + VAE (torch/JAX twins of the same weights).

The reference runs LCM with `use_yh_custom_scheduler=False`
(scripts/main_T2I_LCM_null_space_projection.sh) — i.e. the diffusers
LCMScheduler. diffusers is absent offline, so the engine gets a stand-in
scheduler transcribed from the PUBLISHED LCMScheduler formulas (scaled_linear
tables, origin-grid timesteps, c_skip/c_out boundary scalings, re-noise
between steps); the oracle value of these tests is the reference ENGINE's
composition code itself (loops, step unpacking, walk/strip assembly, prompt
handling), which runs unmodified from /root/reference. The stochastic
consistency sampler is compared pointwise by injecting the SAME inter-step
noise on both sides (keyed by (step_idx, batch) so call order is irrelevant):
the stand-in scheduler draws from it, and `lcm_scan`'s noise_fn hook does.

What this pins that the component tests cannot:

  1. LCMforwardsteps loop semantics (edit.py:148-203): t_end_idx bounds,
     per-step (latents, denoised) unpacking, final-step denoised return
  2. get_x0 = second step output through the VAE decoder (edit.py:206-247)
  3. the prompt-delta direction (get_delta_zt_via_grad, edit.py:251-280)
  4. matched-probe masked subspace iteration on the consistency output
     (local_encoder_decoder_pullback_zt, edit.py:283-370)
  5. run_edit_null_space_projection_zt end to end on the semantic path
     (edit.py:374-470): forward-to-edit_t (with re-noise), delta direction,
     normalize, x-space-guidance walk both directions, vis_num subsample,
     mirrored strip, completion denoise with re-noise — final denoised batch
     pointwise. (The null-projection algebra + cached-basis composition is
     pinned by the SD engine golden, which shares the editing module.)
"""

import math
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
from loco_edit_tpu.diffusion.lcm import lcm_grid  # noqa: E402
from loco_edit_tpu.editing import subspace_iteration  # noqa: E402
from loco_edit_tpu.pipelines.lcm import LCMEditConfig, LCMEditPipeline  # noqa: E402

C = 8          # twin-net width
CTX = 8        # prompt-embedding dim
WDIM = 8       # guidance-embedding dim (unet.config.time_cond_proj_dim)
LAT = 64       # the reference hardcodes zT = randn(1, 4, 64, 64) (edit.py:395)
IMG = 2 * LAT
N_STEPS = 4
EDIT_T_IDX = 2
# w = GS - 1 feeds the guidance embedding (edit.py:118-121). Kept SMALL so
# the sin/cos arguments (w*1000*freq, freq up to 1) stay in [0, 2]: at the
# production w=6.5 the f32 argument reduction of sin(6500) differs between
# torch libm and XLA by ~1e-4, which the amplifying twin net turns into
# O(1e-3) trajectory noise — a tolerance artifact, not a parity signal.
GS = 1.002
SCALE = 0.4
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


def _noise_nchw(step_idx, shape):
    """Shared deterministic inter-step noise, keyed by (step_idx, batch) so
    the two implementations may draw in any call order."""
    r = np.random.default_rng(7000 + 31 * step_idx + shape[0])
    return r.normal(size=shape).astype(np.float32)


def _w_embedding_np(w, dim):
    """diffusers get_guidance_scale_embedding: [sin|cos] of w*1000 against
    exp(-log(1e4)/(half-1) * arange(half))."""
    w = np.atleast_1d(np.asarray(w, np.float64)) * 1000.0
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
    args = w[:, None] * freqs[None]
    return np.concatenate([np.sin(args), np.cos(args)], 1).astype(np.float32)


class _StubLCMScheduler:
    """diffusers LCMScheduler stand-in (SimianLuo/LCM_Dreamshaper_v7 config:
    scaled_linear 0.00085->0.012, original_inference_steps=50,
    timestep_scaling=10, sigma_data=0.5, prediction_type epsilon), transcribed
    from the published formulas. Inter-step noise comes from _noise_nchw."""

    def __init__(self):
        betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5, 1000,
                               dtype=torch.float32) ** 2
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        self.config = _ns(prediction_type="epsilon")

    def set_timesteps(self, n, device=None):
        k = 1000 // 50
        origin = torch.arange(1, 51, dtype=torch.int64) * k - 1
        skip = 50 // n
        self.timesteps = origin.flip(0)[::skip][:n]
        self.num_inference_steps = n

    def step(self, model_pred, t, sample, return_dict=True):
        idx = int((self.timesteps == t).nonzero()[0])
        a_t = self.alphas_cumprod[int(t)]
        scaled = 10.0 * float(t)
        c_skip = 0.25 / (scaled ** 2 + 0.25)
        c_out = scaled / (scaled ** 2 + 0.25) ** 0.5
        x0 = (sample - (1.0 - a_t).sqrt() * model_pred) / a_t.sqrt()
        denoised = c_out * x0 + c_skip * sample
        if idx != self.num_inference_steps - 1:
            a_prev = self.alphas_cumprod[int(self.timesteps[idx + 1])]
            noise = torch.from_numpy(
                _noise_nchw(idx, tuple(sample.shape)))
            prev = a_prev.sqrt() * denoised + (1.0 - a_prev).sqrt() * noise
        else:
            prev = denoised
        return (prev, denoised)


class _StubPipe:
    """The diffusers-pipeline surface the engine touches: encode_prompt and
    get_guidance_scale_embedding (edit.py:109-121)."""

    def __init__(self, embs):
        self._embs = embs

    def encode_prompt(self, prompt, device, num_images_per_prompt=1,
                      do_classifier_free_guidance=False):
        return torch.from_numpy(self._embs[prompt]), None

    def get_guidance_scale_embedding(self, w, embedding_dim):
        # pure torch: the engine calls this inside functorch transforms
        # (jacfwd traces get_x0; a numpy round trip breaks on dual tensors)
        w = w.to(torch.float32) * 1000.0
        half = embedding_dim // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * -(math.log(10000.0) / (half - 1)))
        args = w[:, None] * freqs[None, :]
        return torch.cat([torch.sin(args), torch.cos(args)], dim=1)


class _TorchLCMUNet(torch.nn.Module):
    """Tiny consistency eps-net: conv -> (+ t/w/ctx embeddings) -> silu ->
    conv -> silu -> conv; diffusers-call-compatible (timestep_cond kwarg,
    tuple return, .config.time_cond_proj_dim)."""

    def __init__(self, gen):
        super().__init__()

        def P(*s, scale=0.2):
            return torch.nn.Parameter(torch.randn(*s, generator=gen) * scale)

        self.w1, self.b1 = P(C, 4, 3, 3), P(C, scale=0.05)
        self.w2, self.b2 = P(C, C, 3, 3), P(C, scale=0.05)
        self.w3, self.b3 = P(4, C, 3, 3), P(4, scale=0.05)
        self.wt, self.bt = P(C, 1), P(C, scale=0.05)
        self.ww, self.bw = P(C, WDIM), P(C, scale=0.05)
        self.wc, self.bc = P(C, CTX), P(C, scale=0.05)
        self.config = _ns(time_cond_proj_dim=WDIM)

    def forward(self, z, t, timestep_cond=None, encoder_hidden_states=None,
                return_dict=False):
        b = z.shape[0]
        tt = (torch.as_tensor(t, dtype=z.dtype).reshape(1, 1) / 1000.0
              ).expand(b, 1)
        temb = F.silu(tt @ self.wt.T + self.bt)
        wemb = F.silu(timestep_cond.to(z.dtype) @ self.ww.T + self.bw)
        cemb = F.silu(encoder_hidden_states.mean(dim=1) @ self.wc.T + self.bc)
        h = F.conv2d(z, self.w1, self.b1, padding=1)
        h = F.silu(h + (temb + wemb + cemb)[:, :, None, None])
        h = F.silu(F.conv2d(h, self.w2, self.b2, padding=1))
        return (F.conv2d(h, self.w3, self.b3, padding=1),)


class _TorchVAE(torch.nn.Module):
    """decode: repeat-x2 upsample -> conv -> silu -> conv (4->3ch); supports
    both .sample and return_dict=False tuple access."""

    def __init__(self, gen):
        super().__init__()

        def P(*s, scale=0.2):
            return torch.nn.Parameter(torch.randn(*s, generator=gen) * scale)

        self.wd1, self.bd1 = P(8, 4, 3, 3), P(8, scale=0.05)
        self.wd2, self.bd2 = P(3, 8, 3, 3), P(3, scale=0.05)
        self.config = _ns(scaling_factor=0.18215)

    def decode(self, z, return_dict=True):
        h = z.repeat_interleave(2, dim=2).repeat_interleave(2, dim=3)
        h = F.silu(F.conv2d(h, self.wd1, self.bd1, padding=1))
        out = F.conv2d(h, self.wd2, self.bd2, padding=1)
        return _ns(sample=out) if return_dict else (out,)


def _jconv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _jax_twins(tu, tv):
    w1, w2, w3 = _hwio(tu.w1), _hwio(tu.w2), _hwio(tu.w3)
    b1, b2, b3 = map(lambda p: jnp.asarray(_np(p)), (tu.b1, tu.b2, tu.b3))
    wt, bt = jnp.asarray(_np(tu.wt)), jnp.asarray(_np(tu.bt))
    ww, bw = jnp.asarray(_np(tu.ww)), jnp.asarray(_np(tu.bw))
    wc, bc = jnp.asarray(_np(tu.wc)), jnp.asarray(_np(tu.bc))
    wd1, wd2 = _hwio(tv.wd1), _hwio(tv.wd2)
    bd1, bd2 = jnp.asarray(_np(tv.bd1)), jnp.asarray(_np(tv.bd2))
    half = WDIM // 2
    freqs = jnp.exp(jnp.arange(half) * -(math.log(10000.0) / (half - 1)))

    def unet_apply(z, t, ctx, w):
        b = z.shape[0]
        tt = jnp.broadcast_to(
            jnp.reshape(jnp.asarray(t, z.dtype), (1, 1)) / 1000.0, (b, 1))
        args = (jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(w)), (b,))
                * 1000.0)[:, None] * freqs[None]
        wemb = jnp.concatenate([jnp.sin(args), jnp.cos(args)],
                               1).astype(z.dtype)
        temb = (jax.nn.silu(tt @ wt.T + bt) + jax.nn.silu(wemb @ ww.T + bw)
                + jax.nn.silu(jnp.mean(ctx, axis=1) @ wc.T + bc))
        h = _jconv(z, w1, b1)
        h = jax.nn.silu(h + temb[:, None, None, :])
        h = jax.nn.silu(_jconv(h, w2, b2))
        return _jconv(h, w3, b3)

    def decode(z):
        h = jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)
        h = jax.nn.silu(_jconv(h, wd1, bd1))
        return _jconv(h, wd2, bd2)

    return unet_apply, decode


@pytest.fixture(scope="module")
def shared():
    try:
        from modules.edit import EditLatentConsistency  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    gen = torch.Generator().manual_seed(5)
    tu, tv = _TorchLCMUNet(gen), _TorchVAE(gen)
    tu.eval(), tv.eval()
    unet_apply, decode = _jax_twins(tu, tv)

    rng = np.random.default_rng(44)
    embs = {n: (rng.normal(size=(1, 77, CTX)) * 0.3).astype(np.float32)
            for n in ("a photo of a dog", "a happy dog")}
    zT = rng.normal(size=(1, 4, LAT, LAT)).astype(np.float32)
    mask = np.zeros((1, 1, IMG, IMG), bool)
    mask[..., 30:100, 20:80] = True
    return _ns(tu=tu, tv=tv, unet_apply=unet_apply, decode=decode, embs=embs,
               zT=zT, mask=mask)


def _make_ref_engine(shared, folder):
    from modules.edit import EditLatentConsistency

    os.makedirs(folder, exist_ok=True)
    eng = object.__new__(EditLatentConsistency)
    eng.seed = 0
    eng.pca_device = torch.device("cpu")
    eng.buffer_device = torch.device("cpu")
    eng.memory_bound = 8
    eng.result_folder = str(folder)
    eng.obs_folder = str(folder)
    eng.pipe = _StubPipe(shared.embs)
    eng.vae = shared.tv
    eng.unet = shared.tu
    eng.sam = None
    eng.dtype = torch.float32
    eng.device = torch.device("cpu")
    eng.scheduler = _StubLCMScheduler()
    eng.use_yh_custom_scheduler = False
    eng.c_in = 4
    eng.image_size = IMG
    eng.dataset = None
    eng.dataset_name = "Random"
    eng.for_prompt = "a photo of a dog"
    eng.edit_prompt = "a happy dog"
    eng.guidance_scale = GS
    eng.guidance_scale_edit = GS
    eng.x_edit_step_size = 1.0
    eng.x_space_guidance_edit_step = 1.0
    eng.x_space_guidance_scale = SCALE
    eng.x_space_guidance_num_step = NUM_STEP
    eng.x_space_guidance_use_edit_prompt = False
    eng.num_inference_steps = N_STEPS
    eng.scheduler.set_timesteps(N_STEPS)
    eng.edit_t = float(eng.scheduler.timesteps[EDIT_T_IDX]) / 1000.0
    eng.edit_t_idx = EDIT_T_IDX
    eng.sampling_mode = False
    eng.use_sega = False
    eng.EXP_NAME = "golden"
    return eng


def _make_ours(shared, folder, **over):
    cfg = LCMEditConfig(
        num_inference_steps=N_STEPS, edit_t_idx=EDIT_T_IDX,
        guidance_scale=GS, x_space_guidance_scale=SCALE,
        x_space_guidance_edit_step=1.0, x_space_guidance_num_step=NUM_STEP,
        vis_num=VIS_NUM, pca_rank=RANK, pca_rank_null=RANK_NULL,
        null_space_projection=False, non_semantic=False, probe_chunk=None,
        memory_bound=0, result_folder=str(folder), save_images=False, **over)
    enc = lambda p: jnp.asarray(shared.embs[p])  # noqa: E731
    pipe = LCMEditPipeline(shared.unet_apply, shared.decode, enc, cfg,
                           seed_everything(9), latent_shape=(LAT, LAT, 4))
    pipe.noise_fn = lambda i, shape, dtype: jnp.asarray(_noise_nchw(
        i, (shape[0], shape[3], shape[1], shape[2])).transpose(0, 2, 3, 1),
        dtype)
    return pipe


def test_grid_matches_stub_scheduler(shared):
    sch = _StubLCMScheduler()
    sch.set_timesteps(N_STEPS)
    g = lcm_grid(N_STEPS)
    np.testing.assert_array_equal(np.asarray(g.t), sch.timesteps.numpy())
    np.testing.assert_allclose(
        np.asarray(g.alpha_bar),
        sch.alphas_cumprod.numpy()[sch.timesteps.numpy()], rtol=1e-6)


def test_twin_denoiser_parity(shared):
    rng = np.random.default_rng(0)
    z = rng.normal(size=(2, 4, LAT, LAT)).astype(np.float32)
    ctx = rng.normal(size=(2, 77, CTX)).astype(np.float32)
    w_emb = torch.from_numpy(_w_embedding_np([GS - 1.0] * 2, WDIM))
    with torch.no_grad():
        e_t = shared.tu(torch.from_numpy(z), torch.tensor(519),
                        timestep_cond=w_emb,
                        encoder_hidden_states=torch.from_numpy(ctx))[0]
        d_t = shared.tv.decode(torch.from_numpy(z), return_dict=False)[0]
    e_j = shared.unet_apply(jnp.asarray(_nchw_to_nhwc(z)), 519.0,
                            jnp.asarray(ctx),
                            jnp.full((2,), GS - 1.0, jnp.float32))
    np.testing.assert_allclose(np.asarray(e_j), _nchw_to_nhwc(e_t.numpy()),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(shared.decode(
        jnp.asarray(_nchw_to_nhwc(z)))), _nchw_to_nhwc(d_t.numpy()), atol=1e-5)


def test_lcm_forwardsteps_parity(shared, tmp_path):
    """LCMforwardsteps (edit.py:148-203) with matched inter-step noise: both
    the full run and the stop-at-edit_t slice."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    zT_t = torch.from_numpy(shared.zT)
    with torch.no_grad():
        zt_ref, t_ref, t_idx = eng.LCMforwardsteps(
            zT_t.clone(), prompt=eng.for_prompt, t_start_idx=0,
            t_end_idx=EDIT_T_IDX)
        z_last_ref, _x0 = eng.LCMforwardsteps(
            zT_t.clone(), prompt=eng.for_prompt, t_start_idx=0, t_end_idx=-1)

    pipe = _make_ours(shared, tmp_path / "ours")
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt, _ = pipe.forward_steps(zT_j, "a photo of a dog", 0, EDIT_T_IDX)
    np.testing.assert_allclose(np.asarray(zt), _nchw_to_nhwc(zt_ref.numpy()),
                               rtol=2e-5, atol=1e-3)
    assert int(t_idx) == EDIT_T_IDX
    assert float(t_ref) == float(pipe.grid.t[EDIT_T_IDX])
    z_last, den = pipe.forward_steps(zT_j, "a photo of a dog", 0, None)
    np.testing.assert_allclose(np.asarray(z_last),
                               _nchw_to_nhwc(z_last_ref.numpy()),
                               rtol=2e-5, atol=1e-3)
    # final grid step: latents == denoised (LCMScheduler.step semantics)
    np.testing.assert_array_equal(np.asarray(z_last), np.asarray(den))


def test_consistency_x0_pointwise(shared, tmp_path):
    """get_x0 (edit.py:206-247): consistency output at edit_t through the
    VAE decoder with the 1/scaling_factor rescale."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt, _ = pipe.forward_steps(zT_j, "a photo of a dog", 0, EDIT_T_IDX)
    zt_t = torch.from_numpy(np.asarray(zt).transpose(0, 3, 1, 2)).contiguous()
    t_ref = eng.scheduler.timesteps[EDIT_T_IDX]
    with torch.no_grad():
        x0_ref = eng.get_x0(zt_t, eng.for_prompt, t_ref, EDIT_T_IDX)
    g = pipe.consistency_x0_fn("a photo of a dog", EDIT_T_IDX)
    # |x0| reaches ~300 via the amplifying twins: rtol carries large
    # elements, atol the near-zero ones (observed drift ~1e-6 relative)
    np.testing.assert_allclose(np.asarray(g(jnp.asarray(zt))),
                               _nchw_to_nhwc(x0_ref.numpy()),
                               rtol=2e-5, atol=2e-3)


def test_basis_subspace_matched_probes(shared, tmp_path):
    """Masked subspace iteration on the consistency output with identical
    starting probes and fixed iterations (edit.py:283-370)."""
    iters = 4
    d = 4 * LAT * LAT
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt, _ = pipe.forward_steps(zT_j, "a photo of a dog", 0, EDIT_T_IDX)
    zt_t = torch.from_numpy(np.asarray(zt).transpose(0, 3, 1, 2)).contiguous()
    t_ref = eng.scheduler.timesteps[EDIT_T_IDX]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    g0 = torch.randn(d, RANK, generator=torch.Generator().manual_seed(6))
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (d, RANK):
            return g0.clone()
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        u_ref, s_ref, vT_ref = eng.local_encoder_decoder_pullback_zt(
            zt_t, t_ref, EDIT_T_IDX, eng.for_prompt, op="mid", block_idx=0,
            pca_rank=RANK, chunk_size=25, min_iter=iters, max_iter=iters,
            convergence_threshold=0.0, mask=mask_t)
    finally:
        torch.randn = orig_randn

    q, _ = torch.linalg.qr(g0)
    v_init = jnp.asarray(_flat_chw_to_hwc(q.T.numpy(), 4, LAT, LAT))
    mask_j = jnp.asarray(
        np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                        (1, IMG, IMG, 3)).astype(np.float32))
    g = pipe.consistency_x0_fn("a photo of a dog", EDIT_T_IDX)
    basis = subspace_iteration(
        g, jnp.asarray(zt), jax.random.key(0), rank=RANK, mask=mask_j,
        min_iter=iters, max_iter=iters, tol=0.0, pad_probes=False,
        v_init=v_init)
    v_ours = np.asarray(basis.vT)
    v_ref = _flat_chw_to_hwc(vT_ref.numpy(), 4, LAT, LAT)
    overlap = np.linalg.svd(v_ours @ v_ref.T, compute_uv=False)
    np.testing.assert_allclose(overlap, 1.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(basis.s), s_ref.numpy(), rtol=3e-3)


def test_delta_direction(shared, tmp_path):
    """get_delta_zt_via_grad (edit.py:251-280): masked <delta_x0, x0_edit(z)>
    VJP, rows normalized."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    zT_j = jnp.asarray(_nchw_to_nhwc(shared.zT))
    zt, _ = pipe.forward_steps(zT_j, "a photo of a dog", 0, EDIT_T_IDX)
    zt_t = torch.from_numpy(np.asarray(zt).transpose(0, 3, 1, 2)).contiguous()
    t_ref = eng.scheduler.timesteps[EDIT_T_IDX]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    v_ref = eng.get_delta_zt_via_grad(
        zt_t, t_ref, EDIT_T_IDX, eng.for_prompt, eng.edit_prompt, mask=mask_t)

    mask_j = np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                             (1, IMG, IMG, 3)).astype(np.float32)
    v_ours = np.asarray(pipe.delta_zt_via_grad(
        jnp.asarray(zt), "a photo of a dog", "a happy dog", mask_j))
    v_ref_hwc = _flat_chw_to_hwc(v_ref.detach().numpy(), 4, LAT, LAT)
    cos = float(np.sum(v_ours * v_ref_hwc))
    assert cos > 1 - 1e-5
    np.testing.assert_allclose(v_ours, v_ref_hwc, atol=2e-4)


def test_full_run_strip_parity_semantic(shared, tmp_path):
    """run_edit_null_space_projection_zt end to end on the semantic path
    (edit.py:374-470): matched zT + inter-step noise; the final completion
    denoise's output batch (the edited strip latents) must match pointwise."""
    ref_dir = tmp_path / "ref"
    os.makedirs(ref_dir / "mask", exist_ok=True)
    torch.save(torch.from_numpy(shared.mask), ref_dir / "mask" / "mask.pt")
    (ref_dir / "original.png").touch()

    eng = _make_ref_engine(shared, ref_dir)
    captured = {}
    orig_fwd = eng.LCMforwardsteps

    def _fwd(zt, t_start_idx=0, t_end_idx=-1, prompt=None):
        out = orig_fwd(zt, prompt=prompt, t_start_idx=t_start_idx,
                       t_end_idx=t_end_idx)
        if t_end_idx == -1 and zt.size(0) > 1:
            captured["strip"] = out[0].clone()
        return out

    eng.LCMforwardsteps = _fwd
    zT_fixed = torch.from_numpy(shared.zT)
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (1, 4, LAT, LAT):
            return zT_fixed.clone().to(kw.get("dtype", torch.float32))
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        with torch.no_grad():
            eng.run_edit_null_space_projection_zt(
                op="mid", block_idx=0, vis_num=VIS_NUM, mask_index=0,
                vis_num_pc=1, pca_rank=RANK, null_space_projection=False,
                pca_rank_null=RANK_NULL, non_semantic=False)
    finally:
        torch.randn = orig_randn
    assert "strip" in captured

    pipe = _make_ours(shared, tmp_path / "ours")
    mask_j = np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                             (1, IMG, IMG, 3)).astype(bool)
    out = pipe.run_edit_null_space_projection_zt(
        "a photo of a dog", "a happy dog",
        zT=jnp.asarray(_nchw_to_nhwc(shared.zT)), mask=mask_j,
        sample_name="golden")

    strip_ref = _nchw_to_nhwc(captured["strip"].numpy())
    strip_ours = out["denoised"]
    assert strip_ours.shape == strip_ref.shape
    np.testing.assert_allclose(strip_ours, strip_ref, rtol=2e-5, atol=3e-3)
