"""Whole-pipeline cross-implementation golden for the DeepFloyd-IF (pixel
x-space T-LOCO) engine: the reference `EditDeepFloydIF`
(src/modules/edit.py:1198-2028) executed END TO END on CPU against
`IFEditPipeline`, both driving one shared tiny learned-sigma conditional
denoiser (torch/JAX twins of the same weights).

The reference runs IF with `use_yh_custom_scheduler=True`: the checkpoint's
squaredcos_cap_v2 alphas_cumprod table monkeypatched with the free-function
grid/step from utils.py:159-214 and t_max=990 — exactly what the engine
namespace here carries (real reference functions, published-formula table;
the table itself is pinned against the formula by tests/test_scheduler.py).

What this pins that the per-component goldens cannot (the composition):

  1. the t_max=990 squaredcos CFG denoising loop with the learned-sigma
     channel split inside the 8-mode combiner and the memory_bound buffer
     chunking (DDPMforwardsteps, edit.py:1419-1483), full run incl. the
     uint8 image conversion, and the stop-at-edit_t slice
  2. the pixel-space PMP (get_x0, edit.py:1565-1587) incl. the masked gather
  3. the masked Jacobian subspace iteration at x_t with matched probes
     (local_encoder_decoder_pullback_xt, edit.py:1589-1677)
  4. the prompt-delta Jacobian direction (get_delta_xt_via_grad,
     edit.py:1679-1720) and all three direct eps-combination directions
     (get_v_modify, edit.py:1722-1741)
  5. run_edit_null_space_projection_xt_semantic end to end on the direct
     path (edit.py:1874-2019): forward-to-edit_t, direct direction,
     normalize, x-space-guidance walk both directions, vis_num subsample,
     mirrored strip, completion denoise to uint8 pixels
  6. run_edit_null_space_projection_xt end to end through the cached-basis
     branch (edit.py:1790-1847): load vT-modify/vT-null, null-space
     projection, normalize, walk, completion denoise — against this repo's
     equivalent .npz cache branch seeded with the same directions
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
from loco_edit_tpu.editing import mask_cache_tag, save_directions, subspace_iteration  # noqa: E402
from loco_edit_tpu.pipelines.deepfloyd import IFEditConfig, IFEditPipeline  # noqa: E402

C = 8          # twin-net width
CTX = 8        # prompt-embedding (T5 states) dim
IMG = 32       # stage-1 resolution (engine-agnostic; real IF-I runs 64)
FOR_STEPS = 6  # 5 executed updates on the t_max=990 grid
EDIT_T = 0.6   # -> grid t=594, idx 2
GS = 3.0       # > 1 -> CFG on (the reference always runs IF with CFG)
GS_EDIT = 2.0
SCALE = 0.3
NUM_STEP = 4
VIS_NUM = 2
RANK, RANK_NULL = 3, 2
D = 3 * IMG * IMG

_ns = types.SimpleNamespace


def _np(p):
    return np.asarray(p.detach())


def _hwio(w):
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _nchw_to_nhwc(a):
    return np.asarray(a).transpose(0, 2, 3, 1)


def _nhwc_to_nchw(a):
    return np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2))


def _flat_chw_to_hwc(v, c, h, w):
    return np.asarray(v).reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(
        -1, c * h * w)


def _flat_hwc_to_chw(v, c, h, w):
    return np.asarray(v).reshape(-1, h, w, c).transpose(0, 3, 1, 2).reshape(
        -1, c * h * w)


def _to_uint8(x_nhwc):
    """The reference's image conversion (edit.py:1478-1481): (x/2+.5).clamp
    then a truncating uint8 cast."""
    return (np.clip(np.asarray(x_nhwc) / 2 + 0.5, 0, 1) * 255).astype(np.uint8)


def _squaredcos_tables():
    """diffusers squaredcos_cap_v2 (the IF checkpoints' schedule), from the
    published alpha-bar formula; f64 end to end, f32 tables — matching this
    repo's NoiseSchedule.cosine construction bit for bit."""
    x = np.linspace(0, 1000, 1001, dtype=np.float64)
    ab = np.cos(((x / 1000) + 0.008) / 1.008 * np.pi * 0.5) ** 2
    betas = np.clip(1 - ab[1:] / ab[:-1], 0.0, 0.999)
    abar = np.cumprod(1.0 - betas)
    return (torch.from_numpy(betas.astype(np.float32)),
            torch.from_numpy(abar.astype(np.float32)))


class _TorchIFUNet(torch.nn.Module):
    """Tiny IF-stage-1-like eps-net: 3ch in -> 6ch out ([eps | sigma], the
    learned-sigma layout the CFG combiner splits per chunk,
    edit.py:1328-1335); conv -> (+ t/ctx embeddings) -> silu -> conv -> silu
    -> conv. Exactly twinned in JAX below."""

    def __init__(self, gen):
        super().__init__()

        def P(*s, scale=0.2):
            return torch.nn.Parameter(torch.randn(*s, generator=gen) * scale)

        self.w1, self.b1 = P(C, 3, 3, 3), P(C, scale=0.05)
        self.w2, self.b2 = P(C, C, 3, 3), P(C, scale=0.05)
        self.w3, self.b3 = P(6, C, 3, 3), P(6, scale=0.05)
        self.wt, self.bt = P(C, 1), P(C, scale=0.05)
        self.wc, self.bc = P(C, CTX), P(C, scale=0.05)

    def forward(self, x, t, encoder_hidden_states=None):
        tt = torch.as_tensor(t, dtype=x.dtype).reshape(1, 1) / 1000.0
        temb = F.silu(tt @ self.wt.T + self.bt)
        cemb = F.silu(encoder_hidden_states.mean(dim=1) @ self.wc.T + self.bc)
        h = F.conv2d(x, self.w1, self.b1, padding=1)
        h = F.silu(h + (temb + cemb)[:, :, None, None])
        h = F.silu(F.conv2d(h, self.w2, self.b2, padding=1))
        return _ns(sample=F.conv2d(h, self.w3, self.b3, padding=1))


def _jconv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _jax_twin(tu):
    w1, w2, w3 = _hwio(tu.w1), _hwio(tu.w2), _hwio(tu.w3)
    b1, b2, b3 = map(lambda p: jnp.asarray(_np(p)), (tu.b1, tu.b2, tu.b3))
    wt, bt = jnp.asarray(_np(tu.wt)), jnp.asarray(_np(tu.bt))
    wc, bc = jnp.asarray(_np(tu.wc)), jnp.asarray(_np(tu.bc))

    def unet_apply(x, t, ctx):
        tt = jnp.reshape(jnp.asarray(t, x.dtype), (1, 1)) / 1000.0
        temb = jax.nn.silu(tt @ wt.T + bt)
        cemb = jax.nn.silu(jnp.mean(ctx, axis=1) @ wc.T + bc)
        h = _jconv(x, w1, b1)
        h = jax.nn.silu(h + (temb + cemb)[:, None, None, :])
        h = jax.nn.silu(_jconv(h, w2, b2))
        return _jconv(h, w3, b3)

    return unet_apply


@pytest.fixture(scope="module")
def shared():
    try:
        from modules.edit import EditDeepFloydIF  # noqa: F401
        from utils import utils as ref_utils  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    gen = torch.Generator().manual_seed(11)
    tu = _TorchIFUNet(gen)
    tu.eval()
    unet_apply = _jax_twin(tu)

    rng = np.random.default_rng(55)
    embs = {n: (rng.normal(size=(1, 77, CTX)) * 0.3).astype(np.float32)
            for n in ("a photo of a fox", "a sleeping fox", "")}
    xT = rng.normal(size=(1, 3, IMG, IMG)).astype(np.float32)
    mask = np.zeros((1, 1, IMG, IMG), bool)
    mask[..., 8:26, 5:22] = True
    return _ns(tu=tu, unet_apply=unet_apply, embs=embs, xT=xT, mask=mask)


def _make_ref_engine(shared, folder):
    from modules.edit import EditDeepFloydIF
    from utils import utils as ref_utils

    os.makedirs(folder, exist_ok=True)
    betas, abar = _squaredcos_tables()
    sch = _ns(t_max=990, betas=betas, alphas_cumprod=abar)
    sch.set_timesteps = types.MethodType(ref_utils.set_timesteps, sch)
    sch.step = types.MethodType(ref_utils.step, sch)
    sch.scale_model_input = lambda x, t: x

    eng = object.__new__(EditDeepFloydIF)
    eng.seed = 0
    eng.buffer_device = torch.device("cpu")
    eng.memory_bound = 2  # CFG halves it to 1 -> per-sample strip chunks
    eng.result_folder = str(folder)
    eng.obs_folder = str(folder)
    eng.unet = shared.tu
    eng.mask_type = "SAM"
    eng.sam = None
    eng.dtype = torch.float32
    # a STRING device: the cached-basis branch calls torch.load with
    # map_location=self.device, and under the cuda->cpu torch.device patch
    # an isinstance(map_location, torch.device) check would explode on a
    # device OBJECT (torch.device is temporarily a function); the str branch
    # of torch.load runs first
    eng.device = "cpu"
    eng.scheduler = sch
    eng.for_steps = FOR_STEPS
    eng.use_yh_custom_scheduler = True
    eng.c_in = 3
    eng.image_size = IMG
    eng.dataset = None
    eng.dataset_name = "Random"
    eng.for_prompt = "a photo of a fox"
    eng.neg_prompt = ""
    eng.null_prompt = ""
    eng.inv_prompt = ""
    eng.for_prompt_emb = torch.from_numpy(shared.embs["a photo of a fox"])
    eng.neg_prompt_emb = torch.from_numpy(shared.embs[""])
    eng.null_prompt_emb = torch.from_numpy(shared.embs[""])
    eng.inv_prompt_emb = torch.from_numpy(shared.embs[""])
    eng.guidance_scale = GS
    eng.guidance_scale_edit = GS_EDIT
    eng.edit_prompt = "a sleeping fox"
    eng.edit_prompt_emb = torch.from_numpy(shared.embs["a sleeping fox"])
    eng.x_edit_step_size = 1.0
    eng.x_space_guidance_edit_step = 1.0
    eng.x_space_guidance_scale = SCALE
    eng.x_space_guidance_num_step = NUM_STEP
    eng.x_space_guidance_use_edit_prompt = False
    eng.scheduler.set_timesteps(FOR_STEPS)
    eng.edit_t = EDIT_T
    eng.edit_t_idx = int((sch.timesteps - EDIT_T * 1000).abs().argmin())
    eng.sampling_mode = False
    eng.tilda_v_score_type = "(for-edit)-direct"
    eng.ablation_method = "null-space-proj"
    eng.vT_path = os.path.join(str(folder), "missing-vT.pt")
    eng.EXP_NAME = "golden"
    return eng


def _make_ours(shared, folder, **over):
    kwargs = dict(
        for_steps=FOR_STEPS, edit_t=EDIT_T, t_max=990, guidance_scale=GS,
        guidance_scale_edit=GS_EDIT, x_space_guidance_scale=SCALE,
        x_space_guidance_edit_step=1.0, x_space_guidance_num_step=NUM_STEP,
        vis_num=VIS_NUM, pca_rank=RANK, pca_rank_null=RANK_NULL,
        null_space_projection=False, tilda_v_score_type="(for-edit)-direct",
        jacobian=False, probe_chunk=None, memory_bound=0,
        result_folder=str(folder), save_images=False)
    kwargs.update(over)
    cfg = IFEditConfig(**kwargs)
    enc = lambda p: jnp.asarray(shared.embs[p])  # noqa: E731
    return IFEditPipeline(shared.unet_apply, enc, cfg, seed_everything(13),
                          sample_shape=(IMG, IMG, 3))


def _prompts(pipe):
    return pipe.prompt_set("a photo of a fox", "a sleeping fox")


def _ref_masks(shared, folder):
    """Pre-seed the SAM artifacts so the engine takes its 'Loading masks'
    branch (edit.py:1766-1779) instead of generating + segmenting."""
    os.makedirs(os.path.join(folder, "mask"), exist_ok=True)
    torch.save(torch.from_numpy(shared.mask),
               os.path.join(str(folder), "mask", "mask.pt"))
    open(os.path.join(str(folder), "original_stage1.png"), "a").close()


@pytest.fixture()
def cpu_cuda_patch(monkeypatch):
    """Map the engine's hardcoded torch.device('cuda:0') in the walk
    (edit.py:1846, 1986) to CPU; everything else passes through."""
    orig = torch.device

    def _dev(*a, **kw):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return orig("cpu")
        return orig(*a, **kw)

    monkeypatch.setattr(torch, "device", _dev)
    return _dev


def test_grid_and_twin_parity(shared, tmp_path):
    """Grid identity + the shared tiny denoiser's torch and JAX forms agree
    pointwise — the precondition for every composition test below."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    np.testing.assert_array_equal(np.asarray(pipe.gen_grid.t),
                                  eng.scheduler.timesteps.numpy())
    np.testing.assert_allclose(
        np.asarray(pipe.gen_grid.alpha_bar),
        eng.scheduler.alphas_cumprod.numpy()[
            eng.scheduler.timesteps.numpy().astype(np.int64)], rtol=1e-7)
    assert pipe.edit_t_idx == eng.edit_t_idx == 2

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, IMG, IMG)).astype(np.float32)
    ctx = rng.normal(size=(2, 77, CTX)).astype(np.float32)
    with torch.no_grad():
        e_t = shared.tu(torch.from_numpy(x), torch.tensor(594.0),
                        encoder_hidden_states=torch.from_numpy(ctx)).sample
    e_j = shared.unet_apply(jnp.asarray(_nchw_to_nhwc(x)), 594.0,
                            jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(e_j), _nchw_to_nhwc(e_t.numpy()),
                               atol=1e-5)


def test_cfg_forward_full_and_to_edit_t(shared, tmp_path):
    """DDPMforwardsteps (edit.py:1419-1483): the full denoise to the uint8
    stage-1 image AND the stop-at-edit_t slice, CFG on, learned-sigma split,
    memory_bound buffer loop exercised by a batch-3 input."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    xT3 = np.concatenate([shared.xT,
                          shared.xT * 0.5,
                          -shared.xT], axis=0).astype(np.float32)
    with torch.no_grad():
        img_ref = eng.DDPMforwardsteps(
            torch.from_numpy(xT3), t_start_idx=0, t_end_idx=-1,
            for_prompt_emb=eng.for_prompt_emb,
            edit_prompt_emb=eng.edit_prompt_emb,
            null_prompt_emb=eng.null_prompt_emb, mode="null+(for-null)")
        xt_ref, t_ref, t_idx = eng.DDPMforwardsteps(
            torch.from_numpy(shared.xT), t_start_idx=0,
            t_end_idx=eng.edit_t_idx,
            for_prompt_emb=eng.for_prompt_emb,
            edit_prompt_emb=eng.edit_prompt_emb,
            null_prompt_emb=eng.null_prompt_emb, mode="null+(for-null)")

    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    x0 = pipe.forward_steps(jnp.asarray(_nchw_to_nhwc(xT3)), prompts,
                            "null+(for-null)", 0, None)
    img_ours = _to_uint8(x0)
    # uint8 is a truncating cast: fp drift at an integer boundary moves a
    # pixel by exactly 1 count
    assert img_ref.numpy().shape == img_ours.shape
    assert np.max(np.abs(img_ref.numpy().astype(np.int16)
                         - img_ours.astype(np.int16))) <= 1

    xt = pipe.forward_steps(jnp.asarray(_nchw_to_nhwc(shared.xT)), prompts,
                            "null+(for-null)", 0, pipe.edit_t_idx)
    assert int(t_idx) == pipe.edit_t_idx
    assert float(t_ref) == float(pipe.gen_grid.t[pipe.edit_t_idx])
    np.testing.assert_allclose(np.asarray(xt), _nchw_to_nhwc(xt_ref.numpy()),
                               rtol=2e-5, atol=1e-4)


def test_pixel_pmp_pointwise(shared, tmp_path):
    """get_x0 (edit.py:1565-1587): the pixel-space PMP under the 3-way CFG
    mode, full tensor and the masked CHW-order gather."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    xt = pipe.forward_steps(jnp.asarray(_nchw_to_nhwc(shared.xT)), prompts,
                            "null+(for-null)", 0, pipe.edit_t_idx)
    xt_t = torch.from_numpy(_nhwc_to_nchw(xt))
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    with torch.no_grad():
        x0_full = eng.get_x0(xt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb,
                             eng.edit_prompt_emb, eng.null_prompt_emb,
                             mask=None, mode="null+(for-null)+(edit-null)")
        x0_masked = eng.get_x0(xt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb,
                               eng.edit_prompt_emb, eng.null_prompt_emb,
                               mask=mask_t, mode="null+(for-null)+(edit-null)")

    f = pipe.pmp_fn(prompts, "null+(for-null)+(edit-null)")
    ours_full = np.asarray(f(jnp.asarray(xt)))
    np.testing.assert_allclose(ours_full, _nchw_to_nhwc(x0_full.numpy()),
                               rtol=2e-5, atol=1e-4)
    ours_gather = _nhwc_to_nchw(ours_full)[:, mask_t.numpy()]
    np.testing.assert_allclose(ours_gather, x0_masked.numpy(),
                               rtol=2e-5, atol=1e-4)


def test_basis_subspace_matched_probes(shared, tmp_path):
    """Masked subspace iteration at x_t with identical starting probes and
    fixed iterations (local_encoder_decoder_pullback_xt, edit.py:1589-1677):
    subspace equality up to rotation + pointwise singular values."""
    iters = 4
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    xt = pipe.forward_steps(jnp.asarray(_nchw_to_nhwc(shared.xT)), prompts,
                            "null+(for-null)", 0, pipe.edit_t_idx)
    xt_t = torch.from_numpy(_nhwc_to_nchw(xt))
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    g0 = torch.randn(D, RANK, generator=torch.Generator().manual_seed(3))
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (D, RANK):
            return g0.clone()
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        u_ref, s_ref, vT_ref = eng.local_encoder_decoder_pullback_xt(
            xt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb,
            eng.edit_prompt_emb, eng.null_prompt_emb, op="mid", block_idx=0,
            pca_rank=RANK, chunk_size=25, min_iter=iters, max_iter=iters,
            convergence_threshold=0.0, mask=mask_t, mode="null+(for-null)")
    finally:
        torch.randn = orig_randn

    q, _ = torch.linalg.qr(g0)
    v_init = jnp.asarray(_flat_chw_to_hwc(q.T.numpy(), 3, IMG, IMG))
    mask_j = jnp.asarray(
        np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                        (1, IMG, IMG, 3)).astype(np.float32))
    f = pipe.pmp_fn(prompts, "null+(for-null)")
    basis = subspace_iteration(
        f, jnp.asarray(xt), jax.random.key(0), rank=RANK, mask=mask_j,
        min_iter=iters, max_iter=iters, tol=0.0, pad_probes=False,
        v_init=v_init)
    v_ours = np.asarray(basis.vT)
    v_ref = _flat_chw_to_hwc(vT_ref.numpy(), 3, IMG, IMG)
    overlap = np.linalg.svd(v_ours @ v_ref.T, compute_uv=False)
    np.testing.assert_allclose(overlap, 1.0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(basis.s), s_ref.numpy(), rtol=3e-3)


def test_delta_direction(shared, tmp_path):
    """get_delta_xt_via_grad (edit.py:1679-1720): masked <delta_x0, x0(x)>
    VJP at x_t, rows normalized."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    xt = pipe.forward_steps(jnp.asarray(_nchw_to_nhwc(shared.xT)), prompts,
                            "null+(for-null)", 0, pipe.edit_t_idx)
    xt_t = torch.from_numpy(_nhwc_to_nchw(xt))
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]
    mask_t = torch.from_numpy(shared.mask[0]).squeeze(0).repeat(3, 1, 1)

    v_ref = eng.get_delta_xt_via_grad(
        xt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb, eng.edit_prompt_emb,
        eng.null_prompt_emb, mask=mask_t, mode="null+(for-null)+(edit-null)")

    mask_j = np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                             (1, IMG, IMG, 3)).astype(np.float32)
    v_ours = np.asarray(pipe.delta_xt_via_grad(
        jnp.asarray(xt), prompts, mask_j, "null+(for-null)+(edit-null)"))
    v_ref_hwc = _flat_chw_to_hwc(v_ref.detach().numpy(), 3, IMG, IMG)
    cos = float(np.sum(v_ours * v_ref_hwc))
    assert cos > 1 - 1e-5
    np.testing.assert_allclose(v_ours, v_ref_hwc, atol=2e-4)


@pytest.mark.parametrize("mode", ["(for-edit)-direct", "(edit-null)-direct",
                                  "proj_null[for-null](edit-null)-direct"])
def test_direct_directions(shared, tmp_path, mode):
    """get_v_modify without Jacobian (edit.py:1722-1741): all three direct
    eps-combination directions, compared after row normalization (the
    reference normalizes later in the run, edit.py:1957)."""
    eng = _make_ref_engine(shared, tmp_path / "ref")
    pipe = _make_ours(shared, tmp_path / "ours")
    prompts = _prompts(pipe)
    xt = pipe.forward_steps(jnp.asarray(_nchw_to_nhwc(shared.xT)), prompts,
                            "null+(for-null)", 0, pipe.edit_t_idx)
    xt_t = torch.from_numpy(_nhwc_to_nchw(xt))
    t_ref = eng.scheduler.timesteps[eng.edit_t_idx]

    with torch.no_grad():
        v_ref = eng.get_v_modify(
            xt_t, t_ref, eng.edit_t_idx, eng.for_prompt_emb,
            eng.edit_prompt_emb, eng.null_prompt_emb, mask=None, mode=mode,
            jacobian=False)
    v_ref = v_ref / v_ref.norm(dim=1, keepdim=True)

    v_ours = np.asarray(pipe.direct_direction(jnp.asarray(xt), prompts, mode))
    v_ref_hwc = _flat_chw_to_hwc(v_ref.numpy(), 3, IMG, IMG)
    cos = float(np.sum(v_ours * v_ref_hwc))
    assert cos > 1 - 1e-6
    # unit rows: cross-library conv fp drift lands ~3e-5 absolute on the
    # near-zero coordinates (relative tolerance is meaningless there)
    np.testing.assert_allclose(v_ours, v_ref_hwc, atol=5e-5)


def _capture_final_denoise(eng):
    """Wrap DDPMforwardsteps to capture the completion denoise's uint8 strip
    (the t_end_idx=-1 call on the walked batch)."""
    captured = {}
    orig = eng.DDPMforwardsteps

    def _fwd(xt, t_start_idx, t_end_idx, **kw):
        out = orig(xt, t_start_idx=t_start_idx, t_end_idx=t_end_idx, **kw)
        if t_end_idx == -1 and xt.size(0) > 1:
            captured["strip"] = out.clone()
        return out

    eng.DDPMforwardsteps = _fwd
    return captured


def test_full_run_semantic_direct(shared, tmp_path, cpu_cuda_patch):
    """run_edit_null_space_projection_xt_semantic end to end on the direct
    path (edit.py:1874-2019): matched xT, final uint8 strip pointwise."""
    ref_dir = tmp_path / "ref"
    os.makedirs(ref_dir, exist_ok=True)
    _ref_masks(shared, str(ref_dir))
    eng = _make_ref_engine(shared, ref_dir)
    eng.superresolution = lambda *a, **kw: (None, None)
    captured = _capture_final_denoise(eng)

    xT_fixed = torch.from_numpy(shared.xT)
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (1, 3, IMG, IMG):
            return xT_fixed.clone().to(kw.get("dtype", torch.float32))
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        eng.run_edit_null_space_projection_xt_semantic(
            op="mid", block_idx=0, vis_num=VIS_NUM, mask_index=0,
            vis_num_pc=1, pca_rank=RANK, edit_prompt=None,
            null_space_projection=False, pca_rank_null=RANK_NULL,
            jacobian=False)
    finally:
        torch.randn = orig_randn
    assert "strip" in captured

    pipe = _make_ours(shared, tmp_path / "ours")
    out = pipe.run_edit_null_space_projection_xt(
        "a photo of a fox", "a sleeping fox",
        xT=jnp.asarray(_nchw_to_nhwc(shared.xT)), mask=None,
        sample_name="golden", semantic=True)

    strip_ref = captured["strip"].numpy()
    strip_ours = _to_uint8(out["image"])
    assert strip_ours.shape == strip_ref.shape
    assert np.max(np.abs(strip_ref.astype(np.int16)
                         - strip_ours.astype(np.int16))) <= 1


def test_full_run_nonsemantic_cached_basis_null_projection(
        shared, tmp_path, cpu_cuda_patch):
    """run_edit_null_space_projection_xt end to end through the cached-basis
    branch with null-space projection (edit.py:1790-1847): both sides load
    the SAME vT-modify/vT-null directions from their respective cache
    formats, then project -> normalize -> walk -> completion denoise; final
    uint8 strips pointwise."""
    rng = np.random.default_rng(77)
    vT_modify = rng.normal(size=(RANK, D)).astype(np.float32)
    vT_null = rng.normal(size=(RANK_NULL, D)).astype(np.float32)
    # orthonormal null rows: the reference's projector algebra assumes
    # vT_null vT_null^T = I (it never re-orthogonalizes loaded bases)
    vT_null = np.linalg.qr(vT_null.T)[0].T.astype(np.float32)

    ref_dir = tmp_path / "ref"
    os.makedirs(ref_dir, exist_ok=True)
    _ref_masks(shared, str(ref_dir))
    save_dir = os.path.join(
        str(ref_dir), "basis",
        f"local_basis-{EDIT_T}T-pca-rank-{RANK}-select-mask0")
    os.makedirs(save_dir, exist_ok=True)
    torch.save(torch.from_numpy(vT_modify), os.path.join(save_dir, "vT-modify.pt"))
    torch.save(torch.zeros(1), os.path.join(save_dir, "u-modify.pt"))
    torch.save(torch.from_numpy(vT_null),
               os.path.join(save_dir, f"vT-null-null_space_rank_{RANK_NULL}.pt"))
    torch.save(torch.zeros(1),
               os.path.join(save_dir, f"u-null-null_space_rank_{RANK_NULL}.pt"))

    eng = _make_ref_engine(shared, ref_dir)
    eng.superresolution = lambda *a, **kw: (None, None)
    captured = _capture_final_denoise(eng)

    xT_fixed = torch.from_numpy(shared.xT)
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (1, 3, IMG, IMG):
            return xT_fixed.clone().to(kw.get("dtype", torch.float32))
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        with torch.no_grad():
            eng.run_edit_null_space_projection_xt(
                op="mid", block_idx=0, vis_num=VIS_NUM, mask_index=0,
                vis_num_pc=1, pca_rank=RANK, edit_prompt=None,
                null_space_projection=True, pca_rank_null=RANK_NULL)
    finally:
        torch.randn = orig_randn
    assert "strip" in captured

    ours_dir = tmp_path / "ours"
    pipe = _make_ours(shared, ours_dir, null_space_projection=True)
    basis_dir = os.path.join(str(ours_dir), "golden", "basis")
    mask_j = np.broadcast_to(shared.mask[0, 0][None, :, :, None],
                             (1, IMG, IMG, 3))
    tag = mask_cache_tag(mask_j)
    save_directions(
        os.path.join(basis_dir, f"vT-modify-{EDIT_T}T-rank{RANK}-{tag}.npz"),
        _flat_chw_to_hwc(vT_modify, 3, IMG, IMG))
    save_directions(
        os.path.join(basis_dir, f"vT-null-{EDIT_T}T-rank{RANK_NULL}-{tag}.npz"),
        _flat_chw_to_hwc(vT_null, 3, IMG, IMG))
    out = pipe.run_edit_null_space_projection_xt(
        "a photo of a fox", "a sleeping fox",
        xT=jnp.asarray(_nchw_to_nhwc(shared.xT)),
        mask=mask_j,
        sample_name="golden", semantic=False)

    strip_ref = captured["strip"].numpy()
    strip_ours = _to_uint8(out["image"])
    assert strip_ours.shape == strip_ref.shape
    assert np.max(np.abs(strip_ref.astype(np.int16)
                         - strip_ours.astype(np.int16))) <= 1
