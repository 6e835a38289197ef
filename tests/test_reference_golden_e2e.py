"""Whole-pipeline cross-implementation golden: the reference engine
`EditUncondDiffusion` (src/modules/edit.py:2034-2625) is executed END TO END
on CPU — real class, real methods, tiny DDPM weights shared through our
converter — and every composed stage is pinned against `UncondEditPipeline`:

  1. DDIM inversion xT parity (run_DDIMinversion, edit.py:2116-2167)
  2. xT -> x_{edit_t} forward parity (DDIMforwardsteps, edit.py:2507-2593)
  3. basis-extraction subspace parity with MATCHED probes and a fixed
     iteration count (local_encoder_decoder_pullback_xt, edit.py:2406-2504
     vs editing.pullback.subspace_iteration)
  4. final edited-strip pixel parity through the vT-load branch
     (edit.py:2333-2364 walk + strip assembly + completion denoise vs
     run_edit_null_space_projection with vT_path)

This is the composition-level check the per-component goldens cannot give
(timestep bookkeeping, walk/strip assembly order, grid chaining). The
reference engine is constructed without its loader __init__ (attributes set
directly — the loaders need HF downloads), its hardcoded
torch.device('cuda:0') (edit.py:2350) is mapped to CPU via a torch.device
patch, and visualization deps are stubbed (tests/_ref_stubs.py). No
reference code is vendored; it is imported from /root/reference as the
oracle."""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _ref_stubs import install_reference_path  # noqa: E402

install_reference_path()
sys.path.insert(0, "/root/reference/src/models")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from loco_edit_tpu.core.rng import seed_everything  # noqa: E402
from loco_edit_tpu.diffusion import LinspaceDDIM  # noqa: E402
from loco_edit_tpu.editing import save_directions, subspace_iteration  # noqa: E402
from loco_edit_tpu.editing.pullback import pmp_pullback_fn  # noqa: E402
from loco_edit_tpu.models.base import Denoiser  # noqa: E402
from loco_edit_tpu.models.ddpm import (  # noqa: E402
    DDPMConfig,
    DDPMUNet,
    convert_ddpm_state_dict,
)
from loco_edit_tpu.pipelines import UncondEditConfig, UncondEditPipeline  # noqa: E402

CFG = DDPMConfig(resolution=32, in_channels=3, out_ch=3, ch=32,
                 ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(16,),
                 dropout=0.0, resamp_with_conv=True)

FOR_STEPS = 20
EDIT_T = 0.6
SCALE = 0.5
NUM_STEP = 4
VIS_NUM = 2


class _NS:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _FakeDataset:
    def __init__(self, img, mask):
        self.img, self.mask = img, mask

    def __getitem__(self, idx):
        return self.img.clone()

    def getmask(self, idx, choose_sem):
        return self.mask.clone()


def _nchw_to_nhwc(a):
    return np.asarray(a).transpose(0, 2, 3, 1)


def _flat_chw_to_hwc(v, c=3, h=32, w=32):
    """Reference direction rows are flattened (C,H,W); ours (H,W,C)."""
    return np.asarray(v).reshape(-1, c, h, w).transpose(0, 2, 3, 1).reshape(
        -1, c * h * w)


@pytest.fixture(scope="module")
def shared():
    """Tiny DDPM built on BOTH sides from one state_dict, plus the fixed
    input image and mask."""
    try:
        from ddpm.diffusion import DDPM, PullBackDDPM
        from modules.edit import EditUncondDiffusion  # noqa: F401
        from utils.utils import YHCustomScheduler  # noqa: F401
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference not importable: {e}")

    config = _NS(
        model=_NS(ch=CFG.ch, out_ch=CFG.out_ch, ch_mult=list(CFG.ch_mult),
                  num_res_blocks=CFG.num_res_blocks,
                  attn_resolutions=list(CFG.attn_resolutions),
                  dropout=0.0, in_channels=3, resamp_with_conv=True),
        data=_NS(image_size=CFG.resolution),
    )
    ref_net = DDPM(config)
    gen = torch.Generator().manual_seed(11)
    sd = {k: torch.randn(v.shape, generator=gen) * 0.05
          for k, v in ref_net.state_dict().items()}
    ref_net.load_state_dict(sd)
    ref_net.eval()
    ref_net.device = torch.device("cpu")
    ref_net.dtype = torch.float32

    class _UNet:
        """Engine-facing callable: the reference engine calls unet(x, t)
        with a shared 0-dim t (edit.py:2151,2572); PullBackDDPM.forward
        broadcasts the single-timestep embedding over the batch."""

        def __call__(self, x, t):
            tt = t if torch.is_tensor(t) else torch.tensor(float(t))
            return PullBackDDPM.forward(ref_net, x, tt)

    params = convert_ddpm_state_dict({k: v.numpy() for k, v in sd.items()}, CFG)
    model = DDPMUNet(CFG)
    den = Denoiser(eps_fn=lambda z, t: model.apply(params, z, t),
                   sample_shape=(32, 32, 3))

    rng = np.random.default_rng(42)
    x0 = (rng.normal(size=(1, 3, 32, 32)) * 0.4).astype(np.float32)
    mask_chw = torch.zeros(3, 32, 32, dtype=torch.bool)
    mask_chw[:, 8:20, 10:24] = True

    return _NS(unet_t=_UNet(), den=den, x0_nchw=x0,
               x0_nhwc=_nchw_to_nhwc(x0).copy(), mask_chw=mask_chw,
               mask_nhwc=mask_chw.numpy().transpose(1, 2, 0)[None])


def _make_ref_engine(shared, tmp, vT_path):
    from modules.edit import EditUncondDiffusion
    from utils.utils import YHCustomScheduler

    args = _NS(noise_schedule="linear", device=torch.device("cpu"),
               dtype=torch.float32, sample_idx=0, choose_sem="skin",
               sampling_mode=False, mask_index=0)
    eng = object.__new__(EditUncondDiffusion)
    eng.args = args
    eng.unet = shared.unet_t
    eng.scheduler = YHCustomScheduler(args)
    eng.model_name = "custom_tiny"
    eng.device = args.device
    eng.dtype = args.dtype
    eng.buffer_device = torch.device("cpu")
    eng.pca_device = torch.device("cpu")
    eng.memory_bound = 50
    eng.seed = 0
    eng.save_result_as = "png"
    eng.image_size = 32
    eng.c_in = 3
    eng.dataset = _FakeDataset(torch.from_numpy(shared.x0_nchw), shared.mask_chw)
    eng.dataset_name = "CelebA_HQ_mask"
    eng.for_steps = FOR_STEPS
    eng.inv_steps = FOR_STEPS
    eng.use_yh_custom_scheduler = True
    eng.edit_t = EDIT_T
    eng.scheduler.set_timesteps(FOR_STEPS)
    eng.edit_t_idx = int((eng.scheduler.timesteps - EDIT_T * 1000).abs().argmin())
    eng.performance_boosting_t_idx = 1000  # boosting off -> deterministic
    eng.use_x_space_guidance = True
    eng.x_space_guidance_edit_step = 1.0
    eng.x_space_guidance_scale = SCALE
    eng.x_space_guidance_num_step = NUM_STEP
    eng.result_folder = str(tmp)
    eng.obs_folder = str(tmp)
    eng.mask_type = "GT"
    eng.vT_path = vT_path
    eng.vT1_path = ""
    eng.EXP_NAME = "golden"
    return eng


def _make_ours(shared, tmp, **overrides):
    cfg = UncondEditConfig(
        for_steps=FOR_STEPS, inv_steps=FOR_STEPS, edit_t=EDIT_T,
        performance_boosting_t=0.0, x_space_guidance_scale=SCALE,
        x_space_guidance_edit_step=1.0, x_space_guidance_num_step=NUM_STEP,
        vis_num=VIS_NUM, vis_num_pc=1, pca_rank=3, pca_rank_null=2,
        result_folder=str(tmp), save_images=False, **overrides)
    return UncondEditPipeline(shared.den, cfg, seed_everything(5))


@pytest.fixture()
def cpu_cuda_patch(monkeypatch):
    """Map the engine's hardcoded torch.device('cuda:0') (edit.py:2350) to
    CPU for the walk; all other device constructions pass through."""
    orig = torch.device

    def _dev(*a, **kw):
        if a and isinstance(a[0], str) and a[0].startswith("cuda"):
            return orig("cpu")
        return orig(*a, **kw)

    monkeypatch.setattr(torch, "device", _dev)
    return _dev


def test_inversion_and_forward_to_edit_t_match_reference(shared, tmp_path):
    eng = _make_ref_engine(shared, tmp_path, str(tmp_path / "missing.pt"))
    with torch.no_grad():
        xT_ref = eng.run_DDIMinversion(idx=0).numpy()
        xt_ref, t_ref, t_idx = eng.DDIMforwardsteps(
            torch.from_numpy(xT_ref), t_start_idx=0, t_end_idx=eng.edit_t_idx)
    xt_ref = xt_ref.numpy()

    pipe = _make_ours(shared, tmp_path)
    assert pipe.edit_t_idx == eng.edit_t_idx
    xT = np.asarray(pipe.invert(jnp.asarray(shared.x0_nhwc)))
    np.testing.assert_allclose(xT, _nchw_to_nhwc(xT_ref), atol=2e-3)

    xt = np.asarray(pipe.generate(jnp.asarray(xT), 0, pipe.edit_t_idx))
    np.testing.assert_allclose(xt, _nchw_to_nhwc(xt_ref), atol=2e-3)
    # the model timestep at the edit point must agree exactly
    assert float(t_ref) == float(pipe.gen_grid.t[pipe.edit_t_idx])


def test_basis_subspace_matches_reference_matched_probes(shared, tmp_path):
    """Fixed iteration budget (tol=0 -> no early exit on either side) and
    IDENTICAL starting probes: the per-iteration subspace trajectory of both
    implementations is then the same mathematical map, so the final spans
    must coincide up to fp error — regardless of the tiny net's (degenerate)
    spectrum. Reference probes are injected by patching torch.randn for the
    one (d, rank) draw at edit.py:2435."""
    rank = 3
    iters = 6
    d = 3 * 32 * 32
    eng = _make_ref_engine(shared, tmp_path, str(tmp_path / "missing.pt"))
    with torch.no_grad():
        xT_ref = eng.run_DDIMinversion(idx=0)
        xt_ref, t_ref, _ = eng.DDIMforwardsteps(
            xT_ref, t_start_idx=0, t_end_idx=eng.edit_t_idx)

    g0 = torch.randn(d, rank, generator=torch.Generator().manual_seed(99))
    orig_randn = torch.randn

    def _randn(*size, **kw):
        if tuple(size) == (d, rank):
            return g0.clone().to(**{k: v for k, v in kw.items()
                                    if k in ("device", "dtype")})
        return orig_randn(*size, **kw)

    torch.randn = _randn
    try:
        u_ref, s_ref, vT_ref = eng.local_encoder_decoder_pullback_xt(
            x=xt_ref, t=t_ref, op="mid", block_idx=0, pca_rank=rank,
            chunk_size=25, min_iter=iters, max_iter=iters,
            convergence_threshold=0.0, mask=shared.mask_chw, noise=False)
    finally:
        torch.randn = orig_randn

    # identical starting point on our side: the reference QRs g0 and
    # transposes (edit.py:2435-2438)
    q, _ = torch.linalg.qr(g0)
    v_init = jnp.asarray(_flat_chw_to_hwc(q.T.numpy()))

    pipe = _make_ours(shared, tmp_path)
    xt = pipe.generate(pipe.invert(jnp.asarray(shared.x0_nhwc)), 0,
                       pipe.edit_t_idx)
    f = pmp_pullback_fn(shared.den.eps_fn,
                        float(pipe.gen_grid.alpha_bar[pipe.edit_t_idx]),
                        float(pipe.gen_grid.t[pipe.edit_t_idx]))
    basis = subspace_iteration(
        f, jnp.asarray(xt), jax.random.key(0), rank=rank,
        mask=jnp.asarray(shared.mask_nhwc, jnp.float32),
        min_iter=iters, max_iter=iters, tol=0.0, pad_probes=False,
        v_init=v_init)

    v_ours = np.asarray(basis.vT)
    v_ref = _flat_chw_to_hwc(vT_ref.numpy())
    # subspace parity: all principal angles ~0 <=> all singular values of
    # V_ours V_ref^T ~ 1
    overlap = np.linalg.svd(v_ours @ v_ref.T, compute_uv=False)
    np.testing.assert_allclose(overlap, 1.0, atol=5e-3)
    # singular-value estimates
    np.testing.assert_allclose(np.asarray(basis.s), s_ref.numpy(), rtol=2e-3)


def test_final_edited_strip_matches_reference_shared_direction(
        shared, tmp_path, cpu_cuda_patch):
    """The vT-load branch (direction transfer, edit.py:2333-2336): both
    engines load the SAME direction row, walk +/-, assemble the mirrored
    strip and complete the denoise — final pixels must match. This pins the
    exact composition the component tests cannot: edit_t chaining, walk step
    scaling, strip subsample/mirror order, completion grid."""
    rng = np.random.default_rng(7)
    v_chw = rng.normal(size=(1, 3 * 32 * 32)).astype(np.float32)
    v_chw /= np.linalg.norm(v_chw)
    vt_pt = str(tmp_path / "shared-vT.pt")
    torch.save(torch.from_numpy(v_chw), vt_pt)
    vt_npz = str(tmp_path / "shared-vT.npz")
    save_directions(vt_npz, _flat_chw_to_hwc(v_chw), edit_t=EDIT_T)

    eng = _make_ref_engine(shared, tmp_path, vt_pt)
    # the engine DISCARDS the completion denoise's return value
    # (edit.py:2364 does not assign; :2366 returns the pre-denoise strip and
    # only the PNG sees the result) — wrap DDIMforwardsteps to capture both
    captured = {}
    orig_fwd = eng.DDIMforwardsteps

    def _fwd(xt, t_start_idx, t_end_idx, **kw):
        out = orig_fwd(xt, t_start_idx=t_start_idx, t_end_idx=t_end_idx, **kw)
        if t_end_idx == -1:
            captured["pre"] = xt.clone()
            captured["post"] = out.clone()
        return out

    eng.DDIMforwardsteps = _fwd
    with torch.no_grad():
        eng.run_edit_null_space_projection(
            idx=0, vis_num=VIS_NUM, vis_num_pc=1, pca_rank=3, pca_rank_null=2,
            op="mid", block_idx=0, null_space_projection=True, use_mask=True)
    strip_ref = _nchw_to_nhwc(captured["post"].numpy())

    pipe = _make_ours(shared, tmp_path / "ours")
    out = pipe.run_edit_null_space_projection(
        x0=shared.x0_nhwc, mask=shared.mask_nhwc, sample_name="golden",
        vT_path=vt_npz)
    strip = out["strips"][0]
    assert strip.shape == strip_ref.shape
    np.testing.assert_allclose(strip, strip_ref, atol=5e-3)

    # and the PRE-denoise strip (walk frames + subsample + mirror order)
    from loco_edit_tpu.editing import x_space_guidance_strip

    pre_ours = np.asarray(x_space_guidance_strip(
        jnp.asarray(out["xt"]), jnp.asarray(out["vT"][0]), scale=SCALE,
        edit_step=1.0, num_steps=NUM_STEP, vis_num=VIS_NUM))
    np.testing.assert_allclose(pre_ours, _nchw_to_nhwc(captured["pre"].numpy()),
                               atol=3e-3)


def test_group_edit_matches_reference(shared, tmp_path, cpu_cuda_patch):
    """Direction composition (group_edit_null_space_projection,
    edit.py:2171-2212): both engines invert the image, load the SAME two
    saved directions, apply each full walk offset cumulatively
    (xt += scale * num_step * v_k), and denoise the 3-frame
    [original, +v0, +v0+v1] strip to completion — final pixels must match."""
    rng = np.random.default_rng(13)
    rows_chw = rng.normal(size=(2, 3 * 32 * 32)).astype(np.float32)
    rows_chw /= np.linalg.norm(rows_chw, axis=1, keepdims=True)
    pt_paths, npz_paths = [], []
    for i in range(2):
        p_pt = str(tmp_path / f"dir{i}.pt")
        torch.save(torch.from_numpy(rows_chw[i:i + 1]), p_pt)
        pt_paths.append(p_pt)
        p_npz = str(tmp_path / f"dir{i}.npz")
        save_directions(p_npz, _flat_chw_to_hwc(rows_chw[i:i + 1]),
                        edit_t=EDIT_T)
        npz_paths.append(p_npz)

    eng = _make_ref_engine(shared, tmp_path, pt_paths[0])
    eng.vT1_path = pt_paths[1]
    captured = {}
    orig_fwd = eng.DDIMforwardsteps

    def _fwd(xt, t_start_idx, t_end_idx, **kw):
        out = orig_fwd(xt, t_start_idx=t_start_idx, t_end_idx=t_end_idx, **kw)
        if t_end_idx == -1:
            captured["post"] = out.clone()
        return out

    eng.DDIMforwardsteps = _fwd
    with torch.no_grad():
        eng.group_edit_null_space_projection(idx=0)
    strip_ref = _nchw_to_nhwc(captured["post"].numpy())

    pipe = _make_ours(shared, tmp_path / "ours")
    xT = np.asarray(pipe.invert(jnp.asarray(shared.x0_nhwc)))
    strip = pipe.group_edit(xT, npz_paths, sample_name="group")
    assert strip.shape == strip_ref.shape
    np.testing.assert_allclose(strip, strip_ref, atol=5e-3)
