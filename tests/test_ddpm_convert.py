"""Golden parity for the classic DDPM U-Net: convert a reference-model
state_dict (SDEdit naming) and compare forwards; plus a structure test for the
diffusers UNet2DModel naming."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src/models")

# stub visualization-only deps the reference file imports at module scope
for _name in ("torchvision", "torchvision.utils", "skimage", "matplotlib",
              "matplotlib.pyplot", "tqdm"):
    if _name not in sys.modules:
        mod = types.ModuleType(_name)
        import importlib.machinery

        # real ModuleSpec so later importlib.util.find_spec calls (e.g.
        # transformers probing torchvision) do not fail on the stub
        mod.__spec__ = importlib.machinery.ModuleSpec(_name, loader=None)
        if _name == "tqdm":
            mod.tqdm = lambda x, **kw: x
        sys.modules[_name] = mod

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from loco_edit_tpu.models.ddpm import (  # noqa: E402
    DDPMConfig,
    DDPMUNet,
    convert_ddpm_state_dict,
    convert_diffusers_unet2d_state_dict,
)

CFG = DDPMConfig(resolution=32, in_channels=3, out_ch=3, ch=32,
                 ch_mult=(1, 2), num_res_blocks=2, attn_resolutions=(16,),
                 dropout=0.0, resamp_with_conv=True)


def _reference_ddpm():
    try:
        from ddpm.diffusion import DDPM, PullBackDDPM  # noqa: F401
        from ddpm.diffusion import DDPM as RefDDPM
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference ddpm not importable: {e}")

    class _NS:
        def __init__(self, **kw):
            self.__dict__.update(kw)

    config = _NS(
        model=_NS(ch=CFG.ch, out_ch=CFG.out_ch, ch_mult=list(CFG.ch_mult),
                  num_res_blocks=CFG.num_res_blocks,
                  attn_resolutions=list(CFG.attn_resolutions),
                  dropout=0.0, in_channels=3, resamp_with_conv=True),
        data=_NS(image_size=CFG.resolution),
    )
    return RefDDPM(config)


def _ref_forward(ref, x, t):
    """Reference DDPM.forward raises NotImplementedError; PullBackDDPM.forward
    needs an args object. Reuse PullBackDDPM's forward unbound on the DDPM
    module with device attrs attached."""
    ref.device = torch.device("cpu")
    ref.dtype = torch.float32
    from ddpm.diffusion import PullBackDDPM

    return PullBackDDPM.forward(ref, x, t)


def test_converted_sdedit_weights_match_reference_forward():
    ref = _reference_ddpm()
    gen = torch.Generator().manual_seed(0)
    sd = {k: torch.randn(v.shape, generator=gen) * 0.05
          for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd)
    ref.eval()

    params = convert_ddpm_state_dict({k: v.numpy() for k, v in sd.items()}, CFG)
    model = DDPMUNet(CFG)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    t = 433.77
    with torch.no_grad():
        ref_eps = _ref_forward(ref, torch.from_numpy(x),
                               torch.tensor([t, t])).numpy()
    eps = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    got = np.asarray(eps).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_eps, atol=2e-4, rtol=1e-3)


def _synth_diffusers_sd():
    """Synthetic diffusers-named state_dict for CFG (old query/key/value naming)."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(name, *shape):
        sd[f"{name}.weight"] = rng.normal(size=shape).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = rng.normal(size=shape[0]).astype(np.float32) * 0.05

    ch, mults, nres = CFG.ch, CFG.ch_mult, CFG.num_res_blocks
    temb = 4 * ch
    add("time_embedding.linear_1", temb, ch)
    add("time_embedding.linear_2", temb, temb)
    add("conv_in", ch, 3, 3, 3)
    add("conv_norm_out", ch)
    add("conv_out", 3, ch, 3, 3)

    def res(base, cin, cout):
        add(f"{base}.norm1", cin)
        add(f"{base}.conv1", cout, cin, 3, 3)
        add(f"{base}.time_emb_proj", cout, temb)
        add(f"{base}.norm2", cout)
        add(f"{base}.conv2", cout, cout, 3, 3)
        if cin != cout:
            add(f"{base}.conv_shortcut", cout, cin, 1, 1)

    def attn(base, c):
        add(f"{base}.group_norm", c)
        for n in ("query", "key", "value", "proj_attn"):
            add(f"{base}.{n}", c, c)

    in_mult = (1,) + tuple(mults)
    curr = CFG.resolution
    nlev = len(mults)
    for i in range(nlev):
        cin = ch * in_mult[i]
        cout = ch * mults[i]
        for j in range(nres):
            res(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
            if curr in CFG.attn_resolutions:
                attn(f"down_blocks.{i}.attentions.{j}", cout)
        if i != nlev - 1:
            add(f"down_blocks.{i}.downsamplers.0.conv", cout, cout, 3, 3)
            curr //= 2
    c_mid = ch * mults[-1]
    res("mid_block.resnets.0", c_mid, c_mid)
    attn("mid_block.attentions.0", c_mid)
    res("mid_block.resnets.1", c_mid, c_mid)
    for k in range(nlev):
        i = nlev - 1 - k
        cout = ch * mults[i]
        lres = CFG.resolution // (2 ** i)
        for j in range(nres + 1):
            skip = ch * (in_mult[i] if j == nres else mults[i])
            cin = (c_mid if (k == 0 and j == 0) else
                   ch * mults[i] if j > 0 or k == 0 else ch * mults[i + 1])
            # actual input channels: previous block_out + skip
            prev = c_mid if (k == 0 and j == 0) else (
                ch * mults[i] if j > 0 else ch * mults[i + 1])
            res(f"up_blocks.{k}.resnets.{j}", prev + skip, cout)
            if lres in CFG.attn_resolutions:
                attn(f"up_blocks.{k}.attentions.{j}", cout)
        if i != 0:
            add(f"up_blocks.{k}.upsamplers.0.conv", cout, cout, 3, 3)
    return sd


def test_diffusers_naming_structure_matches_init():
    sd = _synth_diffusers_sd()
    params = convert_diffusers_unet2d_state_dict(sd, CFG)
    model = DDPMUNet(CFG)
    expected = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 32, 32, 3)), 500.0)
    got = {jax.tree_util.keystr(p): v.shape
           for p, v in jax.tree_util.tree_leaves_with_path(params)}
    want = {jax.tree_util.keystr(p): v.shape
            for p, v in jax.tree_util.tree_leaves_with_path(expected)}
    assert got == want
