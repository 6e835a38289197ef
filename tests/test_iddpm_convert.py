"""Golden parity for the improved-diffusion (IDDPM) vintage: the reference's
third ADM variant (src/models/improved_diffusion/unet.py — legacy attention
packing, standalone up/downsampling, no num_head_channels) must convert and
match through the same ADM converter."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src/models")

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

import jax.numpy as jnp  # noqa: E402

from loco_edit_tpu.models.adm import ADMUNet  # noqa: E402
from loco_edit_tpu.models.adm.config import ADMConfig  # noqa: E402
from loco_edit_tpu.models.adm.convert import convert_adm_state_dict  # noqa: E402


def test_iddpm_vintage_parity():
    try:
        from improved_diffusion.unet import UNetModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"improved_diffusion not importable: {e}")

    kw = dict(in_channels=3, model_channels=32, out_channels=6,
              num_res_blocks=2, attention_resolutions=(4,), dropout=0.0,
              channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
              num_heads=2, num_heads_upsample=-1, use_scale_shift_norm=True)
    ref = UNetModel(**kw)
    ref.eval()
    gen = torch.Generator().manual_seed(0)
    sd = {k: torch.randn(v.shape, generator=gen) * 0.05
          for k, v in ref.state_dict().items()}
    ref.load_state_dict(sd)

    cfg = ADMConfig(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=2, attention_ds=(4,), channel_mult=(1, 2),
        num_classes=None, num_heads=2, num_head_channels=-1,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=False, conv_resample=True, learn_sigma=True)
    params = convert_adm_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    model = ADMUNet(cfg)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    t = 377.21
    ref.device = torch.device("cpu")
    with torch.no_grad():
        ref_eps = ref(torch.from_numpy(x), torch.tensor([t, t])).numpy()
    eps = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(eps).transpose(0, 3, 1, 2), ref_eps,
                               atol=2e-4, rtol=1e-3)
