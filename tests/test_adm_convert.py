"""Golden parity: convert a torch guided-diffusion UNetModel's state_dict and
compare outputs against the reference model itself (imported read-only from
/root/reference as the oracle — none of its code lives in this repo).

This validates layout enumeration, conv/linear/groupnorm conversion, legacy
qkv head-packing, up/downsampling, skip ordering and the learn_sigma split in
one shot.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/src/models")

# the reference imports torchvision only for debug image dumps we never call;
# stub it so the oracle loads in this torchvision-free env
import importlib.machinery  # noqa: E402
import types  # noqa: E402

for _name in ("torchvision", "torchvision.utils"):
    if _name not in sys.modules:
        _m = types.ModuleType(_name)
        # a real ModuleSpec so importlib.util.find_spec on the stub does not
        # blow up in later tests (transformers probes torchvision this way)
        _m.__spec__ = importlib.machinery.ModuleSpec(_name, loader=None)
        sys.modules[_name] = _m

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from loco_edit_tpu.models.adm import ADMUNet  # noqa: E402
from loco_edit_tpu.models.adm.config import ADMConfig  # noqa: E402
from loco_edit_tpu.models.adm.convert import convert_adm_state_dict  # noqa: E402


def _reference_model(**kw):
    try:
        from guided_diffusion.unet import UNetModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference model not importable: {e}")
    return UNetModel(**kw)


CASES = {
    "p2_like": dict(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=1, num_head_channels=16,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=True, use_new_attention_order=False,
    ),
    # NOTE: the reference forward always splits learn-sigma channels
    # (unet.py:680), so out_channels must be 6 in every oracle case
    "legacy_updown_noscale": dict(
        image_size=32, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=2, attention_resolutions=(4,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=2, num_head_channels=-1,
        num_heads_upsample=-1, use_scale_shift_norm=False,
        resblock_updown=False, use_new_attention_order=False,
    ),
}


def _to_adm_config(kw) -> ADMConfig:
    return ADMConfig(
        image_size=kw["image_size"],
        in_channels=kw["in_channels"],
        model_channels=kw["model_channels"],
        out_channels=kw["out_channels"],
        num_res_blocks=kw["num_res_blocks"],
        attention_ds=tuple(kw["attention_resolutions"]),
        dropout=kw["dropout"],
        channel_mult=kw["channel_mult"],
        num_classes=kw["num_classes"],
        num_heads=kw["num_heads"],
        num_head_channels=kw["num_head_channels"],
        num_heads_upsample=kw["num_heads_upsample"],
        use_scale_shift_norm=kw["use_scale_shift_norm"],
        resblock_updown=kw["resblock_updown"],
        learn_sigma=kw["out_channels"] == 6,
    )


@pytest.mark.parametrize("case", sorted(CASES))
def test_converted_weights_match_reference_forward(case):
    kw = CASES[case]
    ref = _reference_model(**kw)
    ref.eval()
    # randomize: zero-init convs would hide packing errors
    gen = torch.Generator().manual_seed(0)
    sd = {}
    with torch.no_grad():
        for k, v in ref.state_dict().items():
            sd[k] = torch.randn(v.shape, generator=gen) * 0.05
    ref.load_state_dict(sd)

    cfg = _to_adm_config(kw)
    params = convert_adm_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    model = ADMUNet(cfg)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32) * 0.5
    t = 612.43

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), torch.tensor([t, t]))
    ref_eps = ref_out.numpy()

    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    eps = model.apply(params, x_nhwc, jnp.asarray(t))
    got = np.asarray(eps).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(got, ref_eps, atol=2e-4, rtol=1e-3)


def test_converted_tree_structure_matches_init():
    kw = CASES["p2_like"]
    ref = _reference_model(**kw)
    cfg = _to_adm_config(kw)
    params = convert_adm_state_dict(
        {k: v.numpy() for k, v in ref.state_dict().items()}, cfg)
    model = ADMUNet(cfg)
    expected = jax.eval_shape(model.init, jax.random.key(0),
                              jnp.zeros((1, 32, 32, 3)), 500.0)
    got_paths = {jax.tree_util.keystr(p): v.shape
                 for p, v in jax.tree_util.tree_leaves_with_path(params)}
    want_paths = {jax.tree_util.keystr(p): v.shape
                  for p, v in jax.tree_util.tree_leaves_with_path(expected)}
    assert got_paths == want_paths
