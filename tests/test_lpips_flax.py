"""Golden parity for the Flax LPIPS vs a from-scratch torch oracle.

The oracle reimplements the lpips-package computation (ScalingLayer ->
AlexNet/VGG16 feature taps -> channel unit-normalize -> squared diff -> 1x1
lin heads -> spatial mean -> sum) directly from torch.nn.functional with
synthetic random weights, so the test verifies both the Flax architecture and
`convert_lpips_state_dict` without any pretrained download."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from loco_edit_tpu.utils.lpips_flax import (  # noqa: E402
    LPIPSFlax,
    convert_lpips_state_dict,
)

_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

ALEX_SPEC = [  # (feature_idx, in, out, k, stride, pad, pool_before)
    (0, 3, 64, 11, 4, 2, False),
    (3, 64, 192, 5, 1, 2, True),
    (6, 192, 384, 3, 1, 1, True),
    (8, 384, 256, 3, 1, 1, False),
    (10, 256, 256, 3, 1, 1, False),
]
VGG_PLAN = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def _make_alex_sd(rng):
    sd = {}
    for fi, ci, co, k, _, _, _ in ALEX_SPEC:
        sd[f"features.{fi}.weight"] = torch.tensor(
            rng.normal(0, 0.2, (co, ci, k, k)), dtype=torch.float32)
        sd[f"features.{fi}.bias"] = torch.tensor(
            rng.normal(0, 0.1, (co,)), dtype=torch.float32)
    return sd


def _make_vgg_sd(rng):
    sd, fi, ci = {}, 0, 3
    for bi, (co, n) in enumerate(VGG_PLAN):
        if bi > 0:
            fi += 1  # the MaxPool slot
        for _ in range(n):
            sd[f"features.{fi}.weight"] = torch.tensor(
                rng.normal(0, 0.2, (co, ci, 3, 3)), dtype=torch.float32)
            sd[f"features.{fi}.bias"] = torch.tensor(
                rng.normal(0, 0.1, (co,)), dtype=torch.float32)
            fi += 2  # conv + relu
            ci = co
    return sd


def _make_lins(rng, chans, style="lpips"):
    key = "lin{}.model.1.weight" if style == "lpips" else "lin{}.weight"
    return {key.format(i): torch.tensor(
        np.abs(rng.normal(0, 0.3, (1, c, 1, 1))), dtype=torch.float32)
        for i, c in enumerate(chans)}


def _torch_alex_taps(x, sd):
    import torch.nn.functional as F

    taps = []
    for fi, _, _, _, s, p, pool in ALEX_SPEC:
        if pool:
            x = F.max_pool2d(x, 3, 2)
        x = F.relu(F.conv2d(x, sd[f"features.{fi}.weight"],
                            sd[f"features.{fi}.bias"], stride=s, padding=p))
        taps.append(x)
    return taps


def _torch_vgg_taps(x, sd):
    import torch.nn.functional as F

    taps, fi = [], 0
    for bi, (_, n) in enumerate(VGG_PLAN):
        if bi > 0:
            x = F.max_pool2d(x, 2, 2)
            fi += 1
        for _ in range(n):
            x = F.relu(F.conv2d(x, sd[f"features.{fi}.weight"],
                                sd[f"features.{fi}.bias"], padding=1))
            fi += 2
        taps.append(x)
    return taps


def _torch_lpips(a, b, sd, lins, net):
    taps_fn = _torch_alex_taps if net == "alex" else _torch_vgg_taps
    a = (a - _SHIFT) / _SCALE
    b = (b - _SHIFT) / _SCALE
    fa, fb = taps_fn(a, sd), taps_fn(b, sd)
    total = torch.zeros(a.shape[0])
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb).pow(2)
        w = lins[[k_ for k_ in lins if k_.startswith(f"lin{k}")][0]]
        total = total + (d * w).sum(1).mean((1, 2))
    return total.numpy()


@pytest.mark.parametrize("net,size", [("alex", 64), ("vgg", 32)])
def test_lpips_flax_matches_torch_oracle(net, size):
    rng = np.random.default_rng(0)
    sd = _make_alex_sd(rng) if net == "alex" else _make_vgg_sd(rng)
    chans = (64, 192, 384, 256, 256) if net == "alex" else (64, 128, 256, 512, 512)
    lins = _make_lins(rng, chans)

    a = rng.uniform(-1, 1, (2, 3, size, size)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 3, size, size)).astype(np.float32)
    want = _torch_lpips(torch.tensor(a), torch.tensor(b), sd, lins, net)

    variables, detected = convert_lpips_state_dict(sd, lins)
    assert detected == net or (net == "vgg" and detected == "vgg")
    model = LPIPSFlax(net=detected)
    got = np.asarray(model.apply(variables,
                                 np.transpose(a, (0, 2, 3, 1)),
                                 np.transpose(b, (0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_lpips_converter_full_state_dict_and_strictness():
    """lpips/torchmetrics-style combined dict (net.sliceK.I.*) converts; an
    unknown key raises; a wrong-size lin head raises."""
    rng = np.random.default_rng(1)
    feat = _make_alex_sd(rng)
    # re-key into slice form: slice1={0}, slice2={3}, slice3={6}, slice4={8},
    # slice5={10} (original torchvision indices preserved inside each slice)
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}
    sd = {}
    for k, v in feat.items():
        fi = int(k.split(".")[1])
        sd[f"net.slice{slice_of[fi]}.{fi}.{k.split('.')[-1]}"] = v
    sd.update(_make_lins(rng, (64, 192, 384, 256, 256)))
    sd["scaling_layer.shift"] = _SHIFT
    sd["scaling_layer.scale"] = _SCALE

    variables, net = convert_lpips_state_dict(sd)
    assert net == "alex"
    assert variables["params"]["lin0"].shape == (64,)

    bad = dict(sd)
    bad["mystery.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unconverted"):
        convert_lpips_state_dict(bad)

    bad2 = dict(sd)
    bad2["lin0.model.1.weight"] = torch.zeros(1, 32, 1, 1)
    with pytest.raises(ValueError, match="lin0"):
        convert_lpips_state_dict(bad2)


def test_lpips_converter_real_checkpoint_key_shapes():
    """The key shapes real checkpoints actually ship:
    - lpips package: duplicate heads (`lin0.model.1.weight` AND
      `lins.0.model.1.weight` alias the same module) + slice backbone
    - torchmetrics: everything under one extra `net.` prefix
    - torchvision full file: classifier/avgpool extras alongside features
    - bare `features.state_dict()` dump: keys like "0.weight"."""
    rng = np.random.default_rng(4)
    feat = _make_alex_sd(rng)
    lins = _make_lins(rng, (64, 192, 384, 256, 256))
    slice_of = {0: 1, 3: 2, 6: 3, 8: 4, 10: 5}

    # --- lpips package style with duplicated lins.* aliases
    sd = {}
    for k, v in feat.items():
        fi = int(k.split(".")[1])
        sd[f"net.slice{slice_of[fi]}.{fi}.{k.split('.')[-1]}"] = v
    sd.update(lins)
    sd.update({f"lins.{k[3]}.model.1.weight": v for k, v in lins.items()})
    sd["scaling_layer.shift"] = _SHIFT
    sd["scaling_layer.scale"] = _SCALE
    v1, net = convert_lpips_state_dict(sd)
    assert net == "alex"

    # --- torchmetrics: one extra net. prefix on every key
    tm = {("net." + k): v for k, v in sd.items()}
    v2, _ = convert_lpips_state_dict(tm)
    np.testing.assert_array_equal(v1["params"]["lin3"], v2["params"]["lin3"])

    # --- torchvision full checkpoint (classifier extras) + separate heads
    tv = dict(feat)
    tv["classifier.1.weight"] = torch.zeros(4096, 9216)
    tv["classifier.1.bias"] = torch.zeros(4096)
    v3, _ = convert_lpips_state_dict(tv, lins)
    np.testing.assert_array_equal(v1["params"]["trunk"]["conv0"]["kernel"],
                                  v3["params"]["trunk"]["conv0"]["kernel"])

    # --- bare features submodule dump ("0.weight", ...)
    bare = {k.split(".", 1)[1]: v for k, v in feat.items()}
    v4, _ = convert_lpips_state_dict(bare, lins)
    np.testing.assert_array_equal(v3["params"]["trunk"]["conv4"]["bias"],
                                  v4["params"]["trunk"]["conv4"]["bias"])


def test_eval_cli_lpips_with_local_weights(tmp_path):
    """End-to-end: a synthetic full LPIPS checkpoint on disk drives the eval
    CLI's lpips metric through the native Flax path (no torchmetrics)."""
    from PIL import Image

    from loco_edit_tpu.cli.eval import main as eval_main

    rng = np.random.default_rng(3)
    sd = _make_alex_sd(rng)
    sd.update(_make_lins(rng, (64, 192, 384, 256, 256)))
    ckpt = tmp_path / "lpips_alex.pt"
    torch.save(sd, ckpt)

    pdir, tdir = tmp_path / "p", tmp_path / "t"
    pdir.mkdir(), tdir.mkdir()
    img = rng.uniform(0, 255, (64, 64, 3)).astype(np.uint8)
    Image.fromarray(img).save(pdir / "0.png")
    Image.fromarray(img).save(tdir / "0.png")
    r = eval_main(["--eval_metric", "lpips", "--folder_preds", str(pdir),
                   "--folder_original", str(tdir),
                   "--lpips_weights", str(ckpt)])
    assert abs(r) < 1e-6  # identical pair -> zero distance


def test_lpips_zero_distance_and_normalize():
    rng = np.random.default_rng(2)
    sd = _make_alex_sd(rng)
    lins = _make_lins(rng, (64, 192, 384, 256, 256))
    variables, _ = convert_lpips_state_dict(sd, lins)
    model = LPIPSFlax(net="alex")
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    d = np.asarray(model.apply(variables, x, x))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_lpips_net_mismatch_raises(tmp_path):
    """metrics.lpips with an explicit net that contradicts the checkpoint's
    backbone must raise, not silently score with the wrong network."""
    from loco_edit_tpu.utils import metrics

    rng = np.random.default_rng(6)
    sd = _make_alex_sd(rng)
    sd.update(_make_lins(rng, (64, 192, 384, 256, 256)))
    ckpt = tmp_path / "lpips_alex.pt"
    torch.save(sd, ckpt)

    a = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="alex.*vgg|vgg.*alex"):
        metrics.lpips(a, a, net="vgg", weights_path=str(ckpt))
    # net=None and the matching explicit net both work
    assert abs(float(metrics.lpips(a, a, weights_path=str(ckpt))[0])) < 1e-6
    assert abs(float(metrics.lpips(a, a, net="alex",
                                   weights_path=str(ckpt))[0])) < 1e-6
