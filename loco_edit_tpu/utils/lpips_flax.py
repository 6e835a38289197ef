"""Native Flax LPIPS (Learned Perceptual Image Patch Similarity).

The reference evaluates LPIPS through torchmetrics (src/eval.py:26-42), which
needs torch + torchvision + downloaded pretrained weights at call time. This
module is the same metric as a TPU-runnable Flax model: AlexNet / VGG16
feature taps, per-tap channel unit-normalization, squared difference, learned
1x1 "lin" heads, spatial average, sum over taps (Zhang et al. 2018, the
computation torchmetrics vendors from the `lpips` package).

Weights come from a LOCAL torch checkpoint (no hub egress):
  - a full `lpips.LPIPS(net=...)`/torchmetrics state_dict
    (`net.sliceK.I.weight` backbone + `linK.model.1.weight` heads), or
  - a torchvision backbone state_dict (`features.I.weight`) paired with the
    lpips package's tiny head-only checkpoint (`linK.model.1.weight`).

`convert_lpips_state_dict` normalizes all of these; the architecture +
converter are golden-tested against a from-scratch torch oracle on synthetic
weights (tests/test_lpips_flax.py), the same offline-verification tier as the
SD/IF converters.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# lpips ScalingLayer constants (shift/scale buffers in the reference ckpt)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

# torchvision `features` indices of the conv layers feeding each LPIPS tap
_ALEX_CONVS = (0, 3, 6, 8, 10)          # taps after relu1..relu5
_ALEX_CH = (64, 192, 384, 256, 256)
# VGG16: taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_VGG_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG_CH = (64, 128, 256, 512, 512)


def _maxpool(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """torch MaxPool2d(window, stride) — VALID padding, NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), "VALID")


class AlexFeatures(nn.Module):
    """torchvision AlexNet `features` trunk, NHWC, ReLU taps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        spec = [  # (out_ch, kernel, stride, pad, pool_before)
            (64, 11, 4, 2, False),
            (192, 5, 1, 2, True),
            (384, 3, 1, 1, True),
            (256, 3, 1, 1, False),
            (256, 3, 1, 1, False),
        ]
        for i, (ch, k, s, p, pool) in enumerate(spec):
            if pool:
                x = _maxpool(x)
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16 `features` trunk, NHWC, LPIPS tap points."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        taps = []
        plan = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        ci = 0
        for bi, (ch, n) in enumerate(plan):
            if bi > 0:
                x = _maxpool(x, 2, 2)
            for _ in range(n):
                x = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name=f"conv{ci}")(x)
                x = nn.relu(x)
                ci += 1
            taps.append(x)
        return taps


class LPIPSFlax(nn.Module):
    """LPIPS distance; inputs NHWC in [-1, 1] (use `normalize=True` helpers
    for [0, 1] inputs). Returns (B,) distances."""

    net: str = "alex"  # "alex" | "vgg"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, jnp.float32)
        scale = jnp.asarray(_SCALE, jnp.float32)
        trunk = (AlexFeatures(self.dtype, name="trunk") if self.net == "alex"
                 else VGG16Features(self.dtype, name="trunk"))
        chans = _ALEX_CH if self.net == "alex" else _VGG_CH

        def prep(x):
            return ((jnp.asarray(x, jnp.float32) - shift) / scale
                    ).astype(self.dtype)

        fa = trunk(prep(a))
        fb = trunk(prep(b))
        total = 0.0
        for k, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa.astype(jnp.float32)
            xb = xb.astype(jnp.float32)
            # lpips normalize_tensor: x / (||x||_ch + 1e-10)
            na = xa / (jnp.sqrt(jnp.sum(xa * xa, -1, keepdims=True)) + 1e-10)
            nb = xb / (jnp.sqrt(jnp.sum(xb * xb, -1, keepdims=True)) + 1e-10)
            d = (na - nb) ** 2
            w = self.param(f"lin{k}", nn.initializers.ones, (chans[k],),
                           jnp.float32)
            total = total + jnp.mean(d @ w, axis=(1, 2))
        return total


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (2, 3, 1, 0))


def _normalize_keys(sd: Mapping[str, "np.ndarray"]) -> dict[str, np.ndarray]:
    """Strip wrapper prefixes and make values numpy (accepts torch tensors).

    Handles the real shipped key shapes: torchmetrics prefixes everything
    with one extra `net.` (`net.lin0...`, `net.net.slice1...`); the lpips
    package registers the heads twice (attributes `lin0..lin4` AND the
    nn.ModuleList `lins.0..lins.4` hold the same modules), so `lins.K.*`
    aliases are renamed to `linK.*` and deduped."""
    out = {}
    for k, v in sd.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("net.") and (
                k.startswith(("net.lin", "net.scaling_layer", "net.net."))):
            k = k[len("net."):]  # torchmetrics NoTrainLpips wrapper prefix
        if k.startswith("lins."):
            rest = k[len("lins."):]
            idx, _, tail = rest.partition(".")
            k = f"lin{idx}.{tail}"
        out[k] = arr
    return out


def convert_lpips_state_dict(state_dict: Mapping,
                             lin_state_dict: Mapping | None = None,
                             net: str | None = None) -> tuple[dict, str]:
    """Convert torch LPIPS weights to LPIPSFlax params.

    state_dict: a full lpips/torchmetrics LPIPS state_dict, OR a torchvision
    backbone state_dict (`features.I.*`). lin_state_dict: head-only dict
    (`linK.model.1.weight` / `linK.weight`) when the backbone dict has no
    heads (the lpips package ships heads separately). Returns
    ({"params": ...}, net_name). Strict: unknown keys raise."""
    sd = _normalize_keys(state_dict)
    if lin_state_dict is not None:
        sd.update(_normalize_keys(lin_state_dict))

    # collect backbone convs by torchvision feature index
    convs: dict[int, dict[str, np.ndarray]] = {}
    lins: dict[int, np.ndarray] = {}
    consumed = set()
    for k, v in sd.items():
        parts = k.split(".")
        if "slice" in k:  # net.sliceK.I.{weight,bias} (lpips/torchmetrics)
            idx = int(parts[-2])
            convs.setdefault(idx, {})[parts[-1]] = v
            consumed.add(k)
        elif parts[0] == "features":  # torchvision backbone
            convs.setdefault(int(parts[1]), {})[parts[-1]] = v
            consumed.add(k)
        elif parts[0].isdigit() and parts[-1] in ("weight", "bias"):
            # a bare `model.features.state_dict()` dump: keys like "0.weight"
            convs.setdefault(int(parts[0]), {})[parts[-1]] = v
            consumed.add(k)
        elif parts[0] in ("classifier", "avgpool"):
            consumed.add(k)  # torchvision heads — never part of LPIPS
        elif parts[0].startswith("lin") and parts[0][3:].isdigit():
            # linK.model.1.weight (lpips) / linK.weight (flat)
            if parts[-1] == "weight":
                lins[int(parts[0][3:])] = v.reshape(-1)
                consumed.add(k)
        elif parts[-1] in ("shift", "scale") or "scaling_layer" in k:
            consumed.add(k)  # constants, baked in
    unknown = sorted(set(sd) - consumed)
    if unknown:
        raise ValueError(f"unconverted LPIPS keys: {unknown[:8]}")

    first = convs[min(convs)]["weight"]
    if net is None:
        net = "alex" if first.shape[-1] == 11 else "vgg"
    conv_idx = _ALEX_CONVS if net == "alex" else _VGG_CONVS
    chans = _ALEX_CH if net == "alex" else _VGG_CH
    if sorted(convs) != sorted(conv_idx):
        raise ValueError(f"backbone layer indices {sorted(convs)} do not match "
                         f"{net} expectation {sorted(conv_idx)}")
    if sorted(lins) != [0, 1, 2, 3, 4]:
        raise ValueError(f"expected lin heads 0..4, got {sorted(lins)}; pass "
                         "lin_state_dict with the lpips head checkpoint")

    trunk = {}
    for j, fi in enumerate(conv_idx):
        trunk[f"conv{j}"] = {"kernel": _oihw_to_hwio(convs[fi]["weight"]),
                             "bias": np.asarray(convs[fi]["bias"], np.float32)}
    params = {"trunk": trunk}
    for k in range(5):
        w = np.asarray(lins[k], np.float32)
        if w.size != chans[k]:
            raise ValueError(f"lin{k} has {w.size} weights, expected {chans[k]}")
        params[f"lin{k}"] = w
    return {"params": params}, net


@dataclasses.dataclass
class LPIPSMetric:
    """Bound LPIPS metric: load once, call many times (jitted)."""

    variables: dict
    net: str

    def __post_init__(self):
        model = LPIPSFlax(net=self.net)
        self._fn = jax.jit(lambda a, b: model.apply(self.variables, a, b))

    @classmethod
    def from_torch_file(cls, path: str, lin_path: str | None = None,
                        net: str | None = None) -> "LPIPSMetric":
        from loco_edit_tpu.models.adm.convert import load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        lin = load_torch_checkpoint(lin_path) if lin_path else None
        variables, net = convert_lpips_state_dict(sd, lin, net)
        return cls(variables, net)

    def __call__(self, a, b, normalize: bool = False) -> np.ndarray:
        """a, b: NHWC. normalize=True maps [0,1] -> [-1,1] (torchmetrics
        convention)."""
        a = jnp.asarray(a, jnp.float32)
        b = jnp.asarray(b, jnp.float32)
        if normalize:
            a = a * 2.0 - 1.0
            b = b * 2.0 - 1.0
        return np.asarray(self._fn(a, b))
