"""Evaluation metrics: SSIM, masked MSE, (gated) LPIPS.

Parity surface of the reference's eval (src/eval.py:22-42) with its bugs fixed
(eval_LPIPS there calls ssim, :35; undefined names at :70-79). SSIM follows the
standard Wang et al. formulation (gaussian window 11, sigma 1.5, k1/k2 =
0.01/0.03) that torchmetrics implements; inputs NHWC in [0,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(r**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def _filter2d(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 2D convolution, valid padding; x NHWC."""
    k = kernel[:, :, None, None]  # HWIO with I=1
    c = x.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean SSIM per batch element; a, b: (B, H, W, C) in [0, data_range]."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    kern = _gaussian_kernel()
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_a = _filter2d(a, kern)
    mu_b = _filter2d(b, kern)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = _filter2d(a * a, kern) - mu_aa
    s_bb = _filter2d(b * b, kern) - mu_bb
    s_ab = _filter2d(a * b, kern) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def masked_mse(a: jnp.ndarray, b: jnp.ndarray,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean squared error per batch element, optionally restricted to mask
    (the reference's edit-locality metric: MSE outside the edit region)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    sq = (a - b) ** 2
    if mask is None:
        return jnp.mean(sq, axis=tuple(range(1, sq.ndim)))
    m = jnp.asarray(mask, jnp.float32)
    m = jnp.broadcast_to(m, sq.shape)
    axes = tuple(range(1, sq.ndim))
    return jnp.sum(sq * m, axis=axes) / jnp.maximum(jnp.sum(m, axis=axes), 1.0)


_lpips_cache: dict = {}


def lpips(a: np.ndarray, b: np.ndarray, net: str | None = None,
          weights_path: str | None = None) -> np.ndarray:
    """LPIPS; a, b: NHWC in [0,1].

    net: backbone ("alex"/"vgg"). None (default) follows the checkpoint's
    backbone on the weights path (alex on the torchmetrics fallback); an
    explicit value is VALIDATED against the checkpoint — a mismatch raises
    rather than silently scoring with the wrong network.

    Preferred path: the native Flax model (utils/lpips_flax.py) fed from a
    LOCAL torch checkpoint — pass `weights_path` or set LOCO_LPIPS_WEIGHTS to
    a full lpips/torchmetrics state_dict (or "backbone.pth:lins.pth" for the
    torchvision-features + lpips-heads pair). Falls back to torchmetrics if
    installed; raises ImportError with guidance otherwise."""
    import os

    weights_path = weights_path or os.environ.get("LOCO_LPIPS_WEIGHTS")
    if weights_path:
        from loco_edit_tpu.utils.lpips_flax import LPIPSMetric

        # keyed by (path, mtime): replacing the checkpoint file on disk
        # within a process must not keep serving the stale converted metric
        main, _, lin = weights_path.partition(":")
        try:
            mtime = os.path.getmtime(main)
        except OSError:
            mtime = 0.0
        cache_key = (weights_path, mtime)
        metric = _lpips_cache.get(cache_key)
        if metric is None:
            while len(_lpips_cache) >= 4:   # bound growth across paths/mtimes
                _lpips_cache.pop(next(iter(_lpips_cache)))
            metric = LPIPSMetric.from_torch_file(main, lin or None)
            _lpips_cache[cache_key] = metric
        if net is not None and metric.net != net:
            # silently returning alex distances for net="vgg" would corrupt
            # reported metrics — the checkpoint decides the backbone, the
            # caller must agree
            raise ValueError(
                f"LPIPS weights at {weights_path!r} are a {metric.net!r} "
                f"backbone but net={net!r} was requested; pass "
                f"net={metric.net!r} or point at a {net} checkpoint")
        return metric(np.asarray(a), np.asarray(b), normalize=True)
    try:
        import torch
        from torchmetrics.image.lpip import LearnedPerceptualImagePatchSimilarity
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "LPIPS needs either a local weights file (set LOCO_LPIPS_WEIGHTS "
            "or pass weights_path; see utils/lpips_flax.py) or torchmetrics "
            "with pretrained weights; or use ssim/masked_mse") from e
    metric = LearnedPerceptualImagePatchSimilarity(net_type=net or "alex",
                                                   normalize=True)
    ta = torch.from_numpy(np.transpose(np.asarray(a, np.float32), (0, 3, 1, 2)))
    tb = torch.from_numpy(np.transpose(np.asarray(b, np.float32), (0, 3, 1, 2)))
    with torch.no_grad():
        vals = [float(metric(ta[i:i + 1], tb[i:i + 1])) for i in range(ta.shape[0])]
    return np.asarray(vals)
