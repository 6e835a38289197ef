"""Shared numpy primitives for from-scratch model oracles (torch semantics:
OIHW cross-correlation convs, f32 GroupNorm, LayerNorm, erf-GELU, SiLU)."""

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view
from scipy.special import erf


def conv2d(x, w, b=None, stride=1):
    """x (H, W, Ci); torch w (Co, Ci, kh, kw); SAME-ish padding kh//2."""
    kh = w.shape[2]
    p = kh // 2
    xp = np.pad(x, ((p, p), (p, p), (0, 0))) if p else x
    win = sliding_window_view(xp, (kh, kh), axis=(0, 1))[::stride, ::stride]
    out = np.einsum("hwcij,ocij->hwo", win, w)
    return out if b is None else out + b


def group_norm(x, gamma, beta, eps=1e-5, g=32):
    """x (..., C) with stats over (group channels x leading axes beyond none);
    matches GroupNorm over an (H, W, C) or (S, C) slice."""
    c = x.shape[-1]
    g = min(g, c)
    lead = x.shape[:-1]
    xr = x.reshape(*lead, g, c // g)
    axes = tuple(range(len(lead))) + (len(lead) + 1,)
    mu = xr.mean(axis=axes, keepdims=True)
    var = xr.var(axis=axes, keepdims=True)
    return ((xr - mu) / np.sqrt(var + eps)).reshape(x.shape) * gamma + beta


def layer_norm(x, gamma, beta, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


def silu(x):
    return x / (1 + np.exp(-x))


def gelu_exact(x):
    return 0.5 * x * (1 + erf(x / np.sqrt(2)))


def mha(q, k, v, out_w, out_b, heads):
    """(N, C) q against (M, C) k/v, per-head 1/sqrt(sqrt(d)) on q AND k,
    f32 softmax (the ADM / diffusers added-KV convention)."""
    n, c = q.shape
    d = c // heads
    out = np.zeros((n, c), np.float32)
    sc = d ** -0.25
    for h in range(heads):
        qs, ks, vs = (t[:, h * d:(h + 1) * d] for t in (q, k, v))
        logits = (qs * sc) @ (ks * sc).T
        w = np.exp(logits - logits.max(-1, keepdims=True))
        w /= w.sum(-1, keepdims=True)
        out[:, h * d:(h + 1) * d] = w @ vs
    return out @ out_w.T + out_b


def timestep_embedding(t, dim, max_period=10000.0):
    """[cos|sin], exponent /half (ADM convention == diffusers
    flip_sin_to_cos=True, freq_shift=0)."""
    half = dim // 2
    freqs = np.exp(-np.log(max_period) * np.arange(half) / half)
    args = t * freqs
    return np.concatenate([np.cos(args), np.sin(args)]).astype(np.float32)
