"""Classifier-free-guidance epsilon combiner — all prompt-combination modes.

The reference implements this twice (SD: src/modules/edit.py:636-674, 4 modes;
DeepFloyd-IF: edit.py:1286-1373, 8 modes incl. perpendicular 'proj' modes and
learned-sigma channel splits). Here it is one pure function over a batched
denoiser: the prompt variants are stacked on the batch axis (one batched
U-Net call, exactly like the reference's torch.cat) and recombined per mode.

Modes (g = guidance_scale, ge = guidance_scale_edit, perp(a,b) = a - <a,b>/|b|^2 b):
  null+(for-null)                : e_n + g (e_f - e_n)
  null+(for-null)+(edit-null)    : e_n + g (e_f - e_n) + ge (e_e - e_n)
  null+(edit-null)               : e_n + g (e_e - e_n)
  (for-edit)                     : g (e_f - e_e)
  (for-null)                     : g (e_f - e_n)
  (edit-null)                    : g (e_e - e_n)
  edit-proj[for](edit)           : perp(e_e - e_n, e_f - e_n)
  null+for+edit-proj[for](edit)  : e_n + g (e_f - e_n) + ge perp(e_e - e_n, e_f - e_n)

NOTE the reference's 'edit-proj[for](edit)' branch reads noise_pred_uncond
from a stale loop variable of a previous call (edit.py:1357-1363); the intent
— the null-relative perpendicular component — is implemented here with e_n
from the same call (a 3-variant stack).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

# eps_cond_fn(x, t, context) -> epsilon for a batch under one prompt context
CondEpsFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]

CFG_MODES = (
    "null+(for-null)",
    "null+(for-null)+(edit-null)",
    "null+(edit-null)",
    "(for-edit)",
    "(for-null)",
    "(edit-null)",
    "edit-proj[for](edit)",
    "null+for+edit-proj[for](edit)",
)

# which prompt embeddings each mode stacks, in order
_STACKS: dict[str, tuple[str, ...]] = {
    "null+(for-null)": ("for", "null"),
    "null+(for-null)+(edit-null)": ("for", "edit", "null"),
    "null+(edit-null)": ("edit", "null"),
    "(for-edit)": ("for", "edit"),
    "(for-null)": ("for", "null"),
    "(edit-null)": ("edit", "null"),
    "edit-proj[for](edit)": ("for", "edit", "null"),
    "null+for+edit-proj[for](edit)": ("for", "edit", "null"),
}


def perpendicular_component(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Component of a orthogonal to b, per batch element (the reference's
    get_prependicualr_component, src/modules/edit.py:29-34)."""
    axes = tuple(range(1, a.ndim))
    dot = jnp.sum(a * b, axis=axes, keepdims=True)
    nrm = jnp.sum(b * b, axis=axes, keepdims=True)
    return a - dot / jnp.maximum(nrm, 1e-12) * b


def cfg_eps(eps_cond_fn: CondEpsFn, x: jnp.ndarray, t, prompts: dict,
            mode: str, guidance_scale: float, guidance_scale_edit: float = 0.0,
            enabled: bool = True) -> jnp.ndarray:
    """Combined epsilon at x under `mode`.

    prompts: {'for': emb, 'edit': emb, 'null': emb} with emb (1, seq, dim).
    enabled=False reproduces the reference's no-CFG fallback: a single pass
    under the 'for' prompt (edit.py:651-653).
    """
    if mode not in _STACKS:
        raise ValueError(f"unknown CFG mode {mode!r}; valid: {CFG_MODES}")
    b = x.shape[0]
    if not enabled:
        ctx = jnp.broadcast_to(prompts["for"], (b,) + prompts["for"].shape[-2:])
        return eps_cond_fn(x, t, ctx)

    names = _STACKS[mode]
    ctx = jnp.concatenate([
        jnp.broadcast_to(prompts[n], (b,) + prompts[n].shape[-2:])
        for n in names], axis=0)
    stacked = jnp.concatenate([x] * len(names), axis=0)
    eps = eps_cond_fn(stacked, t, ctx)
    parts = dict(zip(names, jnp.split(eps, len(names), axis=0)))
    g, ge = guidance_scale, guidance_scale_edit

    if mode == "null+(for-null)":
        return parts["null"] + g * (parts["for"] - parts["null"])
    if mode == "null+(for-null)+(edit-null)":
        return (parts["null"] + g * (parts["for"] - parts["null"])
                + ge * (parts["edit"] - parts["null"]))
    if mode == "null+(edit-null)":
        return parts["null"] + g * (parts["edit"] - parts["null"])
    if mode == "(for-edit)":
        return g * (parts["for"] - parts["edit"])
    if mode == "(for-null)":
        return g * (parts["for"] - parts["null"])
    if mode == "(edit-null)":
        return g * (parts["edit"] - parts["null"])
    if mode == "edit-proj[for](edit)":
        return perpendicular_component(parts["edit"] - parts["null"],
                                       parts["for"] - parts["null"])
    if mode == "null+for+edit-proj[for](edit)":
        e_for = parts["for"] - parts["null"]
        e_edit = perpendicular_component(parts["edit"] - parts["null"], e_for)
        return parts["null"] + g * e_for + ge * e_edit
    raise AssertionError(mode)
