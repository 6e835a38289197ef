"""CFG combiner: every mode's algebra against hand-computed expectations,
using a fake conditional denoiser eps(x, t, ctx) = x * mean(ctx)."""

import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.editing.cfg import CFG_MODES, cfg_eps, perpendicular_component


def eps_fn(x, t, ctx):
    # per-element scale from its context slice
    scale = jnp.mean(ctx, axis=(1, 2))[:, None, None, None]
    return x * scale


def _prompts():
    mk = lambda v: jnp.full((1, 4, 8), v)  # noqa: E731
    return {"for": mk(2.0), "edit": mk(3.0), "null": mk(1.0)}


X = jnp.ones((2, 4, 4, 1))


def _eps_for(v):
    return np.asarray(X) * v


@pytest.mark.parametrize("mode,expected", [
    ("null+(for-null)", 1.0 + 5.0 * (2.0 - 1.0)),
    ("null+(for-null)+(edit-null)", 1.0 + 5.0 * 1.0 + 2.0 * (3.0 - 1.0)),
    ("null+(edit-null)", 1.0 + 5.0 * (3.0 - 1.0)),
    ("(for-edit)", 5.0 * (2.0 - 3.0)),
    ("(for-null)", 5.0 * (2.0 - 1.0)),
    ("(edit-null)", 5.0 * (3.0 - 1.0)),
])
def test_linear_modes(mode, expected):
    out = cfg_eps(eps_fn, X, 10.0, _prompts(), mode, 5.0, 2.0)
    np.testing.assert_allclose(np.asarray(out), _eps_for(expected), rtol=1e-5)


def test_proj_modes():
    # with eps proportional to x for every prompt, (edit-null) is parallel to
    # (for-null), so the perpendicular component is ~0
    out = cfg_eps(eps_fn, X, 10.0, _prompts(), "edit-proj[for](edit)", 5.0, 2.0)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)
    out2 = cfg_eps(eps_fn, X, 10.0, _prompts(),
                   "null+for+edit-proj[for](edit)", 5.0, 2.0)
    np.testing.assert_allclose(np.asarray(out2), _eps_for(1.0 + 5.0 * 1.0),
                               atol=1e-4)


def test_perpendicular_component():
    a = jnp.asarray([[1.0, 1.0]])[:, :, None, None]
    b = jnp.asarray([[1.0, 0.0]])[:, :, None, None]
    p = perpendicular_component(a, b)
    np.testing.assert_allclose(np.asarray(p).squeeze(), [0.0, 1.0], atol=1e-6)


def test_disabled_cfg_single_pass():
    out = cfg_eps(eps_fn, X, 10.0, _prompts(), "null+(for-null)", 7.5,
                  enabled=False)
    np.testing.assert_allclose(np.asarray(out), _eps_for(2.0), rtol=1e-5)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        cfg_eps(eps_fn, X, 10.0, _prompts(), "bogus", 1.0)


def test_all_modes_run():
    for mode in CFG_MODES:
        out = cfg_eps(eps_fn, X, 10.0, _prompts(), mode, 2.0, 1.5)
        assert out.shape == X.shape
