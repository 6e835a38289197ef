"""bf16 numerical quality: the production path runs the denoiser in bf16 with
f32 probes/Gram — the recovered subspace must align with the f32 ground truth
(this is the trade the reference makes with fp16 nets + fp32 SVD,
edit.py:2435,1653)."""

import numpy as np

import jax
import jax.numpy as jnp

from loco_edit_tpu.editing import subspace_iteration
from loco_edit_tpu.editing.pullback import pmp_pullback_fn
from loco_edit_tpu.models.adm import ADMUNet
from loco_edit_tpu.models.adm.presets import tiny_test_config


def _basis(dtype):
    cfg = tiny_test_config(dtype=dtype)
    model = ADMUNet(cfg)
    x0 = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x0, 500.0)
    params = jax.tree.map(lambda p: p + 0.02, params)
    eps_fn = lambda z, t: model.apply(params, z, t)  # noqa: E731
    f = pmp_pullback_fn(eps_fn, 0.3, 600.0)
    xt = jax.random.normal(jax.random.key(1), (1, 32, 32, 3)) * 0.5
    return subspace_iteration(f, xt, jax.random.key(2), rank=3,
                              min_iter=5, max_iter=12, tol=1e-5)


def test_bf16_subspace_aligns_with_f32():
    b32 = _basis(jnp.float32)
    b16 = _basis(jnp.bfloat16)
    # singular values within a few percent
    np.testing.assert_allclose(np.asarray(b16.s), np.asarray(b32.s), rtol=0.08)
    # top direction strongly aligned (|cos| close to 1)
    v32 = np.asarray(b32.vT)
    v16 = np.asarray(b16.vT)
    cos0 = abs(float(v16[0] @ v32[0]))
    assert cos0 > 0.98, f"top-direction alignment {cos0}"
