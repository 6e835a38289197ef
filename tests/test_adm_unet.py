"""ADM U-Net structural and numeric tests (tiny config on CPU; preset
structure via eval_shape, no compute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.models.adm import ADMUNet, adm_preset, timestep_embedding
from loco_edit_tpu.models.adm.config import adm_layout
from loco_edit_tpu.models.adm.presets import tiny_test_config


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_test_config()
    model = ADMUNet(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0)
    return cfg, model, params


def test_timestep_embedding_matches_reference_formula():
    torch = pytest.importorskip("torch")
    import math

    t = np.array([0.0, 512.3, 999.0], np.float32)
    dim = 64
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(0, half, dtype=torch.float32) / half)
    args = torch.tensor(t)[:, None] * freqs[None]
    expected = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    # XLA and torch differ in f32 sin/cos range reduction for large phases
    # (t*freq up to ~1000 rad); 2e-3 absolute is the expected f32 trig gap.
    np.testing.assert_allclose(got, expected, atol=2e-3)


def test_forward_shape_and_finiteness(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    eps = model.apply(params, x, 600.0)
    assert eps.shape == (2, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(eps)))


def test_learn_sigma_split(tiny):
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.key(2), (1, 32, 32, 3))
    eps, logvar = model.apply(params, x, 600.0, return_sigma=True)
    assert eps.shape == logvar.shape == (1, 32, 32, 3)


def test_zero_init_output_conv_gives_zero_eps_at_init():
    """out_conv and per-block out convs are zero-initialized (the reference's
    zero_module, nn.py), so a freshly initialized model outputs exactly 0."""
    cfg = tiny_test_config()
    model = ADMUNet(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, 100.0)
    eps = model.apply(params, x, 100.0)
    assert float(jnp.max(jnp.abs(eps))) == 0.0


def test_fractional_timesteps_differ(tiny):
    """The scheduler feeds fractional t; embedding must distinguish them."""
    cfg, model, params = tiny
    x = jax.random.normal(jax.random.key(3), (1, 32, 32, 3))
    # perturb a non-output parameter so eps != 0
    params = jax.tree.map(lambda p: p + 0.01, params)
    e1 = model.apply(params, x, 600.0)
    e2 = model.apply(params, x, 600.5)
    assert float(jnp.max(jnp.abs(e1 - e2))) > 0


def test_p2_preset_structure():
    """The P2 preset must reproduce the published checkpoint's parameter count
    (93,563,910 for the 256px ch=128 res_blocks=1 learn_sigma ADM U-Net)."""
    cfg = adm_preset("FFHQ_P2")
    model = ADMUNet(cfg)
    shapes = jax.eval_shape(model.init, jax.random.key(0),
                            jnp.zeros((1, 256, 256, 3)), 500.0)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    assert n == 93_563_910


def test_layout_skip_symmetry():
    """Decoder consumes exactly the encoder's skip stack."""
    cfg = tiny_test_config()
    layout = adm_layout(cfg)
    assert len(layout.output_blocks) == len(layout.input_blocks)


def test_class_conditional_variant():
    cfg = tiny_test_config(num_classes=10)
    model = ADMUNet(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, 10.0)
    eps_default = model.apply(params, x, 10.0)           # implicit y=0
    eps_y = model.apply(params, x, 10.0, y=jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(eps_default), np.asarray(eps_y))


def test_bf16_compute_dtype():
    cfg = tiny_test_config(dtype=jnp.bfloat16)
    model = ADMUNet(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 32, 32, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0)
    # params stay f32; forward runs in bf16 internally but returns x.dtype
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    eps = model.apply(params, x, 500.0)
    assert eps.dtype == jnp.float32
