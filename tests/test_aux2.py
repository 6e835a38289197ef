"""h-space taps, spectrum utilities, sharded data loader."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from loco_edit_tpu.models.adm import ADMUNet
from loco_edit_tpu.models.adm.presets import tiny_test_config
from loco_edit_tpu.utils.spectrum import (
    fourier_regularize,
    low_pass_filter,
    power_spectral_density,
    save_psd_plot,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_test_config()
    model = ADMUNet(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = jax.jit(model.init)(jax.random.key(0), x, 500.0)
    params = jax.tree.map(lambda p: p + 0.02, params)
    return model, params


def test_h_space_tap_and_injection(tiny_model):
    model, params = tiny_model
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    eps, h_mid = model.apply(params, x, 400.0, return_h=True)
    # tiny cfg: 2 levels, one downsample -> bottleneck at 16x16, ch 64
    assert h_mid.shape == (1, 16, 16, 64)
    eps2 = model.apply(params, x, 400.0, h_inject=jnp.ones_like(h_mid[0]) * 0.5)
    assert float(jnp.max(jnp.abs(eps2 - eps))) > 0


def test_psd_monotone_for_smooth_images():
    rng = np.random.default_rng(0)
    noise = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    smooth = low_pass_filter(noise, cutoff_frac=0.1)
    p_noise = power_spectral_density(noise)
    p_smooth = power_spectral_density(smooth)
    # smooth image loses high-frequency power
    assert p_smooth[-1] < p_noise[-1] * 1e-2
    assert p_smooth[1] == pytest.approx(p_noise[1], rel=0.2)


def test_fourier_regularize_rows_unit_norm():
    rng = np.random.default_rng(1)
    v = rng.normal(size=(3, 32 * 32 * 3)).astype(np.float32)
    out = fourier_regularize(v, (32, 32, 3), cutoff_frac=0.2)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
    # filtered rows have less high-frequency content
    p0 = power_spectral_density(v[:1].reshape(1, 32, 32, 3))
    p1 = power_spectral_density(out[:1].reshape(1, 32, 32, 3))
    assert p1[-1] < p0[-1]


def test_psd_plot_outputs(tmp_path):
    rng = np.random.default_rng(2)
    trajs = [rng.normal(size=(1, 32, 32, 3)).astype(np.float32) for _ in range(3)]
    path = str(tmp_path / "psd.png")
    save_psd_plot(trajs, path)
    assert os.path.exists(path) and os.path.exists(path + ".npz")


def test_sharded_loader(tmp_path):
    from PIL import Image

    from loco_edit_tpu.training.data import ShardedImageLoader

    rng = np.random.default_rng(3)
    for i in range(8):
        arr = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"cls{i % 2}_{i}.png")

    loader = ShardedImageLoader(str(tmp_path), batch_size=2, image_size=32,
                                class_cond=True, seed=0,
                                process_index=0, process_count=2)
    assert len(loader.files) == 4  # half the files on this process
    batch, labels = next(iter(loader))
    assert batch.shape == (2, 32, 32, 3)
    assert batch.min() >= -1.0 and batch.max() <= 1.0
    assert labels.shape == (2,) and set(np.unique(labels)) <= {0, 1}
