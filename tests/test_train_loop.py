"""Training loop: sharded run over the CPU mesh, checkpoint resume,
loss-aware sampler wiring, CI early-exit hook, replication checksum."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.core.mesh import DATA_AXIS, make_mesh
from loco_edit_tpu.parallel import replicated_params_checksum
from loco_edit_tpu.training import TrainConfig
from loco_edit_tpu.training.loop import run_training


def _toy():
    apply_fn = lambda p, x, t: x * p["w"]  # noqa: E731
    return apply_fn, {"w": jnp.asarray(0.0)}


def _data(batch=16):
    rng = np.random.default_rng(0)

    def gen():
        while True:
            yield rng.normal(size=(batch, 8, 8, 3)).astype(np.float32), None

    return gen()


def test_loop_runs_sharded_and_checkpoints(tmp_path):
    apply_fn, params = _toy()
    mesh = make_mesh({DATA_AXIS: 8})
    state = run_training(
        apply_fn, params, _data(), cfg=TrainConfig(lr=1e-2), mesh=mesh,
        total_steps=6, log_interval=2, save_interval=3,
        ckpt_dir=str(tmp_path / "ck"), seed=1)
    assert int(state.step) == 6
    # resume continues from the saved step
    state2 = run_training(
        apply_fn, params, _data(), cfg=TrainConfig(lr=1e-2), mesh=mesh,
        total_steps=8, log_interval=2, save_interval=4,
        ckpt_dir=str(tmp_path / "ck"), seed=1)
    assert int(state2.step) == 8


def test_loss_aware_loop(tmp_path):
    apply_fn, params = _toy()
    state = run_training(
        apply_fn, params, _data(), cfg=TrainConfig(lr=1e-2),
        total_steps=4, log_interval=10, save_interval=100,
        ckpt_dir=None, loss_aware=True, seed=2)
    assert int(state.step) == 4


def test_training_test_env_hook(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    apply_fn, params = _toy()
    state = run_training(apply_fn, params, _data(), cfg=TrainConfig(lr=1e-2),
                         total_steps=100, ckpt_dir=None, seed=3)
    assert int(state.step) < 100


def test_replication_checksum_detects_divergence():
    p1 = {"a": jnp.ones((4, 4)), "b": jnp.zeros((3,))}
    p2 = {"a": jnp.ones((4, 4)), "b": jnp.zeros((3,)).at[1].set(1e-3)}
    c1 = float(replicated_params_checksum(p1))
    c2 = float(replicated_params_checksum(p2))
    assert c1 != c2
    assert c1 == float(replicated_params_checksum(p1))
