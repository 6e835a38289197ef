"""Trainer tests: loss decreases, EMA/anneal math, microbatch accumulation,
loss-aware resampler state machine, and a DP-sharded step over the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from loco_edit_tpu.core.mesh import DATA_AXIS, make_mesh
from loco_edit_tpu.diffusion.schedule import NoiseSchedule
from loco_edit_tpu.training import (
    LossSecondMomentResampler,
    TrainConfig,
    UniformSampler,
    create_train_state,
    make_train_step,
)
from loco_edit_tpu.training.trainer import q_sample


def _toy_apply():
    """A linear 'denoiser' eps = x * w, params = {'w': scalar}."""
    def apply_fn(params, x, t):
        return x * params["w"]
    return apply_fn, {"w": jnp.asarray(0.0)}


def test_train_loss_decreases():
    apply_fn, params = _toy_apply()
    cfg = TrainConfig(lr=5e-2)
    sched = NoiseSchedule.linear()
    step = jax.jit(make_train_step(apply_fn, cfg, sched))
    state = create_train_state(params, cfg)
    x0 = jax.random.normal(jax.random.key(0), (16, 8, 8, 3))
    t = jnp.full((16,), 500, jnp.int32)
    w = jnp.ones((16,))
    losses = []
    for i in range(30):
        state, m = step(state, x0, t, w, jax.random.fold_in(jax.random.key(1), i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


def test_q_sample_endpoints():
    ab = jnp.asarray(NoiseSchedule.linear().alphas_cumprod, jnp.float32)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full_like(x0, 2.0)
    x_early = q_sample(x0, jnp.zeros((2,), jnp.int32), noise, ab)
    # abar_0 = 1 - 1e-4 ~ 1: x_t ~ x0
    np.testing.assert_allclose(np.asarray(x_early), 1.0, atol=0.03)
    x_late = q_sample(x0, jnp.full((2,), 999, jnp.int32), noise, ab)
    # abar_T ~ 4e-5: x_t ~ noise
    np.testing.assert_allclose(np.asarray(x_late), 2.0, atol=0.03)


def test_microbatch_accumulation_shapes():
    apply_fn, params = _toy_apply()
    cfg = TrainConfig(lr=1e-2, microbatches=4)
    sched = NoiseSchedule.linear()
    step = jax.jit(make_train_step(apply_fn, cfg, sched))
    state = create_train_state(params, cfg)
    x0 = jax.random.normal(jax.random.key(0), (8, 4, 4, 3))
    t = jnp.full((8,), 100, jnp.int32)
    state, m = step(state, x0, t, jnp.ones((8,)), jax.random.key(2))
    assert m["per_timestep_losses"].shape == (8,)
    assert np.isfinite(float(m["loss"]))


def test_ema_tracks_params():
    apply_fn, params = _toy_apply()
    cfg = TrainConfig(lr=1e-1, ema_rate=0.5)
    sched = NoiseSchedule.linear()
    step = jax.jit(make_train_step(apply_fn, cfg, sched))
    state = create_train_state(params, cfg)
    x0 = jax.random.normal(jax.random.key(0), (8, 4, 4, 3))
    t = jnp.full((8,), 500, jnp.int32)
    prev_w = float(state.params["w"])
    state, _ = step(state, x0, t, jnp.ones((8,)), jax.random.key(3))
    expected_ema = 0.5 * prev_w + 0.5 * float(state.params["w"])
    np.testing.assert_allclose(float(state.ema_params["w"]), expected_ema, rtol=1e-5)


def test_uniform_sampler():
    s = UniformSampler(1000)
    t, w = s.sample(jax.random.key(0), 64)
    assert t.shape == (64,) and bool(jnp.all((t >= 0) & (t < 1000)))
    np.testing.assert_allclose(np.asarray(w), 1.0)


def test_loss_aware_resampler_warmup_and_bias():
    s = LossSecondMomentResampler(num_timesteps=10, history_per_term=2)
    state = s.init_state()
    # before warmup: uniform weights
    t, w = s.sample(jax.random.key(0), 32, state)
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-5)
    # fill history: timestep 3 has huge loss, others tiny
    for i in range(2):
        ts = jnp.arange(10)
        losses = jnp.where(ts == 3, 100.0, 0.01)
        state = s.update(state, ts, losses)
    assert bool(jnp.all(state["counts"] == 2))
    t, w = s.sample(jax.random.key(1), 4096, state)
    frac_3 = float(jnp.mean((t == 3).astype(jnp.float32)))
    assert frac_3 > 0.5  # importance sampling concentrates on the lossy bin
    # weights de-bias: w ~ 1/(N p): the hot bin gets small weight
    assert float(jnp.min(w)) < 0.5


def test_dp_sharded_train_step():
    mesh = make_mesh({DATA_AXIS: 8})
    apply_fn, params = _toy_apply()
    cfg = TrainConfig(lr=1e-2)
    sched = NoiseSchedule.linear()
    step_fn = make_train_step(apply_fn, cfg, sched)
    state = create_train_state(params, cfg)

    x0 = jax.random.normal(jax.random.key(0), (16, 4, 4, 3))
    t = jnp.full((16,), 300, jnp.int32)
    w = jnp.ones((16,))

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    rep = NamedSharding(mesh, P())
    sharded_step = jax.jit(
        step_fn,
        in_shardings=(rep, batch_sharding, batch_sharding, batch_sharding, rep),
    )
    s1, m1 = sharded_step(state, x0, t, w, jax.random.key(5))
    s2, m2 = jax.jit(step_fn)(state, x0, t, w, jax.random.key(5))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(s1.params["w"]), float(s2.params["w"]), rtol=1e-5)
