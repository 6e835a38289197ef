"""DP diffusion trainer.

TPU-native equivalent of the reference's (dormant) `TrainLoop`
(src/models/guided_diffusion/train_util.py:22-272): epsilon-MSE objective with
q-sampling, microbatch gradient accumulation (train_util.py:180-215 no_sync
accumulation -> lax.scan over microbatches), EMA (:216), linear LR anneal
(:220-226), and schedule-sampler weighting. DDP-over-NCCL is replaced by
sharding the batch over the mesh DATA_AXIS and letting XLA insert the gradient
all-reduce; manual fp16 loss scaling (fp16_util.py:148-235) is unnecessary in
bf16 and is dropped deliberately.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from loco_edit_tpu.diffusion.schedule import NoiseSchedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    weight_decay: float = 0.0
    ema_rate: float = 0.9999
    microbatches: int = 1            # gradient-accumulation chunks per step
    lr_anneal_steps: int = 0         # 0 = no anneal
    max_grad_norm: float = 0.0       # 0 = no clipping


@dataclasses.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.step, s.params, s.opt_state, s.ema_params), None),
    lambda _, c: TrainState(*c),
)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    txs = []
    if cfg.max_grad_norm > 0:
        txs.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    # Linear LR anneal (reference train_util.py:220-226) must act on the
    # learning rate itself: Adam normalizes out any pre-optimizer gradient
    # scale (m/sqrt(v) is invariant), so scaling grads would be a no-op.
    if cfg.lr_anneal_steps > 0:
        lr = optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_steps)
    else:
        lr = cfg.lr
    txs.append(optax.adamw(lr, weight_decay=cfg.weight_decay))
    return optax.chain(*txs)


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    opt = make_optimizer(cfg)
    return TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
    )


def q_sample(x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray,
             alphas_cumprod: jnp.ndarray) -> jnp.ndarray:
    """Forward process x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps."""
    ab = alphas_cumprod[t].astype(x0.dtype)
    while ab.ndim < x0.ndim:
        ab = ab[..., None]
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


def eps_mse_loss(apply_fn: Callable, params, x0, t, weights, key,
                 alphas_cumprod: jnp.ndarray):
    """Per-batch weighted epsilon-MSE (the reference's default MSE objective,
    gaussian_diffusion.py:744-817, learned-sigma channels detached from this
    term). Returns (loss, per_sample_losses)."""
    noise = jax.random.normal(key, x0.shape, x0.dtype)
    xt = q_sample(x0, t, noise, alphas_cumprod)
    eps_pred = apply_fn(params, xt, t)
    per = jnp.mean((eps_pred - noise) ** 2, axis=tuple(range(1, x0.ndim)))
    return jnp.mean(weights * per), per


def make_train_step(apply_fn: Callable, cfg: TrainConfig,
                    schedule: NoiseSchedule, num_timesteps: int | None = None):
    """Build a jittable train step: (state, x0_batch, t, weights, rng) -> (state, metrics).

    The batch is split into cfg.microbatches accumulation chunks (a scan, the
    counterpart of the reference's no_sync microbatch loop). Under pjit with
    the batch sharded on DATA_AXIS, XLA inserts the cross-device grad reduce.
    """
    opt = make_optimizer(cfg)
    ab = jnp.asarray(schedule.alphas_cumprod, jnp.float32)

    def loss_fn(params, x0, t, w, key):
        return eps_mse_loss(apply_fn, params, x0, t, w, key, ab)

    def train_step(state: TrainState, x0, t, weights, rng):
        n_micro = cfg.microbatches
        b = x0.shape[0]
        assert b % n_micro == 0, "batch must divide microbatches"

        def micro(carry, inp):
            grads_acc, loss_acc = carry
            x0_m, t_m, w_m, i = inp
            key = jax.random.fold_in(rng, i)
            (loss, per), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x0_m, t_m, w_m, key)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss), per

        zero_grads = jax.tree.map(jnp.zeros_like, state.params)
        xs = (
            x0.reshape(n_micro, b // n_micro, *x0.shape[1:]),
            t.reshape(n_micro, -1),
            weights.reshape(n_micro, -1),
            jnp.arange(n_micro),
        )
        (grads, loss_sum), per_losses = jax.lax.scan(micro, (zero_grads, 0.0), xs)
        grads = jax.tree.map(lambda g: g / n_micro, grads)
        loss = loss_sum / n_micro

        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(
            lambda e, p: e * cfg.ema_rate + p * (1.0 - cfg.ema_rate),
            state.ema_params, params)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, ema_params=ema)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "per_timestep_losses": per_losses.reshape(-1),
        }
        return new_state, metrics

    return train_step
