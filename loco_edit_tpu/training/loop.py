"""The training loop: data -> sharded step -> EMA -> log -> checkpoint.

TrainLoop parity (reference src/models/guided_diffusion/train_util.py:22-272)
with TPU-native additions: DP sharding over a Mesh (DDP replaced by XLA
all-reduce), orbax checkpoints (rank-0 semantics built in), loss-aware
timestep resampling, the DIFFUSION_TRAINING_TEST early-exit hook the
reference inherited for CI (:164-166), and preemption-aware checkpointing
(SIGTERM triggers a final save — the reference has no preemption story)."""

from __future__ import annotations

import os
import signal

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from loco_edit_tpu.core.mesh import DATA_AXIS
from loco_edit_tpu.diffusion.schedule import NoiseSchedule
from loco_edit_tpu.training.checkpoint import restore_checkpoint, save_checkpoint
from loco_edit_tpu.training.resample import LossSecondMomentResampler, UniformSampler
from loco_edit_tpu.training.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
)
from loco_edit_tpu.utils.logger import Logger


def run_training(apply_fn, params, data_iter, *, cfg: TrainConfig,
                 schedule: NoiseSchedule | None = None,
                 mesh: Mesh | None = None,
                 total_steps: int = 10_000, log_interval: int = 100,
                 save_interval: int = 1000, ckpt_dir: str | None = None,
                 resume: bool = True, loss_aware: bool = False,
                 seed: int = 0, logger: Logger | None = None):
    """Run `total_steps` of DP diffusion training; returns the final state."""
    schedule = schedule or NoiseSchedule.linear()
    n_t = schedule.num_train_timesteps
    logger = logger or Logger(ckpt_dir)
    sampler = (LossSecondMomentResampler(n_t) if loss_aware
               else UniformSampler(n_t))
    sampler_state = sampler.init_state()

    state = create_train_state(params, cfg)
    if resume and ckpt_dir and os.path.isdir(ckpt_dir):
        try:
            state = restore_checkpoint(ckpt_dir, state)
            print(f"resumed from step {int(state.step)}")
        except FileNotFoundError:
            pass

    step_fn = make_train_step(apply_fn, cfg, schedule)
    if mesh is not None:
        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        rep = NamedSharding(mesh, P())
        step_fn = jax.jit(step_fn, in_shardings=(rep, batch_sh, batch_sh,
                                                 batch_sh, rep))
    else:
        step_fn = jax.jit(step_fn)

    stop = {"now": False}

    def _sigterm(signum, frame):
        stop["now"] = True

    old_handler = signal.signal(signal.SIGTERM, _sigterm)
    key = jax.random.key(seed)
    try:
        while int(state.step) < total_steps:
            x0, _labels = next(data_iter)
            b = x0.shape[0]
            skey = jax.random.fold_in(key, int(state.step))
            if loss_aware:
                t, weights = sampler.sample(skey, b, sampler_state)
            else:
                t, weights = sampler.sample(skey, b)
            with logger.profile("step"):
                state, metrics = step_fn(state, jnp.asarray(x0), t, weights,
                                         jax.random.fold_in(skey, 1))
            if loss_aware:
                sampler_state = sampler.update(
                    sampler_state, t, metrics["per_timestep_losses"])
            logger.logkv_mean("loss", float(metrics["loss"]))
            logger.logkv_mean("grad_norm", float(metrics["grad_norm"]))
            # per-timestep-quartile losses (reference log_loss_dict,
            # train_util.py:296-301: loss_q0..loss_q3)
            per = np.asarray(metrics["per_timestep_losses"])
            for ti, li in zip(np.asarray(t).reshape(-1), per.reshape(-1)):
                logger.logkv_mean(f"loss_q{int(4 * ti / n_t)}", float(li))
            s = int(state.step)
            if s % log_interval == 0:
                logger.logkv("step", s)
                logger.dumpkvs()
            if ckpt_dir and (s % save_interval == 0 or stop["now"]):
                save_checkpoint(ckpt_dir, state)
            if stop["now"]:
                print("SIGTERM: checkpoint saved, exiting training loop")
                break
            # CI early-exit hook (reference train_util.py:164-166)
            if os.environ.get("DIFFUSION_TRAINING_TEST", "") and s > 0:
                break
    finally:
        signal.signal(signal.SIGTERM, old_handler)
    return state
