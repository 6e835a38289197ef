"""Orbax checkpointing for the trainer.

Replaces the reference's rank-0 torch.save / chunked-MPI-broadcast restore
(src/models/guided_diffusion/train_util.py:232-272,
dist_util.py:54-83): orbax handles multihost coordination and sharded arrays
natively, so "rank-0 writes, everyone restores" needs no explicit code.
Keeps the reference's artifacts: params, EMA params, optimizer state, step.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from loco_edit_tpu.training.trainer import TrainState


def _mgr(ckpt_dir: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True),
    )


def save_checkpoint(ckpt_dir: str, state: TrainState,
                    extra: dict[str, Any] | None = None,
                    max_to_keep: int = 3) -> None:
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir, max_to_keep)
    payload = {
        "step": np.asarray(state.step),
        "params": state.params,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
    }
    if extra:
        payload["extra"] = extra
    mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def latest_step(ckpt_dir: str) -> int | None:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _mgr(ckpt_dir)
    return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       step: int | None = None) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes/shardings)."""
    import orbax.checkpoint as ocp

    mgr = _mgr(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    tpl = {
        "step": np.asarray(template.step),
        "params": template.params,
        "opt_state": template.opt_state,
        "ema_params": template.ema_params,
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(tpl))
    return TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored["ema_params"],
    )
