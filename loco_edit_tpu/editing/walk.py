"""x-space guidance: straight-line walks along edit directions.

The reference edits x_t by repeatedly adding scale*step*v_k and collecting
intermediate frames, for both +/- directions, subsampling to `vis_num`, and
concatenating the mirrored strip [flip(neg)[:-1], pos]
(src/modules/edit.py:2339-2363, step at :2617-2625). All of it is one
broadcasted expression here — the strip then denoises as a single batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _subsample_indices(length: int, vis_num: int) -> np.ndarray:
    """The reference's frame subsampling: [0, -1] when vis_num == 1, else a
    stride slice xt[::len // vis_num] (edit.py:2358-2361)."""
    if vis_num == 1:
        return np.array([0, length - 1])
    stride = max(length // vis_num, 1)
    return np.arange(0, length, stride)


def x_space_guidance_strip(xt: jnp.ndarray, vk: jnp.ndarray, *,
                           scale: float, edit_step: float, num_steps: int,
                           vis_num: int) -> jnp.ndarray:
    """Build the mirrored edit strip around xt (shape (1, ...)) along vk.

    Frame k of the one-sided walk is xt + k*scale*edit_step*vk, k = 0..num_steps.
    Returns (n_frames, *xt.shape[1:]) with the negative side flipped in front
    and its duplicate center frame dropped.
    """
    vk = vk.reshape(xt.shape[1:]).astype(xt.dtype)
    ks = jnp.arange(0, num_steps + 1, dtype=xt.dtype) * (scale * edit_step)
    one_sided = xt + ks[:, None, None, None] * vk[None]
    idx = _subsample_indices(num_steps + 1, vis_num)
    pos = one_sided[idx]
    neg = (xt - ks[:, None, None, None] * vk[None])[idx]
    return jnp.concatenate([neg[::-1][:-1], pos], axis=0)
