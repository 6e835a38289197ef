"""IF stage-2 super-resolution sampler.

The reference upscales stage-1 outputs through the diffusers IF-II pipeline
(superresolution, src/modules/edit.py:1375-1392; stage 3 is disabled there).
Here stage 2 is a first-class sampler over an IF-architecture UNet whose
input is [x_t | upsampled stage-1 image] (channel concat, the standard
cascade conditioning), denoised with the same linspace DDIM grid and CFG
under the 'for' prompt. With `aug_level` set (the real IF-II protocol,
diffusers IFSuperResolutionPipeline noise_level=250), the conditioning image
is noise-augmented at that raw timestep and the level is fed to the UNet's
class (timestep) embedding — `unet_apply(x, t, ctx, aug_t)`. Returns images
in [-1, 1]."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from loco_edit_tpu.core.rng import RngStream
from loco_edit_tpu.diffusion import LinspaceDDIM
from loco_edit_tpu.diffusion.sampling import ddim_scan
from loco_edit_tpu.editing.cfg import cfg_eps


def _bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch align_corners=True semantics (output corner
    pixels sample input corners; src = dst * (in-1)/(out-1)). The diffusers
    IF-II pipeline preprocesses the conditioning image with
    F.interpolate(..., mode="bilinear", align_corners=True), which differs
    from jax.image.resize's half-pixel convention by a sub-pixel shift."""

    def axis_weights(n_in: int, n_out: int):
        if n_in == 1 or n_out == 1:
            return np.zeros(n_out, np.int64), np.zeros(n_out, np.float32)
        src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
        i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 2)
        return i0, (src - i0).astype(np.float32)

    b, h, w, c = x.shape
    x = jnp.asarray(x, jnp.float32)
    iy, wy = axis_weights(h, out_h)
    ix, wx = axis_weights(w, out_w)
    rows0 = jnp.take(x, iy, axis=1)
    rows1 = jnp.take(x, np.minimum(iy + 1, h - 1), axis=1)
    rows = rows0 * (1 - wy)[None, :, None, None] + rows1 * wy[None, :, None, None]
    cols0 = jnp.take(rows, ix, axis=2)
    cols1 = jnp.take(rows, np.minimum(ix + 1, w - 1), axis=2)
    return cols0 * (1 - wx)[None, None, :, None] + cols1 * wx[None, None, :, None]


class SuperResSampler:
    """unet_apply(x_2c, t, ctx[, aug_t]) -> (B, H, W, 2*C) learned-sigma
    output, where x_2c = [noisy target | conditioning image] on channels (an
    IF-style UNet with in_channels = 2*C). Plug an instance into
    IFEditPipeline(superres=...)."""

    def __init__(self, unet_apply, prompt_encoder, *, out_size: int = 256,
                 channels: int = 3, steps: int = 50, guidance_scale: float = 4.0,
                 t_max: int = 990, aug_level: int | None = None,
                 noise_schedule: str = "squaredcos_cap_v2",
                 rng: RngStream | None = None):
        self.out_size = out_size
        self.c = channels
        self.guidance_scale = guidance_scale
        self.prompt_encoder = prompt_encoder
        # IF-II checkpoints (and their image_noising_scheduler) are trained on
        # the squaredcos_cap_v2 cosine table — both the DDIM alpha-bars and
        # the aug_level noising must use it
        self.scheduler = LinspaceDDIM(t_max=t_max, noise_schedule=noise_schedule)
        self.grid = self.scheduler.generation_grid(steps)
        self.aug_level = aug_level
        self.rng = rng or RngStream.from_seed(0)
        c = channels
        if aug_level is None:
            self.unet_apply = lambda x, t, ctx: unet_apply(x, t, ctx)[..., :c]
        else:
            self.unet_apply = lambda x, t, ctx: unet_apply(
                x, t, ctx, float(aug_level))[..., :c]
        self._jit_cache: dict = {}
        self._emb_cache: dict = {}
        self._calls = 0   # per-call noise streams (fresh xT/aug noise per call)

    def _emb(self, prompt: str):
        if prompt not in self._emb_cache:
            self._emb_cache[prompt] = self.prompt_encoder(prompt)
        return self._emb_cache[prompt]

    def __call__(self, low_res, prompt: str) -> jnp.ndarray:
        """low_res: (B, h, w, C) in [-1, 1] -> (B, out_size, out_size, C)."""
        low_res = jnp.asarray(low_res)
        b = low_res.shape[0]
        prompts = {"for": self._emb(prompt), "edit": self._emb(""),
                   "null": self._emb("")}

        key = (b, prompt)
        if key not in self._jit_cache:

            def run(xT, cond, aug_key):
                if self.aug_level is not None:
                    # noise-augment the conditioning image at the aug level
                    # (diffusers image_noising_scheduler.add_noise)
                    ab = jnp.asarray(
                        self.scheduler.schedule.alphas_cumprod[self.aug_level],
                        cond.dtype)
                    noise = jax.random.normal(aug_key, cond.shape, cond.dtype)
                    cond = jnp.sqrt(ab) * cond + jnp.sqrt(1.0 - ab) * noise

                def unet_with_cond(x, t, ctx_in):
                    # cfg_eps stacks the CFG variants on the batch axis; the
                    # conditioning image is replicated to match
                    reps = x.shape[0] // cond.shape[0]
                    cc = jnp.concatenate([cond] * reps, axis=0).astype(x.dtype)
                    return self.unet_apply(
                        jnp.concatenate([x, cc], axis=-1), t, ctx_in)

                eps = lambda x, t: cfg_eps(  # noqa: E731
                    unet_with_cond, x, t, prompts, "null+(for-null)",
                    self.guidance_scale, enabled=self.guidance_scale > 1.0)
                return ddim_scan(eps, xT, self.grid)

            self._jit_cache[key] = jax.jit(run)

        up = _bilinear_align_corners(low_res, self.out_size, self.out_size)
        # fresh streams per call (repeated upscales must not share noise)
        nk = jax.random.fold_in(self.rng.fork("sr-noise").key, self._calls)
        ak = jax.random.fold_in(self.rng.fork("sr-aug").key, self._calls)
        self._calls += 1
        xT = jax.random.normal(nk, (b, self.out_size, self.out_size, self.c))
        return jnp.clip(self._jit_cache[key](xT, up, ak), -1.0, 1.0)
