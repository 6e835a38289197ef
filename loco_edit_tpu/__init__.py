"""loco-edit-tpu: TPU-native framework for localized diffusion-model editing.

A ground-up JAX/XLA/Pallas re-design of the capabilities of LOCO-Edit
(NeurIPS 2024, arXiv 2409.02374; reference implementation ChicyChen/LOCO-Edit):
training-free, unsupervised, localized image editing with pretrained diffusion
models via low-rank subspaces of the posterior-mean-predictor Jacobian.

Layers (bottom-up):
  core/       rng discipline, device-mesh topology, typed configs
  ops/        Pallas TPU kernels + pure-XLA fallbacks for the hot U-Net ops
  diffusion/  beta schedules, the linspace DDIM scheduler (generation == inversion
              under grid reversal), PMP, scan-compiled sampling loops
  models/     Flax denoisers (ADM/P2, SDEdit DDPM, SD 2.1, DeepFloyd-IF, LCM)
  editing/    the edit algebra: Jacobian subspace iteration (jvp/vjp, probe-sharded),
              null-space projection, x-space guidance walks, direction IO
  masks/      SAM / CelebAMask-HQ GT / DiffEdit mask sources
  data/       datasets
  parallel/   mesh + sharding helpers (DP/probe-parallel over ICI)
  training/   DP trainer (EMA, microbatch accumulation, loss-aware resampling)
  pipelines/  the four edit engines as thin orchestrations
  cli/        argparse surface mirroring the reference scripts
"""

__version__ = "0.1.0"

# LOCO_PLATFORM pins the JAX backend for this package's entry points.
# Rationale: some out-of-tree TPU plugins (the axon tunnel in this
# environment) export JAX_PLATFORMS themselves and ignore user overrides of
# it, so CPU-pinned smoke scripts silently run every op through the TPU RPC
# tunnel. jax.config.update IS honored, so a dedicated env var — one the
# plugin can't have claimed — is mirrored into the config before any
# backend initializes (importing jax does not initialize one).
import os as _os

if _os.environ.get("LOCO_PLATFORM"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["LOCO_PLATFORM"])
    except Exception:  # pragma: no cover - backend already initialized
        pass
