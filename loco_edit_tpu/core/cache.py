"""Persistent XLA compile cache for the product entry points.

The cost profile of this framework is cold-start dominated: the T2I edit
programs compile in 400-950 s through the TPU tunnel (BENCH.md), and a warm
run serves the same edit in seconds. The bench harnesses have always pointed
JAX's persistent compilation cache at the repo's `.jax_cache/` so re-runs
start warm — but a cache only the benchmarks use is a benchmark trick, not a
product feature. This module gives the CLI (`cli/main.py`) and the edit
server (`serve.py`) the same treatment: a process restart with unchanged
program shapes deserializes executables in seconds instead of recompiling.

Resolution order for the cache directory:
  1. `LOCO_COMPILE_CACHE` env var — a directory path, or `0`/`off` to
     disable (e.g. for compile-time measurements, which must stay cold).
  2. `JAX_COMPILATION_CACHE_DIR` / an already-configured
     `jax_compilation_cache_dir` — respected untouched, JAX's own knobs win.
  3. The repo-checkout `.jax_cache/` next to the package (the same directory
     `bench.py` uses, so CLI and bench share warm programs), falling back to
     `~/.cache/loco_edit_tpu/jax_cache` for installed-package use.

Only compilations above 5 s are persisted (`min_compile_time_secs`): the
cache exists for the minutes-long autodiff graphs, not for trivia, and tiny
entries would churn the directory during test runs.

The reference framework has no equivalent (torch eager + cuDNN autotune
caches handle its warm-up); this is a TPU/XLA-specific operational need.
"""

from __future__ import annotations

import os

_DISABLE = {"0", "off", "false", "no"}


def default_cache_dir() -> str:
    """The shared repo `.jax_cache/` when running from a checkout, else a
    user-level cache directory."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isdir(os.path.join(repo, ".git")) or \
            os.path.isdir(os.path.join(repo, ".jax_cache")):
        return os.path.join(repo, ".jax_cache")
    return os.path.join(os.path.expanduser("~"), ".cache", "loco_edit_tpu",
                        "jax_cache")


def enable_compile_cache() -> str | None:
    """Point JAX's persistent compilation cache at the resolved directory.

    Idempotent; safe before or after backend initialization (the cache dir
    is consulted per-compilation). Returns the directory in effect, or None
    when disabled / already configured elsewhere.
    """
    env = os.environ.get("LOCO_COMPILE_CACHE", "").strip()
    if env.lower() in _DISABLE and env != "":
        return None

    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir  # someone else decided

    path = env or default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
