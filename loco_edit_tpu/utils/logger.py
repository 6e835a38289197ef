"""Training/observability logger.

Functional equivalent of the reference's vendored OpenAI-baselines logger
(src/models/guided_diffusion/logger.py): key-value accumulation with mean
aggregation (logkv/logkv_mean/dumpkvs :212-241), human-readable stdout table
(:36), JSONL, CSV, and TensorBoard writers (:98,:113,:150), and wall-time
profile scopes (@profile / profile_kv :294-323). MPI mean-aggregation is unnecessary under
SPMD (all hosts compute identical metrics); cross-host reduction, when values
do differ, happens in-graph via psum before logging. Adds a jax.profiler
trace helper for TPU timelines.
"""

from __future__ import annotations

import contextlib
import csv
import json
import os
import time
from collections import defaultdict
from typing import Any


class Logger:
    def __init__(self, log_dir: str | None = None,
                 formats: tuple[str, ...] = ("stdout", "json")):
        self.log_dir = log_dir
        self.formats = formats
        self._kv: dict[str, float] = {}
        self._kv_sum: dict[str, float] = defaultdict(float)
        self._kv_cnt: dict[str, int] = defaultdict(int)
        self._t0: dict[str, float] = {}
        self._prof: dict[str, float] = defaultdict(float)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
        self._csv_keys: list[str] | None = None
        self._tb = None
        self._tb_step = 0
        if log_dir and "tensorboard" in formats:
            # reference logger.py:150-190 TensorBoardOutputFormat
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(os.path.join(log_dir, "tb"))

    # -- kv api (reference logger.py:212-241) ---------------------------------

    def logkv(self, key: str, val: Any) -> None:
        self._kv[key] = float(val)

    def logkv_mean(self, key: str, val: Any) -> None:
        self._kv_sum[key] += float(val)
        self._kv_cnt[key] += 1

    def dumpkvs(self) -> dict[str, float]:
        out = dict(self._kv)
        for k in self._kv_sum:
            out[k] = self._kv_sum[k] / max(self._kv_cnt[k], 1)
        for k, v in self._prof.items():
            out[f"time/{k}"] = v
        self._kv.clear()
        self._kv_sum.clear()
        self._kv_cnt.clear()
        self._prof.clear()
        if "stdout" in self.formats:
            self._write_stdout(out)
        if self.log_dir and "json" in self.formats:
            with open(os.path.join(self.log_dir, "progress.jsonl"), "a") as f:
                f.write(json.dumps(out) + "\n")
        if self.log_dir and "csv" in self.formats:
            self._write_csv(out)
        if self._tb is not None:
            step = int(out.get("step", self._tb_step))
            for k, v in out.items():
                self._tb.add_scalar(k, v, step)
            self._tb.flush()
            self._tb_step += 1
        return out

    def _write_stdout(self, kv: dict[str, float]) -> None:
        if not kv:
            return
        width = max(len(k) for k in kv) + 2
        print("-" * (width + 14))
        for k in sorted(kv):
            print(f"| {k:<{width}}| {kv[k]:<10.5g}|")
        print("-" * (width + 14))

    def _write_csv(self, kv: dict[str, float]) -> None:
        path = os.path.join(self.log_dir, "progress.csv")
        if self._csv_keys is None:
            self._csv_keys = sorted(kv)
            with open(path, "w", newline="") as f:
                csv.writer(f).writerow(self._csv_keys)
        with open(path, "a", newline="") as f:
            csv.writer(f).writerow([kv.get(k, "") for k in self._csv_keys])

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    # -- profiling scopes (reference logger.py:294-323) -----------------------

    @contextlib.contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._prof[name] += time.perf_counter() - t0


@contextlib.contextmanager
def tpu_trace(log_dir: str):
    """Capture a jax.profiler trace (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
