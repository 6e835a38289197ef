"""Aux subsystems: logger KV semantics, profile scopes, orbax checkpoint
save/restore round trip, eval CLI on generated folders, metrics sanity."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from loco_edit_tpu.utils.logger import Logger
from loco_edit_tpu.utils import metrics


def test_logger_kv_mean_and_json(tmp_path):
    lg = Logger(str(tmp_path), formats=("json",))
    lg.logkv("loss", 2.0)
    lg.logkv_mean("grad", 1.0)
    lg.logkv_mean("grad", 3.0)
    with lg.profile("step"):
        pass
    out = lg.dumpkvs()
    assert out["loss"] == 2.0 and out["grad"] == 2.0 and "time/step" in out
    rows = [json.loads(l) for l in open(tmp_path / "progress.jsonl")]
    assert rows[0]["grad"] == 2.0
    # accumulators reset
    assert lg.dumpkvs() == {}


def test_checkpoint_roundtrip(tmp_path):
    from loco_edit_tpu.training import TrainConfig, create_train_state
    from loco_edit_tpu.training.checkpoint import (
        latest_step,
        restore_checkpoint,
        save_checkpoint,
    )

    params = {"w": jnp.asarray(3.5), "b": jnp.ones((4,))}
    cfg = TrainConfig(lr=1e-3)
    state = create_train_state(params, cfg)
    state = jax.tree.map(lambda x: x, state)
    save_checkpoint(str(tmp_path / "ckpt"), state)
    assert latest_step(str(tmp_path / "ckpt")) == 0

    template = create_train_state(jax.tree.map(jnp.zeros_like, params), cfg)
    restored = restore_checkpoint(str(tmp_path / "ckpt"), template)
    np.testing.assert_allclose(float(restored.params["w"]), 3.5)
    np.testing.assert_allclose(np.asarray(restored.ema_params["b"]), 1.0)
    assert int(restored.step) == 0


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(metrics.ssim(a, a)[0]) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    very_noisy = np.clip(a + rng.normal(0, 0.6, a.shape).astype(np.float32), 0, 1)
    s1 = float(metrics.ssim(a, noisy)[0])
    s2 = float(metrics.ssim(a, very_noisy)[0])
    assert s2 < s1 < 1.0


def test_masked_mse():
    a = np.zeros((1, 4, 4, 1), np.float32)
    b = np.ones((1, 4, 4, 1), np.float32)
    mask = np.zeros((1, 4, 4, 1), bool)
    mask[0, :2] = True
    np.testing.assert_allclose(np.asarray(metrics.masked_mse(a, b, mask)), 1.0)
    b2 = b.copy()
    b2[0, :2] = 0  # perfect inside mask
    np.testing.assert_allclose(np.asarray(metrics.masked_mse(a, b2, mask)), 0.0)


def test_eval_cli(tmp_path):
    from PIL import Image

    from loco_edit_tpu.cli.eval import main as eval_main

    pdir, tdir = tmp_path / "p", tmp_path / "t"
    pdir.mkdir(), tdir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        img = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        Image.fromarray(img).save(pdir / f"{i}.png")
        Image.fromarray(img).save(tdir / f"{i}.png")
    r = eval_main(["--eval_metric", "ssim", "--folder_preds", str(pdir),
                   "--folder_original", str(tdir)])
    assert r == pytest.approx(1.0, abs=1e-5)
    r = eval_main(["--eval_metric", "mmse", "--folder_preds", str(pdir),
                   "--folder_original", str(tdir)])
    assert r == pytest.approx(0.0, abs=1e-6)


def test_logger_tensorboard_writer(tmp_path):
    """The TensorBoard KV format (reference logger.py:150-190) writes event
    files that tensorboard can read back."""
    from loco_edit_tpu.utils.logger import Logger

    lg = Logger(str(tmp_path), formats=("json", "tensorboard"))
    lg.logkv("loss", 0.5)
    lg.logkv("step", 3)
    lg.dumpkvs()
    lg.logkv("loss", 0.25)
    lg.logkv("step", 4)
    lg.dumpkvs()
    lg.close()
    import glob

    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events, "no event files written"
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    def scalar(v):
        if v.HasField("tensor"):  # tensorboardX >= 2.x stores TensorProto
            return float(v.tensor.float_val[0])
        return float(v.simple_value)

    vals = [(v.tag, scalar(v), e.step)
            for e in EventFileLoader(events[0]).Load()
            for v in getattr(e.summary, "value", [])]
    assert ("loss", 0.5, 3) in vals and ("loss", 0.25, 4) in vals
