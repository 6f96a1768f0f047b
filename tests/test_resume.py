"""Crash/resume and observability: full-state checkpointing must make
(train K, crash, resume K..N) bitwise-identical to training N straight."""

import json

import jax
import numpy as np
import pytest

from onestop_tpu.config import TrainConfig
from onestop_tpu.models import UNet
from onestop_tpu.train import Trainer


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    y = np.zeros((12, 16, 16, 1), np.float32)
    y[:, 4:10, 5:11] = 1.0
    x = np.clip(y * 0.7 + 0.2 * rng.random((12, 16, 16, 1)), 0, 1).astype(np.float32)
    return x, y


def _cfg():
    return TrainConfig(batch_size=4, epochs=6, schedule="constant", learning_rate=1e-3)


def test_resume_is_bitwise_identical(tmp_path, data):
    x, y = data
    model = UNet(widths=(4,), bridge=8)

    # straight run: 6 epochs
    tr = Trainer(model, _cfg())
    s0 = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    s_full, h_full, _ = tr.fit(s0, x, y, x, y)

    # interrupted run: 3 epochs + checkpoint, then resume to 6
    ckpt = tmp_path / "state.msgpack"
    tr2 = Trainer(model, _cfg())
    s1 = tr2.init_state(jax.random.PRNGKey(0), x.shape[1:])
    tr2.fit(s1, x, y, x, y, epochs=3, checkpoint_path=ckpt, checkpoint_every=3)
    assert ckpt.exists()
    s2 = tr2.init_state(jax.random.PRNGKey(0), x.shape[1:])
    s_res, h_res, _ = tr2.fit(s2, x, y, x, y, epochs=6,
                              checkpoint_path=ckpt, resume=True)

    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_res.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert h_res["loss"][3:] == pytest.approx(h_full["loss"][3:], rel=1e-6)
    assert len(h_res["loss"]) == 6  # history spliced across the restart


def test_jsonl_log_and_timing(tmp_path, data):
    x, y = data
    tr = Trainer(UNet(widths=(4,), bridge=8), _cfg())
    s = tr.init_state(jax.random.PRNGKey(0), x.shape[1:])
    log = tmp_path / "train_log.jsonl"
    _, hist, _ = tr.fit(s, x, y, x, y, epochs=2, log_file=log)
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert len(lines) == 2
    assert {"epoch", "lr", "loss", "val_loss", "seconds"} <= set(lines[0])
    assert len(hist["epoch_seconds"]) == 2
