"""Unit tests for the device-resident dataset path (train/device_data.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.data import DenseDataset, TrajectoryDataset
from grouptraj.train.device_data import (
    IndexStream, device_dataset, gather_batch,
)
from grouptraj.train.steps import (
    _batch_arrays, init_train_state, make_d_step, make_g_step,
    make_train_chunk,
)


@pytest.fixture(scope="module")
def dense(tmp_path_factory):
    rng = np.random.default_rng(0)
    d = tmp_path_factory.mktemp("data")
    rows = []
    for t in range(30):
        for p in (1, 2, 3):
            rows.append(f"{t*10.0}\t{p}.0\t{0.1*t+p:.4f}\t{0.2*t-p:.4f}"
                        f"\t{p % 2}.0")
    (d / "f.txt").write_text("\n".join(rows) + "\n")
    return DenseDataset(TrajectoryDataset(str(d)), n_max=8)


def test_gather_matches_host_batch(dense):
    data = device_dataset(dense, obs_len=8)
    idx = jnp.asarray([2, 0, 5], jnp.int32)
    b = gather_batch(data, idx, 8)
    host = _batch_arrays(dense.gather([2, 0, 5]))
    for k in b:
        assert np.allclose(np.asarray(b[k]), np.asarray(host[k])), k


def test_null_scene_is_fully_masked(dense):
    data = device_dataset(dense, obs_len=8)
    b = gather_batch(data, jnp.asarray([dense.num_seq], jnp.int32), 8)
    assert float(b["valid"].sum()) == 0.0
    assert float(jnp.abs(b["obs"]).sum()) == 0.0


def test_index_stream_epochs_cover_everything(dense):
    stream = IndexStream(dense.num_seq, batch_size=4, seed=3)
    it = iter(stream)
    per_epoch = -(-dense.num_seq // 4)
    seen = []
    for _ in range(per_epoch):
        seen.extend(np.asarray(next(it)).tolist())
    real = [i for i in seen if i < dense.num_seq]
    assert sorted(real) == list(range(dense.num_seq))
    assert all(i == dense.num_seq for i in seen if i >= dense.num_seq)
    assert stream.epoch == 1
    next(it)
    assert stream.epoch == 2


def test_chunked_equals_stepwise(dense):
    """make_train_chunk's scan produces exactly the same parameters as the
    equivalent sequence of individual d/g steps with the same keys."""
    cfg = ModelConfig()
    tcfg = TrainConfig(best_k=2, batch_size=4, d_steps=1, g_steps=1)
    state0 = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    data = device_dataset(dense, cfg.obs_len)

    idx = np.asarray(
        [[[0, 1, 2, 3], [4, 5, 6, 0]],
         [[1, 2, 3, 4], [5, 6, 0, 1]]], np.int32)   # [chunk=2, spi=2, S=4]
    key = jax.random.PRNGKey(7)
    run = make_train_chunk(cfg, tcfg, "scan", chunk=2)
    state_c, losses = run(state0, data, jnp.asarray(idx), key)

    d_step = make_d_step(cfg, tcfg)
    g_step = make_g_step(cfg, tcfg)
    state_s = state0
    keys = jax.random.split(key, 2)
    for c in range(2):
        k = keys[c]
        k, sub = jax.random.split(k)
        bd = _batch_arrays(dense.gather(idx[c, 0]))
        state_s, _ = d_step(state_s, bd, sub)
        k, sub = jax.random.split(k)
        bg = _batch_arrays(dense.gather(idx[c, 1]))
        state_s, _ = g_step(state_s, bg, sub)

    for a, b in zip(jax.tree_util.tree_leaves(state_c.g_params),
                    jax.tree_util.tree_leaves(state_s.g_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_c.d_params),
                    jax.tree_util.tree_leaves(state_s.d_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert losses["G_total_loss"].shape == (2,)
