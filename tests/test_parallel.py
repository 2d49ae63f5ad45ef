"""Multi-device data-parallel tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.parallel import (
    dryrun_multichip, make_mesh, replicate_state, shard_arrays,
)
from grouptraj.parallel.data_parallel import synthetic_batch
from grouptraj.train import init_train_state, make_d_step, make_g_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == ("data",)


def test_shard_arrays_places_scene_axis():
    mesh = make_mesh(8)
    batch = synthetic_batch(16, 4)
    sharded = shard_arrays(batch, mesh)
    for leaf in jax.tree_util.tree_leaves(sharded):
        assert len(leaf.sharding.device_set) == 8


def test_dryrun_multichip():
    dryrun_multichip(8)


def test_data_parallel_matches_single_device():
    """The same train step on sharded vs single-device inputs gives the same
    losses and parameters (up to f32 reduction order)."""
    cfg = ModelConfig()
    tcfg = TrainConfig(best_k=2, batch_size=8)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    batch = synthetic_batch(8, 6, seed=4)
    key = jax.random.PRNGKey(5)

    d_step = make_d_step(cfg, tcfg)
    g_step = make_g_step(cfg, tcfg)
    s1, dl1 = d_step(state, batch, key)
    s1, gl1 = g_step(s1, batch, key)

    mesh = make_mesh(8)
    state_r = replicate_state(state, mesh)
    batch_s = shard_arrays(batch, mesh)
    s2, dl2 = d_step(state_r, batch_s, key)
    s2, gl2 = g_step(s2, batch_s, key)

    assert np.isclose(float(dl1["D_total_loss"]), float(dl2["D_total_loss"]),
                      atol=1e-4)
    assert np.isclose(float(gl1["G_total_loss"]), float(gl2["G_total_loss"]),
                      atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_uneven_shard_raises():
    mesh = make_mesh(8)
    batch = synthetic_batch(6, 4)   # 6 scenes not divisible by 8
    with pytest.raises(Exception):
        jax.block_until_ready(shard_arrays(batch, mesh))
