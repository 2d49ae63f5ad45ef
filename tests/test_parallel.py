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


@pytest.fixture
def data_root(tmp_path, monkeypatch):
    """GROUPTRAJ_DATA_DIR with tiny train/val splits for a fake scene."""
    rng = np.random.default_rng(0)
    for split, nframes in (("train", 40), ("val", 25)):
        d = tmp_path / "toy" / split
        d.mkdir(parents=True)
        rows = []
        for t in range(nframes):
            for p in (1, 2, 3, 4):
                x = 0.1 * t + p + 0.01 * rng.standard_normal()
                y = 0.05 * t - p
                rows.append(f"{t*10.0}\t{p}.0\t{x:.4f}\t{y:.4f}\t{p % 2}.0")
        (d / "toy.txt").write_text("\n".join(rows) + "\n")
    monkeypatch.setenv("GROUPTRAJ_DATA_DIR", str(tmp_path))
    return tmp_path


def test_train_loop_data_parallel_matches_single_device(data_root, tmp_path):
    """The PRODUCTION train() path (device-resident dataset, chunked
    lax.scan dispatch) on an 8-device mesh produces the same losses and
    final params as single-device — DP is a sharding annotation, not a
    different computation."""
    from grouptraj.train.loop import train

    def run(num_devices, out):
        tcfg = TrainConfig(dataset_name="toy", batch_size=8, num_epochs=0,
                           num_iterations=4, checkpoint_every=3,
                           print_every=1, best_k=2, seed=3,
                           output_dir=str(tmp_path / out),
                           num_devices=num_devices, steps_per_dispatch=2)
        return train(ModelConfig(), tcfg)

    c1 = run(1, "dp1")
    c8 = run(8, "dp8")
    for k in c1["G_losses"]:
        np.testing.assert_allclose(c1["G_losses"][k], c8["G_losses"][k],
                                   atol=2e-3)
    for k in c1["D_losses"]:
        np.testing.assert_allclose(c1["D_losses"][k], c8["D_losses"][k],
                                   atol=2e-3)
    for name in c1["g_state"]:
        np.testing.assert_allclose(c1["g_state"][name], c8["g_state"][name],
                                   atol=1e-3)
    # val metrics path (sharded check_accuracy) agrees too
    assert np.isclose(c1["metrics_val"]["ade"][-1],
                      c8["metrics_val"]["ade"][-1], atol=1e-3)


def test_train_loop_dp_with_buckets(tmp_path, monkeypatch):
    """Data parallelism composes with scene-size buckets: every bucket width
    compiles and executes with the scene axis sharded over 8 devices."""
    from grouptraj.train.loop import train

    rng = np.random.default_rng(2)
    for split, nframes in (("train", 60), ("val", 25)):
        d = tmp_path / "toy" / split
        d.mkdir(parents=True)
        rows = []
        for t in range(nframes):
            peds = (1, 2, 3) if (t < 20 or t >= 40) else tuple(range(1, 13))
            for p in peds:
                x = 0.1 * t + p + 0.01 * rng.standard_normal()
                rows.append(f"{t*10.0}\t{p}.0\t{x:.4f}\t{0.05*t-p:.4f}"
                            f"\t{p % 3}.0")
        (d / "toy.txt").write_text("\n".join(rows) + "\n")
    monkeypatch.setenv("GROUPTRAJ_DATA_DIR", str(tmp_path))

    tcfg = TrainConfig(dataset_name="toy", batch_size=8, num_epochs=0,
                       num_iterations=6, checkpoint_every=100, print_every=2,
                       best_k=2, n_buckets=3, steps_per_dispatch=2,
                       num_devices=8, output_dir=str(tmp_path / "out"))
    ckpt = train(ModelConfig(), tcfg)
    assert ckpt["counters"]["t"] == 6
    for k, vals in ckpt["G_losses"].items():
        assert np.isfinite(vals).all(), k


def test_train_loop_rejects_indivisible_batch(data_root, tmp_path):
    from grouptraj.train.loop import train

    tcfg = TrainConfig(dataset_name="toy", batch_size=6, num_iterations=1,
                       num_epochs=0, num_devices=8,
                       output_dir=str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="divisible by"):
        train(ModelConfig(), tcfg)


def test_uneven_shard_raises():
    mesh = make_mesh(8)
    batch = synthetic_batch(6, 4)   # 6 scenes not divisible by 8
    with pytest.raises(Exception):
        jax.block_until_ready(shard_arrays(batch, mesh))


def test_train_many_data_parallel_matches_single_device(tmp_path,
                                                        monkeypatch):
    """Seed-vmap x data-parallel composition (round 5): a 2-seed sweep with
    the scene axis sharded over 4 mesh devices produces the same per-seed
    losses and final params as the single-device sweep — and the Pallas
    pool kernel stays on its shard_map'd SPMD path under the seed vmap
    (interpret mode; pool_core_pallas_spmd custom_vmap rules)."""
    import os

    from grouptraj.train.multi import train_many

    rng = np.random.default_rng(7)
    for split, nframes in (("train", 60), ("val", 25)):
        d = tmp_path / "toy" / split
        d.mkdir(parents=True)
        rows = []
        for t in range(nframes):
            for p in (1, 2, 3, 4, 5):
                x = 0.1 * t + p + 0.01 * rng.standard_normal()
                rows.append(f"{t*10.0}\t{p}.0\t{x:.4f}\t{0.05*t-p:.4f}"
                            f"\t{p % 2}.0")
        (d / "toy.txt").write_text("\n".join(rows) + "\n")
    monkeypatch.setenv("GROUPTRAJ_DATA_DIR", str(tmp_path))

    def run(num_devices, out, pool_impl="auto"):
        cfg = ModelConfig(pool_impl=pool_impl)
        tcfg = TrainConfig(dataset_name="toy", batch_size=8, num_epochs=0,
                           num_iterations=4, checkpoint_every=3,
                           print_every=2, best_k=2, seed=3,
                           output_dir=str(tmp_path / out),
                           num_devices=num_devices, steps_per_dispatch=2,
                           restore_from_checkpoint=False)
        return train_many(cfg, tcfg, [11, 12])

    c1 = run(1, "dp1")
    c4 = run(4, "dp4")
    for s in (11, 12):
        for k in c1[s]["G_losses"]:
            np.testing.assert_allclose(c1[s]["G_losses"][k],
                                       c4[s]["G_losses"][k], atol=2e-3)
        for name in c1[s]["g_state"]:
            np.testing.assert_allclose(c1[s]["g_state"][name],
                                       c4[s]["g_state"][name], atol=1e-3)
        assert np.isclose(c1[s]["metrics_val"]["ade"][-1],
                          c4[s]["metrics_val"]["ade"][-1], atol=1e-3)

    # the SPMD Pallas pool under the seed vmap (interpret mode on the CPU
    # mesh) agrees with the same kernel unsharded
    monkeypatch.setenv("GROUPTRAJ_PALLAS_INTERPRET", "1")
    try:
        k1 = run(1, "kp1", pool_impl="pallas")
        k4 = run(4, "kp4", pool_impl="pallas")
    finally:
        monkeypatch.delenv("GROUPTRAJ_PALLAS_INTERPRET")
    for s in (11, 12):
        for k in k1[s]["G_losses"]:
            np.testing.assert_allclose(k1[s]["G_losses"][k],
                                       k4[s]["G_losses"][k], atol=2e-3)
