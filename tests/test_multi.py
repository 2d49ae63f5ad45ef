"""Multi-seed vmapped trainer (grouptraj/train/multi.py).

Verifies the core claim — N vmapped replicas compute exactly the updates N
independent single-seed chunk runners would, given the same per-seed keys
and the shared batch schedule — plus the end-to-end train_many path
(per-seed checkpoints, best-state tracking, divergent replicas).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.data import DenseDataset, TrajectoryDataset
from grouptraj.train.device_data import device_dataset
from grouptraj.train.steps import build_train_chunk, init_train_state
from grouptraj.train.multi import train_many


@pytest.fixture
def data_root(tmp_path, monkeypatch):
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


def _tree_allclose(a, b, atol):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol,
                                   rtol=0)


def test_vmapped_chunk_matches_per_seed(data_root):
    """vmap(build_train_chunk) over the seed axis == per-seed runs."""
    cfg = ModelConfig()
    tcfg = TrainConfig(dataset_name="toy", batch_size=4, best_k=2)
    from grouptraj.utils import get_dset_path
    dset = TrajectoryDataset(get_dset_path("toy", "train"), cfg.obs_len,
                             cfg.pred_len)
    data = device_dataset(DenseDataset(dset, 8), cfg.obs_len)

    chunk, spi = 2, tcfg.d_steps + tcfg.g_steps
    rng = np.random.default_rng(3)
    idx = rng.integers(0, len(dset), size=(chunk, spi, 4)).astype(np.int32)

    seeds = [11, 12, 13]
    init_keys = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    step_keys = jnp.stack([jax.random.PRNGKey(100 + s) for s in seeds])
    states = jax.vmap(lambda k: init_train_state(k, cfg, tcfg))(init_keys)

    run = build_train_chunk(cfg, tcfg, "scan", chunk)
    vstates, vlosses = jax.jit(jax.vmap(run, in_axes=(0, None, None, 0)))(
        states, data, jnp.asarray(idx), step_keys)

    for i, _ in enumerate(seeds):
        state_i = jax.tree_util.tree_map(lambda x: x[i], states)
        ref_state, ref_losses = jax.jit(run)(state_i, data,
                                             jnp.asarray(idx), step_keys[i])
        # 1e-4 not 2e-5: the decomposed pool's weight precompute
        # (We @ W1e etc, ops/pooling.py) fuses differently under vmap,
        # so per-seed floats drift at reassociation level after 2 chunks
        _tree_allclose(jax.tree_util.tree_map(lambda x: x[i], vstates),
                       ref_state, atol=1e-4)
        for k in ref_losses:
            np.testing.assert_allclose(np.asarray(vlosses[k])[i],
                                       np.asarray(ref_losses[k]), atol=1e-4,
                                       rtol=0)


def test_train_many_e2e(data_root, tmp_path):
    out = str(tmp_path / "sweep")
    cfg = ModelConfig()
    tcfg = TrainConfig(dataset_name="toy", batch_size=4, num_epochs=0,
                       num_iterations=4, checkpoint_every=2, print_every=1,
                       best_k=2, output_dir=out, checkpoint_name="ck",
                       num_samples_check=50, steps_per_dispatch=2)
    seeds = [5, 6]
    ckpts = train_many(cfg, tcfg, seeds)
    assert set(ckpts) == set(seeds)
    g_flat = {}
    for s in seeds:
        ck = ckpts[s]
        assert ck["counters"]["t"] == 4
        assert len(ck["metrics_val"]["ade"]) >= 1
        assert ck["g_best_state"] is not None
        assert len(ck["norm_g"]) >= 1 and np.isfinite(ck["norm_g"]).all()
        assert ck["args"]["seed"] == s
        assert ck["args"]["sweep_seeds"] == seeds
        path = os.path.join(out, f"s{s}", "ck_with_model.pt")
        assert os.path.exists(path)
        # reloads through the standard checkpoint/eval path
        from grouptraj.compat import import_generator
        from grouptraj.train.checkpoint import load_checkpoint
        loaded = load_checkpoint(path)
        params = import_generator(loaded["g_best_state"])
        g_flat[s] = np.concatenate([np.ravel(x) for x in
                                    jax.tree_util.tree_leaves(params)])
    # replicas actually diverged (different init seeds)
    assert not np.allclose(g_flat[seeds[0]], g_flat[seeds[1]])


def test_train_many_rejects_bad_configs(data_root, tmp_path):
    cfg = ModelConfig()
    tcfg = TrainConfig(dataset_name="toy", batch_size=5, num_iterations=2,
                       num_epochs=0, output_dir=str(tmp_path / "x"),
                       num_devices=2)
    with pytest.raises(ValueError, match="divide"):
        train_many(cfg, tcfg, [1, 2])
    tcfg2 = TrainConfig(dataset_name="toy", batch_size=4, num_iterations=2,
                        num_epochs=0, output_dir=str(tmp_path / "y"),
                        checkpoint_start_from="some/nonexistent_sweep")
    with pytest.raises(ValueError, match="no sweep member"):
        train_many(cfg, tcfg2, [1, 2])
    with pytest.raises(ValueError, match="duplicate"):
        train_many(cfg, TrainConfig(dataset_name="toy"), [1, 1])


def test_train_many_resume_matches_uninterrupted(data_root, tmp_path):
    """Kill a 2-seed sweep mid-run (at a checkpoint boundary) and resume:
    the resumed run must reproduce the uninterrupted run's remaining
    iterations exactly — final metrics histories, counters, and weights —
    because states, per-seed RNG chains (ckpt['rng_key_vec']) and the
    host-side schedule are all restored/fast-forwarded."""
    cfg = ModelConfig()
    seeds = [5, 6]

    def tc(out, iters, restore=False):
        return TrainConfig(dataset_name="toy", batch_size=4, num_epochs=0,
                           num_iterations=iters, checkpoint_every=2,
                           print_every=1, best_k=2, output_dir=out,
                           checkpoint_name="ck", num_samples_check=50,
                           steps_per_dispatch=2,
                           restore_from_checkpoint=restore)

    full = train_many(cfg, tc(str(tmp_path / "full"), 6), seeds)

    # interrupted: run 4 of 6 iterations (dies after the t=4 checkpoint),
    # then resume the same output dir to completion
    out2 = str(tmp_path / "resumed")
    train_many(cfg, tc(out2, 4), seeds)
    resumed = train_many(cfg, tc(out2, 6, restore=True), seeds)

    for s in seeds:
        a, b = full[s], resumed[s]
        assert b["counters"]["t"] == 6
        assert b["restore_ts"] == [4]
        # metric histories: the resumed run reproduces the uninterrupted
        # run's post-restore evaluations exactly (same keys, same order)
        for k in a["metrics_val"]:
            np.testing.assert_allclose(
                a["metrics_val"][k], b["metrics_val"][k], atol=1e-5, rtol=0)
        np.testing.assert_allclose(a["norm_g"], b["norm_g"], atol=1e-4,
                                   rtol=0)
        wa = np.concatenate([np.ravel(np.asarray(x)) for x in
                             jax.tree_util.tree_leaves(a["g_state"])])
        wb = np.concatenate([np.ravel(np.asarray(x)) for x in
                             jax.tree_util.tree_leaves(b["g_state"])])
        np.testing.assert_allclose(wa, wb, atol=1e-5, rtol=0)

    # seed-set mismatch refused (same members, different order counts too:
    # the vmapped replica order defines the schedule identity)
    with pytest.raises(ValueError, match="mismatch"):
        train_many(cfg, tc(out2, 6, restore=True), [6, 5])
    # partial sweep refused
    with pytest.raises(ValueError, match="missing"):
        train_many(cfg, tc(out2, 6, restore=True), [5, 7])


def test_train_many_with_ema_and_export(data_root, tmp_path):
    """The vmapped sweep composes with --g_ema_decay: each seed's
    checkpoint carries its OWN g_ema_state, and tools/export_ema.py bakes
    it into g_state for the standard eval path."""
    out = str(tmp_path / "sweep_ema")
    cfg = ModelConfig()
    tcfg = TrainConfig(dataset_name="toy", batch_size=4, num_epochs=0,
                       num_iterations=3, checkpoint_every=3, print_every=1,
                       best_k=2, output_dir=out, checkpoint_name="ck",
                       num_samples_check=50, steps_per_dispatch=3,
                       g_ema_decay=0.5)
    seeds = [5, 6]
    ckpts = train_many(cfg, tcfg, seeds)
    flat = {}
    for s in seeds:
        ck = ckpts[s]
        assert ck.get("g_ema_state") is not None
        keys = set(ck["g_state"])
        assert set(ck["g_ema_state"]) == keys
        flat[s] = np.concatenate([np.ravel(np.asarray(v))
                                  for k, v in sorted(
                                      ck["g_ema_state"].items())])
    # per-seed EMA actually differs across replicas
    assert not np.allclose(flat[seeds[0]], flat[seeds[1]])

    # export tool: g_state/g_best_state <- g_ema_state, raw preserved
    import subprocess
    import sys as _sys
    src = os.path.join(out, "s5", "ck_with_model.pt")
    dst = str(tmp_path / "exported.pt")
    subprocess.run([_sys.executable, "tools/export_ema.py", src, dst],
                   check=True, cwd=os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))))
    from grouptraj.train.checkpoint import load_checkpoint
    orig = load_checkpoint(src)
    exp = load_checkpoint(dst)
    for k in orig["g_ema_state"]:
        np.testing.assert_array_equal(np.asarray(exp["g_state"][k]),
                                      np.asarray(orig["g_ema_state"][k]))
        np.testing.assert_array_equal(np.asarray(exp["g_best_state"][k]),
                                      np.asarray(orig["g_ema_state"][k]))
        np.testing.assert_array_equal(np.asarray(exp["g_raw_state"][k]),
                                      np.asarray(orig["g_state"][k]))
