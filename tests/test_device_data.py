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


def test_make_buckets_partition_and_merge():
    """Buckets partition all windows, widths are multiples of 8 and cover
    each bucket's largest scene, and sub-batch buckets merge upward."""
    from grouptraj.train.device_data import make_buckets

    class W:
        def __init__(self, n):
            self.num_peds = n

    class D:
        windows = [W(n) for n in
                   [2, 3, 3, 4, 5, 5, 6, 9, 11, 14, 30, 55, 4, 5, 7, 8]]

    buckets = make_buckets(D(), 3, batch_size=4)
    all_idx = np.concatenate([idx for _, idx in buckets])
    assert sorted(all_idx.tolist()) == list(range(len(D.windows)))
    counts = np.array([w.num_peds for w in D.windows])
    for w, idx in buckets:
        assert w % 8 == 0
        assert counts[idx].max() <= w
    widths = [w for w, _ in buckets]
    assert widths == sorted(widths)
    # a bucket smaller than one batch must not exist (except possibly the last)
    for w, idx in buckets[:-1]:
        assert len(idx) >= 4
    # n_buckets=1 degenerates to one global bucket
    (w0, i0), = make_buckets(D(), 1, batch_size=4)
    assert len(i0) == len(D.windows) and w0 == 56


def test_bucket_scheduler_proportional_and_covering():
    from grouptraj.train.device_data import BucketScheduler

    sizes = [100, 20]
    sched = BucketScheduler(sizes, batch_size=5, seed=0)
    picks = []
    for _ in range(60):
        b, idx = sched.next_dispatch(chunk=2, steps_per_iter=2)
        assert idx.shape == (2, 2, 5)
        assert idx.max() <= sizes[b]      # null index allowed
        picks.append(b)
    # long-run proportions track scene share (100:20 = 5:1)
    frac = picks.count(0) / len(picks)
    assert 0.7 < frac < 0.95


def test_train_bucketed_runs_and_checkpoints(tmp_path, monkeypatch):
    """End-to-end train() with n_buckets>1 on a dataset with mixed scene
    sizes: runs, losses finite, checkpoint written."""
    from grouptraj.train.loop import train

    rng = np.random.default_rng(1)
    for split, nframes in (("train", 60), ("val", 25)):
        d = tmp_path / "toy" / split
        d.mkdir(parents=True)
        rows = []
        for t in range(nframes):
            # 3 peds always; 9 more in the middle third (mixed window sizes)
            peds = (1, 2, 3) if (t < 20 or t >= 40) else tuple(range(1, 13))
            for p in peds:
                x = 0.1 * t + p + 0.01 * rng.standard_normal()
                rows.append(f"{t*10.0}\t{p}.0\t{x:.4f}\t{0.05*t-p:.4f}"
                            f"\t{p % 3}.0")
        (d / "toy.txt").write_text("\n".join(rows) + "\n")
    monkeypatch.setenv("GROUPTRAJ_DATA_DIR", str(tmp_path))

    tcfg = TrainConfig(dataset_name="toy", batch_size=4, num_epochs=0,
                       num_iterations=4, checkpoint_every=3, print_every=1,
                       best_k=2, n_buckets=3, steps_per_dispatch=2,
                       output_dir=str(tmp_path / "out"))
    ckpt = train(ModelConfig(), tcfg)
    assert ckpt["counters"]["t"] == 4
    for k, vals in ckpt["G_losses"].items():
        assert np.isfinite(vals).all(), k
    assert ckpt["metrics_val"]["ade"]


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


def test_make_buckets_higher_counts_saturate_and_stay_valid():
    """Raising n_buckets must keep the partition exact and eventually
    saturate (quantile widths dedupe), never exceed n_buckets, and never
    produce a sub-batch bucket except the widest (ARCHITECTURE.md
    "Why the default is 3 buckets")."""
    from grouptraj.train.device_data import make_buckets

    class W:
        def __init__(self, n):
            self.num_peds = n

    class D:
        windows = [W(n) for n in
                   ([3] * 40 + [6] * 30 + [12] * 20 + [20] * 10 +
                    [28] * 8 + [45] * 6 + [57] * 2)]

    counts = np.array([w.num_peds for w in D.windows])
    for nb in (2, 3, 4, 6, 8, 10, 16):
        buckets = make_buckets(D(), nb, batch_size=4)
        assert 1 <= len(buckets) <= nb
        all_idx = np.concatenate([idx for _, idx in buckets])
        assert sorted(all_idx.tolist()) == list(range(len(D.windows)))
        for w, idx in buckets:
            assert w % 8 == 0 and counts[idx].max() <= w
        for w, idx in buckets[:-1]:
            assert len(idx) >= 4
        widths = [w for w, _ in buckets]
        assert widths == sorted(set(widths))
    # saturation: beyond the number of distinct quantile widths, raising
    # n_buckets further changes nothing
    w16 = [w for w, _ in make_buckets(D(), 16, batch_size=4)]
    w32 = [w for w, _ in make_buckets(D(), 32, batch_size=4)]
    assert w32 == w16


def test_bucket_scheduler_epoch_counts_true_batches():
    from grouptraj.train.device_data import BucketScheduler

    sizes = [100, 20]
    batch = 5
    sched = BucketScheduler(sizes, batch_size=batch, seed=0)
    # one aggregate epoch = ceil(100/5) + ceil(20/5) = 24 batches
    assert sched.epoch == 1
    drawn = 0
    while drawn + 4 <= 24:               # 2 iters x 2 steps = 4 batches/call
        sched.next_dispatch(chunk=2, steps_per_iter=2)
        drawn += 4
    assert sched.epoch == 2              # 24 batches dispatched -> epoch 2
    for _ in range(6):
        sched.next_dispatch(chunk=2, steps_per_iter=2)
    assert sched.epoch == 3
