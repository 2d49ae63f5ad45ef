"""Data pipeline tests: windowing semantics vs hand-derived golden values
(mirroring reference trajectories_GCN.py behavior, SURVEY.md §4)."""

import numpy as np
import pytest

from grouptraj.data import (
    DenseDataset, DenseLoader, TrajectoryDataset, extract_windows, poly_fit,
    read_file,
)


def test_read_file(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("0.0\t1.0\t2.5\t3.5\t1.0\n10.0\t1.0\t2.6\t3.6\t1.0\n")
    data = read_file(str(p))
    assert data.shape == (2, 5)
    assert data[1, 2] == 2.6


def test_poly_fit_linear_vs_nonlinear():
    t = np.arange(20.0)
    linear = np.stack([t * 0.1, t * 0.05])
    assert poly_fit(linear, 12, 0.002) == 0.0
    wiggle = np.stack([np.sin(t), np.cos(t)])
    assert poly_fit(wiggle, 12, 0.002) == 1.0


def _toy_data(num_frames=25, peds=(1, 2, 3)):
    rows = []
    for t in range(num_frames):
        for p in peds:
            rows.append([t * 10.0, p, 0.1 * t + p, 0.2 * t - p, p % 2])
    return np.asarray(rows)


def test_window_count_matches_reference_formula():
    # 25 frames, seq_len 20 -> num_sequences = 25-20+1 = 6 full windows
    # (the reference's extra idx=6 window has 19 frames and yields nothing).
    data = _toy_data(25)
    ws = extract_windows(data)
    assert len(ws) == 6
    for w in ws:
        assert w.num_peds == 3
        assert w.xy.shape == (3, 20, 2)
        assert w.loss_mask.min() == 1.0


def test_full_presence_filter():
    # ped 5 only present in frames 0..9 -> dropped from every window
    data = _toy_data(25)
    extra = np.asarray([[t * 10.0, 5, 0.0, 0.0, 0] for t in range(10)])
    ws = extract_windows(np.concatenate([data, extra]))
    assert all(w.num_peds == 3 for w in ws)


def test_min_ped_strictly_greater():
    # 2 peds -> kept (2 > 1); 1 ped -> window dropped entirely
    data = _toy_data(25, peds=(1, 2))
    assert len(extract_windows(data)) == 6
    data1 = _toy_data(25, peds=(1,))
    assert len(extract_windows(data1)) == 0


def test_relative_transform_and_rounding():
    data = _toy_data(25)
    w = extract_windows(data)[0]
    # rel[0] is zero; rel[t] = xy[t] - xy[t-1] after 4-decimal rounding
    assert np.allclose(w.rel[:, 0], 0.0)
    assert np.allclose(w.rel[:, 1:], np.diff(np.around(w.xy, 4), axis=1),
                       atol=1e-6)


def test_group_labels_required():
    data = _toy_data(25)[:, :4]
    with pytest.raises(AssertionError):
        extract_windows(data, group_required=True)
    ws = extract_windows(data, group_required=False)
    assert len(ws) == 6
    assert np.all(ws[0].group == 0)


def test_dataset_and_getitem_layout(tiny_dataset_dir):
    dset = TrajectoryDataset(tiny_dataset_dir)
    assert len(dset) > 0
    item = dset[0]
    (obs, pred, obs_rel, pred_rel, obs_v, pred_v, obs_g, pred_g, nl, lm) = item
    n = dset.windows[0].num_peds
    assert obs.shape == (n, 2, 8) and pred.shape == (n, 2, 12)
    assert obs_g.shape == (n, 1, 8)
    # velocities are rel * 2.5 (2.5 fps; reference trajectories_GCN.py:199-200)
    assert np.allclose(obs_v, obs_rel * 2.5)
    assert lm.shape == (n, 20)


def test_dense_dataset_padding(tiny_dataset_dir):
    dset = TrajectoryDataset(tiny_dataset_dir)
    dense = DenseDataset(dset, n_max=8)
    b = dense.gather(range(dense.num_seq))
    assert b.obs.shape == (dense.num_seq, 8, 8, 2)
    assert b.pred.shape == (dense.num_seq, 8, 12, 2)
    # per-scene valid count equals ragged ped count
    assert np.array_equal(b.valid.sum(1), dset.scene_sizes())
    # padded slots are zero
    v = b.valid[..., None, None]
    assert np.all(b.obs * (1 - v) == 0)
    # abs positions reconstruct from rel + start
    recon = b.obs[:, :, 0:1, :] + np.cumsum(b.obs_rel, axis=2)
    recon = recon * v
    assert np.allclose(recon[:, :, 1:], (b.obs * v)[:, :, 1:], atol=1e-4)


def test_dense_loader_fixed_shapes(tiny_dataset_dir):
    dset = TrajectoryDataset(tiny_dataset_dir)
    dense = DenseDataset(dset, n_max=8)
    loader = DenseLoader(dense, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader)
    for b in batches:
        assert b.obs.shape[0] == 4            # scene-padded final batch
    total_valid_scenes = sum(int((b.valid.sum(1) > 0).sum()) for b in batches)
    assert total_valid_scenes == len(dset)


def test_loader_shuffle_determinism(tiny_dataset_dir):
    dset = TrajectoryDataset(tiny_dataset_dir)
    dense = DenseDataset(dset, n_max=8)
    a = [b.obs.sum() for b in DenseLoader(dense, 2, seed=7)]
    b = [b.obs.sum() for b in DenseLoader(dense, 2, seed=7)]
    assert a == b
