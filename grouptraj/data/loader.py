"""data_loader(args, path) — API-compatible entry (reference sgan/data/loader.py:9-29).

Returns ``(TrajectoryDataset, DenseLoader)``; ``args`` may be a TrainConfig,
an argparse Namespace, or anything with the reference flag attributes.
"""

from __future__ import annotations

from grouptraj.data.batching import DenseDataset, DenseLoader
from grouptraj.data.dataset import TrajectoryDataset


def _get(args, name, default):
    return getattr(args, name, default)


def data_loader(args, path, shuffle: bool = True, group_required: bool = True):
    dset = TrajectoryDataset(
        path,
        obs_len=_get(args, "obs_len", 8),
        pred_len=_get(args, "pred_len", 12),
        skip=_get(args, "skip", 1),
        delim=_get(args, "delim", "\t"),
        group_required=group_required,
    )
    dense = DenseDataset(dset, n_max=_get(args, "n_max", 0))
    loader = DenseLoader(
        dense,
        batch_size=_get(args, "batch_size", 64),
        shuffle=shuffle,
        seed=_get(args, "seed", 0),
    )
    return dset, loader
