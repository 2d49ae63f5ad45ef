"""Device-resident dataset: upload once, index batches on-device.

The ETH/UCY datasets are tiny (≤ ~200 MB dense-padded), while the TPU here
sits behind a network tunnel where per-step host->device transfers dominate
the step time. So the whole dense dataset is placed in HBM once and every
training dispatch receives only ``int32`` scene indices (a few KB); the
batch gather is a ``jnp.take`` inside the jitted step.

An extra all-zero "null scene" is appended at index ``num_seq`` so partial
batches pad with fully-masked scenes without any host logic.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from grouptraj.data.batching import DenseDataset


def device_dataset(dense: DenseDataset, obs_len: int,
                   sharding=None) -> Dict[str, jnp.ndarray]:
    """Upload a DenseDataset to the default device (+ null scene).

    ``sharding`` places the dataset on a mesh (replicated for the
    data-parallel trainer: the dataset is tiny, the batch gather's scene
    indices carry the sharding instead).
    """
    pad1 = lambda a: np.concatenate(
        [a, np.zeros((1,) + a.shape[1:], a.dtype)], axis=0)
    data = {
        "xy": pad1(dense.xy),
        "rel": pad1(dense.rel),
        "group_end": pad1(dense.group[:, :, obs_len - 1]),
        "loss_mask": pad1(dense.loss_mask),
        "non_linear": pad1(dense.non_linear),
        "valid": pad1(dense.valid),
    }
    if sharding is not None:
        return jax.device_put(data, sharding)
    return jax.device_put(data)


def gather_batch(data: Dict[str, jnp.ndarray], idx: jnp.ndarray,
                 obs_len: int) -> Dict[str, jnp.ndarray]:
    """On-device batch assembly from scene indices [S] (inside jit)."""
    take = lambda a: jnp.take(a, idx, axis=0)
    xy = take(data["xy"])
    rel = take(data["rel"])
    return dict(
        obs=xy[:, :, :obs_len], pred=xy[:, :, obs_len:],
        obs_rel=rel[:, :, :obs_len], pred_rel=rel[:, :, obs_len:],
        group=take(data["group_end"]),
        valid=take(data["valid"]),
        loss_mask=take(data["loss_mask"]),
        non_linear=take(data["non_linear"]),
    )


class IndexStream:
    """Continuous epoch-reshuffled stream of scene-index arrays.

    Yields ``[S]`` int32 arrays; partial tails pad with the null-scene index.
    ``on_epoch`` fires when a new shuffle starts (for epoch logging).
    """

    def __init__(self, num_seq: int, batch_size: int, seed: int = 0,
                 shuffle: bool = True):
        self.num_seq = num_seq
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.epoch = 0

    def __iter__(self):
        while True:
            order = np.arange(self.num_seq)
            if self.shuffle:
                self._rng.shuffle(order)
            self.epoch += 1
            for start in range(0, self.num_seq, self.batch_size):
                chunk = order[start:start + self.batch_size]
                if len(chunk) < self.batch_size:
                    pad = np.full(self.batch_size - len(chunk), self.num_seq,
                                  dtype=np.int64)
                    chunk = np.concatenate([chunk, pad])
                yield chunk.astype(np.int32)
