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


def make_buckets(dset, n_buckets: int, batch_size: int):
    """Partition window indices into ≤ n_buckets by pedestrian count.

    SURVEY.md §7: one global pad width makes every batch pay for the largest
    scene (ETH/UCY: p50 ≈ 5-6 peds, max 57 → ~80% padding waste). Buckets
    get quantile-derived widths rounded up to 8; a bucket with fewer scenes
    than one batch merges into the next wider one. Returns a list of
    ``(width, indices)`` sorted by width.
    """
    import numpy as np

    from grouptraj.utils import round_up

    counts = np.array([w.num_peds for w in dset.windows])
    top = max(8, round_up(int(counts.max()), 8))
    if n_buckets <= 1:
        return [(top, np.arange(len(counts)))]
    qs = np.quantile(counts, [(i + 1) / n_buckets
                              for i in range(n_buckets - 1)])
    widths = sorted({max(8, round_up(int(q), 8)) for q in qs} | {top})
    buckets = []
    prev = 0
    carry = np.array([], dtype=np.int64)
    for w in widths:
        idx = np.nonzero((counts > prev) & (counts <= w))[0]
        idx = np.concatenate([carry, idx])
        prev = w
        if len(idx) < batch_size and w != widths[-1]:
            carry = idx                      # too small: merge upward
            continue
        carry = np.array([], dtype=np.int64)
        if len(idx):
            buckets.append((w, idx))
    if len(carry):
        if buckets:
            w, idx = buckets[-1]
            buckets[-1] = (w, np.concatenate([idx, carry]))
        else:
            buckets.append((widths[-1], carry))
    return buckets


class BucketScheduler:
    """Deficit scheduler over per-bucket index streams.

    Each dispatch draws ``chunk × steps_per_iter`` batches from ONE bucket
    (so the whole fused lax.scan chunk runs at that bucket's pad width);
    buckets are picked by least progress relative to their scene share, so
    long-run iteration counts stay proportional to bucket sizes — the same
    expected per-scene visit rate as unbucketed shuffling.
    """

    def __init__(self, bucket_sizes, batch_size: int, seed: int = 0):
        self.weights = [max(s, 1) for s in bucket_sizes]
        self.total = sum(self.weights)
        self.streams = [iter(IndexStream(s, batch_size, seed=seed + 977 * b))
                        for b, s in enumerate(bucket_sizes)]
        self.done = [0] * len(bucket_sizes)
        # one aggregate "epoch" = the number of batches one shuffle of every
        # bucket yields — the same definition IndexStream uses unbucketed
        self._batches = 0
        self._batches_per_epoch = sum(
            -(-max(s, 1) // batch_size) for s in bucket_sizes)

    @property
    def epoch(self) -> int:
        """True epoch counter from batches actually dispatched (matches
        IndexStream.epoch semantics: 1-based, increments when the aggregate
        stream starts a new pass over every scene)."""
        return 1 + self._batches // self._batches_per_epoch

    def next_dispatch(self, chunk: int, steps_per_iter: int):
        b = min(range(len(self.done)),
                key=lambda i: self.done[i] / self.weights[i])
        import numpy as np
        idx = np.stack([
            np.stack([next(self.streams[b]) for _ in range(steps_per_iter)])
            for _ in range(chunk)])
        self.done[b] += chunk
        self._batches += chunk * steps_per_iter
        return b, idx


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
