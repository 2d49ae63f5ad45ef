"""Training loop: alternating D/G schedule with validation checkpointing.

Mirrors the reference loop structure (``scripts/train.py:142-392``): an
iteration = ``d_steps`` discriminator updates then ``g_steps`` generator
updates, each consuming its own batch; loss logging every ``print_every``;
every ``checkpoint_every`` iterations, val+train metrics, best-state tracking
by min val ADE / ADE_nl, and dual checkpoint files. Adds steps/sec and
trajectories/sec throughput reporting (the reference only has a --timing
flag) and optional ``jax.profiler`` traces.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.data import DenseDataset, DenseLoader, TrajectoryDataset
from grouptraj.train import checkpoint as ckpt_lib
from grouptraj.train.device_data import IndexStream, device_dataset
from grouptraj.train.steps import (
    init_train_state, make_check_accuracy_sweep, make_train_chunk,
    summarize_check_accuracy,
)
from grouptraj.utils import device_sync, get_dset_path, round_up

logger = logging.getLogger(__name__)


def build_loaders(cfg: ModelConfig, tcfg: TrainConfig):
    """Train+val loaders sharing one padded width (single XLA compilation)."""
    train_path = get_dset_path(tcfg.dataset_name, "train")
    val_path = get_dset_path(tcfg.dataset_name, "val")
    logger.info("Initializing train dataset")
    train_dset = TrajectoryDataset(train_path, cfg.obs_len, cfg.pred_len,
                                   tcfg.skip, delim=tcfg.delim)
    logger.info("Initializing val dataset")
    val_dset = TrajectoryDataset(val_path, cfg.obs_len, cfg.pred_len,
                                 tcfg.skip, delim=tcfg.delim)
    n_max = tcfg.n_max or max(
        8, round_up(max(train_dset.max_peds, val_dset.max_peds), 8))
    train_dense = DenseDataset(train_dset, n_max)
    val_dense = DenseDataset(val_dset, n_max)
    train_loader = DenseLoader(train_dense, tcfg.batch_size, shuffle=True,
                               seed=tcfg.seed)
    val_loader = DenseLoader(val_dense, tcfg.batch_size, shuffle=False)
    return train_dset, train_loader, val_loader


def _sweep_indices(num_seq: int, batch_size: int,
                   order: Optional[np.ndarray] = None) -> np.ndarray:
    """[n_batches, batch_size] int32 scene indices covering ``order`` (or
    0..num_seq), the partial tail padded with the null-scene index."""
    if order is None:
        order = np.arange(num_seq)
    nb = max(1, -(-len(order) // batch_size))
    pad = nb * batch_size - len(order)
    full = np.concatenate([order, np.full(pad, num_seq, dtype=order.dtype)])
    return full.astype(np.int32).reshape(nb, batch_size)


def make_train_eval_subset(tcfg: TrainConfig, train_dense):
    """Shuffled-subset sizing for the train-split ``check_accuracy`` sweep:
    a fixed batch count covering ~``num_samples_check`` valid trajectories
    (fixed so every metric event reuses one compiled sweep shape). Returns
    ``(eval_rng, nb_limit)``; callers draw each event's subset order from
    ``eval_rng``. Shared by train() and the multi-seed trainer."""
    eval_rng = np.random.default_rng(tcfg.seed + 7919)
    valid_per_scene = train_dense.valid.sum(axis=1)
    csum = np.cumsum(valid_per_scene[eval_rng.permutation(
        train_dense.num_seq)])
    need = int(np.searchsorted(csum, tcfg.num_samples_check) + 1)
    nb_limit = max(1, -(-min(need, train_dense.num_seq)
                        // tcfg.batch_size))
    return eval_rng, nb_limit


class DispatchSource:
    """Training-batch index source: scene-size buckets (``sched``/``datas``/
    ``buckets``) or a single-width shuffled stream (``stream``/``data``).
    Built by :func:`make_dispatch_source`; shared by train() and the
    multi-seed trainer. ``tcfg`` is the possibly-adjusted config (an
    explicit ``n_max`` disables bucketing)."""

    def __init__(self, tcfg, sched=None, datas=None, buckets=None,
                 stream=None, data=None):
        self.tcfg = tcfg
        self.sched = sched
        self.datas = datas
        self.buckets = buckets
        self.stream = stream
        self.index_iter = iter(stream) if stream is not None else None
        self.data = data


def make_dispatch_source(cfg: ModelConfig, tcfg: TrainConfig, train_dset,
                         train_loader, data_sharding=None) -> DispatchSource:
    if tcfg.n_max and tcfg.n_buckets > 1:
        # An explicit --n_max is a request for one fixed pad width (e.g. to
        # reuse a persistent XLA cache or bound memory); honor it instead of
        # silently substituting quantile-derived bucket widths.
        logger.info("--n_max %d set: disabling scene-size buckets and "
                    "padding every batch to that width", tcfg.n_max)
        tcfg = dataclasses.replace(tcfg, n_buckets=1)
    if tcfg.n_buckets > 1:
        from grouptraj.train.device_data import BucketScheduler, make_buckets
        buckets = make_buckets(train_dset, tcfg.n_buckets, tcfg.batch_size)
        datas = [device_dataset(DenseDataset(train_dset, w, indices=idx),
                                cfg.obs_len, sharding=data_sharding)
                 for w, idx in buckets]
        sched = BucketScheduler([len(idx) for _, idx in buckets],
                                tcfg.batch_size, seed=tcfg.seed)
        logger.info("Scene-size buckets (width, scenes): %s",
                    [(w, len(i)) for w, i in buckets])
        return DispatchSource(tcfg, sched=sched, datas=datas,
                              buckets=buckets)
    data = device_dataset(train_loader.dense, cfg.obs_len,
                          sharding=data_sharding)
    stream = IndexStream(train_loader.dense.num_seq, tcfg.batch_size,
                         seed=tcfg.seed, shuffle=True)
    return DispatchSource(tcfg, stream=stream, data=data)


def train(cfg: ModelConfig, tcfg: TrainConfig,
          args_snapshot: Optional[dict] = None) -> dict:
    """Run training; returns the final checkpoint dict."""
    try:
        return _train(cfg, tcfg, args_snapshot)
    finally:
        # clear the pool kernel's data-parallel mesh installed below so a
        # later single-device train/eval in the same process retraces the
        # unsharded kernel
        from grouptraj.ops.pooling import set_spmd_mesh
        set_spmd_mesh(None)


def _train(cfg: ModelConfig, tcfg: TrainConfig,
           args_snapshot: Optional[dict] = None) -> dict:
    from grouptraj.ops.lstm import select_impl
    impl = select_impl(cfg, tcfg)
    train_dset, train_loader, val_loader = build_loaders(cfg, tcfg)

    # ---- data parallelism over scenes (SURVEY.md §2.7): num_devices > 1
    # builds a 1-D mesh; params/optimizer/dataset replicated, every batch's
    # scene axis sharded (via the dispatch's scene-index arrays), GSPMD
    # inserts the gradient all-reduce.
    n_dev = tcfg.num_devices if tcfg.num_devices > 0 else len(jax.devices())
    mesh = None
    idx_shard = None       # [chunk, spi, S] scene-index sharding (train)
    idx_shard_2d = None    # [n_batches, S] sharding (metric sweeps)
    data_sharding = None   # replicated dataset
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from grouptraj.parallel.mesh import (
            DATA_AXIS, make_mesh, replicated_sharding,
        )
        if len(jax.devices()) < n_dev:
            raise ValueError(
                f"num_devices={n_dev} but only {len(jax.devices())} visible")
        if tcfg.batch_size % n_dev:
            raise ValueError(
                f"batch_size={tcfg.batch_size} must be divisible by "
                f"num_devices={n_dev}")
        mesh = make_mesh(n_dev)
        idx_shard = NamedSharding(mesh, P(None, None, DATA_AXIS))
        idx_shard_2d = NamedSharding(mesh, P(None, DATA_AXIS))
        data_sharding = replicated_sharding(mesh)
        # the Pallas pool kernel composes with the mesh via shard_map over
        # the scene axis (ops/pallas_pool.pool_core_pallas_spmd) — each
        # device runs the kernel on its scene shard, dW2/db2 psum over ICI.
        # GSPMD alone can't partition a pallas_call, which is why rounds
        # 1-3 forced pool_impl='fast' here; the shard_map path keeps the
        # flagship kernel under data parallelism. Installed at trace time,
        # cleared by train()'s finally.
        from grouptraj.ops.pooling import set_spmd_mesh
        set_spmd_mesh(mesh, DATA_AXIS)
        logger.info("Data-parallel over %d devices (%s)", n_dev,
                    mesh.devices[0].platform)

    iterations_per_epoch = len(train_dset) / tcfg.batch_size / tcfg.d_steps
    num_iterations = tcfg.num_iterations
    if tcfg.num_epochs:
        num_iterations = int(iterations_per_epoch * tcfg.num_epochs)
    logger.info("There are %s iterations per epoch", iterations_per_epoch)

    acc_sweep = make_check_accuracy_sweep(cfg, impl)

    key = jax.random.PRNGKey(tcfg.seed)
    key, k_init = jax.random.split(key)
    state = init_train_state(k_init, cfg, tcfg)
    if mesh is not None:
        from grouptraj.parallel.mesh import replicate_state
        state = replicate_state(state, mesh)

    if args_snapshot is None:
        args_snapshot = {**dataclasses.asdict(cfg), **dataclasses.asdict(tcfg)}
    # self-describing checkpoints: store the RESOLVED ModelConfig alongside
    # the raw flag snapshot so eval reconstructs the exact training config
    # without weight-name forensics (compat.config_from_checkpoint_args)
    args_snapshot = dict(args_snapshot)
    args_snapshot["resolved_model_config"] = dataclasses.asdict(cfg)

    restore_path = None
    if tcfg.checkpoint_start_from:
        restore_path = tcfg.checkpoint_start_from
    elif tcfg.restore_from_checkpoint:
        restore_path = os.path.join(
            tcfg.output_dir, f"{tcfg.checkpoint_name}_with_model.pt")
    ckpt = None
    t, epoch = 0, 0
    if restore_path:
        ckpt = ckpt_lib.load_checkpoint(restore_path)
    if ckpt is not None and ckpt.get("g_state") is not None:
        logger.info("Restoring from checkpoint %s", restore_path)
        state = ckpt_lib.state_from_checkpoint(ckpt, cfg, tcfg)
        if mesh is not None:
            from grouptraj.parallel.mesh import replicate_state
            state = replicate_state(state, mesh)
        t = ckpt["counters"]["t"] or 0
        epoch = ckpt["counters"]["epoch"] or 0
        ckpt["restore_ts"].append(t)
    else:
        ckpt = ckpt_lib.new_checkpoint(args_snapshot)
    # stream/scheduler epoch counters start at 0 in THIS process; offset by
    # the restored epoch so resumed runs keep a monotonic epoch provenance
    epoch0 = epoch

    # ---- device-resident metric sweeps: val + (limited) train check_accuracy
    # run as ONE dispatch each (make_check_accuracy_sweep) — a fused
    # lax.scan over device-resident data, the same tunnel-latency fix the
    # training chunk applies. Uploaded once; per-event host traffic is one
    # small [n_batches, S] index array + one readback of the summed metrics.
    val_data = device_dataset(val_loader.dense, cfg.obs_len,
                              sharding=data_sharding)
    train_eval_data = device_dataset(train_loader.dense, cfg.obs_len,
                                     sharding=data_sharding)
    val_idx_host = _sweep_indices(val_loader.dense.num_seq, tcfg.batch_size)
    eval_rng, nb_limit = make_train_eval_subset(tcfg, train_loader.dense)

    def run_sweep(data, idx_host, key, n_batches, pred_len):
        idx = (jax.device_put(idx_host, idx_shard_2d)
               if idx_shard is not None else jnp.asarray(idx_host))
        sums = acc_sweep(state, data, idx, key)
        sums = {k: float(v) for k, v in jax.device_get(sums).items()}
        return summarize_check_accuracy(sums, n_batches, pred_len)

    # Per-iteration grad norms stay ON DEVICE and drain in bulk at print /
    # checkpoint events: the device is behind an async queue (possibly a
    # network tunnel) and a float() per iteration would serialize every step
    # on a host<->device roundtrip.
    pending_norm_d, pending_norm_g = [], []

    def drain_norms():
        if pending_norm_d:
            ckpt["norm_d"].extend(
                np.concatenate([np.atleast_1d(np.asarray(v))
                                for v in jax.device_get(pending_norm_d)])
                .tolist())
            pending_norm_d.clear()
        if pending_norm_g:
            ckpt["norm_g"].extend(
                np.concatenate([np.atleast_1d(np.asarray(v))
                                for v in jax.device_get(pending_norm_g)])
                .tolist())
            pending_norm_g.clear()

    # ---- device-resident training: the whole dense dataset lives in HBM;
    # each dispatch ships only [chunk, spi, S] int32 scene indices and runs
    # `chunk` full iterations under one lax.scan (see train/device_data.py).
    spi = tcfg.d_steps + tcfg.g_steps
    chunk = max(1, tcfg.steps_per_dispatch)
    src = make_dispatch_source(cfg, tcfg, train_dset, train_loader,
                               data_sharding)
    tcfg = src.tcfg
    sched, datas, buckets = src.sched, src.datas, src.buckets
    stream, index_iter, data = src.stream, src.index_iter, src.data
    runners = {}

    def get_runner(c):
        if c not in runners:
            runners[c] = make_train_chunk(cfg, tcfg, impl, c)
        return runners[c]

    t0 = time.time()
    t_window_start, window_t0 = t, time.time()
    window_traj = 0          # actual (scene-slot x pad-width) rows dispatched
    logged_epoch = 0
    while t < num_iterations:
        this_chunk = min(chunk, num_iterations - t)
        if stream is None:
            bucket_id, idx = sched.next_dispatch(this_chunk, spi)
            data = datas[bucket_id]
            window_traj += this_chunk * tcfg.batch_size * buckets[bucket_id][0]
            cur_epoch = epoch0 + sched.epoch
        else:
            idx = np.stack([
                np.stack([next(index_iter) for _ in range(spi)])
                for _ in range(this_chunk)])
            window_traj += (this_chunk * tcfg.batch_size
                            * train_loader.dense.n_max)
            cur_epoch = epoch0 + stream.epoch
        if cur_epoch != logged_epoch:
            logged_epoch = cur_epoch
            logger.info("Starting epoch %d", logged_epoch)

        if tcfg.profile_dir and t <= 50 < t + this_chunk:
            jax.profiler.start_trace(tcfg.profile_dir)
        if tcfg.timing:
            device_sync()
            t1 = time.time()
        key, sub = jax.random.split(key)
        idx_dev = (jax.device_put(idx, idx_shard) if idx_shard is not None
                   else jnp.asarray(idx))
        state, losses = get_runner(this_chunk)(state, data, idx_dev, sub)
        if tcfg.timing:
            device_sync()
            logger.info("chunk of %d iterations took %.4f", this_chunk,
                        time.time() - t1)
        if tcfg.profile_dir and t <= 50 < t + this_chunk:
            device_sync()
            jax.profiler.stop_trace()
            logger.info("profiler trace written to %s", tcfg.profile_dir)

        # per-iteration grad norms, still on device ([chunk] arrays)
        if "norm_d" in losses:
            pending_norm_d.append(losses["norm_d"])
        if "norm_g" in losses:
            pending_norm_g.append(losses["norm_g"])

        t_prev = t
        t += this_chunk

        if t_prev // tcfg.print_every != t // tcfg.print_every:
            # host readback first: it is the only reliable device sync on
            # the axon platform (block_until_ready returns early), so the
            # rate below reflects completed work
            drain_norms()
            host_losses = {k: float(np.asarray(v)[-1])
                           for k, v in losses.items()}
            dt = time.time() - window_t0
            steps_done = t - t_window_start
            sps = steps_done / dt if dt > 0 and steps_done else 0.0
            # traj/s counts the padded rows actually dispatched this window
            # (per-bucket widths when bucketed, not the global n_max)
            logger.info("t = %d / %d (%.2f iters/s, %.0f traj/s)",
                        t, num_iterations, sps,
                        window_traj / dt if dt > 0 else 0.0)
            t_window_start, window_t0 = t, time.time()
            window_traj = 0
            for k, v in sorted(host_losses.items()):
                if k.startswith("D_"):
                    logger.info("  [D] %s: %.3f", k, v)
                    ckpt["D_losses"][k].append(v)
                elif k.startswith("G_"):
                    logger.info("  [G] %s: %.3f", k, v)
                    ckpt["G_losses"][k].append(v)
            ckpt["losses_ts"].append(t)

        if t_prev // tcfg.checkpoint_every != t // tcfg.checkpoint_every:
            drain_norms()
            epoch = (epoch0 + stream.epoch if stream is not None
                     else logged_epoch)
            ckpt["counters"]["t"] = t
            ckpt["counters"]["epoch"] = epoch
            ckpt["sample_ts"].append(t)
            key, k1, k2 = jax.random.split(key, 3)
            logger.info("Checking stats on val ...")
            metrics_val = run_sweep(val_data, val_idx_host, k1,
                                    len(val_idx_host), cfg.pred_len)
            logger.info("Checking stats on train ...")
            train_idx = _sweep_indices(
                train_loader.dense.num_seq, tcfg.batch_size,
                order=eval_rng.permutation(
                    train_loader.dense.num_seq))[:nb_limit]
            metrics_train = run_sweep(train_eval_data, train_idx, k2,
                                      nb_limit, cfg.pred_len)
            for k, v in sorted(metrics_val.items()):
                logger.info("  [val] %s: %.3f", k, v)
                ckpt["metrics_val"][k].append(v)
            for k, v in sorted(metrics_train.items()):
                logger.info("  [train] %s: %.3f", k, v)
                ckpt["metrics_train"][k].append(v)

            min_ade = min(ckpt["metrics_val"]["ade"])
            min_ade_nl = min(ckpt["metrics_val"]["ade_nl"])
            ckpt = ckpt_lib.checkpoint_from_state(ckpt, state)
            if metrics_val["ade"] == min_ade:
                logger.info("New low for avg_disp_error")
                ckpt["best_t"] = t
                ckpt["g_best_state"] = ckpt["g_state"]
                ckpt["d_best_state"] = ckpt["d_state"]
            if metrics_val["ade_nl"] == min_ade_nl:
                logger.info("New low for avg_disp_error_nl")
                ckpt["best_t_nl"] = t
                ckpt["g_best_nl_state"] = ckpt["g_state"]
                ckpt["d_best_nl_state"] = ckpt["d_state"]
            ckpt_lib.save_checkpoint(ckpt, tcfg.output_dir,
                                     tcfg.checkpoint_name)
            logger.info("Saved checkpoint to %s", tcfg.output_dir)
            window_t0, t_window_start = time.time(), t
            window_traj = 0

    device_sync()
    drain_norms()
    logger.info("Training done in %.1fs", time.time() - t0)
    ckpt["counters"]["t"] = t
    ckpt["counters"]["epoch"] = epoch
    ckpt = ckpt_lib.checkpoint_from_state(ckpt, state)
    if ckpt.get("g_best_state") is None:
        ckpt["g_best_state"] = ckpt["g_state"]
        ckpt["d_best_state"] = ckpt["d_state"]
    ckpt_lib.save_checkpoint(ckpt, tcfg.output_dir, tcfg.checkpoint_name)
    return ckpt
