"""Vmapped multi-seed training: N independent GAN replicas in one dispatch.

A capability the reference cannot express: its seed sweeps rerun
``scripts/train.py`` N times (reference ``scripts/train.py:142-392`` is a
stateful torch loop over one model). Here the whole train state is a pytree
and every step is a pure function, so N seeds train as ONE program:
``jax.vmap`` over :func:`grouptraj.train.steps.build_train_chunk` adds a
leading seed axis to params/optimizer state and the per-seed RNG keys while
the device-resident dataset and the dispatch's scene-index arrays broadcast.
Every matmul in the step gets N× wider — on a step that is bound by
sequential depth, not FLOPs (ARCHITECTURE.md "Sequential-depth reduction"),
the extra seeds ride along nearly free, which is what makes the model zoo's
seed sweeps (MODEL_ZOO.md, PROVENANCE.json) cheap.

Semantics vs. N sequential runs: identical per-seed model/optimizer updates
EXCEPT that all seeds share one batch order (the scheduler is seeded by
``TrainConfig.seed``, not the per-replica seeds — one index stream feeds
every replica). Init, noise draws, and label smoothing stay per-seed. For
sweep purposes (hunting a good checkpoint) this is the point; a run's true
provenance is recorded in its args snapshot (``seed`` + ``sweep_seeds``).

Checkpoints: each seed writes the standard dual checkpoint files to
``<output_dir>/s<seed>/`` with the usual best-state tracking, so
``scripts/evaluate_model.py --use_best 1`` works unchanged on every member.

Resume: ``--restore_from_checkpoint 1`` (or ``--checkpoint_start_from
<sweep_dir>``) restores an interrupted sweep from those per-seed files —
states re-vmapped, counters/histories continued, and, beyond what
``train()`` does, the per-seed RNG chains themselves (``rng_key_vec`` in
each checkpoint) plus deterministic fast-forward of the host-side batch
schedule, so the resumed sweep reproduces the uninterrupted run's
remaining iterations exactly (tests/test_multi.py). Refused only on
seed-set mismatch or a partial sweep.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.train import checkpoint as ckpt_lib
from grouptraj.train.device_data import device_dataset
from grouptraj.train.loop import (
    _sweep_indices, build_loaders, make_dispatch_source,
    make_train_eval_subset,
)
from grouptraj.train.steps import (
    build_check_accuracy_sweep, build_train_chunk, init_train_state,
    summarize_check_accuracy,
)
from grouptraj.utils import device_sync

logger = logging.getLogger(__name__)


@jax.jit
def _split_keys(key_vec: jax.Array):
    """[n,2] key vector -> (new [n,2] vector, [n,2] subkeys)."""
    ks = jax.vmap(lambda k: jax.random.split(k, 2))(key_vec)
    return ks[:, 0], ks[:, 1]


def _load_sweep_checkpoints(restore_dir: str, seeds: List[int],
                            ckpt_name: str) -> Optional[List[dict]]:
    """Load the per-seed checkpoints of an interrupted sweep from
    ``<restore_dir>/s<seed>/`` (the layout train_many writes). Returns None
    when NO member checkpoint exists (fresh start); refuses partial sweeps,
    seed-set mismatches, and members checkpointed at different t (replicas
    share one schedule, so a consistent sweep always has equal counters).
    """
    paths = [os.path.join(restore_dir, f"s{s}", f"{ckpt_name}_with_model.pt")
             for s in seeds]
    present = [os.path.exists(p) for p in paths]
    if not any(present):
        return None
    if not all(present):
        missing = [s for s, ok in zip(seeds, present) if not ok]
        raise ValueError(
            f"partial sweep checkpoint in {restore_dir}: seeds {missing} "
            f"missing; delete the s*/ dirs to start fresh or restore with "
            f"the original seed set")
    cks = [ckpt_lib.load_checkpoint(p) for p in paths]
    for s, ck in zip(seeds, cks):
        saved = ck["args"].get("sweep_seeds")
        if saved is not None and list(saved) != list(seeds):
            raise ValueError(
                f"sweep seed-set mismatch: checkpoint s{s} was part of "
                f"sweep {saved}, requested {list(seeds)}")
    ts = {ck["counters"]["t"] for ck in cks}
    if len(ts) != 1:
        raise ValueError(
            f"inconsistent member counters t={sorted(ts)} in {restore_dir}")
    return cks


def train_many(cfg: ModelConfig, tcfg: TrainConfig, seeds: List[int],
               args_snapshot: Optional[dict] = None) -> Dict[int, dict]:
    """Train one replica per seed simultaneously; returns {seed: ckpt}."""
    try:
        return _train_many(cfg, tcfg, seeds, args_snapshot)
    finally:
        # clear the pool kernel's data-parallel mesh (installed below when
        # num_devices > 1) so later single-device work in this process
        # retraces the unsharded kernel — same discipline as train()
        from grouptraj.ops.pooling import set_spmd_mesh
        set_spmd_mesh(None)


def _train_many(cfg: ModelConfig, tcfg: TrainConfig, seeds: List[int],
                args_snapshot: Optional[dict] = None) -> Dict[int, dict]:
    from grouptraj.ops.lstm import select_impl

    if len(set(seeds)) != len(seeds):
        raise ValueError(f"duplicate seeds: {seeds}")

    # ---- seed-vmap x data-parallel composition (round 5): the seed axis
    # vmaps OUTSIDE (replica-unrolled custom_vmap rules), the scene axis
    # shards INSIDE over a 1-D mesh exactly as train() shards it — states
    # and the device-resident dataset replicate, the dispatch's scene-index
    # arrays shard, GSPMD inserts the gradient all-reduce per replica. The
    # Pallas pool kernel keeps working through pool_core_pallas_spmd, whose
    # custom_vmap rules fold the seed axis into the kernel's native replica
    # axis inside the shard_map (ops/pallas_pool.py). Validated like dryrun
    # stages 2-3: CPU-mesh loss parity of a multi-seed sharded sweep vs the
    # single-device run (tests/test_parallel.py).
    n_dev = tcfg.num_devices if tcfg.num_devices > 0 else len(jax.devices())
    mesh = None
    idx_shard = None
    idx_shard_2d = None
    data_sharding = None
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
        from grouptraj.ops.pooling import set_spmd_mesh
        set_spmd_mesh(mesh, DATA_AXIS)
        logger.info("Multi-seed data-parallel over %d devices (%s)", n_dev,
                    mesh.devices[0].platform)

    impl = select_impl(cfg, tcfg)
    if impl != "scan":
        # same reason as the pool guard below: Mosaic pallas_calls
        # (ops/pallas_lstm.py, ops/pallas_fused.py) are not validated under
        # the seed-axis vmap's auto-batching — the scan path is the
        # vmap-safe numerical twin ('auto' already resolves to scan —
        # this guard only fires for an explicit --lstm_impl pallas|fused)
        logger.info("train_many: lstm_impl %s -> scan (vmap-safe)", impl)
        impl = "scan"
    # the fused Pallas pool kernel composes with the seed-axis vmap
    # natively (ops/pallas_pool.py custom_vmap rules fold the replica axis
    # into the kernel's scene grid with per-replica VMEM weight blocks) —
    # the old pool_impl='fast' fallback here cost 4x per seed-iteration at
    # the widest bucket (the [S,N,N,512] HBM pair slab, per-op profile in
    # the kernel docstring)
    n_seeds = len(seeds)
    train_dset, train_loader, val_loader = build_loaders(cfg, tcfg)

    iterations_per_epoch = len(train_dset) / tcfg.batch_size / tcfg.d_steps
    num_iterations = tcfg.num_iterations
    if tcfg.num_epochs:
        num_iterations = int(iterations_per_epoch * tcfg.num_epochs)
    logger.info("There are %s iterations per epoch; %d seeds vmapped",
                iterations_per_epoch, n_seeds)

    # per-seed RNG chains: PRNGKey(seed) each, exactly as train() would
    key_vec = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
    key_vec, init_keys = _split_keys(key_vec)
    states = jax.jit(jax.vmap(
        lambda k: init_train_state(k, cfg, tcfg)))(init_keys)
    if mesh is not None:
        states = jax.device_put(states, data_sharding)

    import dataclasses
    if args_snapshot is None:
        args_snapshot = {**dataclasses.asdict(cfg),
                         **dataclasses.asdict(tcfg)}
    # self-describing checkpoints, as in train() (loop.py)
    args_snapshot = dict(args_snapshot)
    args_snapshot["resolved_model_config"] = dataclasses.asdict(cfg)
    ckpts = {}
    for s in seeds:
        snap = dict(args_snapshot)
        snap["seed"] = s
        snap["sweep_seeds"] = list(seeds)
        ckpts[s] = ckpt_lib.new_checkpoint(snap)

    # ---- sweep resume (e.g. tunnel-wedge recovery, TRAINING.md): the
    # per-seed checkpoints under <dir>/s<seed>/ restore the WHOLE sweep —
    # states re-vmapped, per-seed RNG chains (saved as ckpt['rng_key_vec'];
    # resumed runs reproduce the uninterrupted run's draws exactly),
    # counters and metric histories; the host-side batch schedule and
    # eval-subset RNG are fast-forwarded deterministically below.
    restore_dir = tcfg.checkpoint_start_from or (
        tcfg.output_dir if tcfg.restore_from_checkpoint else None)
    t_restored = 0
    if restore_dir:
        cks = _load_sweep_checkpoints(restore_dir, seeds,
                                      tcfg.checkpoint_name)
        if cks is None and tcfg.checkpoint_start_from:
            raise ValueError(
                f"checkpoint_start_from={restore_dir!r}: no sweep member "
                f"checkpoints (s<seed>/{tcfg.checkpoint_name}"
                f"_with_model.pt) found to restore from")
        if cks is not None:
            t_restored = cks[0]["counters"]["t"] or 0
            logger.info("Resuming %d-seed sweep from %s at t=%d",
                        n_seeds, restore_dir, t_restored)
            per_states = [ckpt_lib.state_from_checkpoint(ck, cfg, tcfg)
                          for ck in cks]
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *per_states)
            states = (jax.device_put(stacked, data_sharding)
                      if mesh is not None else jax.device_put(stacked))
            if all(ck.get("rng_key_vec") is not None for ck in cks):
                key_vec = jnp.asarray(
                    np.stack([np.asarray(ck["rng_key_vec"]) for ck in cks]))
            else:
                logger.warning(
                    "sweep checkpoints lack rng_key_vec (pre-round-4 "
                    "files); resuming with a fresh per-seed key chain")
            for ck, s in zip(cks, seeds):
                ck["restore_ts"].append(t_restored)
                ckpts[s] = ck

    # metric sweeps, vmapped over (state, key); data/idx broadcast
    vsweep = jax.jit(jax.vmap(build_check_accuracy_sweep(cfg, impl),
                              in_axes=(0, None, None, 0)))
    val_data = device_dataset(val_loader.dense, cfg.obs_len,
                              sharding=data_sharding)
    train_eval_data = device_dataset(train_loader.dense, cfg.obs_len,
                                     sharding=data_sharding)
    val_idx_host = _sweep_indices(val_loader.dense.num_seq, tcfg.batch_size)
    eval_rng, nb_limit = make_train_eval_subset(tcfg, train_loader.dense)

    def put_idx2(idx_host):
        return (jax.device_put(jnp.asarray(idx_host), idx_shard_2d)
                if mesh is not None else jnp.asarray(idx_host))

    def run_sweeps(data, idx_host, keys, n_batches, pred_len):
        sums = jax.device_get(vsweep(states, data, put_idx2(idx_host),
                                     keys))
        return [summarize_check_accuracy(
            {k: float(v[i]) for k, v in sums.items()}, n_batches, pred_len)
            for i in range(n_seeds)]

    # one shared batch schedule (see module docstring); buckets as in train()
    spi = tcfg.d_steps + tcfg.g_steps
    chunk = max(1, tcfg.steps_per_dispatch)
    src = make_dispatch_source(cfg, tcfg, train_dset, train_loader,
                               data_sharding=data_sharding)
    tcfg = src.tcfg
    sched, datas = src.sched, src.datas
    stream, index_iter, data = src.stream, src.index_iter, src.data

    runners = {}

    def get_runner(c):
        if c not in runners:
            runners[c] = jax.jit(jax.vmap(
                build_train_chunk(cfg, tcfg, impl, c),
                in_axes=(0, None, None, 0)))
        return runners[c]

    def snapshot_states():
        """One bulk readback; per-seed TrainState slices."""
        host = jax.device_get(states)
        return [jax.tree_util.tree_map(lambda x: x[i], host)
                for i in range(n_seeds)]

    # per-iteration grad norms stay on device between print/checkpoint
    # events (same tunnel-latency discipline as loop.py drain_norms)
    pending_norm_d, pending_norm_g = [], []

    def drain_norms():
        for pending, field in ((pending_norm_d, "norm_d"),
                               (pending_norm_g, "norm_g")):
            if pending:
                host = [np.asarray(v) for v in jax.device_get(pending)]
                cat = np.concatenate(host, axis=1)  # [n_seeds, total]
                for i, s in enumerate(seeds):
                    ckpts[s][field].extend(cat[i].astype(float).tolist())
                pending.clear()

    t = 0
    if t_restored > num_iterations:
        # mirrors the partial-sweep/seed-mismatch refusals: running the loop
        # would retrain restored states from t=0 and append non-monotonic
        # histories (ADVICE round 4)
        raise ValueError(
            f"restored sweep is at t={t_restored} > num_iterations="
            f"{num_iterations}; raise --num_iterations/--num_epochs (or "
            f"start fresh) instead of retraining restored states")
    if t_restored:
        # fast-forward the host-side schedulers to the restore point (both
        # deterministic in tcfg.seed, mirroring the dispatch loop below).
        # eval_rng draws one permutation per checkpoint-boundary CROSSING —
        # exactly like the live loop, where a chunk spanning several
        # checkpoint_every multiples still fires once (ADVICE round 4).
        while t < t_restored:
            this_chunk = min(chunk, num_iterations - t)
            if stream is None:
                sched.next_dispatch(this_chunk, spi)
            else:
                for _ in range(spi * this_chunk):
                    next(index_iter)
            t_prev = t
            t += this_chunk
            if t_prev // tcfg.checkpoint_every != t // tcfg.checkpoint_every:
                eval_rng.permutation(train_loader.dense.num_seq)
    t0 = time.time()
    logged_epoch = (ckpts[seeds[0]]["counters"]["epoch"] or 0) \
        if t_restored else 0
    t_window_start, window_t0 = t, time.time()
    while t < num_iterations:
        this_chunk = min(chunk, num_iterations - t)
        if stream is None:
            bucket_id, idx = sched.next_dispatch(this_chunk, spi)
            data = datas[bucket_id]
            cur_epoch = sched.epoch
        else:
            idx = np.stack([
                np.stack([next(index_iter) for _ in range(spi)])
                for _ in range(this_chunk)])
            cur_epoch = stream.epoch
        if cur_epoch != logged_epoch:
            logged_epoch = cur_epoch
            logger.info("Starting epoch %d", logged_epoch)

        key_vec, subs = _split_keys(key_vec)
        idx_dev = (jax.device_put(jnp.asarray(idx), idx_shard)
                   if mesh is not None else jnp.asarray(idx))
        states, losses = get_runner(this_chunk)(states, data, idx_dev, subs)
        if "norm_d" in losses:
            pending_norm_d.append(losses["norm_d"])  # [n_seeds, chunk]
        if "norm_g" in losses:
            pending_norm_g.append(losses["norm_g"])
        t_prev = t
        t += this_chunk

        if t_prev // tcfg.print_every != t // tcfg.print_every:
            drain_norms()
            host_losses = jax.device_get(losses)  # [n_seeds, chunk] each
            dt = time.time() - window_t0
            steps = t - t_window_start
            logger.info(
                "t = %d / %d (%.2f iters/s x %d seeds = %.2f seed-iters/s)",
                t, num_iterations, steps / dt if dt > 0 else 0, n_seeds,
                steps * n_seeds / dt if dt > 0 else 0)
            t_window_start, window_t0 = t, time.time()
            for lk in sorted(host_losses):
                if lk.startswith(("D_", "G_")):
                    vals = np.asarray(host_losses[lk])[:, -1]
                    logger.info("  %s: %s", lk,
                                np.round(vals.astype(float), 3).tolist())
            for i, s in enumerate(seeds):
                for lk, v in host_losses.items():
                    row = float(np.asarray(v)[i, -1])
                    if lk.startswith("D_"):
                        ckpts[s]["D_losses"][lk].append(row)
                    elif lk.startswith("G_"):
                        ckpts[s]["G_losses"][lk].append(row)
                ckpts[s]["losses_ts"].append(t)

        if t_prev // tcfg.checkpoint_every != t // tcfg.checkpoint_every:
            drain_norms()
            key_vec, k1 = _split_keys(key_vec)
            key_vec, k2 = _split_keys(key_vec)
            logger.info("Checking stats on val ...")
            mvals = run_sweeps(val_data, val_idx_host, k1,
                               len(val_idx_host), cfg.pred_len)
            train_idx = _sweep_indices(
                train_loader.dense.num_seq, tcfg.batch_size,
                order=eval_rng.permutation(
                    train_loader.dense.num_seq))[:nb_limit]
            mtrains = run_sweeps(train_eval_data, train_idx, k2,
                                 nb_limit, cfg.pred_len)
            per_seed_states = snapshot_states()
            host_keys = np.asarray(jax.device_get(key_vec))
            for i, s in enumerate(seeds):
                ck = ckpts[s]
                ck["counters"]["t"] = t
                ck["counters"]["epoch"] = logged_epoch
                ck["rng_key_vec"] = host_keys[i]   # sweep-resume RNG chain
                ck["sample_ts"].append(t)
                for k, v in sorted(mvals[i].items()):
                    ck["metrics_val"][k].append(v)
                for k, v in sorted(mtrains[i].items()):
                    ck["metrics_train"][k].append(v)
                ck = ckpt_lib.checkpoint_from_state(ck, per_seed_states[i])
                if mvals[i]["ade"] == min(ck["metrics_val"]["ade"]):
                    ck["best_t"] = t
                    ck["g_best_state"] = ck["g_state"]
                    ck["d_best_state"] = ck["d_state"]
                if mvals[i]["ade_nl"] == min(ck["metrics_val"]["ade_nl"]):
                    ck["best_t_nl"] = t
                    ck["g_best_nl_state"] = ck["g_state"]
                    ck["d_best_nl_state"] = ck["d_state"]
                ckpt_lib.save_checkpoint(
                    ck, os.path.join(tcfg.output_dir, f"s{s}"),
                    tcfg.checkpoint_name)
            logger.info("val ADE per seed: %s",
                        {s: round(mvals[i]["ade"], 3)
                         for i, s in enumerate(seeds)})
            window_t0, t_window_start = time.time(), t

    device_sync()
    drain_norms()
    logger.info("Training done in %.1fs (%d seeds)", time.time() - t0,
                n_seeds)
    per_seed_states = snapshot_states()
    host_keys = np.asarray(jax.device_get(key_vec))
    for i, s in enumerate(seeds):
        ck = ckpts[s]
        ck["counters"]["t"] = t
        ck["counters"]["epoch"] = logged_epoch
        ck["rng_key_vec"] = host_keys[i]
        ck = ckpt_lib.checkpoint_from_state(ck, per_seed_states[i])
        if ck.get("g_best_state") is None:
            ck["g_best_state"] = ck["g_state"]
            ck["d_best_state"] = ck["d_state"]
        ckpt_lib.save_checkpoint(ck, os.path.join(tcfg.output_dir, f"s{s}"),
                                 tcfg.checkpoint_name)
    return ckpts
