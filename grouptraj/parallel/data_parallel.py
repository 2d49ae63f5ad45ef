"""Data-parallel training step validation (multi-chip dry run).

``dryrun_multichip(n)`` builds an ``n``-device mesh, jits the FULL training
step (discriminator + generator updates, best-of-k vmapped) with the batch
scene axis sharded and parameters replicated, and executes one step on tiny
shapes — exactly what the driver runs with N virtual CPU devices to validate
the multi-chip path compiles and executes without N real chips.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.parallel.mesh import (
    make_mesh, replicate_state, shard_arrays,
)
from grouptraj.train.steps import (
    init_train_state, make_d_step, make_g_step,
)


def synthetic_batch(S: int, N: int, obs_len: int = 8, pred_len: int = 12,
                    seed: int = 0):
    r = np.random.default_rng(seed)
    T = obs_len + pred_len
    rel = r.normal(scale=0.1, size=(S, N, T, 2)).astype(np.float32)
    xy = np.cumsum(rel, axis=2)
    valid = np.ones((S, N), np.float32)
    valid[:, N // 2:] = (r.random((S, N - N // 2)) > 0.3)
    group = (r.integers(0, 3, (S, N)) * valid).astype(np.float32)
    return dict(
        obs=jnp.asarray(xy[:, :, :obs_len]),
        pred=jnp.asarray(xy[:, :, obs_len:]),
        obs_rel=jnp.asarray(rel[:, :, :obs_len]),
        pred_rel=jnp.asarray(rel[:, :, obs_len:]),
        group=jnp.asarray(group),
        valid=jnp.asarray(valid),
        loss_mask=jnp.asarray(np.repeat(valid[:, :, None], T, 2)),
        non_linear=jnp.asarray((r.random((S, N)) > 0.5) * valid),
    )


def synthetic_device_data(num_seq: int, N: int, obs_len: int = 8,
                          pred_len: int = 12, seed: int = 0, sharding=None):
    """A device-resident dataset dict with the exact schema
    :func:`grouptraj.train.device_data.device_dataset` produces (incl. the
    trailing all-zero null scene), built from :func:`synthetic_batch`."""
    b = synthetic_batch(num_seq, N, obs_len, pred_len, seed)
    pad1 = lambda a: np.concatenate(
        [np.asarray(a), np.zeros((1,) + a.shape[1:], np.float32)], axis=0)
    data = {
        "xy": pad1(jnp.concatenate([b["obs"], b["pred"]], axis=2)),
        "rel": pad1(jnp.concatenate([b["obs_rel"], b["pred_rel"]], axis=2)),
        "group_end": pad1(b["group"]),
        "loss_mask": pad1(b["loss_mask"]),
        "non_linear": pad1(b["non_linear"]),
        "valid": pad1(b["valid"]),
    }
    if sharding is not None:
        return jax.device_put(data, sharding)
    return jax.device_put(data)


def dryrun_multichip(n_devices: int) -> None:
    """Data-parallel dry run over an n-device mesh, two stages:

    1. the raw unchunked d/g steps on a sharded batch (params stay
       replicated, losses finite);
    2. the PRODUCTION dispatch path — :func:`make_train_chunk`'s fused
       lax.scan over a device-resident dataset at two scene-size bucket
       widths, scene-index arrays sharded on the data axis exactly as
       ``train()`` dispatches them — asserting per-iteration loss parity
       against the identical single-device run (DP is a sharding
       annotation, not a different computation).
    """
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count)")
    mesh = make_mesh(n_devices, devices)

    cfg = ModelConfig()                      # flagship GAT preset
    # stages 1-2 run the decomposed XLA pool (what 'auto' resolves to at
    # these tiny pair volumes); stage 3 exercises the shard_map'd Pallas
    # pool kernel — the path multi-device training keeps at production
    # volumes (train() installs the mesh via set_spmd_mesh)
    import dataclasses as _dc
    if cfg.pool_impl in ("auto", "pallas"):
        cfg = _dc.replace(cfg, pool_impl="fast")
    tcfg = TrainConfig(best_k=3, batch_size=2 * n_devices)
    key = jax.random.PRNGKey(0)
    state0 = init_train_state(key, cfg, tcfg)
    state = replicate_state(state0, mesh)

    batch = synthetic_batch(tcfg.batch_size, 8)
    batch = shard_arrays(batch, mesh)

    d_step = make_d_step(cfg, tcfg)
    g_step = make_g_step(cfg, tcfg)
    state, d_losses = d_step(state, batch, jax.random.PRNGKey(1))
    state, g_losses = g_step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(state)
    for name, v in {**d_losses, **g_losses}.items():
        val = float(v)
        assert np.isfinite(val), f"{name} not finite: {val}"
    # the updated params must remain replicated across the mesh
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    assert len(leaf.sharding.device_set) == n_devices

    # ---- stage 2: production chunked + bucketed dispatch (train() path)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grouptraj.parallel.mesh import DATA_AXIS, replicated_sharding
    from grouptraj.train.steps import make_train_chunk

    chunk = 2
    spi = tcfg.d_steps + tcfg.g_steps
    run = make_train_chunk(cfg, tcfg, "scan", chunk)
    rng = np.random.default_rng(0)
    idx_shard = NamedSharding(mesh, P(None, None, DATA_AXIS))
    results = {}
    for tag, data_sharding, idx_place, st in (
            ("single", None, jnp.asarray, state0),
            ("mesh", replicated_sharding(mesh),
             lambda i: jax.device_put(i, idx_shard),
             replicate_state(state0, mesh))):
        rng = np.random.default_rng(0)           # identical index sequence
        losses_all = []
        for width, num_seq in ((8, 12), (16, 6)):   # two bucket widths
            data = synthetic_device_data(num_seq, width, cfg.obs_len,
                                         cfg.pred_len, seed=width,
                                         sharding=data_sharding)
            idx = rng.integers(0, num_seq,
                               (chunk, spi, tcfg.batch_size)).astype(np.int32)
            st, losses = run(st, data, idx_place(idx), jax.random.PRNGKey(9))
            losses_all.append(losses)
        results[tag] = (st, losses_all)
    for la, lb in zip(results["single"][1], results["mesh"][1]):
        for name in la:
            a, b = np.asarray(la[name]), np.asarray(lb[name])
            assert np.isfinite(a).all() and np.isfinite(b).all(), name
            assert np.allclose(a, b, atol=2e-3), (
                f"chunked loss diverged on mesh: {name} {a} vs {b}")
    leaf = jax.tree_util.tree_leaves(results["mesh"][0].g_params)[0]
    assert len(leaf.sharding.device_set) == n_devices

    # ---- stage 3: the shard_map'd Pallas pool kernel (what production
    # multi-chip training runs at real pair volumes, train/loop.py
    # set_spmd_mesh) — interpret mode on the CPU mesh, same harness as
    # tests/test_pallas_pool.py; loss parity vs the SAME kernel unsharded.
    import os

    from grouptraj.ops.pooling import set_spmd_mesh

    cfg_k = _dc.replace(cfg, pool_impl="pallas")
    os.environ["GROUPTRAJ_PALLAS_INTERPRET"] = "1"
    try:
        run_k = {}
        for tag in ("single", "mesh"):
            set_spmd_mesh(mesh if tag == "mesh" else None)
            runner = make_train_chunk(cfg_k, tcfg, "scan", chunk)
            rng = np.random.default_rng(0)
            st = (replicate_state(state0, mesh) if tag == "mesh"
                  else state0)
            losses_all = []
            for width, num_seq in ((8, 12), (16, 6)):
                data = synthetic_device_data(
                    num_seq, width, cfg.obs_len, cfg.pred_len, seed=width,
                    sharding=(replicated_sharding(mesh) if tag == "mesh"
                              else None))
                idx = rng.integers(
                    0, num_seq,
                    (chunk, spi, tcfg.batch_size)).astype(np.int32)
                st, losses = runner(
                    st, data,
                    (jax.device_put(idx, idx_shard) if tag == "mesh"
                     else jnp.asarray(idx)), jax.random.PRNGKey(9))
                losses_all.append(jax.device_get(losses))
            run_k[tag] = losses_all
        for la, lb in zip(run_k["single"], run_k["mesh"]):
            for name in la:
                a, b = np.asarray(la[name]), np.asarray(lb[name])
                assert np.isfinite(a).all() and np.isfinite(b).all(), name
                assert np.allclose(a, b, atol=2e-3), (
                    f"sharded pool kernel diverged: {name} {a} vs {b}")
    finally:
        set_spmd_mesh(None)
        os.environ.pop("GROUPTRAJ_PALLAS_INTERPRET", None)

    # ---- stage 4: seed-vmap x data-parallel composition (round 5) — the
    # multi-seed trainer's vmapped chunk with the scene axis sharded AND the
    # shard_map'd Pallas pool under the seed vmap (train_many
    # num_devices > 1; ops/pallas_pool._pool_core_spmd custom_vmap rules).
    # Loss parity per seed vs the identical single-device vmapped run.
    from grouptraj.train.steps import build_train_chunk

    os.environ["GROUPTRAJ_PALLAS_INTERPRET"] = "1"
    try:
        n_seeds = 2
        init_keys = jnp.stack([jax.random.PRNGKey(s) for s in (11, 12)])
        states0 = jax.jit(jax.vmap(
            lambda k: init_train_state(k, cfg_k, tcfg)))(init_keys)
        run_ms = {}
        for tag in ("single", "mesh"):
            set_spmd_mesh(mesh if tag == "mesh" else None)
            runner = jax.jit(jax.vmap(
                build_train_chunk(cfg_k, tcfg, "scan", chunk),
                in_axes=(0, None, None, 0)))
            rng = np.random.default_rng(0)
            st = (jax.device_put(states0, replicated_sharding(mesh))
                  if tag == "mesh" else states0)
            keys2 = jax.vmap(jax.random.fold_in, (0, None))(init_keys, 3)
            losses_all = []
            for width, num_seq in ((8, 12), (16, 6)):
                data = synthetic_device_data(
                    num_seq, width, cfg.obs_len, cfg.pred_len, seed=width,
                    sharding=(replicated_sharding(mesh) if tag == "mesh"
                              else None))
                idx = rng.integers(
                    0, num_seq,
                    (chunk, spi, tcfg.batch_size)).astype(np.int32)
                st, losses = runner(
                    st, data,
                    (jax.device_put(idx, idx_shard) if tag == "mesh"
                     else jnp.asarray(idx)), keys2)
                losses_all.append(jax.device_get(losses))
            run_ms[tag] = losses_all
        for la, lb in zip(run_ms["single"], run_ms["mesh"]):
            for name in la:
                a, b = np.asarray(la[name]), np.asarray(lb[name])
                assert np.isfinite(a).all() and np.isfinite(b).all(), name
                assert np.allclose(a, b, atol=2e-3), (
                    f"multi-seed sharded chunk diverged: {name} {a} vs {b}")
    finally:
        set_spmd_mesh(None)
        os.environ.pop("GROUPTRAJ_PALLAS_INTERPRET", None)
