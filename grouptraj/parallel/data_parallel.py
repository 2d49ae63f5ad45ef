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


def dryrun_multichip(n_devices: int) -> None:
    """One data-parallel train step (d + g) over an n-device mesh."""
    devices = jax.devices()
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)} "
        "(set XLA_FLAGS=--xla_force_host_platform_device_count)")
    mesh = make_mesh(n_devices, devices)

    cfg = ModelConfig()                      # flagship GAT preset
    tcfg = TrainConfig(best_k=3, batch_size=2 * n_devices)
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, tcfg)
    state = replicate_state(state, mesh)

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
