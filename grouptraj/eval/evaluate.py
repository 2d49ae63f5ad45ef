"""Best-of-N ADE/FDE evaluation harness.

Reference semantics (``scripts/evaluate_model.py:58-99``): for each batch,
draw ``num_samples`` stochastic predictions; per scene, sum the raw error
over its pedestrians, take the min over samples; normalize the grand totals
by ``total_traj * pred_len`` (ADE) and ``total_traj`` (FDE). The reference's
k sequential forwards per batch become one vmapped evaluation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from grouptraj import losses as L
from grouptraj.config import ModelConfig
from grouptraj.models.generator import (
    generator_context, generator_sample_many,
)
from grouptraj.utils import relative_to_abs


def make_eval_step(cfg: ModelConfig, num_samples: int, impl: str = "scan"):
    @jax.jit
    def step(g_params, obs, obs_rel, group, valid, pred_gt, key):
        keys = jax.random.split(key, num_samples)
        # eval runs train=False: the context phase is deterministic, so
        # compute it once and vmap only the noise+decode phase
        ctx = generator_context(g_params, cfg, obs, obs_rel, group, valid,
                                keys[0], train=False, impl=impl)
        preds = generator_sample_many(
            g_params, cfg, ctx, obs, obs_rel, group, valid, keys,
            train=False, impl=impl)                        # [K, S, N, Tp, 2]
        pred_abs = relative_to_abs(preds, obs[:, :, -1, :][None])
        ade_raw = L.displacement_error(pred_abs, pred_gt[None],
                                       valid[None], mode="raw")  # [K, S, N]
        fde_raw = L.final_displacement_error(
            pred_abs[:, :, :, -1], pred_gt[None][:, :, :, -1],
            valid[None], mode="raw")
        # per-scene sum over peds, min over samples (evaluate_helper)
        ade_sum = jnp.sum(jnp.min(jnp.sum(ade_raw, axis=-1), axis=0))
        fde_sum = jnp.sum(jnp.min(jnp.sum(fde_raw, axis=-1), axis=0))
        return ade_sum, fde_sum, jnp.sum(valid)

    return step


def evaluate(cfg: ModelConfig, loader, g_params, num_samples: int = 20,
             key: jax.Array | None = None, impl: str = "scan"
             ) -> Tuple[float, float]:
    if key is None:
        key = jax.random.PRNGKey(0)
    step = make_eval_step(cfg, num_samples, impl)
    acc = None
    for batch in loader:
        key, sub = jax.random.split(key)
        out = step(g_params, jnp.asarray(batch.obs),
                   jnp.asarray(batch.obs_rel),
                   jnp.asarray(batch.end_group),
                   jnp.asarray(batch.valid),
                   jnp.asarray(batch.pred), sub)
        # sums stay on device; one host readback per loader pass (a float()
        # per metric per batch is a host<->device round trip each — on the
        # tunneled TPU that serialized the whole eval, same pathology
        # check_accuracy avoids in train/steps.py)
        acc = out if acc is None else jax.tree_util.tree_map(jnp.add, acc, out)
    ade_total, fde_total, traj_total = (float(v) for v in jax.device_get(acc))
    ade = ade_total / (traj_total * cfg.pred_len)
    fde = fde_total / traj_total
    return ade, fde


def evaluate_bucketed(cfg: ModelConfig, dset, g_params,
                      num_samples: int = 20, batch_size: int = 64,
                      n_buckets: int = 3, key: jax.Array | None = None,
                      impl: str = "scan") -> Tuple[float, float]:
    """Best-of-N eval with scene-size buckets.

    Metric-equivalent to :func:`evaluate`: the per-scene min-over-k and the
    grand-total normalization do not depend on batch membership, so for a
    deterministic generator (``noise_dim=()``) the numbers are bit-identical
    (tested). For a stochastic generator the estimator is the same but the
    PRNG subkeys are consumed in bucket order rather than loader order, so
    at a fixed seed the sampled noise — and hence the best-of-N draw —
    differs from the unbucketed path by ordinary sampling variance (like
    changing the seed). Each batch pads only to its bucket's width instead
    of the split's global max — the same padding-waste fix the trainer
    applies (ARCHITECTURE.md "Scene-size buckets"). ``dset`` is a
    TrajectoryDataset.
    """
    from grouptraj.data.batching import DenseDataset, DenseLoader
    from grouptraj.train.device_data import make_buckets

    if key is None:
        key = jax.random.PRNGKey(0)
    step = make_eval_step(cfg, num_samples, impl)
    acc = None
    for width, idx in make_buckets(dset, n_buckets, batch_size):
        dense = DenseDataset(dset, width, indices=idx)
        loader = DenseLoader(dense, batch_size, shuffle=False)
        for batch in loader:
            key, sub = jax.random.split(key)
            out = step(g_params, jnp.asarray(batch.obs),
                       jnp.asarray(batch.obs_rel),
                       jnp.asarray(batch.end_group),
                       jnp.asarray(batch.valid),
                       jnp.asarray(batch.pred), sub)
            # device-side accumulation, one readback per sweep (see evaluate)
            acc = out if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, out)
    ade_total, fde_total, traj_total = (float(v) for v in jax.device_get(acc))
    ade = ade_total / (traj_total * cfg.pred_len)
    fde = fde_total / traj_total
    return ade, fde
