"""GAN losses and displacement metrics as pure masked JAX functions.

TPU-native re-design of reference ``sgan/losses.py``. The reference operates
on ragged batches ``[T, sum_N, 2]``; here everything is scene-padded dense:
trajectories are ``[S, N, T, 2]`` with a validity mask ``[S, N]`` (and a
per-step ``loss_mask [S, N, T]``), so each function reduces with masks
instead of per-scene Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_loss(logits: jnp.ndarray, target: jnp.ndarray,
             mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Numerically-stable logits BCE, mean over (valid) entries.

    Matches reference ``sgan/losses.py:5-21``:
    ``max(x,0) - x*y + log(1 + exp(-|x|))`` averaged over the batch.
    """
    loss = jnp.clip(logits, 0, None) - logits * target + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    if mask is None:
        return jnp.mean(loss)
    mask = mask.astype(loss.dtype)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def gan_g_loss(scores_fake: jnp.ndarray, key: jax.Array,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Generator adversarial loss with one-sided label smoothing.

    The reference draws ONE Python-random scalar per call, y ~ U(0.7, 1.2)
    (``sgan/losses.py:24-33``); here the scalar comes from an explicit key.
    """
    y = jax.random.uniform(key, (), minval=0.7, maxval=1.2)
    return bce_loss(scores_fake, jnp.full_like(scores_fake, y), mask)


def gan_d_loss(scores_real: jnp.ndarray, scores_fake: jnp.ndarray,
               key: jax.Array, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Discriminator loss: BCE(real, ~U(0.7,1.2)) + BCE(fake, 0).

    Matches reference ``sgan/losses.py:36-49`` (whose ``zeros * U(0,0.3)`` fake
    label is a no-op — fake targets are exactly 0).
    """
    y_real = jax.random.uniform(key, (), minval=0.7, maxval=1.2)
    loss_real = bce_loss(scores_real, jnp.full_like(scores_real, y_real), mask)
    loss_fake = bce_loss(scores_fake, jnp.zeros_like(scores_fake), mask)
    return loss_real + loss_fake


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray, loss_mask: jnp.ndarray,
            mode: str = "average") -> jnp.ndarray:
    """Masked squared error (reference ``sgan/losses.py:52-71``).

    - pred, gt: [..., N, T, 2]
    - loss_mask: [..., N, T]
    - mode: 'sum' | 'average' | 'raw' ('raw' returns per-ped [..., N], the
      input of the best-of-k variety loss)

    Note 'average' divides by numel(loss_mask) exactly like the reference
    (count of mask *entries*, not of ones).
    """
    sq = loss_mask[..., None] * (gt - pred) ** 2
    if mode == "sum":
        return jnp.sum(sq)
    if mode == "average":
        return jnp.sum(sq) / loss_mask.size
    if mode == "raw":
        return jnp.sum(sq, axis=(-2, -1))
    raise ValueError(mode)


def displacement_error(pred: jnp.ndarray, gt: jnp.ndarray,
                       consider_ped: jnp.ndarray | None = None,
                       mode: str = "sum") -> jnp.ndarray:
    """ADE numerator: per-ped sum over T of euclidean error
    (reference ``sgan/losses.py:74-95``).

    - pred, gt: [..., N, T, 2] -> per-ped [..., N] (raw) or scalar (sum).
    - consider_ped: optional [..., N] multiplicative mask (e.g. validity,
      linear/non-linear split).
    """
    err = jnp.sqrt(jnp.sum((gt - pred) ** 2, axis=-1))  # [..., N, T]
    per_ped = jnp.sum(err, axis=-1)                     # [..., N]
    if consider_ped is not None:
        per_ped = per_ped * consider_ped
    if mode == "sum":
        return jnp.sum(per_ped)
    if mode == "raw":
        return per_ped
    raise ValueError(mode)


def final_displacement_error(pred_last: jnp.ndarray, gt_last: jnp.ndarray,
                             consider_ped: jnp.ndarray | None = None,
                             mode: str = "sum") -> jnp.ndarray:
    """FDE numerator (reference ``sgan/losses.py:98-119``).

    - pred_last, gt_last: [..., N, 2]
    """
    per_ped = jnp.sqrt(jnp.sum((gt_last - pred_last) ** 2, axis=-1))
    if consider_ped is not None:
        per_ped = per_ped * consider_ped
    if mode == "raw":
        return per_ped
    return jnp.sum(per_ped)


def variety_l2_loss(pred_rel_k: jnp.ndarray, gt_rel: jnp.ndarray,
                    loss_mask: jnp.ndarray, valid: jnp.ndarray,
                    l2_loss_weight: float = 1.0) -> jnp.ndarray:
    """Best-of-k "variety" loss over a vmapped sample axis.

    Replaces the reference's k sequential generator calls + per-scene Python
    min loop (``scripts/train.py:443-464``): for each scene, sum the raw l2
    over its pedestrians per sample, take the min over k, normalize by the
    scene's loss-mask sum, and sum over scenes.

    - pred_rel_k: [K, S, N, T, 2]
    - gt_rel: [S, N, T, 2]
    - loss_mask: [S, N, T] (zero at padded peds/steps)
    - valid: [S, N] pedestrian validity
    """
    per_scene, denom = variety_l2_parts(pred_rel_k, gt_rel, loss_mask,
                                        valid, l2_loss_weight)
    return variety_from_scene_l2(jnp.min(per_scene, axis=0), denom)


def variety_l2_parts(pred_rel_k: jnp.ndarray, gt_rel: jnp.ndarray,
                     loss_mask: jnp.ndarray, valid: jnp.ndarray,
                     l2_loss_weight: float = 1.0):
    """Per-(sample, scene) raw l2 sums and the per-scene normalizer —
    the pieces of :func:`variety_l2_loss` before the min-over-k, exposed so
    the sparse best-of-k backward (grouptraj/train/steps.py) can take the
    argmin itself and re-derive the loss from one re-decoded sample."""
    raw = l2_loss_weight * l2_loss(
        pred_rel_k, gt_rel[None], loss_mask[None], mode="raw")   # [K, S, N]
    per_scene = jnp.sum(raw * valid[None], axis=-1)              # [K, S]
    denom = jnp.sum(loss_mask, axis=(-2, -1))                    # [S]
    return per_scene, denom


def variety_scene_l2(pred_rel: jnp.ndarray, gt_rel: jnp.ndarray,
                     loss_mask: jnp.ndarray, valid: jnp.ndarray,
                     l2_loss_weight: float = 1.0) -> jnp.ndarray:
    """Per-scene raw l2 sums for ONE sample [S, N, T, 2] -> [S]."""
    raw = l2_loss_weight * l2_loss(pred_rel, gt_rel, loss_mask, mode="raw")
    return jnp.sum(raw * valid, axis=-1)


def variety_from_scene_l2(best: jnp.ndarray, denom: jnp.ndarray) -> jnp.ndarray:
    """Final variety reduction given per-scene best l2 [S] and the scene
    loss-mask sums [S] (empty scenes contribute exactly zero)."""
    scene_valid = denom > 0
    return jnp.sum(jnp.where(scene_valid, best / jnp.maximum(denom, 1.0), 0.0))
