"""Jitted GAN training steps: alternating discriminator / generator updates.

Re-design of reference ``scripts/train.py:395-484``:
- the best-of-k variety loss vmaps k noise keys through one generator
  evaluation instead of k sequential Python-loop forwards
  (reference ``train.py:443-445``);
- gradient clipping matches torch semantics (clip grads by global norm, then
  Adam) via ``optax.chain(clip_by_global_norm, adam)``;
- the adversarial score reduction masks padded pedestrians; like the
  reference, the g step feeds the discriminator the LAST of the k samples
  (``train.py:468-471`` uses the final loop iterate).

Each step is a pure function ``(state, batch, key) -> (state, losses)``
compiled once per (S, N) shape; data parallelism is layered on by
``grouptraj.parallel`` through sharding annotations, not code changes.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from grouptraj import losses as L
from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.models import (
    discriminator_forward, generator_forward, init_discriminator,
    init_generator,
)
from grouptraj.models.generator import (
    generator_context, generator_sample, generator_sample_many,
    sample_noises,
)
from grouptraj.utils import relative_to_abs


class TrainState(NamedTuple):
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    # EMA of g_params when TrainConfig.g_ema_decay > 0, else None (None is
    # an empty pytree subtree, so vmap/sharding/checkpoint slicing all
    # pass it through untouched)
    ema_g: Any = None


def make_optimizers(tcfg: TrainConfig):
    def chain(lr, clip):
        steps = []
        if clip and clip > 0:
            steps.append(optax.clip_by_global_norm(clip))
        steps.append(optax.adam(lr))
        return optax.chain(*steps)

    return (chain(tcfg.g_learning_rate, tcfg.clipping_threshold_g),
            chain(tcfg.d_learning_rate, tcfg.clipping_threshold_d))


def init_train_state(key: jax.Array, cfg: ModelConfig, tcfg: TrainConfig
                     ) -> TrainState:
    kg, kd = jax.random.split(key)
    g_params = init_generator(kg, cfg)
    d_params = init_discriminator(kd, cfg)
    g_tx, d_tx = make_optimizers(tcfg)
    ema_g = jax.tree_util.tree_map(jnp.asarray, g_params) \
        if tcfg.g_ema_decay > 0 else None
    return TrainState(g_params, d_params, g_tx.init(g_params),
                      d_tx.init(d_params), ema_g)


def _batch_arrays(batch) -> Dict[str, jnp.ndarray]:
    return dict(
        obs=jnp.asarray(batch.obs), pred=jnp.asarray(batch.pred),
        obs_rel=jnp.asarray(batch.obs_rel),
        pred_rel=jnp.asarray(batch.pred_rel),
        group=jnp.asarray(batch.obs_g[..., -1]),
        valid=jnp.asarray(batch.valid),
        loss_mask=jnp.asarray(batch.loss_mask),
        non_linear=jnp.asarray(batch.non_linear),
    )


def _bf16(t):
    """Cast a pytree's f32 leaves to bf16 (the no-grad-leg residency;
    TrainConfig.bf16_nograd)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, t)


def _trajs(b, pred_rel_fake):
    """Assemble full real/fake (abs, rel) trajectories [S, N, To+Tp, 2]."""
    pred_abs_fake = relative_to_abs(pred_rel_fake, b["obs"][:, :, -1, :])
    traj_real = jnp.concatenate([b["obs"], b["pred"]], axis=2)
    traj_real_rel = jnp.concatenate([b["obs_rel"], b["pred_rel"]], axis=2)
    traj_fake = jnp.concatenate([b["obs"], pred_abs_fake], axis=2)
    traj_fake_rel = jnp.concatenate([b["obs_rel"], pred_rel_fake], axis=2)
    return traj_real, traj_real_rel, traj_fake, traj_fake_rel


def build_d_step(cfg: ModelConfig, tcfg: TrainConfig, impl: str = "scan"
                 ) -> Callable:
    """Discriminator step, unjitted (reference ``train.py:395-429``)."""
    _, d_tx = make_optimizers(tcfg)

    def d_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               key: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        b = batch
        k_gen, k_label, k_disc = jax.random.split(key, 3)
        if tcfg.bf16_nograd:
            # no gradient flows through the generator here — run the decode
            # leg in bf16 (context stays f32: it feeds the Pallas pool
            # kernel; the decode is where the rows are). Noise drawn in f32
            # via the sample_noises seam — bit-identical draw layout to
            # generator_forward (tested), only the decode precision differs.
            S, N = b["valid"].shape
            ctx_d = generator_context(
                state.g_params, cfg, b["obs"], b["obs_rel"], b["group"],
                b["valid"], k_gen, impl=impl)
            z = sample_noises(cfg, k_gen[None], S, N, ctx_d.dtype)
            pred_rel_fake = generator_sample(
                _bf16(state.g_params), cfg, _bf16(ctx_d), _bf16(b["obs"]),
                _bf16(b["obs_rel"]), b["group"], b["valid"], k_gen,
                user_noise=None if z is None else _bf16(z[0]),
                impl=impl).astype(jnp.float32)
        else:
            pred_rel_fake = generator_forward(
                state.g_params, cfg, b["obs"], b["obs_rel"], b["group"],
                b["valid"], k_gen, impl=impl)
        tr, trr, tf, tfr = _trajs(b, pred_rel_fake)
        S = b["valid"].shape[0]
        # real and fake scored in ONE stacked forward: halves the
        # discriminator's sequential depth in both forward and backward
        # (scenes are independent rows; only batch-stat BN would couple
        # them, so that config falls back to two calls)
        stack = not cfg.batch_norm
        if stack:
            tb = jnp.concatenate([tr, tf], axis=0)
            tbr = jnp.concatenate([trr, tfr], axis=0)
            vb = jnp.concatenate([b["valid"], b["valid"]], axis=0)

        def loss_fn(d_params):
            if stack:
                scores = discriminator_forward(d_params, cfg, tb, tbr, vb,
                                               k_disc, impl=impl)
                scores_real, scores_fake = scores[:S], scores[S:]
            else:
                k_df, k_dr = jax.random.split(k_disc)
                scores_fake = discriminator_forward(
                    d_params, cfg, tf, tfr, b["valid"], k_df, impl=impl)
                scores_real = discriminator_forward(
                    d_params, cfg, tr, trr, b["valid"], k_dr, impl=impl)
            return L.gan_d_loss(scores_real, scores_fake, k_label,
                                b["valid"])

        data_loss, grads = jax.value_and_grad(loss_fn)(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        losses = {"D_data_loss": data_loss, "D_total_loss": data_loss,
                  "norm_d": optax.global_norm(grads)}
        return state._replace(d_params=d_params, d_opt=d_opt), losses

    return d_step


def make_d_step(cfg: ModelConfig, tcfg: TrainConfig, impl: str = "scan"
                ) -> Callable:
    return jax.jit(build_d_step(cfg, tcfg, impl))


def build_g_step(cfg: ModelConfig, tcfg: TrainConfig, impl: str = "scan"
                 ) -> Callable:
    """Generator step with vmapped best-of-k variety loss, unjitted
    (reference ``train.py:432-484``)."""
    g_tx, _ = make_optimizers(tcfg)
    best_k = tcfg.best_k

    def g_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               key: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        b = batch
        k_label, k_samples, k_disc = jax.random.split(key, 3)
        sample_keys = jax.random.split(k_samples, best_k)
        pred_loss_mask = b["loss_mask"][..., cfg.obs_len:]

        # With dropout off (the reference default), everything before the
        # noise concat is identical across the k samples: compute the
        # context once and vmap only the noise+decode phase.
        share_ctx = cfg.dropout == 0 and cfg.dropout1 == 0
        # Sparse best-of-k backward (TrainConfig.sparse_best_k): the variety
        # min only propagates gradient through the per-scene ARGMIN sample
        # (and the adversarial term through the last sample), so decode all
        # k with stop_gradient'd inputs — no backward graph, no residuals —
        # then differentiably re-decode just those two samples as a stacked
        # [2S, N] batch. Scenes are independent rows in the decoder
        # (generator_sample_many's tested tiling property), so the re-decode
        # reproduces the selected samples bitwise and the loss VALUE is
        # unchanged; gradients equal the dense formulation everywhere except
        # exact per-scene l2 ties (measure zero; jnp.min's VJP splits ties,
        # argmin picks one). The backward's decoder work drops from k·S·N
        # rows to 2·S·N — the profiled #1 g-step cost at best_k=20
        # (tools/profile_step.py; ARCHITECTURE.md round-3 continuation).
        sparse = (share_ctx and tcfg.sparse_best_k
                  and tcfg.l2_loss_weight > 0 and best_k > 1
                  and not cfg.pool_every_timestep)

        def loss_fn(g_params):
            if sparse:
                sg = jax.lax.stop_gradient
                ctx = generator_context(
                    g_params, cfg, b["obs"], b["obs_rel"], b["group"],
                    b["valid"], sample_keys[0], impl=impl)
                S, N = b["valid"].shape
                # draw ALL sample noises once in f32 (bit-identical to the
                # in-decode draws, tested) so the probe decode — bf16 or
                # f32 — and the f32 re-decode share the exact same z
                z_all = sample_noises(cfg, sample_keys, S, N, ctx.dtype)
                if tcfg.bf16_nograd:
                    # the probe decode carries no gradient (stop_gradient'd
                    # inputs); bf16 halves its HBM traffic and doubles MXU
                    # rate. Only effect: the per-scene argmin may pick a
                    # different sample on near-ties (TrainConfig docstring).
                    preds_all = generator_sample_many(
                        _bf16(sg(g_params)), cfg, _bf16(sg(ctx)),
                        _bf16(b["obs"]), _bf16(b["obs_rel"]), b["group"],
                        b["valid"], sample_keys, impl=impl,
                        user_noises=None if z_all is None
                        else _bf16(sg(z_all))).astype(jnp.float32)
                else:
                    preds_all = generator_sample_many(
                        sg(g_params), cfg, sg(ctx), b["obs"], b["obs_rel"],
                        b["group"], b["valid"], sample_keys, impl=impl,
                        user_noises=None if z_all is None else sg(z_all))
                per_scene, denom = L.variety_l2_parts(
                    preds_all, b["pred_rel"], pred_loss_mask, b["valid"],
                    tcfg.l2_loss_weight)
                k_star = jnp.argmin(per_scene, axis=0)            # [S]
                cat2 = lambda a: jnp.concatenate([a, a], axis=0)
                z2 = None if z_all is None else jnp.concatenate(
                    [z_all[k_star, jnp.arange(S)], z_all[-1]], axis=0)
                preds2 = generator_sample(
                    g_params, cfg, cat2(ctx), cat2(b["obs"]),
                    cat2(b["obs_rel"]), cat2(b["group"]), cat2(b["valid"]),
                    sample_keys[0], user_noise=z2, impl=impl)
                pred_sel, pred_last = preds2[:S], preds2[S:]
                variety = L.variety_from_scene_l2(
                    L.variety_scene_l2(pred_sel, b["pred_rel"],
                                       pred_loss_mask, b["valid"],
                                       tcfg.l2_loss_weight), denom)
            elif share_ctx:
                ctx = generator_context(
                    g_params, cfg, b["obs"], b["obs_rel"], b["group"],
                    b["valid"], sample_keys[0], impl=impl)
                # all k samples in ONE scene-tiled decode (numerically
                # identical to the per-key vmap, tested) — a single decoder
                # recurrence at [k·S·N] batch instead of a k-batched vmap
                preds = generator_sample_many(
                    g_params, cfg, ctx, b["obs"], b["obs_rel"], b["group"],
                    b["valid"], sample_keys, impl=impl)
            else:
                preds = jax.vmap(lambda k: generator_forward(
                    g_params, cfg, b["obs"], b["obs_rel"], b["group"],
                    b["valid"], k, impl=impl))(sample_keys)  # [K,S,N,Tp,2]
            if not sparse:
                variety = L.variety_l2_loss(
                    preds, b["pred_rel"], pred_loss_mask, b["valid"],
                    tcfg.l2_loss_weight) if tcfg.l2_loss_weight > 0 else 0.0
                pred_last = preds[-1]
            _, _, tf, tfr = _trajs(b, pred_last)
            scores_fake = discriminator_forward(
                state.d_params, cfg, tf, tfr, b["valid"], k_disc, impl=impl)
            adv = L.gan_g_loss(scores_fake, k_label, b["valid"])
            return variety + adv, (variety, adv)

        (total, (variety, adv)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.g_params)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        losses = {"G_l2_loss_rel": variety, "G_discriminator_loss": adv,
                  "G_total_loss": total, "norm_g": optax.global_norm(grads)}
        ema_g = state.ema_g
        if ema_g is not None and tcfg.g_ema_decay > 0:
            d = tcfg.g_ema_decay
            ema_g = jax.tree_util.tree_map(
                lambda e, p: e * d + p * (1.0 - d), ema_g, g_params)
        return state._replace(g_params=g_params, g_opt=g_opt,
                              ema_g=ema_g), losses

    return g_step


def make_g_step(cfg: ModelConfig, tcfg: TrainConfig, impl: str = "scan"
                ) -> Callable:
    return jax.jit(build_g_step(cfg, tcfg, impl))


def build_train_chunk(cfg: ModelConfig, tcfg: TrainConfig, impl: str = "scan",
                      chunk: int = 8) -> Callable:
    """Unjitted body of :func:`make_train_chunk` — K training iterations
    over a device-resident dataset as ``(state, data, idx, key) ->
    (state, losses)``. Kept separate so callers can compose transforms
    (``jax.vmap`` for the multi-seed trainer) before jitting.
    """
    from grouptraj.train.device_data import gather_batch

    d_raw = build_d_step(cfg, tcfg, impl)
    g_raw = build_g_step(cfg, tcfg, impl)

    def run(state: TrainState, data, idx, key: jax.Array):
        keys = jax.random.split(key, chunk)

        def body(state, xs):
            bidx, k = xs
            losses = {}
            for j in range(tcfg.d_steps):
                k, sub = jax.random.split(k)
                b = gather_batch(data, bidx[j], cfg.obs_len)
                state, ld = d_raw(state, b, sub)
                losses.update(ld)
            for j in range(tcfg.g_steps):
                k, sub = jax.random.split(k)
                b = gather_batch(data, bidx[tcfg.d_steps + j], cfg.obs_len)
                state, lg = g_raw(state, b, sub)
                losses.update(lg)
            return state, losses

        state, losses = jax.lax.scan(body, state, (idx, keys))
        return state, losses

    return run


def make_train_chunk(cfg: ModelConfig, tcfg: TrainConfig, impl: str = "scan",
                     chunk: int = 8) -> Callable:
    """K training iterations per dispatch over a device-resident dataset.

    The returned jitted function takes ``(state, data, idx, key)`` where
    ``data`` is the :func:`grouptraj.train.device_data.device_dataset` dict
    and ``idx`` is ``[chunk, d_steps+g_steps, S]`` int32 scene indices — the
    only per-dispatch host->device traffic. A ``lax.scan`` alternates the
    reference's d/g schedule; all per-iteration losses come back stacked
    ``[chunk]`` so logging is unchanged. Semantically identical updates to
    the unchunked path, minus per-step dispatch/transfer latency (the
    bottleneck on a tunneled TPU).
    """
    return jax.jit(build_train_chunk(cfg, tcfg, impl, chunk))


def make_check_accuracy_step(cfg: ModelConfig, impl: str = "scan") -> Callable:
    """Per-batch raw sums for check_accuracy (reference ``train.py:487-568``):
    single-sample eval-mode generator; the caller accumulates and normalizes.
    """

    @jax.jit
    def step(state: TrainState, batch: Dict[str, jnp.ndarray],
             key: jax.Array) -> Dict[str, jnp.ndarray]:
        b = batch
        k_gen, k_label = jax.random.split(key)
        valid = b["valid"]
        linear = (1.0 - b["non_linear"]) * valid
        non_linear = b["non_linear"] * valid
        pred_loss_mask = b["loss_mask"][..., cfg.obs_len:]

        pred_rel_fake = generator_forward(
            state.g_params, cfg, b["obs"], b["obs_rel"], b["group"], valid,
            k_gen, train=False, impl=impl)
        pred_abs_fake = relative_to_abs(pred_rel_fake, b["obs"][:, :, -1, :])
        tr, trr, tf, tfr = _trajs(b, pred_rel_fake)

        scores_fake = discriminator_forward(state.d_params, cfg, tf, tfr,
                                            valid, train=False, impl=impl)
        scores_real = discriminator_forward(state.d_params, cfg, tr, trr,
                                            valid, train=False, impl=impl)
        out = {
            "d_loss": L.gan_d_loss(scores_real, scores_fake, k_label, valid),
            "g_l2_loss_abs": L.l2_loss(pred_abs_fake, b["pred"],
                                       pred_loss_mask, "sum"),
            "g_l2_loss_rel": L.l2_loss(pred_rel_fake, b["pred_rel"],
                                       pred_loss_mask, "sum"),
            "disp_error": L.displacement_error(pred_abs_fake, b["pred"],
                                               valid),
            "disp_error_l": L.displacement_error(pred_abs_fake, b["pred"],
                                                 linear),
            "disp_error_nl": L.displacement_error(pred_abs_fake, b["pred"],
                                                  non_linear),
            "f_disp_error": L.final_displacement_error(
                pred_abs_fake[:, :, -1], b["pred"][:, :, -1], valid),
            "f_disp_error_l": L.final_displacement_error(
                pred_abs_fake[:, :, -1], b["pred"][:, :, -1], linear),
            "f_disp_error_nl": L.final_displacement_error(
                pred_abs_fake[:, :, -1], b["pred"][:, :, -1], non_linear),
            "loss_mask_sum": jnp.sum(pred_loss_mask),
            "total_traj": jnp.sum(valid),
            "total_traj_l": jnp.sum(linear),
            "total_traj_nl": jnp.sum(non_linear),
        }
        return out

    return step


def make_check_accuracy_sweep(cfg: ModelConfig, impl: str = "scan"
                              ) -> Callable:
    """The whole check_accuracy loader pass in ONE dispatch.

    Returns a jitted ``(state, data, idx, key) -> sums`` where ``data`` is a
    :func:`grouptraj.train.device_data.device_dataset` dict and ``idx`` is
    ``[n_batches, S]`` int32 scene indices (null-scene-padded tails). A
    ``lax.scan`` runs the per-batch metric step over all batches and
    accumulates the raw sums on device — one host round trip per sweep
    instead of one per batch, the same tunnel-latency fix the training
    chunk applies (``make_train_chunk``). Metrics identical to the
    per-batch path: every sum is over per-scene quantities and the null
    scene contributes exactly zero (masked everywhere); d_loss is averaged
    by the true batch count outside.
    """
    return jax.jit(build_check_accuracy_sweep(cfg, impl))


def build_check_accuracy_sweep(cfg: ModelConfig, impl: str = "scan"
                               ) -> Callable:
    """Unjitted body of :func:`make_check_accuracy_sweep`, composable with
    ``jax.vmap`` (multi-seed trainer)."""
    from grouptraj.train.device_data import gather_batch

    raw = make_check_accuracy_step(cfg, impl)

    def sweep(state: TrainState, data, idx: jnp.ndarray, key: jax.Array):
        keys = jax.random.split(key, idx.shape[0])
        # prime with the first batch to get the accumulator structure, scan
        # the rest (scan of length 0 is fine for single-batch sweeps)
        first = raw(state, gather_batch(data, idx[0], cfg.obs_len), keys[0])
        acc, _ = jax.lax.scan(
            lambda a, xs: (jax.tree_util.tree_map(
                jnp.add, a, raw(state, gather_batch(data, xs[0],
                                                    cfg.obs_len), xs[1])),
                None),
            first, (idx[1:], keys[1:]))
        return acc

    return sweep


def summarize_check_accuracy(sums: Dict[str, float], n_batches: int,
                             pred_len: int) -> Dict[str, float]:
    """Normalize raw metric sums (reference ``train.py:487-568``):
    d_loss averaged per batch; ADE = Σ/(total_traj·pred_len),
    FDE = Σ/total_traj; _l/_nl variants guarded for empty classes."""
    d_loss_mean = sums.pop("d_loss") / max(n_batches, 1)
    tt, tl, tnl = (sums["total_traj"], sums["total_traj_l"],
                   sums["total_traj_nl"])
    return {
        "d_loss": d_loss_mean,
        "g_l2_loss_abs": sums["g_l2_loss_abs"] / max(sums["loss_mask_sum"], 1),
        "g_l2_loss_rel": sums["g_l2_loss_rel"] / max(sums["loss_mask_sum"], 1),
        "ade": sums["disp_error"] / max(tt * pred_len, 1),
        "fde": sums["f_disp_error"] / max(tt, 1),
        "ade_l": sums["disp_error_l"] / (tl * pred_len) if tl else 0,
        "fde_l": sums["f_disp_error_l"] / tl if tl else 0,
        "ade_nl": sums["disp_error_nl"] / (tnl * pred_len) if tnl else 0,
        "fde_nl": sums["f_disp_error_nl"] / tnl if tnl else 0,
    }


def check_accuracy(args, loader, state: TrainState, step_fn, key: jax.Array,
                   limit: bool = False, batch_sharding=None
                   ) -> Dict[str, float]:
    """Accumulate val/train metrics over a loader (reference
    ``train.py:487-568`` — d_loss averaged per batch, the rest sample-summed
    then normalized; ADE = Σ/(total_traj·pred_len), FDE = Σ/total_traj).

    Device-side accumulation: per-batch sums stay on device and are added
    into one running pytree; the host reads back ONCE per loader pass. (A
    ``float()`` per metric per batch is a host<->device round-trip each — on
    a tunneled TPU that serialized the whole eval.) The limit check uses the
    host-resident ``batch.valid`` so it costs no sync either.
    """
    acc = None
    n_batches = 0
    seen_traj = 0.0
    for batch in loader:
        key, sub = jax.random.split(key)
        arrays = _batch_arrays(batch)
        if batch_sharding is not None:
            arrays = jax.device_put(arrays, batch_sharding)
        out = step_fn(state, arrays, sub)
        acc = out if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, out)
        n_batches += 1
        seen_traj += float(batch.valid.sum())
        if limit and seen_traj >= args.num_samples_check:
            break
    sums = {k: float(v) for k, v in jax.device_get(acc).items()}
    return summarize_check_accuracy(sums, n_batches, loader.dense.pred_len)
