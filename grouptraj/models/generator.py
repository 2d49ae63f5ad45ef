"""TrajectoryGenerator: LSTM encoder → social pooling → group graph module →
noise → autoregressive LSTM decoder, all scene-padded dense.

Re-design of reference ``sgan/models.py:715-927``. Differences by design:
- batch layout is ``[S, N, T, ...]`` with validity masks, no seq_start_end;
- the decoder loop is a ``lax.scan`` (12 steps compiled to one device loop);
- noise comes from explicit PRNG keys;
- ``pooling_type='gcn'`` and ``'none'`` are working configurations (they
  crash in the reference, SURVEY.md §2.2 — consciously fixed);
- the dead always-constructed ``gcn_module`` (reference ``models.py:806-812``)
  is only created when it is actually used (``graph_module='gcn'``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from grouptraj.config import ModelConfig
from grouptraj.models.modules import (
    gat_encoder, gat_encoder_mh, gcn_module, gcn_pooling,
    init_gat_encoder, init_gat_encoder_mh, init_gcn_module, init_gcn_pooling,
)
from grouptraj.ops.linear import init_linear, init_mlp, linear, mlp_forward
from grouptraj.ops.lstm import (
    decoder_first_step, encoder_recurrence, init_lstm, lstm_cell,
    lstm_gates, lstm_scan,
)
from grouptraj.ops.noise import get_noise
from grouptraj.ops.pooling import init_pool_hidden_net, pool_hidden_net


def _encode(enc_params: dict, traj_rel: jnp.ndarray, impl: str) -> jnp.ndarray:
    """Shared encoder: Linear(2→emb) then LSTM over time; returns final h.

    traj_rel: [S, N, T, 2] -> [S, N, H]. (reference Encoder, models.py:32-92)

    On the scan path the embedding folds into the recurrence —
    ``gates_t = x_t @ (W_e W_ih) + (b_e W_ih + b_ih + b_hh) + h @ W_hh`` —
    exact algebra (the reference's spatial_embedding is a bare Linear), so
    no embedded-input, gx, or dgx slab is ever materialized; see
    :func:`grouptraj.ops.lstm.encoder_recurrence` for the measured why.
    """
    S, N, T, _ = traj_rel.shape
    if impl == "scan":
        se, lstm = enc_params["spatial_embedding"], enc_params["lstm"]
        w_comp = se["w"] @ lstm["w_ih"]                       # [2, 4H]
        b_comp = se["b"] @ lstm["w_ih"] + lstm["b_ih"] + lstm["b_hh"]
        xs = jnp.moveaxis(traj_rel.reshape(S * N, T, 2), 1, 0)
        h_t, _ = encoder_recurrence(w_comp, b_comp, lstm["w_hh"], xs)
        return h_t.reshape(S, N, -1)
    emb = linear(enc_params["spatial_embedding"], traj_rel)  # [S, N, T, E]
    xs = jnp.moveaxis(emb.reshape(S * N, T, -1), 1, 0)        # [T, S*N, E]
    _, (h_t, _) = lstm_scan(enc_params["lstm"], xs, impl=impl)
    return h_t.reshape(S, N, -1)


def init_generator(key: jax.Array, cfg: ModelConfig, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 8)
    params = {
        "encoder": {
            "spatial_embedding": init_linear(keys[0], 2, cfg.embedding_dim,
                                             dtype),
            "lstm": init_lstm(keys[1], cfg.embedding_dim, cfg.encoder_h_dim_g,
                              dtype),
        },
        "decoder": {
            "spatial_embedding": init_linear(keys[2], 2, cfg.embedding_dim,
                                             dtype),
            "lstm": init_lstm(keys[3], cfg.embedding_dim, cfg.decoder_h_dim_g,
                              dtype),
            "hidden2pos": init_linear(keys[4], cfg.decoder_h_dim_g, 2, dtype),
        },
    }
    if cfg.pool_every_timestep:
        kd1, kd2 = jax.random.split(keys[5])
        if cfg.pooling_type == "pool_net":
            params["decoder"]["pool_net"] = init_pool_hidden_net(
                kd1, cfg.embedding_dim, cfg.decoder_h_dim_g,
                cfg.bottleneck_dim, cfg.batch_norm, dtype)
        elif cfg.pooling_type == "gcn":
            params["decoder"]["pool_net"] = init_gcn_pooling(
                kd1, cfg.embedding_dim, cfg.decoder_h_dim_g,
                cfg.gcn_hidden_dim, cfg.bottleneck_dim, cfg.gcn_layers, dtype)
        params["decoder"]["mlp"] = init_mlp(
            kd2, [cfg.decoder_h_dim_g + cfg.bottleneck_dim, cfg.mlp_dim,
                  cfg.decoder_h_dim_g], cfg.batch_norm, dtype)

    if cfg.pooling_type == "pool_net":
        params["pool_net"] = init_pool_hidden_net(
            keys[6], cfg.embedding_dim, cfg.encoder_h_dim_g,
            cfg.bottleneck_dim, cfg.batch_norm, dtype)
    elif cfg.pooling_type == "gcn":
        params["pool_net"] = init_gcn_pooling(
            keys[6], cfg.embedding_dim, cfg.encoder_h_dim_g,
            cfg.gcn_hidden_dim, cfg.bottleneck_dim, cfg.gcn_layers, dtype)

    if cfg.graph_module == "gat":
        params["gatencoder"] = init_gat_encoder(
            keys[7], cfg.context_dim, cfg.hidden_units, cfg.graph_out_dim,
            cfg.decoder_context_dim, cfg.n_heads, dtype)
    elif cfg.graph_module == "gcn":
        params["gcn_module"] = init_gcn_module(
            keys[7], cfg.context_dim, cfg.gcn_hidden_dim, cfg.graph_out_dim,
            cfg.gcn_layers, cfg.decoder_context_dim, dtype)
    elif cfg.graph_module == "gat-mh":
        k_gat, k_mlp = jax.random.split(keys[7])
        params["gatencoder"] = init_gat_encoder_mh(
            k_gat, cfg.mh_n_units, cfg.mh_n_heads, dtype)
        params["mlp_decoder_context"] = init_mlp(
            k_mlp, [cfg.mh_n_units[-1], cfg.mlp_dim,
                    cfg.decoder_context_dim], cfg.batch_norm, dtype)
    elif cfg.mlp_decoder_context:
        params["mlp_decoder_context"] = init_mlp(
            keys[7], [cfg.context_dim, cfg.mlp_dim, cfg.decoder_context_dim],
            cfg.batch_norm, dtype)
    return params


def _mlp_decoder_needed(cfg: ModelConfig) -> bool:
    """reference models.py:852-859."""
    return bool(cfg.noise_first_dim) or (
        cfg.pooling_type not in (None, "none")) or (
        cfg.encoder_h_dim_g != cfg.decoder_h_dim_g)


def _pool(params: dict, cfg: ModelConfig, h, end_pos, last_rel, labels,
          valid, h_dim_key: str, key, train):
    if cfg.pooling_type == "pool_net":
        return pool_hidden_net(params, h, end_pos, valid, cfg.activation,
                               cfg.batch_norm, cfg.dropout, key, train,
                               impl=cfg.pool_impl)
    if cfg.pooling_type == "gcn":
        return gcn_pooling(params, h, last_rel, labels, valid)
    raise ValueError(cfg.pooling_type)


def generator_context(
    params: dict,
    cfg: ModelConfig,
    obs: jnp.ndarray,          # [S, N, To, 2] absolute
    obs_rel: jnp.ndarray,      # [S, N, To, 2]
    group_end: jnp.ndarray,    # [S, N] group label at t_obs
    valid: jnp.ndarray,        # [S, N]
    key: Optional[jax.Array] = None,
    train: bool = True,
    impl: str = "scan",
) -> jnp.ndarray:
    """Deterministic-given-inputs context phase: encoder → pooling → graph
    module → noise_input [S, N, decoder_h − noise]. Everything before the
    noise concat; with dropout off (the reference default) it is identical
    across best-of-k samples, so callers compute it ONCE and vmap only
    :func:`generator_sample` over noise keys."""
    if key is None:
        key = jax.random.PRNGKey(0)
    _, k_pool, k_graph, _ = jax.random.split(key, 4)
    end_pos = obs[:, :, -1, :]

    final_h = _encode(params["encoder"], obs_rel, impl)       # [S, N, He]

    if cfg.pooling_type not in (None, "none"):
        pool_h = _pool(params["pool_net"], cfg, final_h, end_pos,
                       obs_rel[:, :, -1, :], group_end, valid, "encoder",
                       k_pool, train)
        ctx = jnp.concatenate([final_h, pool_h], axis=-1)      # [S, N, He+B]
    else:
        ctx = final_h

    if _mlp_decoder_needed(cfg):
        if cfg.graph_module == "gat":
            noise_input = gat_encoder(params["gatencoder"], ctx, group_end,
                                      valid, cfg.alpha, cfg.dropout1, k_graph,
                                      train)
        elif cfg.graph_module == "gcn":
            noise_input = gcn_module(params["gcn_module"], ctx, group_end,
                                     valid)
        elif cfg.graph_module == "gat-mh":
            k_gm, k_ctx = jax.random.split(k_graph)
            gm = gat_encoder_mh(params["gatencoder"], ctx, group_end, valid,
                                cfg.alpha, cfg.dropout1, k_gm, train,
                                adj_mode=cfg.mh_adj,
                                concat_mode=cfg.mh_concat,
                                norm=cfg.mh_norm)
            noise_input = mlp_forward(
                params["mlp_decoder_context"], gm, cfg.activation,
                cfg.batch_norm, cfg.dropout, k_ctx, mask=valid, train=train)
        elif cfg.mlp_decoder_context:
            noise_input = mlp_forward(
                params["mlp_decoder_context"], ctx, cfg.activation,
                cfg.batch_norm, cfg.dropout, k_graph, mask=valid, train=train)
        else:
            noise_input = ctx
    else:
        noise_input = ctx
    return noise_input


def generator_sample(
    params: dict,
    cfg: ModelConfig,
    noise_input: jnp.ndarray,  # [S, N, decoder_h − noise] from generator_context
    obs: jnp.ndarray,
    obs_rel: jnp.ndarray,
    group_end: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    user_noise: Optional[jnp.ndarray] = None,
    train: bool = True,
    impl: str = "scan",
) -> jnp.ndarray:
    """Stochastic phase: noise concat + autoregressive decode. vmap this
    over sample keys for best-of-k with a shared context."""
    S, N = valid.shape
    end_pos = obs[:, :, -1, :]
    last_pos_rel = obs_rel[:, :, -1, :]
    k_noise, _, _, k_dec = jax.random.split(key, 4)

    # Noise (reference add_noise, models.py:814-850): 'global' draws one
    # vector per scene, repeated across its peds; 'ped' draws one per ped.
    nd = cfg.noise_first_dim
    if nd:
        if user_noise is not None:
            z = user_noise
        elif cfg.noise_mix_type == "global":
            z = get_noise(k_noise, (S, nd), cfg.noise_type, noise_input.dtype)
        else:
            z = get_noise(k_noise, (S, N, nd), cfg.noise_type,
                          noise_input.dtype)
        if z.ndim == 2:
            z = jnp.broadcast_to(z[:, None, :], (S, N, nd))
        decoder_h = jnp.concatenate([noise_input, z], axis=-1)
    else:
        decoder_h = noise_input

    return _decode(params["decoder"], cfg, decoder_h, end_pos, last_pos_rel,
                   group_end, valid, k_dec, train, impl)


def generator_sample_many(
    params: dict,
    cfg: ModelConfig,
    noise_input: jnp.ndarray,  # [S, N, decoder_h − noise] from generator_context
    obs: jnp.ndarray,
    obs_rel: jnp.ndarray,
    group_end: jnp.ndarray,
    valid: jnp.ndarray,
    keys: jax.Array,           # [K] sample keys
    train: bool = True,
    impl: str = "scan",
    user_noises: Optional[jnp.ndarray] = None,  # [K, S, N, nd] pre-drawn z
) -> jnp.ndarray:
    """All K best-of-k samples in ONE decoder pass -> [K, S, N, Tp, 2].

    Numerically identical to ``vmap(generator_sample)`` over the keys (same
    per-key noise splits, tested): each sample's noise is drawn exactly as
    :func:`generator_sample` draws it, then the scene axis is tiled K-fold
    and a single decode runs on ``[K·S, N]`` scenes. Scenes are independent
    rows everywhere in the decoder, so tiling is semantics-preserving; the
    payoff is one kernel launch (and one Pallas fused-recurrence call at
    full ``K·S·N`` batch) instead of a K-batched vmap body. The per-step
    dropout keys of the ``pool_every_timestep`` path are shared across
    samples here (they are per-sample under vmap) — callers on that path
    with dropout > 0 use the vmap fallback (train/steps.py selects it).

    ``user_noises`` (optional ``[K, S, N, nd]``) replaces the internal
    draws — same seam as ``generator_sample(user_noise=...)``, used by the
    bf16 probe decode (train/steps.py) to keep the noise DRAWN in f32 (and
    bit-shared with the f32 re-decode) while the decode itself runs in a
    lower precision.
    """
    K = keys.shape[0]
    S, N = valid.shape
    end_pos = obs[:, :, -1, :]
    last_rel = obs_rel[:, :, -1, :]
    nd = cfg.noise_first_dim

    def mk_h(key, z_user):
        k_noise, _, _, k_dec = jax.random.split(key, 4)
        if nd:
            if z_user is not None:
                z = z_user.astype(noise_input.dtype)
            elif cfg.noise_mix_type == "global":
                z = get_noise(k_noise, (S, nd), cfg.noise_type,
                              noise_input.dtype)
                z = jnp.broadcast_to(z[:, None, :], (S, N, nd))
            else:
                z = get_noise(k_noise, (S, N, nd), cfg.noise_type,
                              noise_input.dtype)
            return jnp.concatenate([noise_input, z], axis=-1), k_dec
        return noise_input, k_dec

    if user_noises is None:
        decoder_h, k_decs = jax.vmap(lambda k: mk_h(k, None))(keys)
    else:
        decoder_h, k_decs = jax.vmap(mk_h)(keys, user_noises)  # [K, S, N, H]
    tile = lambda a: jnp.broadcast_to(
        a[None], (K,) + a.shape).reshape((K * a.shape[0],) + a.shape[1:])
    pred = _decode(params["decoder"], cfg,
                   decoder_h.reshape(K * S, N, -1), tile(end_pos),
                   tile(last_rel), tile(group_end), tile(valid),
                   k_decs[0], train, impl)
    return pred.reshape(K, S, N, cfg.pred_len, 2)


def sample_noises(cfg: ModelConfig, keys: jax.Array, S: int, N: int,
                  dtype) -> Optional[jnp.ndarray]:
    """The noise tensors all K best-of-k samples would draw -> [K, S, N, nd]
    (None when noise_dim is 0). Bit-identical to the draws inside
    :func:`generator_sample` / :func:`generator_sample_many` (same key
    split layout), so a caller can decode any sample later by passing the
    gathered row as ``user_noise`` — the seam the sparse best-of-k backward
    uses (train/steps.py)."""
    nd = cfg.noise_first_dim
    if not nd:
        return None

    def draw(key):
        k_noise = jax.random.split(key, 4)[0]
        if cfg.noise_mix_type == "global":
            z = get_noise(k_noise, (S, nd), cfg.noise_type, dtype)
            return jnp.broadcast_to(z[:, None, :], (S, N, nd))
        return get_noise(k_noise, (S, N, nd), cfg.noise_type, dtype)

    return jax.vmap(draw)(keys)


def generator_forward(
    params: dict,
    cfg: ModelConfig,
    obs: jnp.ndarray,          # [S, N, To, 2] absolute
    obs_rel: jnp.ndarray,      # [S, N, To, 2]
    group_end: jnp.ndarray,    # [S, N] group label at t_obs
    valid: jnp.ndarray,        # [S, N]
    key: Optional[jax.Array] = None,
    user_noise: Optional[jnp.ndarray] = None,
    train: bool = True,
    impl: str = "scan",
) -> jnp.ndarray:
    """One stochastic forward pass -> pred_traj_rel [S, N, Tp, 2].

    Mirrors reference ``TrajectoryGenerator.forward`` (models.py:862-927):
    encode rel obs → pool on end positions → graph module on (h ‖ pool) with
    the group labels → concat per-scene noise → decode autoregressively.
    Composed from :func:`generator_context` + :func:`generator_sample` (the
    same key drives both, preserving the original key-split layout).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    noise_input = generator_context(params, cfg, obs, obs_rel, group_end,
                                    valid, key, train, impl)
    return generator_sample(params, cfg, noise_input, obs, obs_rel,
                            group_end, valid, key, user_noise, train, impl)


def _decode(dec: dict, cfg: ModelConfig, h0: jnp.ndarray, last_pos,
            last_pos_rel, group_end, valid, key, train, impl) -> jnp.ndarray:
    """Autoregressive decoder (reference Decoder, models.py:95-178).

    Without per-step re-pooling (the reference default and every shipped
    checkpoint) the step is a pure linear-recurrence LSTM and runs through
    :func:`_decode_folded` — one matmul of sequential depth per step instead
    of three. With ``pool_every_timestep`` the pooling breaks the algebra and
    the step-wise scan below runs instead: carry (h, c, pos, rel); step:
    embed rel → LSTM cell → hidden2pos → new rel; re-pooling mixes the pool
    vector back into h through an MLP.
    """
    if not cfg.pool_every_timestep:
        return _decode_folded(dec, cfg, h0, last_pos_rel, valid, impl)
    S, N, H = h0.shape
    flat = lambda a: a.reshape(S * N, *a.shape[3:]) if a.ndim > 3 else (
        a.reshape(S * N, *a.shape[2:]))
    h = h0.reshape(S * N, H)
    c = jnp.zeros_like(h)
    keys = jax.random.split(key, cfg.pred_len)

    def step(carry, k):
        h, c, pos, rel = carry
        inp = linear(dec["spatial_embedding"], rel)
        h, c = lstm_cell(dec["lstm"], inp, h, c)
        new_rel = linear(dec["hidden2pos"], h)
        new_pos = pos + new_rel
        if cfg.pool_every_timestep:
            k_p, k_m = jax.random.split(k)
            hs = h.reshape(S, N, H)
            pool_h = _pool(dec["pool_net"], cfg, hs,
                           new_pos.reshape(S, N, 2),
                           new_rel.reshape(S, N, 2), group_end, valid,
                           "decoder", k_p, train)
            mixed = mlp_forward(
                dec["mlp"], jnp.concatenate([hs, pool_h], axis=-1),
                cfg.activation, cfg.batch_norm, cfg.dropout, k_m,
                mask=valid, train=train)
            h = mixed.reshape(S * N, H)
        return (h, c, new_pos, new_rel), new_rel

    init = (h, c, flat(last_pos), flat(last_pos_rel))
    from grouptraj.ops.lstm import scan_unroll
    _, rels = jax.lax.scan(step, init, keys,
                           unroll=scan_unroll())              # [Tp, S*N, 2]
    pred_rel = jnp.moveaxis(rels, 0, 1).reshape(S, N, cfg.pred_len, 2)
    return pred_rel * valid[..., None, None]


def _decode_folded(dec: dict, cfg: ModelConfig, h0: jnp.ndarray,
                   last_pos_rel, valid, impl) -> jnp.ndarray:
    """Sequential-depth-collapsed decoder (exact algebra, TPU hot path).

    The reference decoder step (models.py:157-175, no per-step pooling) is
    three chained linear maps around the gate nonlinearity:

        inp_t   = rel_{t-1} @ W_e + b_e            (spatial_embedding)
        gates_t = inp_t @ W_ih + h_{t-1} @ W_hh + b_ih + b_hh
        rel_t   = h_t @ W_p + b_p                  (hidden2pos)

    and rel_{t-1} for t ≥ 2 is itself an affine map of h_{t-1}, so the whole
    step collapses to ONE matmul of sequential depth:

        gates_t = h_{t-1} @ W_eff + b_eff
        W_eff   = W_hh + W_p W_e W_ih
        b_eff   = (b_p W_e + b_e) W_ih + b_ih + b_hh

    (composition computed fresh each call, so autodiff reaches the original
    parameters). Step 1 uses the observed last relative displacement; the
    rels are recovered from the stacked hidden states with ONE batched
    matmul after the recurrence. This cuts the decoder's sequential depth
    from 3 matmuls + 2 affine maps per step to 1 matmul per step — the
    ~3 %-MXU sequential-small-op bound named in ARCHITECTURE.md.
    """
    S, N, H = h0.shape
    B = S * N
    T = cfg.pred_len
    w_e, b_e = dec["spatial_embedding"]["w"], dec["spatial_embedding"]["b"]
    w_p, b_p = dec["hidden2pos"]["w"], dec["hidden2pos"]["b"]
    lstm = dec["lstm"]
    w_r = w_e @ lstm["w_ih"]                             # [2, 4H]
    b_1 = b_e @ lstm["w_ih"] + lstm["b_ih"] + lstm["b_hh"]
    w_eff = lstm["w_hh"] + w_p @ w_r                     # [H, 4H]
    b_eff = b_p @ w_r + b_1

    h = h0.reshape(B, H)
    rel0 = last_pos_rel.reshape(B, 2)
    # first step as a custom_vmap'd op (ops/lstm.py decoder_first_step):
    # under the multi-seed vmap its batched dots were the next superlinear
    # group after the recurrence fix — same algebra, replica-unrolled
    h1, c1, rel1 = decoder_first_step(w_r, b_1, lstm["w_hh"], w_p, b_p,
                                      rel0, h)
    # project each part to rel-space BEFORE concatenating: the concat (and
    # its backward split) then moves [T, B, 2] instead of a [T, B, H] slab —
    # at the g-step's [k·S·N] batch the H-wide concat/split was ~0.35 ms/iter
    # of pure HBM traffic (tools/profile_step.py `split` op)
    rel1 = rel1[None]                                    # [1, B, 2]
    if T > 1:
        if impl == "fused" and jax.default_backend() == "tpu":
            from grouptraj.ops.pallas_fused import decoder_recurrence_pallas
            ys = decoder_recurrence_pallas(w_eff, b_eff, h1, c1, T - 1)
            rest = ys @ w_p + b_p
        else:
            # hidden2pos folded INTO the recurrence: the scan emits [B, 2]
            # rel-coords per step instead of the [B, H] hidden slab whose
            # only consumer was this projection (ops/lstm.py
            # decoder_proj_recurrence — the round-4 profiled fix for the
            # multi-seed superlinear emission/cotangent ops)
            from grouptraj.ops.lstm import decoder_proj_recurrence
            rest = decoder_proj_recurrence(w_eff, b_eff, w_p, b_p, h1, c1,
                                           T - 1)
        rels = jnp.concatenate([rel1, rest], axis=0)     # [T, B, 2]
    else:
        rels = rel1
    pred_rel = jnp.moveaxis(rels, 0, 1).reshape(S, N, T, 2)
    return pred_rel * valid[..., None, None]
