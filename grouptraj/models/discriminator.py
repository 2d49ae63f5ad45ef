"""TrajectoryDiscriminator (reference ``sgan/models.py:930-991``), dense.

LSTM-encodes the full (obs+pred) relative trajectory; for ``d_type='global'``
pools with PoolHiddenNet keyed on the trajectory START position (reference
``models.py:986-989``, with the pool bottleneck = h_dim); classifies with an
MLP whose trailing ReLU (make_mlp quirk) is preserved — scores are ≥ 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from grouptraj.config import ModelConfig
from grouptraj.models.generator import _encode
from grouptraj.ops.linear import init_linear, init_mlp, mlp_forward
from grouptraj.ops.lstm import init_lstm
from grouptraj.ops.pooling import init_pool_hidden_net, pool_hidden_net


def init_discriminator(key: jax.Array, cfg: ModelConfig,
                       dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, 4)
    h = cfg.encoder_h_dim_d
    params = {
        "encoder": {
            "spatial_embedding": init_linear(keys[0], 2, cfg.embedding_dim,
                                             dtype),
            "lstm": init_lstm(keys[1], cfg.embedding_dim, h, dtype),
        },
        "real_classifier": init_mlp(keys[2], [h, cfg.mlp_dim, 1],
                                    cfg.batch_norm, dtype),
    }
    if cfg.d_type == "global":
        params["pool_net"] = init_pool_hidden_net(
            keys[3], cfg.embedding_dim, h, h, cfg.batch_norm, dtype)
    return params


def discriminator_forward(
    params: dict,
    cfg: ModelConfig,
    traj: jnp.ndarray,       # [S, N, To+Tp, 2] absolute
    traj_rel: jnp.ndarray,   # [S, N, To+Tp, 2]
    valid: jnp.ndarray,      # [S, N]
    key: Optional[jax.Array] = None,
    train: bool = True,
    impl: str = "scan",
) -> jnp.ndarray:
    """Returns real/fake scores [S, N] (masked entries scored but invalid —
    callers reduce with the validity mask)."""
    k_pool = k_cls = None
    if key is not None:
        k_pool, k_cls = jax.random.split(key)
    final_h = _encode(params["encoder"], traj_rel, impl)      # [S, N, Hd]
    if cfg.d_type == "global":
        start_pos = traj[:, :, 0, :]
        classifier_input = pool_hidden_net(
            params["pool_net"], final_h, start_pos, valid, cfg.activation,
            cfg.batch_norm, cfg.dropout, k_pool, train,
            impl=cfg.pool_impl)
    else:
        classifier_input = final_h
    scores = mlp_forward(params["real_classifier"], classifier_input,
                         cfg.activation, cfg.batch_norm, cfg.dropout, k_cls,
                         mask=valid, train=train)
    return scores[..., 0]
