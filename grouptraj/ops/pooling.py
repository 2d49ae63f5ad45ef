"""PoolHiddenNet social pooling as one masked dense batched op.

Reference semantics (``sgan/models.py:458-549``): per scene, for each
pedestrian i, pool over ALL pedestrians j (including i) of
``mlp(embed(p_j − p_i) ‖ h_j)`` with an elementwise max. The reference loops
scenes in Python and materializes ``[N², 48]``; here the whole batch is one
``[S, N, N, E+H]`` tensor -> MLP -> masked max over j. The pre-pool MLP's
hidden width 512 is hardcoded as in the reference (``models.py:473``), and —
because make_mlp activates after every Linear — its output is post-ReLU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from grouptraj.ops.linear import init_linear, init_mlp, linear, mlp_forward

_NEG = -1e9  # mask value for the max (forward-exact for post-ReLU features)


def init_pool_hidden_net(key: jax.Array, embedding_dim: int, h_dim: int,
                         bottleneck_dim: int, batch_norm: bool = False,
                         dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "spatial_embedding": init_linear(k1, 2, embedding_dim, dtype),
        "mlp_pre_pool": init_mlp(
            k2, [embedding_dim + h_dim, 512, bottleneck_dim], batch_norm,
            dtype),
    }


def pool_hidden_net(params: dict, h: jnp.ndarray, end_pos: jnp.ndarray,
                    valid: jnp.ndarray, activation: str = "relu",
                    batch_norm: bool = False, dropout: float = 0.0,
                    key: Optional[jax.Array] = None,
                    train: bool = True) -> jnp.ndarray:
    """- h: [S, N, H] hidden states
    - end_pos: [S, N, 2] pooling anchor positions
    - valid: [S, N] {0,1}
    Returns pool_h [S, N, bottleneck] (zeros at invalid i).
    """
    rel = end_pos[:, None, :, :] - end_pos[:, :, None, :]   # [S, i, j, 2] = p_j − p_i
    rel_emb = linear(params["spatial_embedding"], rel)       # [S, N, N, E]
    hj = jnp.broadcast_to(h[:, None, :, :], rel_emb.shape[:3] + h.shape[-1:])
    feat = jnp.concatenate([rel_emb, hj], axis=-1)           # [S, N, N, E+H]
    pair_mask = (valid[:, :, None] * valid[:, None, :])
    feat = mlp_forward(params["mlp_pre_pool"], feat, activation, batch_norm,
                       dropout, key, mask=pair_mask, train=train)
    feat = jnp.where(pair_mask[..., None] > 0, feat, _NEG)
    pooled = jnp.max(feat, axis=2)                            # max over j
    return jnp.where(valid[..., None] > 0, pooled, 0.0)
