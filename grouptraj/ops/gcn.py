"""Dense GCN layers batched over scenes (reference ``sgan/models.py:552-580``).

``H ← relu(A @ H @ W_i)`` per layer with standard-normal initialized weights
(the reference uses raw ``torch.randn`` ParameterList entries,
``models.py:564-571`` — preserved for checkpoint-era parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_gcn(key: jax.Array, input_dim: int, hidden_dim: int, out_dim: int,
             gcn_layers: int = 2, dtype=jnp.float32) -> dict:
    dims = ([input_dim] + [hidden_dim] * (gcn_layers - 1) + [out_dim]
            if gcn_layers > 1 else [input_dim, out_dim])
    keys = jax.random.split(key, gcn_layers)
    return {"W": [jax.random.normal(k, (d_in, d_out), dtype)
                  for k, (d_in, d_out) in zip(keys, zip(dims[:-1], dims[1:]))]}


def gcn(params: dict, adj: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """- adj: [S, N, N] (already normalized, rows of padding are zero)
    - x: [S, N, F]
    """
    h = x
    for w in params["W"]:
        h = jax.nn.relu(adj @ h @ w)
    return h
