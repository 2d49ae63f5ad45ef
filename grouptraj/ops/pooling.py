"""PoolHiddenNet social pooling as one masked dense batched op.

Reference semantics (``sgan/models.py:458-549``): per scene, for each
pedestrian i, pool over ALL pedestrians j (including i) of
``mlp(embed(p_j − p_i) ‖ h_j)`` with an elementwise max. The reference loops
scenes in Python and materializes ``[N², 48]``; here the whole batch is one
``[S, N, N, E+H]`` tensor -> MLP -> masked max over j. The pre-pool MLP's
hidden width 512 is hardcoded as in the reference (``models.py:473``), and —
because make_mlp activates after every Linear — its output is post-ReLU.

Round-3 profiling (tools/profile_step.py) showed this op is the training
step's #1 cost: the pair tensors ``[S, N, N, 512]`` are ~0.5 GB of HBM
traffic per materialization and dominate the fwd AND bwd of both training
legs (~57% of device time at the widest bucket). Two escalating fixes, both
exact on the reference semantics:

1. **Decomposition** (``_pool_fast``): every map before the first ReLU is
   affine, so with ``u = p @ (We W1e)`` and
   ``a_j = u_j + h_j @ W1h + (be W1e + b1)`` the first MLP layer is
   ``z_ij = a_j − u_i`` — the N²-pair ``[.., 48] @ [48, 512]`` matmul
   disappears entirely (two [S, N, 512] matmuls replace it) and only the
   elementwise part + the 512→bottleneck contraction stay N².
2. **Fused Pallas kernel** (``grouptraj.ops.pallas_pool``): computes
   ``max_j(mask(relu(relu(a_j − u_i) @ W2 + b2)))`` tile-by-tile in VMEM so
   no ``[S, N, N, ·]`` tensor ever reaches HBM, with a custom-VJP backward
   that recomputes tiles and accumulates (da, du, dW2, db2) in VMEM.

The decomposed path is used whenever the quirk-free conditions hold
(relu activation, no batch_norm, dropout inactive, the reference's 2-layer
pre-pool MLP); the pair path remains for the general case and as the
parity oracle. Numerics: the decomposition regroups float ops, so results
match the pair path to f32 rounding (tested), not bit-exactly.
"""

from __future__ import annotations

import os
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


def _select_pool_impl() -> str:
    """'pair' | 'fast' | 'pallas' | 'auto' (env GROUPTRAJ_POOL_IMPL;
    read at trace time so tests/benchmarks can flip it after import)."""
    return os.environ.get("GROUPTRAJ_POOL_IMPL", "auto")


def pool_hidden_net(params: dict, h: jnp.ndarray, end_pos: jnp.ndarray,
                    valid: jnp.ndarray, activation: str = "relu",
                    batch_norm: bool = False, dropout: float = 0.0,
                    key: Optional[jax.Array] = None,
                    train: bool = True, impl: Optional[str] = None
                    ) -> jnp.ndarray:
    """- h: [S, N, H] hidden states
    - end_pos: [S, N, 2] pooling anchor positions
    - valid: [S, N] {0,1}
    Returns pool_h [S, N, bottleneck] (zeros at invalid i).
    """
    if impl in (None, "auto"):
        impl = _select_pool_impl()
    decomposable = (
        impl != "pair"
        and activation == "relu" and not batch_norm
        and (dropout == 0 or not train)
        and len(params["mlp_pre_pool"]["layers"]) == 2)
    if decomposable:
        return _pool_fast(params, h, end_pos, valid, impl)
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


def _use_pallas_pool(impl: str, S: int, N: int) -> bool:
    """The measured 'auto' rule (see the threshold comment in
    :func:`_pool_fast`); pinned by tests/test_pallas_pool.py."""
    if impl == "pallas":
        return True
    return (impl == "auto" and jax.default_backend() != "cpu"
            and N <= 128 and S * N * N >= 100_000)


def _pool_fast(params: dict, h: jnp.ndarray, end_pos: jnp.ndarray,
               valid: jnp.ndarray, impl: str) -> jnp.ndarray:
    """Decomposed PoolHiddenNet (module docstring, fix 1): per-ped
    ``a``/``u`` feed the N²-only core ``max_j(relu(relu(a_j − u_i)@W2+b2))``.
    """
    We = params["spatial_embedding"]["w"]                     # [2, E]
    be = params["spatial_embedding"]["b"]                     # [E]
    l1, l2 = params["mlp_pre_pool"]["layers"]
    W1 = l1["linear"]["w"]                                    # [E+H, 512]
    b1 = l1["linear"]["b"]
    W2 = l2["linear"]["w"]                                    # [512, B]
    b2 = l2["linear"]["b"]
    E = We.shape[1]
    u = end_pos @ (We @ W1[:E])                               # [S, N, 512]
    a = u + h @ W1[E:] + (be @ W1[:E] + b1)                   # [S, N, 512]
    # 'auto' picks by per-call pair volume S·N² (tools/pool_bench.py, v5e
    # fwd+bwd): below ~1e5 pairs XLA keeps the whole pair slab in
    # registers/fused and wins 2-3x (N=8: 0.027 vs 0.049 ms at S=64; N=16:
    # 0.076 vs 0.119), above it XLA goes HBM-bound on the [S,N,N,512] slab
    # and the VMEM-tiled kernel wins (N=32/S=128: 0.447 vs 0.950; N=64/
    # S=64: 0.618 vs 1.754). The S=64/128 x N=8..64 grid all lands on the
    # 1e5 threshold. Under the multi-seed vmap the rule sees the
    # UNBATCHED shape — also measured correct there (the XLA path batches
    # linearly; the kernel's replica fold only pays at wide buckets).
    S, N = a.shape[0], a.shape[1]
    if _use_pallas_pool(impl, S, N):
        from grouptraj.ops.pallas_pool import pool_core_pallas
        pooled = pool_core_pallas(a, u, W2, b2, valid)
    else:
        pooled = pool_core(a, u, W2, b2, valid)
    return jnp.where(valid[..., None] > 0, pooled, 0.0)


def pool_core(a: jnp.ndarray, u: jnp.ndarray, W2: jnp.ndarray,
              b2: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """N²-pair core of the decomposed pool, plain XLA:
    ``max_j(mask_j(relu(relu(a_j − u_i) @ W2 + b2)))`` -> [S, N, B]
    (rows at invalid i are the masked max of _NEG — callers re-mask)."""
    z = a[:, None, :, :] - u[:, :, None, :]                   # [S, i, j, 512]
    out = jax.nn.relu(jax.nn.relu(z) @ W2 + b2)               # [S, i, j, B]
    out = jnp.where(valid[:, None, :, None] > 0, out, _NEG)   # mask invalid j
    return jnp.max(out, axis=2)
