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


# Active data-parallel mesh for the Pallas pool kernel, set (at trace time)
# by the multi-device trainer/dryrun via set_spmd_mesh(). When set, kernel
# calls go through shard_map over the scene axis (pallas_pool.
# pool_core_pallas_spmd) instead of the bare pallas_call GSPMD can't
# partition — this is what lets multi-chip training keep the flagship
# kernel instead of falling back to the [S,N,N,512] XLA pair slab.
_SPMD_MESH = None


def set_spmd_mesh(mesh, axis: str = "data") -> None:
    """Install (or clear, with mesh=None) the mesh the pool kernel shards
    over. Takes effect at trace time; train()/dryrun set it before jitting
    and clear it after."""
    global _SPMD_MESH
    _SPMD_MESH = None if mesh is None else (mesh, axis)


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
    :func:`_pool_fast`); pinned by tests/test_pallas_pool.py. Under a
    data-parallel mesh the per-CALL volume each device sees is the
    per-shard S — the same crossover applied to S // n_dev."""
    if impl == "pallas":
        return True
    if _SPMD_MESH is not None:
        # size of the NAMED data axis, not the whole device count — the
        # same under the current 1-D mesh, different if a second mesh axis
        # is ever added (ADVICE round 4)
        S = S // _SPMD_MESH[0].shape[_SPMD_MESH[1]]
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
    Wu = We @ W1[:E]                                          # [2, 512]
    cvec = be @ W1[:E] + b1                                   # [512]
    S, N = h.shape[0], h.shape[1]
    use_kernel = _use_pallas_pool(impl, S, N)
    if use_kernel:
        # replica-unrolled precompute: kernel-ready layouts under vmap
        # (see pool_precompute); identical float ops/order to the inline
        # form below
        a, u = pool_precompute(end_pos, h, Wu, W1[E:], cvec)
    else:
        u = end_pos @ Wu                                      # [S, N, 512]
        a = u + h @ W1[E:] + cvec                             # [S, N, 512]
    # 'auto' picks by per-call pair volume S·N² (tools/pool_bench.py, v5e
    # fwd+bwd): below ~1e5 pairs XLA keeps the whole pair slab in
    # registers/fused and wins 2-3x (N=8: 0.027 vs 0.049 ms at S=64; N=16:
    # 0.076 vs 0.119), above it XLA goes HBM-bound on the [S,N,N,512] slab
    # and the VMEM-tiled kernel wins (N=32/S=128: 0.447 vs 0.950; N=64/
    # S=64: 0.618 vs 1.754). The S=64/128 x N=8..64 grid all lands on the
    # 1e5 threshold. Under the multi-seed vmap the rule sees the
    # UNBATCHED shape — also measured correct there (the XLA path batches
    # linearly; the kernel's replica fold only pays at wide buckets).
    if use_kernel:
        if (_SPMD_MESH is not None
                and S % _SPMD_MESH[0].shape[_SPMD_MESH[1]] == 0):
            from grouptraj.ops.pallas_pool import pool_core_pallas_spmd
            pooled = pool_core_pallas_spmd(a, u, W2, b2, valid,
                                           *_SPMD_MESH)
        elif _SPMD_MESH is not None:
            # scene count not divisible by the mesh: the XLA core shards
            # cleanly under GSPMD, the kernel cannot
            pooled = pool_core(a, u, W2, b2, valid)
        else:
            from grouptraj.ops.pallas_pool import pool_core_pallas
            pooled = pool_core_pallas(a, u, W2, b2, valid)
    else:
        pooled = pool_core(a, u, W2, b2, valid)
    return jnp.where(valid[..., None] > 0, pooled, 0.0)


# ---------------------------------------------------------------------------
# Replica-friendly a/u precompute for the kernel path
# ---------------------------------------------------------------------------
#
# Under the multi-seed vmap the two precompute dots (u = p @ Wu,
# a = u + h @ W1h + c) become batched dots whose conv lowering emits
# transposed-layout outputs — and the Pallas kernel's custom-call needs
# default-layout operands, so XLA inserted full-tensor copies (~0.83 ms
# per 8-seed iteration at the d-step's stacked [8,128,64,512] a/u,
# tools/attr_ops.py round 4). Same treatment as ops/lstm.py: custom_vjp
# with custom_vmap rules unrolling the replica axis into flat dots whose
# outputs are already kernel-ready. Used only on the kernel path — the
# XLA core path wants the batched form to fuse into the pair slab.


@jax.custom_vjp
def pool_precompute(p, h, Wu, W1h, cvec):
    """(a, u) for the decomposed pool core: ``u = p @ Wu``,
    ``a = u + h @ W1h + cvec`` — same float ops/order as the inline form."""
    return _ppre_fwd_cv(p, h, Wu, W1h, cvec)[0]


def _ppre_one(p, h, Wu, W1h, cvec):
    u = p @ Wu
    return u + h @ W1h + cvec, u


def _ppre_bwd_one(p, h, Wu, W1h, da, du_ct):
    flat = lambda x: x.reshape(-1, x.shape[-1])
    du = da + du_ct
    dp = jax.lax.dot_general(du, Wu, (((du.ndim - 1,), (1,)), ((), ())))
    dh = jax.lax.dot_general(da, W1h, (((da.ndim - 1,), (1,)), ((), ())))
    dWu = jax.lax.dot_general(flat(p), flat(du), (((0,), (0,)), ((), ())))
    dW1h = jax.lax.dot_general(flat(h), flat(da), (((0,), (0,)), ((), ())))
    dc = jnp.sum(flat(da), axis=0)
    return dp, dh, dWu, dW1h, dc


@jax.custom_batching.custom_vmap
def _ppre_fwd_cv(p, h, Wu, W1h, cvec):
    out = _ppre_one(p, h, Wu, W1h, cvec)
    return out, (p, h, Wu, W1h)


@_ppre_fwd_cv.def_vmap
def _ppre_fwd_rule(axis_size, in_batched, *args):
    from grouptraj.ops.replica_scan import bc_args, vmap_unroll_max
    R = axis_size
    args = bc_args(args, in_batched, R)
    if R > vmap_unroll_max("ppre"):
        # Flattened batched dots instead of jax.vmap(_ppre_one): the naive
        # vmap emits 4-D batched dots ([R,S,N,2]@[R,2,512]) whose TPU
        # lowering picks a {3,1,2,0} output layout, and the Pallas pool
        # custom-call consumers need the default layout — XLA bridged the
        # two with full-slab copies (2 x ~417 us/iter at the d-leg's
        # [8,128,64,512] f32, copy.1399/.1400, round-5 attribution via
        # tools/list_copies.py). Collapsing S,N into one M dim leaves the
        # dot no M-permutation to choose, it emits the default layout, and
        # the reshapes are bitcasts. Same dot_general contraction and add
        # order as _ppre_one -> bitwise-identical values (pinned by
        # tests/test_ops.py::test_ppre_batched_matches_vmap).
        p, h, Wu, W1h, cvec = args
        S, N = p.shape[1], p.shape[2]
        dn = (((2,), (1,)), ((0,), (0,)))
        pf = p.reshape(R, S * N, p.shape[-1])
        hf = h.reshape(R, S * N, h.shape[-1])
        # the adds stay in the flat shape so they output-fuse into the
        # second dot (reshaping between dot and add re-materialized the
        # adds as separate ~0.5-0.6 ms full-slab fusions, measured)
        uf = jax.lax.dot_general(pf, Wu, dn)
        af = uf + jax.lax.dot_general(hf, W1h, dn) + cvec[:, None]
        u = uf.reshape(R, S, N, -1)
        a = af.reshape(R, S, N, -1)
    else:
        # static-offset dynamic_update_slice instead of jnp.stack: XLA
        # output-fuses each per-replica dot into its slab write (the same
        # fusion the lstm rules get), where a concatenate lowered to a
        # separate ~0.4 ms full-slab copy per output at the d-leg's
        # [8, 128, 64, 512] (round-5 profile, copy.2886/.2887)
        outs = [_ppre_one(*[x[r] for x in args]) for r in range(R)]
        a = jnp.zeros((R,) + outs[0][0].shape, outs[0][0].dtype)
        u = jnp.zeros((R,) + outs[0][1].shape, outs[0][1].dtype)
        for r in range(R):
            a = jax.lax.dynamic_update_slice(
                a, outs[r][0][None], (r,) + (0,) * outs[r][0].ndim)
            u = jax.lax.dynamic_update_slice(
                u, outs[r][1][None], (r,) + (0,) * outs[r][1].ndim)
    return ((a, u), tuple(args[:4])), ((True, True), (True,) * 4)


@jax.custom_batching.custom_vmap
def _ppre_bwd_cv(p, h, Wu, W1h, da, du_ct):
    return _ppre_bwd_one(p, h, Wu, W1h, da, du_ct)


@_ppre_bwd_cv.def_vmap
def _ppre_bwd_rule(axis_size, in_batched, *args):
    from grouptraj.ops.replica_scan import bc_args, vmap_unroll_max
    R = axis_size
    args = bc_args(args, in_batched, R)
    if R > vmap_unroll_max("ppre"):
        return jax.vmap(_ppre_bwd_one)(*args), (True,) * 5
    outs = [_ppre_bwd_one(*[x[r] for x in args]) for r in range(R)]

    def slab(i):   # static-DUS assembly, see the fwd rule
        buf = jnp.zeros((R,) + outs[0][i].shape, outs[0][i].dtype)
        for r in range(R):
            buf = jax.lax.dynamic_update_slice(
                buf, outs[r][i][None], (r,) + (0,) * outs[r][i].ndim)
        return buf

    return tuple(slab(i) for i in range(5)), (True,) * 5


pool_precompute.defvjp(
    lambda *a: _ppre_fwd_cv(*a),
    lambda res, cts: _ppre_bwd_cv(*res, *cts))


def pool_core(a: jnp.ndarray, u: jnp.ndarray, W2: jnp.ndarray,
              b2: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """N²-pair core of the decomposed pool, plain XLA:
    ``max_j(mask_j(relu(relu(a_j − u_i) @ W2 + b2)))`` -> [S, N, B]
    (rows at invalid i are the masked max of _NEG — callers re-mask)."""
    z = a[:, None, :, :] - u[:, :, None, :]                   # [S, i, j, 512]
    out = jax.nn.relu(jax.nn.relu(z) @ W2 + b2)               # [S, i, j, B]
    out = jnp.where(valid[:, None, :, None] > 0, out, _NEG)   # mask invalid j
    return jnp.max(out, axis=2)
