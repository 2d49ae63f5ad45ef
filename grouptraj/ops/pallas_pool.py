"""Fused Pallas TPU kernel for the PoolHiddenNet pair core.

The decomposed PoolHiddenNet (``grouptraj.ops.pooling``, round-3 profiling
notes there; reference semantics ``sgan/models.py:458-549``) reduces social
pooling to the N²-pair core

    pool[s, i] = max_j  mask_j( relu( relu(a[s, j] − u[s, i]) @ W2 + b2 ) )

with per-ped ``a``/``u`` of width 512 (the reference's hardcoded pre-pool
hidden). Plain XLA still materializes the ``[S, N, N, 512]`` pair tensor in
HBM for the 512→bottleneck contraction — ~0.5 GB of traffic per call at the
widest training bucket, the measured #1 cost of the training step
(tools/profile_step.py). This kernel computes the core tile-by-tile in VMEM
so no N² tensor ever reaches HBM:

- grid ``(S, N/TI)`` with the i-tile axis minor: the per-scene ``a`` and
  ``valid`` blocks keep the same block index across consecutive grid steps,
  so Mosaic leaves them resident instead of re-fetching;
- forward: ``z = a[None, :, :] − u[:, None, :]`` → relu → one
  ``[TI·N, 512] @ [512, Bp]`` MXU contraction → +b2 → relu → mask invalid
  j with −1e9 → max over j → ``[TI, Bp]`` written out. The bottleneck is
  padded to the 128-lane tile (Bp = 128) and sliced outside;
- backward (``custom_vjp``): recomputes the tile (same op sequence as the
  forward, so the max-equality test is deterministic), routes the pool
  cotangent through the max exactly like XLA's reduce-max VJP (even split
  among ties: ``eq / cnt``), and accumulates ``da`` per scene and
  ``dW2``/``db2`` across the whole grid in revisited output blocks
  (initialized at the first visit, ``+=`` after).

Gradient summation ORDER differs from XLA autodiff (per-tile accumulation),
so weight grads match to f32 tolerance, not bit-exactly (tested vs autodiff
of the XLA core in tests/test_pallas_pool.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grouptraj.utils import round_up

_NEG = -1e9
_LANES = 128     # bottleneck padded to one lane tile


def _tile_rows(Np: int) -> int:
    """i-rows per grid step: 16 when the four [TI, N, 512] f32 tile
    temporaries of the backward stay ≲8 MB VMEM, else the minimum 8."""
    return 16 if Np <= 64 else 8


def _use_bf16() -> bool:
    """Match the session matmul precision: bf16 MXU passes (f32
    accumulate) under the JAX default — exactly what the XLA pair/core
    paths do — and full f32 when tests set jax_default_matmul_precision
    to float32/highest."""
    prec = jax.config.jax_default_matmul_precision
    return prec in (None, "default", "bfloat16", "fastest", "tensorfloat32")


def _cast(x, bf16):
    return x.astype(jnp.bfloat16) if bf16 else x


def _dot(x, y, bf16):
    """[M, K] @ [K, N] (contract x dim 1 with y dim 0), f32 accumulate."""
    return jax.lax.dot_general(_cast(x, bf16), _cast(y, bf16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(x, y, bf16):
    """xᵀ @ y as dot_general (no in-kernel transposes — Mosaic hangs)."""
    return jax.lax.dot_general(_cast(x, bf16), _cast(y, bf16),
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(x, y, bf16):
    """x @ yᵀ as dot_general."""
    return jax.lax.dot_general(_cast(x, bf16), _cast(y, bf16),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _tile_forward(a, u_t, W2, b2, valid, TI, N, K, bf16):
    """The pair core for one i-tile: returns (z, h1, o_masked) with
    z [TI, N, K], o_masked [TI, N, _LANES]."""
    z = a[None, :, :] - u_t[:, None, :]                     # [TI, N, K]
    h1 = jax.nn.relu(z)
    q = _dot(h1.reshape(TI * N, K), W2, bf16) + b2          # [TI·N, Bp]
    o = jax.nn.relu(q).reshape(TI, N, _LANES)
    o = jnp.where(valid[None, :, None] > 0, o, _NEG)        # mask invalid j
    return z, h1, o


def _fwd_kernel(a_ref, u_ref, W2_ref, b2_ref, valid_ref, out_ref,
                *, TI, N, K, bf16):
    _, _, o = _tile_forward(a_ref[0], u_ref[0], W2_ref[:], b2_ref[0],
                            valid_ref[0, 0], TI, N, K, bf16)
    out_ref[0] = jnp.max(o, axis=1)                         # [TI, Bp]


def _bwd_kernel(a_ref, u_ref, W2_ref, b2_ref, valid_ref, pool_ref, dpool_ref,
                da_ref, du_ref, dW2_ref, db2_ref, *, TI, N, K, bf16):
    s = pl.program_id(0)
    t = pl.program_id(1)
    z, h1, o = _tile_forward(a_ref[0], u_ref[0], W2_ref[:], b2_ref[0],
                             valid_ref[0, 0], TI, N, K, bf16)
    # reduce-max VJP: even split among ties (matches jnp.max autodiff)
    eq = (o == pool_ref[0][:, None, :]).astype(jnp.float32)  # [TI, N, Bp]
    cnt = jnp.maximum(jnp.sum(eq, axis=1, keepdims=True), 1.0)
    g = dpool_ref[0][:, None, :] * eq / cnt
    # through the j-mask (where: cotangent only to valid j) and outer relu
    dq = g * valid_ref[0, 0][None, :, None] * (o > 0)        # [TI, N, Bp]
    dq2 = dq.reshape(TI * N, _LANES)
    h1_2 = h1.reshape(TI * N, K)
    dh1 = _dot_nt(dq2, W2_ref[:], bf16)                      # [TI·N, K]
    dz = (dh1.reshape(TI, N, K) * (z > 0))                   # [TI, N, K]

    du_ref[0] = -jnp.sum(dz, axis=1)                         # [TI, K]

    @pl.when(t == 0)
    def _():
        da_ref[0] = jnp.zeros_like(da_ref[0])
    da_ref[0] += jnp.sum(dz, axis=0)                         # [N, K]

    @pl.when(jnp.logical_and(s == 0, t == 0))
    def _():
        dW2_ref[:] = jnp.zeros_like(dW2_ref[:])
        db2_ref[:] = jnp.zeros_like(db2_ref[:])
    dW2_ref[:] += _dot_tn(h1_2, dq2, bf16)                   # [K, Bp]
    db2_ref[0] += jnp.sum(dq2, axis=0)                       # [Bp]


def _pad_args(a, u, W2, b2, valid):
    S, N, K = a.shape
    B = W2.shape[1]
    Np = round_up(max(N, 8), _tile_rows(max(N, 8)))
    padN = lambda x: jnp.pad(x, ((0, 0), (0, Np - N), (0, 0)))
    ap, up = padN(a), padN(u)
    # [S, 1, Np] so the block's trailing dims equal the array dims (Mosaic
    # requires (8, 128)-divisible or whole-axis blocks)
    vp = jnp.pad(valid.astype(jnp.float32),
                 ((0, 0), (0, Np - N)))[:, None, :]
    W2p = jnp.pad(W2, ((0, 0), (0, _LANES - B)))
    b2p = jnp.pad(b2, (0, _LANES - B)).reshape(1, _LANES)
    return ap, up, W2p, b2p, vp, S, Np, K, B


def _specs(S, Np, K):
    TI = _tile_rows(Np)
    nt = Np // TI
    a_spec = pl.BlockSpec((1, Np, K), lambda s, t: (s, 0, 0),
                          memory_space=pltpu.VMEM)
    u_spec = pl.BlockSpec((1, TI, K), lambda s, t: (s, t, 0),
                          memory_space=pltpu.VMEM)
    W2_spec = pl.BlockSpec((K, _LANES), lambda s, t: (0, 0),
                           memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((1, _LANES), lambda s, t: (0, 0),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, 1, Np), lambda s, t: (s, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, TI, _LANES), lambda s, t: (s, t, 0),
                          memory_space=pltpu.VMEM)
    return TI, (S, nt), a_spec, u_spec, W2_spec, b2_spec, v_spec, o_spec


def _core_fwd(a, u, W2, b2, valid):
    ap, up, W2p, b2p, vp, S, Np, K, B = _pad_args(a, u, W2, b2, valid)
    TI, grid, a_s, u_s, W2_s, b2_s, v_s, o_s = _specs(S, Np, K)
    pooled = pl.pallas_call(
        functools.partial(_fwd_kernel, TI=TI, N=Np, K=K, bf16=_use_bf16()),
        grid=grid,
        in_specs=[a_s, u_s, W2_s, b2_s, v_s],
        out_specs=o_s,
        out_shape=jax.ShapeDtypeStruct((S, Np, _LANES), jnp.float32),
    )(ap, up, W2p, b2p, vp)
    return pooled[:, :a.shape[1], :B], pooled


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pool_core_pallas(a, u, W2, b2, valid):
    """Fused pair core: [S,N,K] a/u, [K,B] W2, [B] b2, [S,N] valid ->
    [S,N,B] pooled (invalid-i rows are the masked max — callers re-mask)."""
    out, _ = _core_fwd(a, u, W2, b2, valid)
    return out


def _vjp_fwd(a, u, W2, b2, valid):
    out, pooled_padded = _core_fwd(a, u, W2, b2, valid)
    return out, (a, u, W2, b2, valid, pooled_padded)


def _vjp_bwd(res, dpool):
    a, u, W2, b2, valid, pooled_padded = res
    ap, up, W2p, b2p, vp, S, Np, K, B = _pad_args(a, u, W2, b2, valid)
    N = a.shape[1]
    dpool_p = jnp.pad(dpool, ((0, 0), (0, Np - N), (0, _LANES - B)))
    TI, grid, a_s, u_s, W2_s, b2_s, v_s, o_s = _specs(S, Np, K)
    da_s = pl.BlockSpec((1, Np, K), lambda s, t: (s, 0, 0),
                        memory_space=pltpu.VMEM)
    du_s = pl.BlockSpec((1, TI, K), lambda s, t: (s, t, 0),
                        memory_space=pltpu.VMEM)
    dW2_s = pl.BlockSpec((K, _LANES), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM)
    db2_s = pl.BlockSpec((1, _LANES), lambda s, t: (0, 0),
                         memory_space=pltpu.VMEM)
    da, du, dW2p, db2p = pl.pallas_call(
        functools.partial(_bwd_kernel, TI=TI, N=Np, K=K, bf16=_use_bf16()),
        grid=grid,
        in_specs=[a_s, u_s, W2_s, b2_s, v_s, o_s, o_s],
        out_specs=(da_s, du_s, dW2_s, db2_s),
        out_shape=(
            jax.ShapeDtypeStruct((S, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((S, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((K, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
        ),
    )(ap, up, W2p, b2p, vp, pooled_padded, dpool_p)
    return (da[:, :N, :], du[:, :N, :], dW2p[:, :B], db2p[0, :B], None)


pool_core_pallas.defvjp(_vjp_fwd, _vjp_bwd)
