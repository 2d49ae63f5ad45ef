"""Fused, size-aware Pallas TPU kernel for the PoolHiddenNet pair core.

The decomposed PoolHiddenNet (``grouptraj.ops.pooling``, round-3 profiling
notes there; reference semantics ``sgan/models.py:458-549``) reduces social
pooling to the N²-pair core

    pool[s, i] = max_j  mask_j( relu( relu(a[s, j] − u[s, i]) @ W2 + b2 ) )

with per-ped ``a``/``u`` of width 512 (the reference's hardcoded pre-pool
hidden). Plain XLA materializes the ``[S, N, N, 512]`` pair tensor in HBM
for the 512→bottleneck contraction — ~0.5 GB of traffic per call at the
widest training bucket, the measured #1 cost of the training step
(tools/profile_step.py). This kernel computes the core tile-by-tile in
VMEM so no N² tensor ever reaches HBM, and skips padding:

- grid ``(S/SB,)`` with SB scenes per grid step (``_scene_block``: ~256
  pedestrian rows per block) and the scene/i-tile loops INSIDE the kernel:
  the first revision used one (scene, i-tile) pair per grid step and was
  grid-step bound — ~0.9 µs/step × 256 steps ≈ its whole 258 µs forward at
  [64, 64, 512] (tools/pool_bench.py), ~7× off the MXU roofline;
- **size-aware bounds**: scene sizes vary 17–64 inside the widest training
  bucket (mean ~29 → ~22% pair fill), so a dense kernel wastes ~4.5× its
  compute on padding. Each scene carries ``n_s = max_j (j+1)·valid_j``
  (exact for any mask pattern — interior invalid j are still masked
  elementwise): i-tiles with ``t·TI ≥ n_s`` skip compute and write zeros,
  and the j axis runs as a ``fori_loop`` over ⌈n_s/TJ⌉ tiles with a
  running masked max;
- forward per (i, j) tile: ``z = a_j[None] − u_i[:, None]`` → relu → one
  ``[TI·TJ, 512] @ [512, 128]`` MXU contraction (bottleneck padded to the
  lane tile and sliced outside) → +b2 → relu → mask → max into the
  accumulator;
- backward (``custom_vjp``): recomputes tiles with the SAME op sequence
  and tiling as the forward, so the max-equality test is deterministic.
  The tie count ``cnt`` (the cotangent must split evenly among ties
  exactly like XLA's reduce-max VJP) is accumulated by the FORWARD as a
  running count alongside the running max and saved as a residual, so the
  backward is a single j-pass: form ``g = dpool·eq/cnt`` and accumulate
  ``da``/``du`` (per scene-block output) and ``dW2``/``db2`` (whole grid,
  revisited block initialized at the first grid step).

Gradient summation ORDER differs from XLA autodiff (per-tile
accumulation), so weight grads match to f32 tolerance, not bit-exactly
(tested vs autodiff of the XLA core in tests/test_pallas_pool.py). Matmul
precision follows the session default: bf16 MXU passes with f32
accumulate (exactly what the XLA paths do), full f32 when
``jax_default_matmul_precision`` asks for it.

**vmap composition (replica axis).** ``pallas_call`` auto-batching emits
illegal Mosaic blocks, so a bare kernel breaks under ``jax.vmap`` — which
is exactly how the multi-seed trainer (train/multi.py) runs every op. The
kernel is therefore replica-aware natively: args carry a leading R axis
([R,S,N,K] a/u, [R,K,B] W2), the scene grid is the flattened R·Sp axis
(per-replica padding keeps scene-blocks inside one replica), and the
weight blocks are indexed ``grid_step // blocks_per_replica`` so each
replica's W2 stays VMEM-resident across its blocks and its dW2/db2
accumulator block flushes exactly once. ``jax.custom_batching.custom_vmap``
rules on the fwd/bwd entries route a vmapped call into that replica axis
(the documented composition: custom_vjp outside, custom_vmap inside —
the vjp rules are never themselves differentiated). The un-vmapped call
is the R=1 case of the same kernel. Measured: the 8-seed vmapped
training chunk was 17.8 ms/seed-iter on the XLA fallback at the widest
zara1 bucket vs 4.32 ms single-seed (this kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.custom_batching
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from grouptraj.utils import round_up


def _interpret() -> bool:
    """Run the kernels in Pallas interpret mode (env
    GROUPTRAJ_PALLAS_INTERPRET=1) — how the CPU-mesh multichip dryrun and
    ad-hoc CPU checks exercise the kernel path without Mosaic."""
    return os.environ.get("GROUPTRAJ_PALLAS_INTERPRET", "0") == "1"

_NEG = -1e9
_LANES = 128     # bottleneck padded to one lane tile


def _tile_rows(N: int) -> int:
    """i/j tile edge: small buckets keep 8 (less padding), wider use 16."""
    return 8 if N <= 16 else 16


def _tile_cols(Np: int, TI: int) -> int:
    """j-tile edge: the widest multiple of TI that divides Np, capped at 32.
    Wider j-tiles mean fewer sequential fori iterations and fatter MXU
    contractions per tile ([TI·TJ, K] @ [K, 128]); the cap keeps the
    [TI, TJ, K] z/h1/dz temporaries (~3 MB f32 at 16×32×512) inside the
    VMEM scratch budget next to the double-buffered blocks."""
    tj = TI
    while tj * 2 <= min(Np, 32) and Np % (tj * 2) == 0:
        tj *= 2
    return tj


def _scene_block(Np: int) -> int:
    """Scenes per grid step. Round-3 microbenchmark (tools/pool_bench.py):
    with one (scene, i-tile) pair per grid step the kernel was grid-step
    bound — ~0.9 µs/step × 256 steps ≈ the whole 258 µs forward at
    [64, 64, 512], ~7× off the MXU roofline. Blocking ~256 pedestrian rows
    of scenes per step (0.5 MB a-slab per ref at K=512; ×2 Mosaic
    double-buffering stays well under the 16 MB VMEM scope) cuts the grid
    to S/SB steps and loops scenes/i-tiles inside the kernel."""
    return max(1, 256 // Np)


def _use_bf16() -> bool:
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


def _jtile_forward(a_ref, valid_ref, u_t, W2, b2, j, *, s, TI, TJ, K, bf16):
    """(z, h1, o_masked) for one (i-tile, j-tile): o [TI, TJ, _LANES]."""
    a_j = a_ref[s, pl.ds(j * TJ, TJ), :]                    # [TJ, K]
    v_j = valid_ref[s, pl.ds(j * TJ, TJ), :]                # [TJ, 1]
    z = a_j[None, :, :] - u_t[:, None, :]                   # [TI, TJ, K]
    h1 = jax.nn.relu(z)
    q = _dot(h1.reshape(TI * TJ, K), W2, bf16) + b2         # [TI·TJ, Bp]
    o = jax.nn.relu(q).reshape(TI, TJ, _LANES)
    o = jnp.where(v_j[None, :, :] > 0, o, _NEG)             # mask invalid j
    return z, h1, o


def _fwd_kernel(n_ref, a_ref, u_ref, W2_ref, b2_ref, valid_ref, out_ref,
                cnt_ref, *, SB, TI, TJ, K, bf16):
    sb0 = pl.program_id(0) * SB
    # weights arrive as ONE replica's (1, K/1, LANES) block — the specs
    # index them by grid_step // blocks_per_replica (replica axis; R=1 for
    # the plain un-vmapped call)
    W2, b2 = W2_ref[0], b2_ref[0, 0]
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    cnt_ref[...] = jnp.zeros(cnt_ref.shape, cnt_ref.dtype)

    for s in range(SB):                                     # unrolled
        ni = n_ref[sb0 + s]
        nit = (ni + TI - 1) // TI
        njt = (ni + TJ - 1) // TJ

        # running (max, tie count): cnt tracks how many j attain the
        # running max, resetting whenever a tile raises it — so at the end
        # it equals the full-extent tie count the reduce-max VJP needs
        # (the backward splits the cotangent evenly among ties, exactly
        # like XLA's jnp.max autodiff). Computing it here costs one
        # elementwise compare/sum per tile; the backward saves a whole
        # recompute pass (incl. its matmul) per tile.
        def ibody(t, _, s=s, njt=njt):
            u_t = u_ref[s, pl.ds(t * TI, TI), :]

            def jbody(j, carry):
                m, c = carry
                _, _, o = _jtile_forward(a_ref, valid_ref, u_t, W2, b2, j,
                                         s=s, TI=TI, TJ=TJ, K=K, bf16=bf16)
                m_new = jnp.maximum(m, jnp.max(o, axis=1))
                keep = (m == m_new).astype(jnp.float32)
                tile_cnt = jnp.sum(
                    (o == m_new[:, None, :]).astype(jnp.float32), axis=1)
                return m_new, c * keep + tile_cnt

            m, c = jax.lax.fori_loop(
                0, njt, jbody,
                (jnp.full((TI, _LANES), _NEG, jnp.float32),
                 jnp.zeros((TI, _LANES), jnp.float32)))
            out_ref[s, pl.ds(t * TI, TI), :] = m
            cnt_ref[s, pl.ds(t * TI, TI), :] = c
            return 0

        jax.lax.fori_loop(0, nit, ibody, 0)


def _bwd_kernel(n_ref, a_ref, u_ref, W2_ref, b2_ref, valid_ref, pool_ref,
                cnt_ref, dpool_ref, da_ref, du_ref, dW2_ref, db2_ref,
                *, SB, TI, TJ, K, GB, bf16):
    sb0 = pl.program_id(0) * SB
    W2, b2 = W2_ref[0], b2_ref[0, 0]
    da_ref[...] = jnp.zeros(da_ref.shape, da_ref.dtype)
    du_ref[...] = jnp.zeros(du_ref.shape, du_ref.dtype)

    # dW2/db2 accumulate across each replica's GB consecutive grid steps
    # (the weight-block index map flips every GB steps, flushing the block)
    @pl.when(pl.program_id(0) % GB == 0)
    def _():
        dW2_ref[...] = jnp.zeros_like(dW2_ref[...])
        db2_ref[...] = jnp.zeros_like(db2_ref[...])

    for s in range(SB):                                     # unrolled
        ni = n_ref[sb0 + s]
        nit = (ni + TI - 1) // TI
        njt = (ni + TJ - 1) // TJ

        def ibody(t, _, s=s, njt=njt):
            u_t = u_ref[s, pl.ds(t * TI, TI), :]
            pool_t = pool_ref[s, pl.ds(t * TI, TI), :]       # [TI, Bp]
            dpool_t = dpool_ref[s, pl.ds(t * TI, TI), :]
            cnt_t = cnt_ref[s, pl.ds(t * TI, TI), :]

            # tie counts were accumulated by the forward (saved residual);
            # the reduce-max VJP splits the cotangent evenly among ties,
            # like jnp.max autodiff
            gd = dpool_t / jnp.maximum(cnt_t, 1.0)           # [TI, Bp]

            # single pass: gradients
            def jbody(j, du_acc):
                z, h1, o = _jtile_forward(a_ref, valid_ref, u_t, W2, b2, j,
                                          s=s, TI=TI, TJ=TJ, K=K, bf16=bf16)
                eq = (o == pool_t[:, None, :]).astype(jnp.float32)
                v_j = valid_ref[s, pl.ds(j * TJ, TJ), :]     # [TJ, 1]
                # where-mask VJP (valid j only) and the outer relu
                dq = gd[:, None, :] * eq * v_j[None, :, :] * (o > 0)
                dq2 = dq.reshape(TI * TJ, _LANES)
                h1_2 = h1.reshape(TI * TJ, K)
                dh1 = _dot_nt(dq2, W2, bf16)                 # [TI·TJ, K]
                dz = dh1.reshape(TI, TJ, K) * (z > 0)
                da_ref[s, pl.ds(j * TJ, TJ), :] += jnp.sum(dz, axis=0)
                dW2_ref[0] += _dot_tn(h1_2, dq2, bf16)
                db2_ref[0, 0] += jnp.sum(dq2, axis=0)
                return du_acc - jnp.sum(dz, axis=1)

            du = jax.lax.fori_loop(
                0, njt, jbody, jnp.zeros((TI, K), jnp.float32))
            du_ref[s, pl.ds(t * TI, TI), :] = du
            return 0

        jax.lax.fori_loop(0, nit, ibody, 0)


def _pad_args(a, u, W2, b2, valid):
    """Pad replica-stacked args to kernel layout.

    - a/u   [R, S, N, K] -> [R·Sp, Np, K]  (per-replica scene padding, so
      scene-blocks never straddle a replica boundary: Sp % SB == 0)
    - valid [R, S, N]    -> [R·Sp, Np, 1]  (N on the SUBLANE axis — the
      kernel j-loop slices valid at dynamic offsets, which Mosaic only
      supports on non-lane dims)
    - W2    [R, K, B]    -> [R, K, LANES];  b2 [R, B] -> [R, 1, LANES]
    - n     [R·Sp] per-scene extents: last valid j + 1 (exact for ANY mask
      pattern — interior invalid j are still masked elementwise in the
      kernel); padded scenes get extent 0 and are skipped entirely.

    The plain (un-vmapped) call is the R = 1 case.
    """
    R, S, N, K = a.shape
    B = W2.shape[-1]
    TI = _tile_rows(N)
    Np = round_up(max(N, TI), TI)
    SB = _scene_block(Np)
    Sp = round_up(S, SB)
    padSN = lambda x: jnp.pad(
        x, ((0, 0), (0, Sp - S), (0, Np - N), (0, 0))).reshape(
            R * Sp, Np, x.shape[-1])
    ap, up = padSN(a), padSN(u)
    vf = valid.astype(jnp.float32)
    vp = padSN(vf[..., None])
    n = jnp.max(jnp.arange(1, N + 1, dtype=jnp.int32)[None, None, :]
                * vf.astype(jnp.int32), axis=2)              # [R, S]
    n = jnp.pad(n, ((0, 0), (0, Sp - S))).reshape(R * Sp)
    W2p = jnp.pad(W2, ((0, 0), (0, 0), (0, _LANES - B)))
    b2p = jnp.pad(b2, ((0, 0), (0, _LANES - B))).reshape(R, 1, _LANES)
    return ap, up, W2p, b2p, vp, n, R, Sp, Np, K, B


def _specs(R, Sp, Np, K):
    TI = _tile_rows(Np)
    SB = _scene_block(Np)
    GB = Sp // SB                        # grid steps per replica
    a_spec = pl.BlockSpec((SB, Np, K), lambda g, n: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    # weight blocks are indexed by REPLICA: the index map advances every GB
    # grid steps, so one replica's weights stay VMEM-resident across all of
    # its scene-blocks (and its dW2/db2 output block flushes exactly once)
    W2_spec = pl.BlockSpec((1, K, _LANES), lambda g, n: (g // GB, 0, 0),
                           memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((1, 1, _LANES), lambda g, n: (g // GB, 0, 0),
                           memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((SB, Np, 1), lambda g, n: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((SB, Np, _LANES), lambda g, n: (g, 0, 0),
                          memory_space=pltpu.VMEM)
    return TI, SB, GB, (R * GB,), a_spec, W2_spec, b2_spec, v_spec, o_spec


def _core_fwd(a, u, W2, b2, valid):
    """Replica-stacked forward: [R,S,N,·] in, ([R,S,N,B] out, padded
    pooled/cnt residuals [R, Sp, Np, LANES])."""
    R, S, N = a.shape[:3]
    ap, up, W2p, b2p, vp, n, R, Sp, Np, K, B = _pad_args(a, u, W2, b2, valid)
    TI, SB, GB, grid, a_s, W2_s, b2_s, v_s, o_s = _specs(R, Sp, Np, K)
    pooled, cnt = pl.pallas_call(
        functools.partial(_fwd_kernel, SB=SB, TI=TI, TJ=_tile_cols(Np, TI),
                          K=K, bf16=_use_bf16()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[a_s, a_s, W2_s, b2_s, v_s],
            out_specs=(o_s, o_s)),
        out_shape=(jax.ShapeDtypeStruct((R * Sp, Np, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((R * Sp, Np, _LANES), jnp.float32)),
        interpret=_interpret(),
    )(n, ap, up, W2p, b2p, vp)
    pooled = pooled.reshape(R, Sp, Np, _LANES)
    cnt = cnt.reshape(R, Sp, Np, _LANES)
    return pooled[:, :S, :N, :B], pooled, cnt


def _core_bwd(a, u, W2, b2, valid, pooled_padded, cnt, dpool):
    """Replica-stacked backward; residuals come padded from _core_fwd."""
    R, S, N = a.shape[:3]
    ap, up, W2p, b2p, vp, n, R, Sp, Np, K, B = _pad_args(a, u, W2, b2, valid)
    dpool_p = jnp.pad(dpool, ((0, 0), (0, Sp - S), (0, Np - N),
                              (0, _LANES - B))).reshape(R * Sp, Np, _LANES)
    TI, SB, GB, grid, a_s, W2_s, b2_s, v_s, o_s = _specs(R, Sp, Np, K)
    dW2_s = pl.BlockSpec((1, K, _LANES), lambda g, n: (g // GB, 0, 0),
                         memory_space=pltpu.VMEM)
    db2_s = pl.BlockSpec((1, 1, _LANES), lambda g, n: (g // GB, 0, 0),
                         memory_space=pltpu.VMEM)
    da, du, dW2p, db2p = pl.pallas_call(
        functools.partial(_bwd_kernel, SB=SB, TI=TI, TJ=_tile_cols(Np, TI),
                          K=K, GB=GB, bf16=_use_bf16()),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[a_s, a_s, W2_s, b2_s, v_s, o_s, o_s, o_s],
            out_specs=(a_s, a_s, dW2_s, db2_s)),
        out_shape=(
            jax.ShapeDtypeStruct((R * Sp, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((R * Sp, Np, K), jnp.float32),
            jax.ShapeDtypeStruct((R, K, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((R, 1, _LANES), jnp.float32),
        ),
        interpret=_interpret(),
    )(n, ap, up, W2p, b2p, vp,
      pooled_padded.reshape(R * Sp, Np, _LANES),
      cnt.reshape(R * Sp, Np, _LANES), dpool_p)
    da = da.reshape(R, Sp, Np, K)[:, :S, :N, :]
    du = du.reshape(R, Sp, Np, K)[:, :S, :N, :]
    return da, du, dW2p[:, :, :B], db2p[:, 0, :B]


def _bc(x, batched, R):
    """Broadcast an un-batched arg to the replica axis (custom_vmap rules
    receive batched args with the axis moved to dim 0)."""
    return x if batched else jnp.broadcast_to(x[None], (R,) + x.shape)


@jax.custom_batching.custom_vmap
def _core_fwd_cv(a, u, W2, b2, valid):
    out, pooled, cnt = _core_fwd(a[None], u[None], W2[None], b2[None],
                                 valid[None])
    return out[0], pooled[0], cnt[0]


@_core_fwd_cv.def_vmap
def _core_fwd_vmap(axis_size, in_batched, a, u, W2, b2, valid):
    ab, ub, wb, bb, vb = in_batched
    out, pooled, cnt = _core_fwd(
        _bc(a, ab, axis_size), _bc(u, ub, axis_size),
        _bc(W2, wb, axis_size), _bc(b2, bb, axis_size),
        _bc(valid, vb, axis_size))
    return (out, pooled, cnt), (True, True, True)


@jax.custom_batching.custom_vmap
def _core_bwd_cv(a, u, W2, b2, valid, pooled_padded, cnt, dpool):
    r = _core_bwd(a[None], u[None], W2[None], b2[None], valid[None],
                  pooled_padded[None], cnt[None], dpool[None])
    return tuple(x[0] for x in r)


@_core_bwd_cv.def_vmap
def _core_bwd_vmap(axis_size, in_batched, a, u, W2, b2, valid,
                   pooled_padded, cnt, dpool):
    args = [_bc(x, b, axis_size) for x, b in
            zip((a, u, W2, b2, valid, pooled_padded, cnt, dpool),
                in_batched)]
    return _core_bwd(*args), (True, True, True, True)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pool_core_pallas(a, u, W2, b2, valid):
    """Fused pair core: [S,N,K] a/u, [K,B] W2, [B] b2, [S,N] valid ->
    [S,N,B] pooled. Invalid-i rows are UNDEFINED (zero only when their
    whole i-tile is skipped; inside an active tile they carry the
    unmasked max) — callers must re-mask with valid, as pool_hidden_net
    does.

    Composes with ``jax.vmap`` (e.g. the multi-seed trainer's replica
    axis): ``custom_vmap`` rules on the fwd/bwd kernel entries fold the
    batch axis into the kernel's scene grid and give every replica its
    own VMEM-resident weight block, instead of falling back to the XLA
    pair tensor (the [S,N,N,512] HBM slab this kernel exists to avoid).
    """
    out, _, _ = _core_fwd_cv(a, u, W2, b2, valid)
    return out


def _vjp_fwd(a, u, W2, b2, valid):
    out, pooled_padded, cnt = _core_fwd_cv(a, u, W2, b2, valid)
    return out, (a, u, W2, b2, valid, pooled_padded, cnt)


def _vjp_bwd(res, dpool):
    a, u, W2, b2, valid, pooled_padded, cnt = res
    da, du, dW2, db2 = _core_bwd_cv(a, u, W2, b2, valid, pooled_padded,
                                    cnt, dpool)
    return (da, du, dW2, db2, None)


pool_core_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Data-parallel (multi-chip) composition: shard_map over the scene axis
# ---------------------------------------------------------------------------
#
# GSPMD cannot partition a ``pallas_call`` (it would replicate the kernel
# and all-gather the sharded scene axis), so rounds 1-3 forced multi-device
# training onto the decomposed XLA pool — re-materializing the [S, N, N, 512]
# HBM pair slab this kernel exists to kill. The kernel is already
# scene-blocked with no cross-scene coupling, so data parallelism is a
# ``jax.shard_map`` over the scene axis: every chip runs the SAME kernel on
# its local scene shard (weights replicated), and the only collective is
# the dW2/db2 psum in the backward — which rides ICI exactly like the rest
# of the gradient all-reduce GSPMD inserts around it. custom_vjp sits
# OUTSIDE the shard_map (check_vma=False shard_maps do not transpose
# replicated-in grads on their own; the explicit bwd psums them).


@functools.lru_cache(maxsize=None)
def _pool_core_spmd(mesh, axis: str):
    # Replica-STACKED shard_map bodies: args carry a leading replica axis
    # (R = 1 for plain DP training) that stays unsharded while the scene
    # axis (dim 1) shards over mesh[axis]. This is what lets the multi-seed
    # trainer's seed vmap compose with data parallelism: the custom_vmap
    # rules below fold the seed axis into the kernel's native replica axis
    # INSTEAD of vmapping the shard_map (pallas_call auto-batching emits
    # illegal Mosaic blocks). Same composition order as pool_core_pallas:
    # custom_vjp outside, custom_vmap inside, shard_map innermost.
    fwd_sm = jax.shard_map(
        _core_fwd, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(), P(), P(None, axis)),
        out_specs=(P(None, axis), P(None, axis), P(None, axis)),
        check_vma=False)

    def bwd_body(a, u, W2, b2, valid, pooled, cnt, dpool):
        da, du, dW2, db2 = _core_bwd(a, u, W2, b2, valid, pooled, cnt,
                                     dpool)
        # weight grads: per-shard partial sums -> one psum over the mesh
        return da, du, jax.lax.psum(dW2, axis), jax.lax.psum(db2, axis)

    bwd_sm = jax.shard_map(
        bwd_body, mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(), P(), P(None, axis),
                  P(None, axis), P(None, axis), P(None, axis)),
        out_specs=(P(None, axis), P(None, axis), P(), P()), check_vma=False)

    @jax.custom_batching.custom_vmap
    def fwd_cv(a, u, W2, b2, valid):
        out, pooled, cnt = fwd_sm(a[None], u[None], W2[None], b2[None],
                                  valid[None])
        return out[0], pooled[0], cnt[0]

    @fwd_cv.def_vmap
    def _fwd_rule(axis_size, in_batched, a, u, W2, b2, valid):
        ab, ub, wb, bb, vb = in_batched
        out = fwd_sm(_bc(a, ab, axis_size), _bc(u, ub, axis_size),
                     _bc(W2, wb, axis_size), _bc(b2, bb, axis_size),
                     _bc(valid, vb, axis_size))
        return out, (True, True, True)

    @jax.custom_batching.custom_vmap
    def bwd_cv(a, u, W2, b2, valid, pooled, cnt, dpool):
        r = bwd_sm(a[None], u[None], W2[None], b2[None], valid[None],
                   pooled[None], cnt[None], dpool[None])
        return tuple(x[0] for x in r)

    @bwd_cv.def_vmap
    def _bwd_rule(axis_size, in_batched, *args):
        args = [_bc(x, b, axis_size) for x, b in zip(args, in_batched)]
        return bwd_sm(*args), (True, True, True, True)

    @jax.custom_vjp
    def f(a, u, W2, b2, valid):
        return fwd_cv(a, u, W2, b2, valid)[0]

    def f_fwd(a, u, W2, b2, valid):
        out, pooled, cnt = fwd_cv(a, u, W2, b2, valid)
        return out, (a, u, W2, b2, valid, pooled, cnt)

    def f_bwd(res, dpool):
        a, u, W2, b2, valid, pooled, cnt = res
        da, du, dW2, db2 = bwd_cv(a, u, W2, b2, valid, pooled, cnt, dpool)
        return da, du, dW2, db2, None

    f.defvjp(f_fwd, f_bwd)
    return f


def pool_core_pallas_spmd(a, u, W2, b2, valid, mesh, axis: str):
    """:func:`pool_core_pallas` under data parallelism: the scene axis of
    a/u/valid shards over ``mesh[axis]``, weights replicate, each device
    runs the kernel on its shard (S must divide the mesh size — callers
    guarantee this via the batch_size % num_devices check in train()).
    Same numerics as the unsharded kernel per shard; dW2/db2 summed over
    shards by a psum (f32 tolerance vs the single-device grad, tested on
    the CPU mesh in interpret mode)."""
    return _pool_core_spmd(mesh, axis)(a, u, W2, b2, valid)
