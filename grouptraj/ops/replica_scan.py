"""Shared scaffolding for the replica-unrolled custom_vmap rules.

The multi-seed trainer vmaps whole train chunks over a replica axis with
per-replica weights (train/multi.py). For the recurrences that dominate the
step, XLA's default batched-dot lowering materializes transposed-layout gate
slabs in HBM (round-3 profile), so ops/lstm.py and ops/pooling.py register
custom_vmap rules that unroll the (small, static) replica axis inside the
scan body — each replica runs the unbatched program's fused dot+gates.

Round-4 profiling (ARCHITECTURE.md "Round-4 close") found the residue of
that approach: every rule wrote its per-replica, per-step emissions with a
separate ``dynamic_update_slice`` into the ``[R, T, B, D]`` output buffer
(~14.5k ~3.3 µs ops per 8-seed chunk, 10.2% of device time) and read its
per-replica time slices with a separate ``dynamic_slice``. This module is
the round-5 fix, factored once for all rule families (VERDICT round-4 items
1–2): :func:`replica_scan` runs the same unrolled step functions but

- reads each time-indexed input buffer ONCE per step for ALL replicas
  (one ``[R, 1, ...]`` dynamic_slice, statically indexed per replica), and
- writes each emission buffer ONCE per step for ALL replicas (the
  per-replica outputs are stacked and stored with one
  ``[R, 1, ...]`` dynamic_update_slice),

collapsing the R-per-step slice/update tails into 1-per-step fused ops
while keeping the output layout ``[R, T, ...]`` (replica axis leading, the
custom_vmap calling convention) with no post-scan transpose. Emission
buffers live in the scan carry, so XLA updates them in place and its
while-loop simplifier still DCEs any buffer with no consumer (the (h, c)
residuals in no-grad probe decodes).

Numerics are unchanged — the per-replica step functions are byte-for-byte
the ones the round-4 rules ran; only the buffer IO is batched. The
op-level vmap(grad) equivalence tests (tests/test_ops.py
TestRecurrenceCustomVmap) pin this.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp


def vmap_unroll_max(family: str | None = None) -> int:
    """Replica-axis size above which the custom_vmap rules fall back to the
    plain batched program instead of unrolling replicas inside the scan.

    The rules emit R dots PER SCAN STEP, so HLO size and compile time scale
    linearly with axis_size — fine for the multi-seed trainer's 4-16
    replicas, pathological for e.g. per-sample grads vmapped over a large
    batch. Above the threshold the rules return the reference batched
    program (correct, just XLA's batched-dot layout).

    ``family`` lets a rule family be A/B'd independently:
    ``GROUPTRAJ_VMAP_UNROLL_MAX_<FAMILY>`` (e.g. ``..._PPRE=16`` forces the
    pool-precompute rules onto the unrolled path) overrides the global
    ``GROUPTRAJ_VMAP_UNROLL_MAX`` for that family only. Families: ENC, DEC,
    DECPROJ, FIRST, PPRE. Numerics agree to float-reassociation level
    (tests pin the two paths equal at 1e-4); this is a measurement knob
    for the perf audits.

    DEFAULT IS 1 (= always the batched program) since round 5: with the
    bf16 no-grad legs and the fused buffer IO in place, re-measuring the
    round-3 unroll decision showed XLA's plain batched lowering now wins
    at EVERY bucket and EVERY family on v5e (8-seed widest zara1 bucket
    43.46 -> 37.81 ms/iter; bucket 0 6.34 -> 3.62; bucket 1 14.02 ->
    10.89; per-family flips all neutral-or-worse, ARCHITECTURE.md "Round
    5"). The unrolled machinery stays env-gated because the measurement
    is config-specific, not because any shipped config still uses it.
    """
    raw = None
    if family is not None:
        raw = os.environ.get(f"GROUPTRAJ_VMAP_UNROLL_MAX_{family.upper()}")
    if raw is None:
        raw = os.environ.get("GROUPTRAJ_VMAP_UNROLL_MAX", "1")
    try:
        return max(1, int(raw))
    except ValueError:
        import warnings
        warnings.warn(
            f"GROUPTRAJ_VMAP_UNROLL_MAX={raw!r} is not an int; using the "
            "default 1 (batched)")
        return 1


def bc_args(args: Sequence, in_batched: Sequence[bool], axis_size: int):
    """Broadcast un-batched custom_vmap rule args to the replica axis
    (rules receive batched args with the axis already moved to dim 0)."""
    return [x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, b in zip(args, in_batched)]


def _read_all(buf: jnp.ndarray, t, R: int) -> jnp.ndarray:
    """One [R, 1, ...] dynamic_slice at time t covering every replica."""
    sl = jax.lax.dynamic_slice(
        buf, (0, t) + (0,) * (buf.ndim - 2), (R, 1) + buf.shape[2:])
    return sl.reshape((R,) + buf.shape[2:])


def replica_scan(
    step_fn: Callable,
    init_carries: Tuple,
    read_bufs: Tuple[jnp.ndarray, ...],
    T: int,
    *,
    reverse: bool = False,
    unroll: int = 1,
) -> Tuple[Tuple, Tuple[jnp.ndarray, ...]]:
    """Replica-unrolled scan with per-step buffer IO fused across replicas.

    - ``init_carries``: tuple over replicas of per-replica carry pytrees.
    - ``read_bufs``: arrays of shape ``[R, T, ...]``; each is sliced once
      per step (all replicas) and the per-replica rows are indexed
      statically inside the unrolled body.
    - ``step_fn(r, carry_r, reads_r) -> (new_carry_r, emits_r)`` where
      ``reads_r`` is the tuple of this replica's time-t rows and
      ``emits_r`` a (possibly empty) tuple of arrays to be stacked into
      ``[R, T, ...]`` output buffers.

    Returns ``(final_carries, emit_bufs)`` with ``final_carries`` a tuple
    over replicas and each emission buffer shaped ``[R, T, ...]``. With
    ``reverse=True`` the step at t = T-1 runs first (emissions still land
    at their own t index), matching ``lax.scan(reverse=True)``.
    """
    R = len(init_carries)

    # Discover emission shapes/dtypes without executing the step.
    reads0 = tuple(
        jax.eval_shape(lambda b=buf: b[:, 0], buf) for buf in read_bufs)
    _, emits0 = jax.eval_shape(
        lambda c, rd: step_fn(0, c, tuple(r[0] for r in rd)),
        init_carries[0], reads0)
    init_ebufs = tuple(
        jnp.zeros((R, T) + e.shape, e.dtype) for e in emits0)

    def body(carry, t):
        carries, ebufs = carry
        reads = tuple(_read_all(buf, t, R) for buf in read_bufs)
        new_carries, emits = [], []
        for r in range(R):
            c2, e = step_fn(r, carries[r], tuple(rd[r] for rd in reads))
            new_carries.append(c2)
            emits.append(e)
        new_ebufs = []
        for i, ebuf in enumerate(ebufs):
            stacked = jnp.stack([emits[r][i] for r in range(R)])
            new_ebufs.append(jax.lax.dynamic_update_slice(
                ebuf, stacked[:, None],
                (0, t) + (0,) * (ebuf.ndim - 2)))
        return (tuple(new_carries), tuple(new_ebufs)), None

    (final_carries, ebufs), _ = jax.lax.scan(
        body, (init_carries, init_ebufs), jnp.arange(T),
        reverse=reverse, unroll=unroll)
    return final_carries, ebufs


def stack_slots(carries: Tuple, n_slots: int) -> Tuple[jnp.ndarray, ...]:
    """Stack a tuple-over-replicas of per-replica carry tuples into
    per-slot [R, ...] arrays: the rules' output convention."""
    return tuple(jnp.stack([c[i] for c in carries]) for i in range(n_slots))
