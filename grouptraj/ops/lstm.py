"""Single-layer LSTM as a fused-gate `lax.scan` (with optional Pallas kernel).

Replaces the reference's cuDNN ``nn.LSTM`` (reference ``sgan/models.py:54,118``).
The four gate matmuls are fused into one ``[B, in] @ [in, 4H]`` product so XLA
tiles a single MXU op per step; the time loop is a ``lax.scan`` compiled into
one on-device loop (no per-step dispatch). Gate order matches torch
(i, f, g, o) so imported checkpoints drop in unchanged.

For the TPU hot path a Pallas kernel that keeps weights + (h, c) resident in
VMEM across all timesteps lives in :mod:`grouptraj.ops.pallas_lstm`; it is
numerically equivalent (tested) and selected via ``impl='pallas'``.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

from grouptraj.ops.replica_scan import (
    bc_args, replica_scan, stack_slots, vmap_unroll_max as _vmap_unroll_max)

# Time-loop unroll factor for the scans (this module + the decoder scan).
# Measured on the v5e training step (bench.py, zara1 Bo20 bucketed):
# unroll 1 = 128 it/s, 4 = 90, 8 = 108 — unrolling only bloats the HLO at
# these tiny per-step shapes, so the rolled loop stays the default.
# Read at call (trace) time so setting GROUPTRAJ_SCAN_UNROLL after import —
# e.g. in a test or notebook — takes effect on the next trace.
def scan_unroll() -> int:
    raw = os.environ.get("GROUPTRAJ_SCAN_UNROLL", "1")
    try:
        return max(1, int(raw))
    except ValueError:
        import warnings
        warnings.warn(f"GROUPTRAJ_SCAN_UNROLL={raw!r} is not an int; using 1")
        return 1


def select_impl(cfg, tcfg) -> str:
    """Pick the LSTM implementation from TrainConfig.

    Three TPU implementations (all numerically equivalent, tested):
    - 'scan': XLA lax.scan with the input-gate products precomputed as one
      big matmul (the cuDNN trick) — one [B,H]@[H,4H] matmul per step;
    - 'pallas': the per-timestep-grid kernel (ops/pallas_lstm.py);
    - 'fused': the single-grid-step kernels (ops/pallas_fused.py) — the
      whole time loop in one kernel launch, weights + carry + slabs
      VMEM-resident, used for BOTH the encoders and the folded decoder.

    'auto' resolves to 'scan' on every backend. The per-timestep kernel
    wins the ISOLATED recurrence microbenchmark fwd+bwd at H ≥ 64 (up to
    2.2× at B=4096/H=128, tools/depth_bench.py, table in ARCHITECTURE.md)
    and an earlier auto rule picked it there — but the END-TO-END training
    step measures slower at every size a reference-shaped workload
    reaches (tools/scale_bench.py: 98.4 vs 123.9 it/s at H=64, 55.9 vs
    59.4 at H=128/B=64; tools/profile_step.py --impl at flagship sizes:
    6.54 vs 4.32 ms/iter). In context the scan path's per-step matmuls
    fuse with neighbors and the kernel's launch/slab overheads only pay
    off at an extreme corner (H=128/N=128/B=256, 655k-row decodes: 4.4
    vs 3.9 it/s) — users there opt in explicitly. The kernels remain
    tested-equal opt-ins (`--lstm_impl pallas|fused`); non-TPU backends
    always use scan (they are Mosaic-only).
    """
    impl = getattr(tcfg, "lstm_impl", "auto")
    if getattr(tcfg, "use_pallas", False):
        impl = "pallas"
    if impl in ("scan", "pallas", "fused"):
        return impl if jax.default_backend() == "tpu" else "scan"
    return "scan"


def init_lstm(key: jax.Array, d_in: int, d_hidden: int,
              dtype=jnp.float32) -> dict:
    """torch nn.LSTM default init: every tensor U(−1/√H, 1/√H).

    Stored transposed relative to torch: w_ih [in, 4H], w_hh [H, 4H].
    """
    bound = 1.0 / math.sqrt(d_hidden)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (d_in, 4 * d_hidden)),
        "w_hh": u(ks[1], (d_hidden, 4 * d_hidden)),
        "b_ih": u(ks[2], (4 * d_hidden,)),
        "b_hh": u(ks[3], (4 * d_hidden,)),
    }


def lstm_gates(z: jnp.ndarray, c: jnp.ndarray, H: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gate nonlinearities for pre-activation gates z [..., 4H] (torch
    i,f,g,o order) and cell c [..., H] -> (h', c')."""
    i = jax.nn.sigmoid(z[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(z[..., 1 * H:2 * H])
    g = jnp.tanh(z[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(z[..., 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step. x [B, in], h/c [B, H] -> (h', c')."""
    H = h.shape[-1]
    gates = x @ params["w_ih"] + h @ params["w_hh"] + (
        params["b_ih"] + params["b_hh"])
    return lstm_gates(gates, c, H)


def _gate_acts(z, H):
    i = jax.nn.sigmoid(z[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(z[..., 1 * H:2 * H])
    g = jnp.tanh(z[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(z[..., 3 * H:4 * H])
    return i, f, g, o


def _gate_bwd(z, c_prev, dh, dc_in, H):
    """(dz, dc_prev-chain) for one step, gates recomputed from z."""
    i, f, g, o = _gate_acts(z, H)
    c = f * c_prev + i * g
    tc = jnp.tanh(c)
    do = dh * tc
    dc = dc_in + dh * o * (1.0 - tc * tc)
    dz = jnp.concatenate([
        dc * g * i * (1.0 - i), dc * c_prev * f * (1.0 - f),
        dc * i * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    return dz, dc * f


@jax.custom_vjp
def lstm_recurrence(w_hh, gx, h0, c0):
    """Recurrent half of an LSTM with precomputed input gates.

    gx [T, B, 4H] already holds ``x_t @ W_ih + b``; returns
    (ys [T, B, H], hT, cT). The point of the custom VJP: XLA's autodiff
    saves 4H-wide gate intermediates per step; this backward recomputes the
    gates from the saved (h, c) states instead, chains only (dh, dc)
    through the reverse scan, and accumulates dW_hh in the carry (round-3
    note: an earlier revision stacked dzs and formed dW as one post-loop
    [H, T·B] @ [T·B, 4H] matmul — profiling showed the slab assembly and
    re-read were pure HBM traffic, so dW now accumulates per step from
    operands the step already has resident; dzs is still emitted because
    it IS dgx). Same math as autodiff (tested).
    """
    return _lstm_recurrence_fwd(w_hh, gx, h0, c0)[0]


def _lstm_recurrence_fwd(w_hh, gx, h0, c0):
    H = h0.shape[-1]

    def step(carry, g):
        h, c = carry
        h2, c2 = lstm_gates(g + h @ w_hh, c, H)
        # emit the PRE-step (h, c) too: the backward consumes h_{t-1}/c_{t-1}
        # slabs directly instead of rebuilding them with a full-slab
        # concatenate (measured ~0.3 ms/iter of pure copies at the widest
        # bucket, tools/profile_step.py)
        return (h2, c2), (h, c, h2)

    (hT, cT), (hs_prev, cs_prev, ys) = jax.lax.scan(
        step, (h0, c0), gx, unroll=scan_unroll())
    return (ys, hT, cT), (w_hh, gx, hs_prev, cs_prev)


def _lstm_recurrence_bwd(res, cts):
    w_hh, gx, hs_prev, cs_prev = res
    dys, dhT, dcT = cts
    H = hs_prev.shape[-1]

    def bstep(carry, inp):
        dh_next, dc_next, dw = carry
        g, h_prev, c_prev, dy = inp
        z = g + h_prev @ w_hh                      # recompute (1 matmul)
        dz, dc_chain = _gate_bwd(z, c_prev, dh_next + dy, dc_next, H)
        dh_chain = jax.lax.dot_general(            # dz @ w_hhᵀ, no transpose
            dz, w_hh, (((1,), (1,)), ((), ())))
        # dW accumulates in the carry ([H, 4H], tiny): a fat [H, B] @ [B, 4H]
        # reduction per step instead of stacking dzs into a [T, B, 4H] HBM
        # slab and re-reading it — h_prev/dz are already resident this step
        dw = dw + jax.lax.dot_general(
            h_prev, dz, (((0,), (0,)), ((), ())))
        return (dh_chain, dc_chain, dw), dz

    (dh0, dc0, dw), dzs = jax.lax.scan(
        bstep, (dhT, dcT, jnp.zeros_like(w_hh)),
        (gx, hs_prev, cs_prev, dys), reverse=True, unroll=scan_unroll())
    return dw, dzs, dh0, dc0


lstm_recurrence.defvjp(lambda w, gx, h0, c0: _lstm_recurrence_fwd(
    w, gx, h0, c0), _lstm_recurrence_bwd)


@jax.custom_vjp
def encoder_recurrence(w_comp, b_comp, w_hh, xs):
    """Whole encoder leg — folded embedding + LSTM — returning (hT, cT) only.

    ``w_comp = W_e @ W_ih`` [2, 4H] and ``b_comp = b_e @ W_ih + b_ih + b_hh``
    fold the (bare Linear) spatial embedding into the input-gate products —
    exact algebra, same as the folded decoder (reference Encoder has no
    nonlinearity between the embedding and the LSTM, ``sgan/models.py:50-56``).
    xs is the RAW [T, B, 2] rel-coord input.

    The point vs ``lstm_recurrence`` over a precomputed gx (round-3
    profiling, tools/profile_step.py + tools/attr_ops.py): encoders only
    ever use the FINAL hidden state, yet the gx formulation writes a
    [T, B, 4H] gx slab, saves it as a residual, and its backward zero-inits
    + update-slices + re-reads a same-sized dzs slab (dgx) — at the d-step's
    stacked discriminator encoder that is ~126 MB of pure HBM traffic per
    slab pass. Here the forward emits only the (h, c) step states
    (unavoidable backward residents), the backward recomputes the tiny
    per-step gate input ``x_t @ w_comp + b_comp`` from xs ([B, 2] — data
    already resident as the reverse scan's input) and accumulates ALL
    weight gradients in the carry; the only slab it emits is dxs [T, B, 2]
    (needed in the g-step, where the discriminator input is the generator's
    output). Gradients match plain autodiff of the unfolded encoder to fp
    tolerance (tests/test_ops.py).

    The primal routes through the custom_vmap entry: vmap of an
    UNdifferentiated custom_vjp call batches this body by the ordinary
    rules, so no-grad forwards under the multi-seed vmap would otherwise
    run the batched-dot program the replica rules exist to avoid (round-4
    profile; block comment above _enc_fwd_cv). The dead residuals are
    DCE'd.
    """
    return _enc_fwd_cv(w_comp, b_comp, w_hh, xs)[0]


def _enc_recurrence_fwd(w_comp, b_comp, w_hh, xs):
    B = xs.shape[1]
    H = w_hh.shape[0]
    h0 = jnp.zeros((B, H), xs.dtype)

    def step(carry, x):
        h, c = carry
        h2, c2 = lstm_gates(x @ w_comp + b_comp + h @ w_hh, c, H)
        return (h2, c2), (h, c)

    (hT, cT), (hs_prev, cs_prev) = jax.lax.scan(
        step, (h0, h0), xs, unroll=scan_unroll())
    return (hT, cT), (w_comp, b_comp, w_hh, xs, hs_prev, cs_prev)


def _enc_recurrence_bwd(res, cts):
    w_comp, b_comp, w_hh, xs, hs_prev, cs_prev = res
    dhT, dcT = cts
    H = hs_prev.shape[-1]

    def bstep(carry, inp):
        dh_next, dc_next, dwc, dwh, db = carry
        x, h_prev, c_prev = inp
        z = x @ w_comp + b_comp + h_prev @ w_hh      # recompute, no gx slab
        dz, dc_chain = _gate_bwd(z, c_prev, dh_next, dc_next, H)
        dh_chain = jax.lax.dot_general(              # dz @ w_hhᵀ
            dz, w_hh, (((1,), (1,)), ((), ())))
        dwh = dwh + jax.lax.dot_general(             # h_prevᵀ @ dz, in-carry
            h_prev, dz, (((0,), (0,)), ((), ())))
        dwc = dwc + jax.lax.dot_general(             # xᵀ @ dz, in-carry
            x, dz, (((0,), (0,)), ((), ())))
        dx = jax.lax.dot_general(                    # dz @ w_compᵀ
            dz, w_comp, (((1,), (1,)), ((), ())))
        return (dh_chain, dc_chain, dwc, dwh, db + jnp.sum(dz, axis=0)), dx

    (dh0, dc0, dwc, dwh, db), dxs = jax.lax.scan(
        bstep,
        (dhT, dcT, jnp.zeros_like(w_comp), jnp.zeros_like(w_hh),
         jnp.zeros_like(b_comp)),
        (xs, hs_prev, cs_prev), reverse=True, unroll=scan_unroll())
    return dwc, db, dwh, dxs


# Replica-batched encoder recurrence: same custom_vmap treatment as the
# decoder below (see the block comment there) — under the multi-seed vmap
# the per-step batched dots of the d-leg's stacked real+fake encoder were
# the next superlinear group after the probe decode (~1.5-2 ms per 8-seed
# iteration excess, tools/profile_step.py --n_seeds 8, round 3). The rules
# unroll the replica axis inside the scan step so each replica runs the
# unbatched program's fused dot+gates, with (h, c) residual emissions
# DUS'd into [R, T, B, H] buffers (dead, hence DCE'd, in fwd-only sweeps).
#
# Round-4: the custom_vjp PRIMAL bodies also route through these cv
# entries — vmap of an UNdifferentiated custom_vjp call batches the primal
# by the ordinary rules, so the no-grad decodes under the seed vmap (the
# g-step's best-of-20 probe at 81,920 rows; the d-step's generator
# forward) were still running the batched program: its scan emission and
# gate dot were the two remaining superlinear ops (695/505 us/call x 11
# steps/iter at 8 seeds vs 26/16 single-seed, tools/profile_step.py
# --n_seeds 8).


@jax.custom_batching.custom_vmap
def _enc_fwd_cv(w_comp, b_comp, w_hh, xs):
    return _enc_recurrence_fwd(w_comp, b_comp, w_hh, xs)


@_enc_fwd_cv.def_vmap
def _enc_fwd_rule(axis_size, in_batched, w_comp, b_comp, w_hh, xs):
    R = axis_size
    w_comp, b_comp, w_hh, xs = bc_args(
        (w_comp, b_comp, w_hh, xs), in_batched, R)
    if R > _vmap_unroll_max("enc"):   # guard: HLO size scales with R below
        out = jax.vmap(_enc_recurrence_fwd)(w_comp, b_comp, w_hh, xs)
        return out, ((True, True), (True, True, True, True, True, True))
    T, B = xs.shape[1], xs.shape[2]
    H = w_hh.shape[1]
    zbh = jnp.zeros((B, H), xs.dtype)

    def step(r, carry, reads):
        h, c = carry
        (x,) = reads
        h2, c2 = lstm_gates(x @ w_comp[r] + b_comp[r] + h @ w_hh[r], c, H)
        return (h2, c2), (h, c)

    carries, (hs_prev, cs_prev) = replica_scan(
        step, tuple((zbh, zbh) for _ in range(R)), (xs,), T,
        unroll=scan_unroll())
    hT, cT = stack_slots(carries, 2)
    out = ((hT, cT), (w_comp, b_comp, w_hh, xs, hs_prev, cs_prev))
    return out, ((True, True), (True, True, True, True, True, True))


@jax.custom_batching.custom_vmap
def _enc_bwd_cv(w_comp, b_comp, w_hh, xs, hs_prev, cs_prev, dhT, dcT):
    return _enc_recurrence_bwd(
        (w_comp, b_comp, w_hh, xs, hs_prev, cs_prev), (dhT, dcT))


@_enc_bwd_cv.def_vmap
def _enc_bwd_rule(axis_size, in_batched, w_comp, b_comp, w_hh, xs, hs_prev,
                  cs_prev, dhT, dcT):
    R = axis_size
    (w_comp, b_comp, w_hh, xs, hs_prev, cs_prev, dhT, dcT) = bc_args(
        (w_comp, b_comp, w_hh, xs, hs_prev, cs_prev, dhT, dcT),
        in_batched, R)
    if R > _vmap_unroll_max("enc"):   # guard: HLO size scales with R below
        out = jax.vmap(lambda w, b, wh, x, hp, cp, dh, dc:
                       _enc_recurrence_bwd((w, b, wh, x, hp, cp), (dh, dc)))(
            w_comp, b_comp, w_hh, xs, hs_prev, cs_prev, dhT, dcT)
        return out, (True, True, True, True)
    T = xs.shape[1]
    H = w_hh.shape[1]

    def bstep(r, carry, reads):
        dh, dc, dwc, dwh, db = carry
        x, h_prev, c_prev = reads
        z = x @ w_comp[r] + b_comp[r] + h_prev @ w_hh[r]
        dz, dc_chain = _gate_bwd(z, c_prev, dh, dc, H)
        dh_chain = jax.lax.dot_general(
            dz, w_hh[r], (((1,), (1,)), ((), ())))
        dwh = dwh + jax.lax.dot_general(
            h_prev, dz, (((0,), (0,)), ((), ())))
        dwc = dwc + jax.lax.dot_general(
            x, dz, (((0,), (0,)), ((), ())))
        dx = jax.lax.dot_general(
            dz, w_comp[r], (((1,), (1,)), ((), ())))
        return (dh_chain, dc_chain, dwc, dwh,
                db + jnp.sum(dz, axis=0)), (dx,)

    init = tuple(
        (dhT[r], dcT[r],
         jnp.zeros(w_comp.shape[1:], w_comp.dtype),
         jnp.zeros(w_hh.shape[1:], w_hh.dtype),
         jnp.zeros(b_comp.shape[1:], b_comp.dtype))
        for r in range(R))
    carries, (dxs,) = replica_scan(
        bstep, init, (xs, hs_prev, cs_prev), T, reverse=True,
        unroll=scan_unroll())
    _, _, dwc, dwh, db = stack_slots(carries, 5)
    return (dwc, db, dwh, dxs), (True, True, True, True)


encoder_recurrence.defvjp(
    lambda w_comp, b_comp, w_hh, xs: _enc_fwd_cv(w_comp, b_comp, w_hh, xs),
    lambda res, cts: _enc_bwd_cv(*res, *cts))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def decoder_recurrence(w_eff, b_eff, h1, c1, T):
    """T steps of the folded-decoder recurrence (constant input b_eff):
    h,c evolve by ``gates = h @ W_eff + b_eff``; returns ys [T, B, H].
    Same one-big-matmul backward as :func:`lstm_recurrence`. The primal
    routes through the custom_vmap entry (see encoder_recurrence)."""
    return _dec_fwd_cv(T)(w_eff, b_eff, h1, c1)[0]


def _dec_recurrence_fwd(w_eff, b_eff, h1, c1, T):
    H = h1.shape[-1]

    def step(carry, _):
        h, c = carry
        h2, c2 = lstm_gates(h @ w_eff + b_eff, c, H)
        return (h2, c2), (h, c, h2)

    (_, _), (hs_prev, cs_prev, ys) = jax.lax.scan(
        step, (h1, c1), None, length=T, unroll=scan_unroll())
    return ys, (w_eff, b_eff, hs_prev, cs_prev)


def _dec_recurrence_bwd(T, res, dys):
    """Reverse scan chaining (dh, dc) with dW/db accumulated IN the carry.

    Unlike :func:`lstm_recurrence`, dz is not an output here (the folded
    decoder has no per-step input), so nothing N²-sized needs to leave the
    loop: stacking dzs into a ``[T, k·S·N, 4H]`` HBM slab for a single
    post-loop matmul was the g-step's #2 cost after pooling (~4.7 ms/iter
    at the widest bucket — the slab zero-init, per-step update-slices and
    re-read are pure bandwidth; tools/profile_step.py). The in-carry
    accumulation reads only what the step already has resident.
    """
    w_eff, b_eff, hs_prev, cs_prev = res
    H = hs_prev.shape[-1]

    def bstep(carry, inp):
        dh_next, dc_next, dw, db = carry
        h_prev, c_prev, dy = inp
        z = h_prev @ w_eff + b_eff
        dz, dc_chain = _gate_bwd(z, c_prev, dh_next + dy, dc_next, H)
        dh_chain = jax.lax.dot_general(
            dz, w_eff, (((1,), (1,)), ((), ())))
        dw = dw + jax.lax.dot_general(
            h_prev, dz, (((0,), (0,)), ((), ())))
        return (dh_chain, dc_chain, dw, db + jnp.sum(dz, axis=0)), None

    (dh1, dc1, dw, db), _ = jax.lax.scan(
        bstep,
        (jnp.zeros_like(hs_prev[0]), jnp.zeros_like(cs_prev[0]),
         jnp.zeros_like(w_eff), jnp.zeros_like(b_eff)),
        (hs_prev, cs_prev, dys), reverse=True, unroll=scan_unroll())
    return dw, db, dh1, dc1


# ---------------------------------------------------------------------------
# Replica-batched decoder recurrence: custom_vmap rules on the VJP entries
# ---------------------------------------------------------------------------
#
# Under the multi-seed trainer's seed-axis vmap (train/multi.py — the whole
# train chunk vmapped over R replicas with per-replica weights), the decoder
# scan's per-step dot becomes a batched [R, B, H] @ [R, H, 4H] dot_general.
# XLA:TPU lowers that as a windowed convolution that MATERIALIZES the
# [R, B, 4H] f32 gate slab in HBM with a transposed {1,2,0} layout and
# re-reads it for the gate math — at the g-step's best-of-20 probe batch
# (B = k·S·N = 81920, widest zara1 bucket) those two ops alone measured
# 12.5 ms per 8-seed iteration, ~2× an entire single-seed step
# (tools/profile_step.py --n_seeds 8 / tools/attr_ops.py: op_name
# ``vmap()/…/jvp()/while/body`` at lstm.py decoder scan, round 3).
#
# The rules below restore the unbatched program's structure: the (small,
# static) replica axis is unrolled INSIDE the scan body, so each step runs
# R flat [B, H] @ [H, 4H] dots whose gate nonlinearities fuse into the
# matmul output (gates never touch HBM). Buffer IO goes through
# ops/replica_scan.replica_scan (round 5): per-step emissions for ALL
# replicas land with ONE [R, 1, B, D] dynamic_update_slice into the
# [R, T, B, D] carry buffer (round 4 did one DUS per replica per step —
# ~14.5k ~3.3 µs ops per 8-seed chunk, 10.2% of device time), and reverse
# scans read their time slices the same fused way. The batch axis stays
# leading (custom_vmap's calling convention) with no post-scan transpose.
# hs_prev is derived from ys by a shift-concat OUTSIDE the scan
# (h_{t-1} = ys[t-1], h1 prepended) — in the no-grad probe decode both it
# and the cs_prev buffer are dead and XLA's while-loop simplifier removes
# them. Same composition as ops/pallas_pool.py: custom_vjp outside,
# custom_vmap inside (the vjp rules are never themselves differentiated).


@functools.lru_cache(maxsize=None)
def _dec_fwd_cv(T: int):
    @jax.custom_batching.custom_vmap
    def fwd(w_eff, b_eff, h1, c1):
        return _dec_recurrence_fwd(w_eff, b_eff, h1, c1, T)

    @fwd.def_vmap
    def _fwd_rule(axis_size, in_batched, w_eff, b_eff, h1, c1):
        R = axis_size
        w_eff, b_eff, h1, c1 = bc_args(
            (w_eff, b_eff, h1, c1), in_batched, R)
        if R > _vmap_unroll_max("dec"):   # guard: HLO size scales with R below
            out = jax.vmap(lambda w, b, h, c: _dec_recurrence_fwd(
                w, b, h, c, T))(w_eff, b_eff, h1, c1)
            return out, (True, (True, True, True, True))
        H = h1.shape[2]

        def step(r, carry, reads):
            h, c = carry
            h2, c2 = lstm_gates(h @ w_eff[r] + b_eff[r], c, H)
            return (h2, c2), (c, h2)

        _, (cs_prev, ys) = replica_scan(
            step, tuple((h1[r], c1[r]) for r in range(R)), (), T,
            unroll=scan_unroll())
        hs_prev = jnp.concatenate([h1[:, None], ys[:, :T - 1]], axis=1)
        out = (ys, (w_eff, b_eff, hs_prev, cs_prev))
        return out, (True, (True, True, True, True))

    return fwd


@functools.lru_cache(maxsize=None)
def _dec_bwd_cv(T: int):
    @jax.custom_batching.custom_vmap
    def bwd(w_eff, b_eff, hs_prev, cs_prev, dys):
        return _dec_recurrence_bwd(T, (w_eff, b_eff, hs_prev, cs_prev), dys)

    @bwd.def_vmap
    def _bwd_rule(axis_size, in_batched, w_eff, b_eff, hs_prev, cs_prev,
                  dys):
        R = axis_size
        w_eff, b_eff, hs_prev, cs_prev, dys = bc_args(
            (w_eff, b_eff, hs_prev, cs_prev, dys), in_batched, R)
        if R > _vmap_unroll_max("dec"):   # guard: HLO size scales with R below
            out = jax.vmap(lambda w, b, hp, cp, dy: _dec_recurrence_bwd(
                T, (w, b, hp, cp), dy))(w_eff, b_eff, hs_prev, cs_prev, dys)
            return out, (True, True, True, True)
        B, H = hs_prev.shape[2], hs_prev.shape[3]

        def bstep(r, carry, reads):
            dh, dc, dw, db = carry
            h_prev, c_prev, dy = reads
            z = h_prev @ w_eff[r] + b_eff[r]
            dz, dc_chain = _gate_bwd(z, c_prev, dh + dy, dc, H)
            dh_chain = jax.lax.dot_general(
                dz, w_eff[r], (((1,), (1,)), ((), ())))
            dw = dw + jax.lax.dot_general(
                h_prev, dz, (((0,), (0,)), ((), ())))
            return (dh_chain, dc_chain, dw, db + jnp.sum(dz, axis=0)), ()

        zbh = jnp.zeros((B, H), hs_prev.dtype)
        init = tuple(
            (zbh, zbh, jnp.zeros(w_eff.shape[1:], w_eff.dtype),
             jnp.zeros(b_eff.shape[1:], b_eff.dtype))
            for _ in range(R))
        carries, _ = replica_scan(
            bstep, init, (hs_prev, cs_prev, dys), T, reverse=True,
            unroll=scan_unroll())
        dh1, dc1, dw, db = stack_slots(carries, 4)
        return (dw, db, dh1, dc1), (True, True, True, True)

    return bwd


decoder_recurrence.defvjp(
    lambda w, b, h1, c1, T: _dec_fwd_cv(T)(w, b, h1, c1),
    lambda T, res, dys: _dec_bwd_cv(T)(*res, dys))


# ---------------------------------------------------------------------------
# Projection-folded decoder recurrence: emit rel-coords, not hidden states
# ---------------------------------------------------------------------------
#
# :func:`decoder_recurrence` emits the [T, B, H] hidden slab whose ONLY
# consumer is the H->2 ``hidden2pos`` projection (models/generator.py
# ``_decode_folded``; reference Decoder models.py:157-175). Round-4
# profiling (tools/profile_step.py --n_seeds 8) found the two remaining
# superlinear multi-seed ops both living on that slab: the per-step
# dynamic-update-slice emission into the [R, T, B, H] buffer (591 us/call
# x 11 steps/iter at the best-of-20 probe's 81,920-row batch) and the
# matching gate-dot whose output feeds it. Folding the projection INTO the
# scan step shrinks every per-step emission (and the backward's incoming
# cotangent slab) from [B, H] to [B, 2] — 24x less HBM traffic at H=48 —
# while the (h, c) residual emissions stay DCE-able in no-grad decodes
# (the probe and the d-step's generator forward consume only the rels).
# Numerics: y_t = h_t @ W_p + b_p row-by-row is the same matmul the
# post-scan [T·B, H] @ [H, 2] projection computed (bit-identical rows);
# dW_p/db_p accumulate in-carry across the reverse scan, so weight grads
# match autodiff to f32 tolerance like every recurrence here.


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def decoder_proj_recurrence(w_eff, b_eff, w_p, b_p, h1, c1, T):
    """T steps of the folded-decoder recurrence with the ``hidden2pos``
    projection fused into the step: returns ys [T, B, 2] where
    ``y_t = h_t @ w_p + b_p`` and h evolves by ``gates = h @ w_eff + b_eff``.
    Equals ``decoder_recurrence(...) @ w_p + b_p`` (tested) without ever
    materializing the [T, B, H] hidden slab. The primal routes through the
    custom_vmap entry (see encoder_recurrence): the no-grad probe decode
    under the seed vmap is exactly where the [B, 2] emission pays."""
    return _dproj_fwd_cv(T)(w_eff, b_eff, w_p, b_p, h1, c1)[0]


def _dproj_fwd(w_eff, b_eff, w_p, b_p, h1, c1, T):
    H = h1.shape[-1]

    def step(carry, _):
        h, c = carry
        h2, c2 = lstm_gates(h @ w_eff + b_eff, c, H)
        return (h2, c2), (h, c, h2 @ w_p + b_p)

    (_, _), (hs_prev, cs_prev, ys) = jax.lax.scan(
        step, (h1, c1), None, length=T, unroll=scan_unroll())
    return ys, (w_eff, b_eff, w_p, hs_prev, cs_prev)


def _dproj_bwd_step(w_eff, b_eff, w_p, H, carry, inp):
    """One reverse step shared by the plain bwd and the custom_vmap rule:
    recomputes (z, gates, h2) from the saved (h_prev, c_prev), backprops the
    projection then the gates, accumulating all four weight grads in-carry.
    """
    dh_next, dc_next, dw, db, dwp, dbp = carry
    h_prev, c_prev, dy = inp
    z = h_prev @ w_eff + b_eff
    i, f, g, o = _gate_acts(z, H)
    c = f * c_prev + i * g
    tc = jnp.tanh(c)
    h2 = o * tc
    # projection backward: dh2 gains dy @ w_p^T; dW_p/db_p in-carry
    dh = dh_next + jax.lax.dot_general(dy, w_p, (((1,), (1,)), ((), ())))
    dwp = dwp + jax.lax.dot_general(h2, dy, (((0,), (0,)), ((), ())))
    dbp = dbp + jnp.sum(dy, axis=0)
    # gate backward (same math as _gate_bwd, gates already in registers)
    do = dh * tc
    dc = dc_next + dh * o * (1.0 - tc * tc)
    dz = jnp.concatenate([
        dc * g * i * (1.0 - i), dc * c_prev * f * (1.0 - f),
        dc * i * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    dh_chain = jax.lax.dot_general(dz, w_eff, (((1,), (1,)), ((), ())))
    dw = dw + jax.lax.dot_general(h_prev, dz, (((0,), (0,)), ((), ())))
    return (dh_chain, dc * f, dw, db + jnp.sum(dz, axis=0), dwp, dbp)


def _dproj_bwd(T, res, dys):
    w_eff, b_eff, w_p, hs_prev, cs_prev = res
    H = hs_prev.shape[-1]

    def bstep(carry, inp):
        return _dproj_bwd_step(w_eff, b_eff, w_p, H, carry, inp), None

    (dh1, dc1, dw, db, dwp, dbp), _ = jax.lax.scan(
        bstep,
        (jnp.zeros_like(hs_prev[0]), jnp.zeros_like(cs_prev[0]),
         jnp.zeros_like(w_eff), jnp.zeros_like(b_eff),
         jnp.zeros((w_p.shape[0], w_p.shape[1]), w_p.dtype),
         jnp.zeros(w_p.shape[1], w_p.dtype)),
        (hs_prev, cs_prev, dys), reverse=True, unroll=scan_unroll())
    return dw, db, dwp, dbp, dh1, dc1


@functools.lru_cache(maxsize=None)
def _dproj_fwd_cv(T: int):
    @jax.custom_batching.custom_vmap
    def fwd(w_eff, b_eff, w_p, b_p, h1, c1):
        return _dproj_fwd(w_eff, b_eff, w_p, b_p, h1, c1, T)

    @fwd.def_vmap
    def _fwd_rule(axis_size, in_batched, w_eff, b_eff, w_p, b_p, h1, c1):
        R = axis_size
        args = bc_args((w_eff, b_eff, w_p, b_p, h1, c1), in_batched, R)
        if R > _vmap_unroll_max("decproj"):
            out = jax.vmap(
                lambda w, b, wp, bp, h, c: _dproj_fwd(w, b, wp, bp, h, c, T)
            )(*args)
            return out, (True, (True, True, True, True, True))
        w_eff, b_eff, w_p, b_p, h1, c1 = args
        H = h1.shape[2]

        def step(r, carry, reads):
            h, c = carry
            h2, c2 = lstm_gates(h @ w_eff[r] + b_eff[r], c, H)
            return (h2, c2), (h, c, h2 @ w_p[r] + b_p[r])

        _, (hs_prev, cs_prev, ys) = replica_scan(
            step, tuple((h1[r], c1[r]) for r in range(R)), (), T,
            unroll=scan_unroll())
        out = (ys, (w_eff, b_eff, w_p, hs_prev, cs_prev))
        return out, (True, (True, True, True, True, True))

    return fwd


@functools.lru_cache(maxsize=None)
def _dproj_bwd_cv(T: int):
    @jax.custom_batching.custom_vmap
    def bwd(w_eff, b_eff, w_p, hs_prev, cs_prev, dys):
        return _dproj_bwd(T, (w_eff, b_eff, w_p, hs_prev, cs_prev), dys)

    @bwd.def_vmap
    def _bwd_rule(axis_size, in_batched, w_eff, b_eff, w_p, hs_prev,
                  cs_prev, dys):
        R = axis_size
        args = bc_args(
            (w_eff, b_eff, w_p, hs_prev, cs_prev, dys), in_batched, R)
        if R > _vmap_unroll_max("decproj"):
            out = jax.vmap(
                lambda w, b, wp, hp, cp, dy: _dproj_bwd(
                    T, (w, b, wp, hp, cp), dy))(*args)
            return out, (True,) * 6
        w_eff, b_eff, w_p, hs_prev, cs_prev, dys = args
        B, H = hs_prev.shape[2], hs_prev.shape[3]

        def bstep(r, carry, reads):
            return _dproj_bwd_step(
                w_eff[r], b_eff[r], w_p[r], H, carry, reads), ()

        zbh = jnp.zeros((B, H), hs_prev.dtype)
        init = tuple(
            (zbh, zbh, jnp.zeros(w_eff.shape[1:], w_eff.dtype),
             jnp.zeros(b_eff.shape[1:], b_eff.dtype),
             jnp.zeros(w_p.shape[1:], w_p.dtype),
             jnp.zeros(w_p.shape[2:], w_p.dtype))
            for _ in range(R))
        carries, _ = replica_scan(
            bstep, init, (hs_prev, cs_prev, dys), T, reverse=True,
            unroll=scan_unroll())
        dh1, dc1, dw, db, dwp, dbp = stack_slots(carries, 6)
        return (dw, db, dwp, dbp, dh1, dc1), (True,) * 6

    return bwd


decoder_proj_recurrence.defvjp(
    lambda w, b, wp, bp, h1, c1, T: _dproj_fwd_cv(T)(w, b, wp, bp, h1, c1),
    lambda T, res, dys: _dproj_bwd_cv(T)(*res, dys))


# ---------------------------------------------------------------------------
# Decoder first step: the one cell update before the constant-input algebra
# ---------------------------------------------------------------------------
#
# The folded decoder's FIRST step consumes the observed displacement
# (models/generator.py _decode_folded), so it runs outside
# decoder_proj_recurrence — and under the multi-seed vmap its two batched
# dots (x0 @ w_r, h0 @ w_hh at the probe's 81,920-row batch) were the next
# superlinear group after the scan fix (~2.1 ms per 8-seed iteration:
# fusion.5009/.5062/.5063, tools/attr_ops.py round 4). Same treatment:
# custom_vjp with custom_vmap rules on the primal/fwd/bwd that unroll the
# replica axis into flat per-replica dots.


@jax.custom_vjp
def decoder_first_step(w_r, b1c, w_hh, w_p, b_p, x0, h0):
    """One LSTM step from a zero cell with a distinct input path, plus the
    fused hidden2pos projection: ``z = x0 @ w_r + h0 @ w_hh + b1c``,
    ``(h1, c1) = gates(z, 0)``, ``y1 = h1 @ w_p + b_p``. Returns
    (h1, c1, y1); feeds :func:`decoder_proj_recurrence` for steps 2..T."""
    return _dfs_fwd_cv(w_r, b1c, w_hh, w_p, b_p, x0, h0)[0]


def _dfs_fwd(w_r, b1c, w_hh, w_p, b_p, x0, h0):
    H = h0.shape[-1]
    z = x0 @ w_r + h0 @ w_hh + b1c
    h1, c1 = lstm_gates(z, jnp.zeros_like(h0), H)
    return (h1, c1, h1 @ w_p + b_p), (w_r, b1c, w_hh, w_p, x0, h0)


def _dfs_bwd(res, cts):
    w_r, b1c, w_hh, w_p, x0, h0 = res
    return _dfs_bwd_cv(w_r, b1c, w_hh, w_p, x0, h0, *cts)


def _dfs_bwd_one(w_r, b1c, w_hh, w_p, x0, h0, dh1, dc1, dy1):
    H = h0.shape[-1]
    z = x0 @ w_r + h0 @ w_hh + b1c          # recompute
    i, f, g, o = _gate_acts(z, H)
    c1 = i * g                              # f * c0 = 0
    tc = jnp.tanh(c1)
    h1 = o * tc
    dh = dh1 + jax.lax.dot_general(dy1, w_p, (((1,), (1,)), ((), ())))
    dwp = jax.lax.dot_general(h1, dy1, (((0,), (0,)), ((), ())))
    dbp = jnp.sum(dy1, axis=0)
    do = dh * tc
    dc = dc1 + dh * o * (1.0 - tc * tc)
    zero = jnp.zeros_like(i)
    dz = jnp.concatenate([
        dc * g * i * (1.0 - i), zero,       # df: c_prev = 0 kills the term
        dc * i * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    dwr = jax.lax.dot_general(x0, dz, (((0,), (0,)), ((), ())))
    dwh = jax.lax.dot_general(h0, dz, (((0,), (0,)), ((), ())))
    dx0 = jax.lax.dot_general(dz, w_r, (((1,), (1,)), ((), ())))
    dh0 = jax.lax.dot_general(dz, w_hh, (((1,), (1,)), ((), ())))
    return dwr, jnp.sum(dz, axis=0), dwh, dwp, dbp, dx0, dh0


@jax.custom_batching.custom_vmap
def _dfs_fwd_cv(w_r, b1c, w_hh, w_p, b_p, x0, h0):
    return _dfs_fwd(w_r, b1c, w_hh, w_p, b_p, x0, h0)


@_dfs_fwd_cv.def_vmap
def _dfs_fwd_rule(axis_size, in_batched, *args):
    R = axis_size
    args = bc_args(args, in_batched, R)
    if R > _vmap_unroll_max("first"):   # guard: HLO size scales with R below
        out = jax.vmap(_dfs_fwd)(*args)
        return out, ((True, True, True), (True,) * 6)
    outs = [_dfs_fwd(*[a[r] for a in args]) for r in range(R)]
    out = (tuple(jnp.stack([o[0][i] for o in outs]) for i in range(3)),
           tuple(args[i] for i in (0, 1, 2, 3, 5, 6)))
    return out, ((True, True, True), (True,) * 6)


@jax.custom_batching.custom_vmap
def _dfs_bwd_cv(w_r, b1c, w_hh, w_p, x0, h0, dh1, dc1, dy1):
    return _dfs_bwd_one(w_r, b1c, w_hh, w_p, x0, h0, dh1, dc1, dy1)


@_dfs_bwd_cv.def_vmap
def _dfs_bwd_rule(axis_size, in_batched, *args):
    R = axis_size
    args = bc_args(args, in_batched, R)
    if R > _vmap_unroll_max("first"):   # guard: HLO size scales with R below
        return jax.vmap(_dfs_bwd_one)(*args), (True,) * 7
    outs = [_dfs_bwd_one(*[a[r] for a in args]) for r in range(R)]
    return (tuple(jnp.stack([o[i] for o in outs]) for i in range(7)),
            (True,) * 7)


decoder_first_step.defvjp(
    lambda *a: _dfs_fwd_cv(*a),
    _dfs_bwd)


def lstm_scan(params: dict, xs: jnp.ndarray, h0: jnp.ndarray | None = None,
              c0: jnp.ndarray | None = None, impl: str = "scan"
              ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the LSTM over time. xs [T, B, in] -> (outputs [T, B, H], (hT, cT)).

    Zero initial state by default (reference ``sgan/models.py:56-60``).
    """
    B = xs.shape[1]
    H = params["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((B, H), xs.dtype)
    if c0 is None:
        c0 = jnp.zeros((B, H), xs.dtype)
    if impl == "pallas":
        from grouptraj.ops.pallas_lstm import lstm_scan_pallas
        return lstm_scan_pallas(params, xs, h0, c0)

    # Sequential-depth reduction (the cuDNN trick): the input-gate products
    # x_t @ W_ih for ALL timesteps are one [T·B, in] @ [in, 4H] MXU matmul —
    # XLA cannot hoist it out of the scan itself — leaving a single
    # [B, H] @ [H, 4H] matmul + gate math per sequential step.
    gx = xs @ params["w_ih"] + (params["b_ih"] + params["b_hh"])
    if impl == "fused" and jax.default_backend() == "tpu":
        from grouptraj.ops.pallas_fused import lstm_recurrence_pallas
        ys, (hT, cT) = lstm_recurrence_pallas(params["w_hh"], gx, h0, c0)
        return ys, (hT, cT)

    ys, hT, cT = lstm_recurrence(params["w_hh"], gx, h0, c0)
    return ys, (hT, cT)
