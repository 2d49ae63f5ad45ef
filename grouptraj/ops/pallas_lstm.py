"""Fused Pallas TPU LSTM: the whole time loop in one kernel launch.

Replaces the reference's cuDNN ``nn.LSTM`` on the hot path. One
``pallas_call`` runs all T steps: the grid is ``(batch_blocks, T)`` with the
time dimension innermost — TPU grids execute sequentially, so the (h, c)
carry lives in VMEM scratch across grid steps while the pipeline streams
one ``[block, D]`` timestep slab at a time. Each step is two MXU matmuls
``[Bb, D]@[D, 4H]`` + ``[Bb, H]@[H, 4H]`` and VPU gate math; weights stay
resident in VMEM.

Training support is a full Pallas BPTT backward kernel via ``custom_vjp``:
the forward saves per-step post-activation gates and cell states to HBM,
the backward walks the grid in reverse time accumulating ``dW`` in VMEM
scratch. Gate order matches torch (i, f, g, o), so the same parameters drive
the ``lax.scan`` and Pallas paths interchangeably (tested equal).

Why this shape: B = S·N_max reaches ~4096 rows, H = 32-48 → the fused gate
width 4H = 128-192 lands on the 128-lane MXU tiles; per-step dispatch and
HBM carry round-trips (the XLA scan fallback) are what is eliminated.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grouptraj.utils import round_up

_BLOCK_B = 1024  # batch rows per grid block


def _split_gates(z, H):
    i = jax.nn.sigmoid(z[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(z[:, 1 * H:2 * H])
    g = jnp.tanh(z[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
    return i, f, g, o


def _fwd_kernel(x_ref, w_ih_ref, w_hh_ref, b_ref, h0_ref, c0_ref,
                y_ref, hT_ref, cT_ref, gate_ref, c_out_ref,
                h_s, c_s, *, T, H):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    h = h_s[:]
    z = (jnp.dot(x_ref[0], w_ih_ref[:], preferred_element_type=jnp.float32)
         + jnp.dot(h, w_hh_ref[:], preferred_element_type=jnp.float32)
         + b_ref[:])
    i, f, g, o = _split_gates(z, H)
    gate_ref[0] = jnp.concatenate([i, f, g, o], axis=-1)
    c = f * c_s[:] + i * g
    c_out_ref[0] = c
    h = o * jnp.tanh(c)
    y_ref[0] = h
    h_s[:] = h
    c_s[:] = c
    hT_ref[:] = h
    cT_ref[:] = c


def _bwd_kernel(x_ref, w_ih_ref, w_hh_ref, y_prev_ref,
                c_prev_ref, gate_ref, dy_ref, dhT_ref, dcT_ref,
                dx_ref, dwih_ref, dwhh_ref, db_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, dwih_s, dwhh_s, db_s, *, T, H):
    """Grid step t processes real time rt = T-1-t (reverse BPTT).

    ``y_prev``/``c_prev`` are the pre-shifted state arrays
    ``[h0; ys[:-1]]`` / ``[c0; cs[:-1]]`` so every block uses a plain
    reverse index map (no clamping inside the kernel).
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dh_s[:] = dhT_ref[:]
        dc_s[:] = dcT_ref[:]
        dwih_s[:] = jnp.zeros_like(dwih_s)
        dwhh_s[:] = jnp.zeros_like(dwhh_s)
        db_s[:] = jnp.zeros_like(db_s)

    gates = gate_ref[0]
    i = gates[:, 0 * H:1 * H]
    f = gates[:, 1 * H:2 * H]
    g = gates[:, 2 * H:3 * H]
    o = gates[:, 3 * H:4 * H]
    c_prev = c_prev_ref[0]
    h_prev = y_prev_ref[0]
    c = f * c_prev + i * g                      # recompute c_t (saves a load)
    tc = jnp.tanh(c)

    dh = dh_s[:] + dy_ref[0]
    do = dh * tc
    dc = dc_s[:] + dh * o * (1.0 - tc * tc)
    di = dc * g
    dg = dc * i
    df = dc * c_prev
    dc_next = dc * f
    dz = jnp.concatenate([
        di * i * (1.0 - i), df * f * (1.0 - f),
        dg * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    # contractions phrased via dot_general so no operand is transposed in
    # VMEM: dz @ Wᵀ contracts the 4H lanes; xᵀ @ dz contracts the rows.
    dot_nt = lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dot_tn = lambda a, b: jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dx_ref[0] = dot_nt(dz, w_ih_ref[:])
    dh_next = dot_nt(dz, w_hh_ref[:])
    dwih_s[:] += dot_tn(x_ref[0], dz)
    dwhh_s[:] += dot_tn(h_prev, dz)
    db_s[:] += jnp.sum(dz, axis=0, keepdims=True)
    dh_s[:] = dh_next
    dc_s[:] = dc_next
    # flushed once per batch block; the final (t == T-1) values win
    dwih_ref[0] = dwih_s[:]
    dwhh_ref[0] = dwhh_s[:]
    db_ref[0] = db_s[:]
    dh0_ref[:] = dh_next
    dc0_ref[:] = dc_next


def _grid_setup(B, H=128):
    """Pick the batch block so per-step VMEM (gates block×4H dominates)
    stays under the ~16 MB scoped limit at any hidden size.

    The block is 8-row aligned (f32 sublane tile) and balanced: given the
    VMEM cap, split the padded batch evenly across the minimum number of
    blocks rather than padding B up to a multiple of the cap — e.g.
    H=160, B=1024 gets 2x512 (zero waste) instead of 2x816 (1.6x compute
    and saved-gates inflation). The backward pass calls this same function
    so its grid always matches the forward's padding.

    The 112/128 factor at H >= 128 leaves headroom for the BACKWARD's
    extra scratch (dz + dW accumulators next to the recomputed gates): at
    the full 128/128 cap the bwd kernel's scoped VMEM measured 16.19 MB
    vs the 16 MB limit at H=128, B=65536 (tools/scale_bench.py OOM);
    H <= 112 is unaffected.
    """
    Bp = round_up(max(B, 8), 8)
    cap = min(_BLOCK_B, _BLOCK_B * 112 // max(H, 112), Bp)
    cap = max(cap - cap % 8, 8)
    nb = -(-Bp // cap)
    block = round_up(-(-Bp // nb), 8)
    return block * nb, block, nb


def _lstm_pallas_fwd_impl(w_ih, w_hh, b, xs, h0, c0):
    T, B, D = xs.shape
    H = w_hh.shape[0]
    Bp, block, nb = _grid_setup(B, H)
    xs_p = jnp.pad(xs, ((0, 0), (0, Bp - B), (0, 0)))
    h0_p = jnp.pad(h0, ((0, Bp - B), (0, 0)))
    c0_p = jnp.pad(c0, ((0, Bp - B), (0, 0)))
    b2 = b.reshape(1, -1)

    step_spec = lambda w: pl.BlockSpec(
        (1, block, w), lambda ib, t: (t, ib, 0), memory_space=pltpu.VMEM)
    full_spec = lambda r, cdim: pl.BlockSpec(
        (r, cdim), lambda ib, t: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = lambda w: pl.BlockSpec(
        (block, w), lambda ib, t: (ib, 0), memory_space=pltpu.VMEM)

    ys, hT, cT, gates, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, H=H),
        grid=(nb, T),
        in_specs=[step_spec(D), full_spec(D, 4 * H), full_spec(H, 4 * H),
                  full_spec(1, 4 * H), vec_spec(H), vec_spec(H)],
        out_specs=(step_spec(H), vec_spec(H), vec_spec(H),
                   step_spec(4 * H), step_spec(H)),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block, H), jnp.float32),
                        pltpu.VMEM((block, H), jnp.float32)],
    )(xs_p, w_ih, w_hh, b2, h0_p, c0_p)
    return ys[:, :B], hT[:B], cT[:B], gates, cs


@jax.custom_vjp
def _lstm_pallas(w_ih, w_hh, b, xs, h0, c0):
    ys, hT, cT, _, _ = _lstm_pallas_fwd_impl(w_ih, w_hh, b, xs, h0, c0)
    return ys, hT, cT


def _fwd_rule(w_ih, w_hh, b, xs, h0, c0):
    ys, hT, cT, gates, cs = _lstm_pallas_fwd_impl(w_ih, w_hh, b, xs, h0, c0)
    return (ys, hT, cT), (w_ih, w_hh, xs, h0, c0, ys, gates, cs)


def _bwd_rule(res, cts):
    w_ih, w_hh, xs, h0, c0, ys, gates, cs = res
    dys, dhT, dcT = cts
    T, B, D = xs.shape
    H = w_hh.shape[0]
    Bp, block, nb = _grid_setup(B, H)
    assert Bp == gates.shape[1], "backward grid desynced from forward"

    pad_b = lambda a: jnp.pad(a, ((0, 0), (0, Bp - a.shape[1]), (0, 0))) \
        if a.ndim == 3 else jnp.pad(a, ((0, Bp - a.shape[0]), (0, 0)))
    xs_p, ys_p, dys_p = pad_b(xs), pad_b(ys), pad_b(dys)
    dhT_p, dcT_p = pad_b(dhT), pad_b(dcT)
    h0_p, c0_p = pad_b(h0), pad_b(c0)
    # pre-shifted previous-step states: index [t] holds state at t-1
    ys_prev = jnp.concatenate([h0_p[None], ys_p[:-1]], axis=0)
    cs_prev = jnp.concatenate([c0_p[None], cs[:-1]], axis=0)

    rev = lambda w: pl.BlockSpec(
        (1, block, w), lambda ib, t: (T - 1 - t, ib, 0),
        memory_space=pltpu.VMEM)
    full_spec = lambda r, cdim: pl.BlockSpec(
        (r, cdim), lambda ib, t: (0, 0), memory_space=pltpu.VMEM)
    vec_spec = lambda w: pl.BlockSpec(
        (block, w), lambda ib, t: (ib, 0), memory_space=pltpu.VMEM)
    acc_spec = lambda r, cdim: pl.BlockSpec(
        (1, r, cdim), lambda ib, t: (ib, 0, 0), memory_space=pltpu.VMEM)

    dxs, dwih_b, dwhh_b, db_b, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, H=H),
        grid=(nb, T),
        in_specs=[rev(D), full_spec(D, 4 * H), full_spec(H, 4 * H),
                  rev(H), rev(H), rev(4 * H), rev(H),
                  vec_spec(H), vec_spec(H)],
        out_specs=(rev(D), acc_spec(D, 4 * H), acc_spec(H, 4 * H),
                   acc_spec(1, 4 * H), vec_spec(H), vec_spec(H)),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, D), jnp.float32),
            jax.ShapeDtypeStruct((nb, D, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, H), jnp.float32),
            pltpu.VMEM((block, H), jnp.float32),
            pltpu.VMEM((D, 4 * H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((1, 4 * H), jnp.float32),
        ],
    )(xs_p, w_ih, w_hh, ys_prev, cs_prev, gates, dys_p, dhT_p, dcT_p)

    return (jnp.sum(dwih_b, axis=0), jnp.sum(dwhh_b, axis=0),
            jnp.sum(db_b, axis=0)[0], dxs[:, :B], dh0[:B], dc0[:B])


_lstm_pallas.defvjp(_fwd_rule, _bwd_rule)


def lstm_scan_pallas(params: dict, xs: jnp.ndarray, h0: jnp.ndarray,
                     c0: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Drop-in for :func:`grouptraj.ops.lstm.lstm_scan` with impl='pallas'."""
    b = params["b_ih"] + params["b_hh"]
    ys, hT, cT = _lstm_pallas(params["w_ih"], params["w_hh"], b,
                              xs.astype(jnp.float32), h0.astype(jnp.float32),
                              c0.astype(jnp.float32))
    return ys, (hT, cT)
