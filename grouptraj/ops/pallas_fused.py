"""Fused Pallas TPU recurrence kernels: the WHOLE time loop in one grid step.

Round-3 depth-reduction work (ARCHITECTURE.md "Remaining step time"): the
training step is bound by the sequential depth of small fused ops, not FLOPs.
Two kernels built on a shared body attack it:

- :func:`lstm_recurrence_pallas` — LSTM over time with the input-gate
  products ``gx = xs @ W_ih + b`` precomputed OUTSIDE as one big MXU matmul
  (``ops/lstm.py``, the cuDNN trick); the kernel runs only the recurrent
  half: ``z_t = gx_t + h_{t-1} @ W_hh``.
- :func:`decoder_recurrence_pallas` — the folded autoregressive decoder
  (``models/generator.py:_decode_folded``): constant input, so a step is
  exactly ``z_t = h_{t-1} @ W_eff + b_eff``.

Unlike :mod:`grouptraj.ops.pallas_lstm` (grid ``(nb, T)`` — one grid step
and one pipeline slab per timestep), the grid here is ``(nb,)`` and a
``fori_loop`` walks all T steps with the weights, the (h, c) carry AND every
per-step slab resident in VMEM — zero per-timestep grid or pipeline
overhead. Sequences are short (T ≤ 20) and hiddens tiny (H ≤ 48), so full-T
slabs fit comfortably; the batch block is sized by :func:`_pick_block`.

Training support is a full Pallas BPTT backward via ``custom_vjp``: the
forward saves post-activation gates and cell states; the backward walks the
loop in reverse accumulating ``dW`` in VMEM scratch (per batch block,
summed outside). Gate order is torch (i, f, g, o) — reference
``sgan/models.py:54,118`` semantics, same parameters as the scan path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grouptraj.utils import round_up

_VMEM_BUDGET = 10 * 1024 * 1024    # of the ~16 MB scoped-vmem limit


def _pick_block(B: int, T: int, H: int, with_gx: bool) -> Tuple[int, int, int]:
    """Batch rows per grid step so all full-T VMEM slabs fit the budget.

    Two effects the budget must model (both bit the first cut, verified
    against Mosaic's scoped-vmem accounting on the v5e):
    - Mosaic DOUBLE-BUFFERS every in/out block for grid pipelining, so each
      slab counts twice;
    - the f32 tile is (8, 128): a [..., H] array with H < 128 still
      occupies 128 lanes, so H-wide slabs cost ``max(H, 128)`` lanes.

    Worst case is the backward kernel: slabs of T·4H (gates) + 3·T·H
    (cs_prev, hs_prev, dys) per row, plus the gx/dgx streams (T·4H each)
    when present, plus the h/c-class vectors and scratch. Returns
    (padded_B, block, num_blocks); block is 8-row aligned (f32 sublane
    tile) and the padded batch splits evenly across blocks.
    """
    lane = lambda d: max(d, 128)
    slab = T * lane(4 * H) + 3 * T * lane(H)
    if with_gx:
        slab += 2 * T * lane(4 * H)
    per_row = 4 * 2 * (slab + 8 * lane(H))
    cap = max(8, min(2048, _VMEM_BUDGET // max(per_row, 1)))
    cap -= cap % 8
    cap = max(cap, 8)
    Bp = round_up(max(B, 8), 8)
    nb = -(-Bp // cap)
    block = round_up(-(-Bp // nb), 8)
    return block * nb, block, nb


def _gate_forward(z, c, H):
    i = jax.nn.sigmoid(z[:, 0 * H:1 * H])
    f = jax.nn.sigmoid(z[:, 1 * H:2 * H])
    g = jnp.tanh(z[:, 2 * H:3 * H])
    o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, c2, jnp.concatenate([i, f, g, o], axis=-1)


def _gate_backward(gates, c_prev, dh, dc_in, H):
    """dz and the carry gradients for one step (recomputes c_t)."""
    i = gates[:, 0 * H:1 * H]
    f = gates[:, 1 * H:2 * H]
    g = gates[:, 2 * H:3 * H]
    o = gates[:, 3 * H:4 * H]
    c = f * c_prev + i * g
    tc = jnp.tanh(c)
    do = dh * tc
    dc = dc_in + dh * o * (1.0 - tc * tc)
    dz = jnp.concatenate([
        dc * g * i * (1.0 - i), dc * c_prev * f * (1.0 - f),
        dc * i * (1.0 - g * g), do * o * (1.0 - o)], axis=-1)
    return dz, dc * f


def _dot(a, b):            # [B, X] @ [X, Y] on the MXU, f32 accumulate
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_nt(a, b):         # a @ b.T without transposing b in VMEM
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):         # a.T @ b without transposing a in VMEM
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward kernels

def _fwd_kernel(whh_ref, h0_ref, c0_ref, gx_or_b_ref,
                ys_ref, hT_ref, cT_ref, gates_ref, cs_ref,
                h_s, c_s, *, T, H, with_gx):
    h_s[:] = h0_ref[:]
    c_s[:] = c0_ref[:]

    def body(t, _):
        gx = gx_or_b_ref[t] if with_gx else gx_or_b_ref[:]
        z = gx + _dot(h_s[:], whh_ref[:])
        h2, c2, gates = _gate_forward(z, c_s[:], H)
        ys_ref[t] = h2
        gates_ref[t] = gates
        cs_ref[t] = c2
        h_s[:] = h2
        c_s[:] = c2
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    hT_ref[:] = h_s[:]
    cT_ref[:] = c_s[:]


def _run_fwd(w, h0, c0, gx, b, T):
    """Shared pallas_call for both variants. gx [T, B, 4H] or None (then b
    [1, 4H] is the constant per-step input)."""
    with_gx = gx is not None
    B, H = h0.shape
    Bp, block, nb = _pick_block(B, T, H, with_gx)
    padB = lambda a: jnp.pad(a, ((0, Bp - a.shape[0]), (0, 0)))
    padTB = lambda a: jnp.pad(a, ((0, 0), (0, Bp - a.shape[1]), (0, 0)))
    h0p, c0p = padB(h0), padB(c0)
    inp = padTB(gx) if with_gx else b.reshape(1, -1)

    vec = lambda wd: pl.BlockSpec((block, wd), lambda ib: (ib, 0),
                                  memory_space=pltpu.VMEM)
    slab = lambda wd: pl.BlockSpec((T, block, wd), lambda ib: (0, ib, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda r, wd: pl.BlockSpec((r, wd), lambda ib: (0, 0),
                                      memory_space=pltpu.VMEM)

    ys, hT, cT, gates, cs = pl.pallas_call(
        functools.partial(_fwd_kernel, T=T, H=H, with_gx=with_gx),
        grid=(nb,),
        in_specs=[full(H, 4 * H), vec(H), vec(H),
                  slab(4 * H) if with_gx else full(1, 4 * H)],
        out_specs=(slab(H), vec(H), vec(H), slab(4 * H), slab(H)),
        out_shape=(
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((block, H), jnp.float32),
                        pltpu.VMEM((block, H), jnp.float32)],
    )(w, h0p, c0p, inp)
    return ys, hT, cT, gates, cs, (Bp, block, nb)


# ---------------------------------------------------------------------------
# backward kernels

def _bwd_kernel(whh_ref, gates_ref, cs_prev_ref, hs_prev_ref,
                dys_ref, dhT_ref, dcT_ref,
                dgx_ref, dw_ref, db_ref, dh0_ref, dc0_ref,
                dh_s, dc_s, dw_s, db_s, *, T, H, with_gx):
    dh_s[:] = dhT_ref[:]
    dc_s[:] = dcT_ref[:]
    dw_s[:] = jnp.zeros_like(dw_s)
    db_s[:] = jnp.zeros_like(db_s)

    def body(i, _):
        t = T - 1 - i
        dh = dh_s[:] + dys_ref[t]
        dz, dc_next = _gate_backward(gates_ref[t], cs_prev_ref[t], dh,
                                     dc_s[:], H)
        if with_gx:
            dgx_ref[t] = dz
        else:
            db_s[:] += jnp.sum(dz, axis=0, keepdims=True)
        dh_s[:] = _dot_nt(dz, whh_ref[:])
        dc_s[:] = dc_next
        dw_s[:] += _dot_tn(hs_prev_ref[t], dz)
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    dw_ref[0] = dw_s[:]
    db_ref[0] = db_s[:]
    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


def _run_bwd(w, h0, c0, ys, gates, cs, dys, dhT, dcT, with_gx):
    T, Bp, H = ys.shape
    B = h0.shape[0]
    _, block, nb = _pick_block(B, T, H, with_gx)
    padB = lambda a: jnp.pad(a, ((0, Bp - a.shape[0]), (0, 0)))
    padTB = lambda a: jnp.pad(a, ((0, 0), (0, Bp - a.shape[1]), (0, 0)))
    h0p, c0p = padB(h0), padB(c0)
    dys_p = padTB(dys)
    dhT_p = padB(dhT) if dhT is not None else jnp.zeros_like(h0p)
    dcT_p = padB(dcT) if dcT is not None else jnp.zeros_like(c0p)
    # pre-shifted previous-step states: index [t] holds the state at t-1
    hs_prev = jnp.concatenate([h0p[None], ys[:-1]], axis=0)
    cs_prev = jnp.concatenate([c0p[None], cs[:-1]], axis=0)

    vec = lambda wd: pl.BlockSpec((block, wd), lambda ib: (ib, 0),
                                  memory_space=pltpu.VMEM)
    slab = lambda wd: pl.BlockSpec((T, block, wd), lambda ib: (0, ib, 0),
                                   memory_space=pltpu.VMEM)
    full = lambda r, wd: pl.BlockSpec((r, wd), lambda ib: (0, 0),
                                      memory_space=pltpu.VMEM)
    acc = lambda r, wd: pl.BlockSpec((1, r, wd), lambda ib: (ib, 0, 0),
                                     memory_space=pltpu.VMEM)

    if with_gx:
        dgx_shape = jax.ShapeDtypeStruct((T, Bp, 4 * H), jnp.float32)
        dgx_spec = slab(4 * H)
    else:
        # the decoder variant has no per-step input: keep a minimal dummy
        # output (never written) so the VMEM slab is one tile, not T·B·4H
        dgx_shape = jax.ShapeDtypeStruct((1, 8, 4 * H), jnp.float32)
        dgx_spec = pl.BlockSpec((1, 8, 4 * H), lambda ib: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    dgx, dw_b, db_b, dh0, dc0 = pl.pallas_call(
        functools.partial(_bwd_kernel, T=T, H=H, with_gx=with_gx),
        grid=(nb,),
        in_specs=[full(H, 4 * H), slab(4 * H), slab(H), slab(H),
                  slab(H), vec(H), vec(H)],
        out_specs=(dgx_spec, acc(H, 4 * H), acc(1, 4 * H),
                   vec(H), vec(H)),
        out_shape=(
            dgx_shape,
            jax.ShapeDtypeStruct((nb, H, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 4 * H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
            jax.ShapeDtypeStruct((Bp, H), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block, H), jnp.float32),
            pltpu.VMEM((block, H), jnp.float32),
            pltpu.VMEM((H, 4 * H), jnp.float32),
            pltpu.VMEM((1, 4 * H), jnp.float32),
        ],
    )(w, gates, cs_prev, hs_prev, dys_p, dhT_p, dcT_p)
    dw = jnp.sum(dw_b, axis=0)
    db = jnp.sum(db_b, axis=0)[0]
    dgx_out = dgx[:, :B] if with_gx else None
    return dgx_out, dw, db, dh0[:B], dc0[:B]


# ---------------------------------------------------------------------------
# public ops with custom_vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _lstm_recur(w_hh, gx, h0, c0):
    T = gx.shape[0]
    B = h0.shape[0]
    ys, hT, cT, _, _, _ = _run_fwd(w_hh, h0, c0, gx, None, T)
    return ys[:, :B], hT[:B], cT[:B]


def _lstm_recur_fwd(w_hh, gx, h0, c0):
    T = gx.shape[0]
    B = h0.shape[0]
    ys, hT, cT, gates, cs, _ = _run_fwd(w_hh, h0, c0, gx, None, T)
    return ((ys[:, :B], hT[:B], cT[:B]),
            (w_hh, h0, c0, ys, gates, cs))


def _lstm_recur_bwd(res, cts):
    w_hh, h0, c0, ys, gates, cs = res
    dys, dhT, dcT = cts
    dgx, dw, _, dh0, dc0 = _run_bwd(w_hh, h0, c0, ys, gates, cs,
                                    dys, dhT, dcT, with_gx=True)
    return dw, dgx, dh0, dc0


_lstm_recur.defvjp(_lstm_recur_fwd, _lstm_recur_bwd)


def lstm_recurrence_pallas(w_hh, gx, h0, c0):
    """Recurrent half of an LSTM: gx [T, B, 4H] already holds
    ``x_t @ W_ih + b_ih + b_hh``. Returns (ys [T, B, H], (hT, cT))."""
    ys, hT, cT = _lstm_recur(w_hh, gx.astype(jnp.float32),
                             h0.astype(jnp.float32), c0.astype(jnp.float32))
    return ys, (hT, cT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _dec_recur(w_eff, b_eff, h1, c1, T):
    B = h1.shape[0]
    ys, _, _, _, _, _ = _run_fwd(w_eff, h1, c1, None, b_eff, T)
    return ys[:, :B]


def _dec_recur_fwd(w_eff, b_eff, h1, c1, T):
    B = h1.shape[0]
    ys, _, _, gates, cs, _ = _run_fwd(w_eff, h1, c1, None, b_eff, T)
    return ys[:, :B], (w_eff, h1, c1, ys, gates, cs)


def _dec_recur_bwd(T, res, dys):
    w_eff, h1, c1, ys, gates, cs = res
    _, dw, db, dh1, dc1 = _run_bwd(w_eff, h1, c1, ys, gates, cs,
                                   dys, None, None, with_gx=False)
    return dw, db, dh1, dc1


_dec_recur.defvjp(_dec_recur_fwd, _dec_recur_bwd)


def decoder_recurrence_pallas(w_eff, b_eff, h1, c1, T):
    """T steps of the folded decoder recurrence from (h1, c1); returns the
    stacked hidden states ys [T, B, H] (h_2 … h_{T+1})."""
    return _dec_recur(w_eff, b_eff.astype(jnp.float32),
                      h1.astype(jnp.float32), c1.astype(jnp.float32), T)
