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

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp

# Time-loop unroll factor for the scans (this module + the decoder scan).
# Measured on the v5e training step (bench.py, zara1 Bo20 bucketed):
# unroll 1 = 128 it/s, 4 = 90, 8 = 108 — unrolling only bloats the HLO at
# these tiny per-step shapes, so the rolled loop stays the default.
def _scan_unroll() -> int:
    raw = os.environ.get("GROUPTRAJ_SCAN_UNROLL", "1")
    try:
        return max(1, int(raw))
    except ValueError:
        import warnings
        warnings.warn(f"GROUPTRAJ_SCAN_UNROLL={raw!r} is not an int; using 1")
        return 1


SCAN_UNROLL = _scan_unroll()


def select_impl(cfg, tcfg) -> str:
    """Pick the LSTM implementation from TrainConfig.

    'auto' applies the measured v5e crossover (tools/pallas_bench.py; table
    in ARCHITECTURE.md): the fused Pallas BPTT kernel wins fwd+bwd once any
    hidden size reaches 64; at the reference's H = 32/48 XLA's lax.scan
    wins. Non-TPU backends always use scan (the kernel is Mosaic-only).
    """
    impl = getattr(tcfg, "lstm_impl", "auto")
    if getattr(tcfg, "use_pallas", False):
        impl = "pallas"
    if impl in ("scan", "pallas"):
        return impl if jax.default_backend() == "tpu" else "scan"
    if jax.default_backend() != "tpu":
        return "scan"
    h = max(cfg.encoder_h_dim_g, cfg.encoder_h_dim_d, cfg.decoder_h_dim_g)
    return "pallas" if h >= 64 else "scan"


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


def lstm_cell(params: dict, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step. x [B, in], h/c [B, H] -> (h', c')."""
    H = h.shape[-1]
    gates = x @ params["w_ih"] + h @ params["w_hh"] + (
        params["b_ih"] + params["b_hh"])
    i = jax.nn.sigmoid(gates[..., 0 * H:1 * H])
    f = jax.nn.sigmoid(gates[..., 1 * H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:4 * H])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


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

    def step(carry, x):
        h, c = carry
        h, c = lstm_cell(params, x, h, c)
        return (h, c), h

    (hT, cT), ys = jax.lax.scan(step, (h0, c0), xs, unroll=SCAN_UNROLL)
    return ys, (hT, cT)
