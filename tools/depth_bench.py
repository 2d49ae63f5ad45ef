"""Micro-benchmarks for the sequential-depth bound (VERDICT r2 item 1).

Times the components of the training step in isolation on the current
device to locate the ceiling: XLA per-scan-step overhead vs VPU
transcendental throughput vs MXU matmul time. Run on the v5e; host
readback is the only reliable sync (CLAUDE.md).

Usage: python tools/depth_bench.py [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import setup_jax_cache  # noqa: E402

setup_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])      # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # hard sync
        best = min(best, time.time() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--B", type=int, default=81920,
                    help="decoder rows (g-step wide bucket: 20*64*64)")
    ap.add_argument("--T", type=int, default=12)
    ap.add_argument("--H", type=int, default=32)
    ap.add_argument("--no-kernels", action="store_true")
    args = ap.parse_args()
    B, T, H = args.B, args.T, args.H
    key = jax.random.PRNGKey(0)
    h0 = jax.random.normal(key, (B, H), jnp.float32)
    w = jax.random.normal(key, (H, 4 * H), jnp.float32) * 0.1
    b = jnp.zeros((4 * H,), jnp.float32)

    from grouptraj.ops.lstm import lstm_gates

    def recur(w, b, h0):
        def step(carry, _):
            h, c = carry
            h, c = lstm_gates(h @ w + b, c, H)
            return (h, c), h
        _, ys = jax.lax.scan(step, (h0, jnp.zeros_like(h0)), None, length=T)
        return ys

    def recur_loss(w, b, h0):
        return jnp.sum(recur(w, b, h0) ** 2)

    def matmul_chain(w, h0):
        def step(h, _):
            return jnp.tanh(h @ w[:, :H]), None
        h, _ = jax.lax.scan(step, h0, None, length=T)
        return h

    def gates_only(b, h0):
        # T steps of pure gate math, no matmul: VPU/transcendental bound
        def step(carry, _):
            h, c = carry
            z = jnp.concatenate([h, h, h, h], axis=-1) + b
            h, c = lstm_gates(z, c, H)
            return (h, c), None
        (h, c), _ = jax.lax.scan(step, (h0, jnp.zeros_like(h0)), None,
                                 length=T)
        return h

    def big_matmul(h0, w):
        # the same FLOPs as T recurrence matmuls, in ONE call: MXU bound
        hs = jnp.broadcast_to(h0[None], (T,) + h0.shape).reshape(T * B, H)
        return hs @ w

    fwd = jax.jit(recur)
    g = jax.jit(jax.grad(recur_loss, argnums=(0, 1, 2)))
    mm = jax.jit(matmul_chain)
    go = jax.jit(gates_only)
    bm = jax.jit(big_matmul)

    t_fwd = timeit(fwd, w, b, h0, reps=args.reps)
    t_bwd = timeit(g, w, b, h0, reps=args.reps)
    t_mm = timeit(mm, w, h0, reps=args.reps)
    t_go = timeit(go, b, h0, reps=args.reps)
    t_bm = timeit(bm, h0, w, reps=args.reps)

    print(f"B={B} T={T} H={H}  (times = best of {args.reps}, ms)", flush=True)
    print(f"  recurrence fwd (scan, {T} steps):   {t_fwd*1e3:8.3f}")
    print(f"  recurrence fwd+bwd:                 {t_bwd*1e3:8.3f}")
    print(f"  matmul-only chain ({T} steps):      {t_mm*1e3:8.3f}")
    print(f"  gate-math-only chain ({T} steps):   {t_go*1e3:8.3f}")
    print(f"  same matmul FLOPs, one call:        {t_bm*1e3:8.3f}")

    if jax.default_backend() != "tpu" or args.no_kernels:
        print("(kernel comparison skipped)", flush=True)
        return

    from grouptraj.ops.pallas_fused import decoder_recurrence_pallas

    def recur_fused(w, b, h0):
        return decoder_recurrence_pallas(w, b, h0, jnp.zeros_like(h0), T)

    def recur_fused_loss(w, b, h0):
        return jnp.sum(recur_fused(w, b, h0) ** 2)

    try:
        ff = jax.jit(recur_fused)
        fg = jax.jit(jax.grad(recur_fused_loss, argnums=(0, 1, 2)))
        t_ff = timeit(ff, w, b, h0, reps=args.reps)
        print(f"  fused-kernel decoder fwd:           {t_ff*1e3:8.3f}",
              flush=True)
        t_fg = timeit(fg, w, b, h0, reps=args.reps)
        print(f"  fused-kernel decoder fwd+bwd:       {t_fg*1e3:8.3f}",
              flush=True)
    except Exception as e:
        print(f"  fused-kernel decoder FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

    # encoder-style comparison: gx-precomputed recurrence, scan vs kernels
    from grouptraj.ops.lstm import init_lstm, lstm_scan
    for (Te, Be, He, tag) in ((8, 4096, 32, "G-enc"), (20, 8192, 48, "D-enc")):
        p = init_lstm(jax.random.PRNGKey(0), 16, He)
        xs = jax.random.normal(key, (Te, Be, 16), jnp.float32)

        res = {}
        for impl in ("scan", "pallas", "fused"):
            def f(p, xs, impl=impl):
                ys, (hT, cT) = lstm_scan(p, xs, impl=impl)
                return jnp.sum(hT ** 2)
            try:
                jf = jax.jit(f)
                jg = jax.jit(jax.grad(f, argnums=0))
                res[impl] = (timeit(jf, p, xs, reps=args.reps),
                             timeit(jg, p, xs, reps=args.reps))
            except Exception as e:
                print(f"  {tag} {impl} FAILED: {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
        line = " ".join(f"{impl} {res[impl][0]*1e3:.3f}/{res[impl][1]*1e3:.3f}"
                        for impl in res)
        print(f"  {tag} T={Te} B={Be} H={He} fwd/fwd+bwd ms: {line}",
              flush=True)


if __name__ == "__main__":
    main()
