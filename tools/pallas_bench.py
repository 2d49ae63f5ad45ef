"""Micro-benchmark: Pallas fused LSTM vs XLA lax.scan LSTM on this chip.

Times forward and forward+backward (BPTT) across hidden sizes and batch
sizes, T=8 (the encoder's sequence length). Each measurement runs CHAIN=50
data-dependent applications inside ONE jitted lax.scan so the device stays
busy and per-dispatch tunnel latency (ms-scale on axon) cannot swamp the
sub-ms kernels; sync is a host readback (the only reliable barrier here).
Results feed the ARCHITECTURE.md table and the TrainConfig.use_pallas
default.

Run: python tools/pallas_bench.py  (on the TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import setup_jax_cache  # noqa: E402

setup_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from grouptraj.ops.lstm import init_lstm, lstm_scan  # noqa: E402

CHAIN = 50


def chained_fwd(impl):
    def run(p, xs):
        def body(c, _):
            ys, _ = lstm_scan(p, c, impl=impl)
            return c + 1e-6 * ys[..., : c.shape[-1]], ()
        c, _ = jax.lax.scan(body, xs, None, length=CHAIN)
        return c
    return jax.jit(run)


def chained_grad(impl):
    def loss(p, xs):
        def body(c, _):
            ys, _ = lstm_scan(p, c, impl=impl)
            return c + 1e-6 * ys[..., : c.shape[-1]], jnp.sum(ys ** 2)
        _, ls = jax.lax.scan(body, xs, None, length=CHAIN)
        return jnp.sum(ls)
    return jax.jit(jax.grad(loss))


def time_fn(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])       # compile + sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])       # hard sync
    return (time.time() - t0) / reps / CHAIN * 1e3      # ms per application


def main():
    T, E = 8, 16
    print(f"platform: {jax.devices()[0].platform}, T={T}, in_dim={E}, "
          f"chain={CHAIN}")
    print(f"{'B':>6} {'H':>4} | {'scan fwd':>9} {'pallas fwd':>10} | "
          f"{'scan f+b':>9} {'pallas f+b':>10} | winner(f+b)")
    rows = []
    for B in (1024, 4096):
        for H in (32, 64, 128, 256):
            key = jax.random.PRNGKey(0)
            p = init_lstm(key, E, H)
            xs = jax.random.normal(key, (T, B, E))
            sf = time_fn(chained_fwd("scan"), p, xs)
            pf = time_fn(chained_fwd("pallas"), p, xs)
            sg = time_fn(chained_grad("scan"), p, xs)
            pg = time_fn(chained_grad("pallas"), p, xs)
            win = "pallas" if pg < sg else "scan"
            rows.append((B, H, sf, pf, sg, pg, win))
            print(f"{B:>6} {H:>4} | {sf:9.3f} {pf:10.3f} | "
                  f"{sg:9.3f} {pg:10.3f} | {win}", flush=True)
    print("\nmarkdown:")
    print("| B | H | scan fwd ms | pallas fwd ms | scan fwd+bwd ms | "
          "pallas fwd+bwd ms | winner (f+b) |")
    print("|---|---|---|---|---|---|---|")
    for B, H, sf, pf, sg, pg, win in rows:
        print(f"| {B} | {H} | {sf:.3f} | {pf:.3f} | {sg:.3f} | {pg:.3f} | "
              f"{win} |")


if __name__ == "__main__":
    main()
