"""Device-plane microbenchmark of the fused pool kernel fwd/bwd.

Times ``pool_core_pallas`` forward and backward at the production shapes
(the three hot call sites tools/profile_step.py attributes: d-step
stacked discriminator pool [2S, N], g-step discriminator pool [S, N],
g-step generator context pool [S, N]) using ``jax.profiler.trace`` device
durations, so results stay valid while training jobs share the chip (TPU
programs serialize; each program's own span is unaffected).

Scene sizes are drawn to match the widest zara1 training bucket
(17..64, mean ~29) so the size-aware skip logic is exercised as in
production.

Usage::

    python tools/pool_bench.py [--S 64] [--N 64] [--reps 30]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def device_ms(fn, args, reps, tag):
    """Sum of leaf device-op durations for `reps` calls of jitted fn."""
    import glob
    import gzip
    import json
    import re
    import tempfile

    import jax
    import numpy as np

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
    td = tempfile.mkdtemp(prefix=f"poolbench_{tag}_")
    with jax.profiler.trace(td):
        for _ in range(reps):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
    [path] = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                       recursive=True)
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name"))}
    container = re.compile(r"^(jit_|\d+$|while)")
    tot = 0.0
    for e in ev:
        if (e.get("pid") in dev_pids and e.get("ph") == "X"
                and not container.match(e["name"])):
            tot += e["dur"]
    return tot / 1e3 / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--S", type=int, default=64)
    ap.add_argument("--N", type=int, default=64)
    ap.add_argument("--K", type=int, default=512)
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.ops.pallas_pool import pool_core_pallas
    from grouptraj.ops.pooling import pool_core

    rng = np.random.default_rng(0)

    def make(S):
        lo = min(17, max(args.N // 2, 1))
        sizes = rng.integers(lo, args.N + 1, S)
        valid = (np.arange(args.N)[None, :] < sizes[:, None])
        a = jnp.asarray(rng.standard_normal((S, args.N, args.K)), jnp.float32)
        u = jnp.asarray(rng.standard_normal((S, args.N, args.K)), jnp.float32)
        W2 = jnp.asarray(rng.standard_normal((args.K, args.B)) * 0.05,
                         jnp.float32)
        b2 = jnp.zeros((args.B,), jnp.float32)
        return a, u, W2, b2, jnp.asarray(valid)

    def loss(core, *xs):
        return jnp.sum(core(*xs[:4], xs[4]) * 1e-3)

    for S in (args.S, 2 * args.S):
        xs = make(S)
        for name, core in (("pallas", pool_core_pallas), ("xla", pool_core)):
            fwd = jax.jit(lambda *z, c=core: c(*z[:4], z[4]))
            grad = jax.jit(jax.grad(lambda *z, c=core: loss(c, *z),
                                    argnums=(0, 1, 2, 3)))
            f = device_ms(fwd, xs, args.reps, f"{name}_f{S}")
            fb = device_ms(grad, xs, args.reps, f"{name}_g{S}")
            print(f"S={S:4d} {name:7s} fwd {f:8.3f} ms   fwd+bwd {fb:8.3f} ms"
                  f"   bwd-only ~{fb - f:7.3f} ms")


if __name__ == "__main__":
    main()
