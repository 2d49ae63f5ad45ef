"""Per-op device-time profile of the production training dispatch.

Traces ``make_train_chunk`` (the exact program bench.py times) with
``jax.profiler.trace`` and prints device-plane op durations summed by op
name, so perf work targets measured hotspots instead of the step-time
folklore. Works through the axon tunnel (the TPU device plane is present
in the trace; other processes' programs are not captured, and TPU programs
serialize, so per-op durations stay valid under queue contention).

Usage::

    python tools/profile_step.py [--chunk 10] [--bucket 2] [--batch 64]
    python tools/profile_step.py --leg d|g      # profile one leg only
    python tools/profile_step.py --impl fused   # A/B an LSTM implementation
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dispatch(args):
    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig, TrainConfig
    from grouptraj.data.batching import DenseDataset
    from grouptraj.train.device_data import device_dataset, make_buckets
    from grouptraj.train.steps import init_train_state

    from grouptraj.train.loop import build_loaders

    cfg = ModelConfig()
    tcfg = TrainConfig(dataset_name="zara1", batch_size=args.batch,
                       d_steps=args.d_steps, g_steps=args.g_steps,
                       bf16_nograd=bool(getattr(args, "bf16", 0)))
    train_dset, train_loader, _ = build_loaders(cfg, tcfg)
    buckets = make_buckets(train_dset, 3, args.batch)
    w, bidx = buckets[min(args.bucket, len(buckets) - 1)]
    data = device_dataset(DenseDataset(train_dset, w, indices=bidx),
                          cfg.obs_len)
    num_seq = len(bidx)
    print(f"bucket {args.bucket}: {num_seq} scenes, n_max={w}")

    if args.leg == "full":
        from grouptraj.train.steps import make_train_chunk
        run = make_train_chunk(cfg, tcfg, args.impl, args.chunk)
        n_draw = tcfg.d_steps + tcfg.g_steps
        if args.n_seeds > 1:
            # the train_many composition (train/multi.py get_runner):
            # replica axis on state + key, data/idx broadcast
            from grouptraj.train.steps import build_train_chunk
            run = jax.jit(jax.vmap(
                build_train_chunk(cfg, tcfg, args.impl, args.chunk),
                in_axes=(0, None, None, 0)))
    else:
        # single-leg chunk: scan the chosen raw step over the dispatch
        from grouptraj.train.device_data import gather_batch
        from grouptraj.train.steps import build_d_step, build_g_step
        raw = (build_d_step if args.leg == "d" else build_g_step)(
            cfg, tcfg, args.impl)

        def chunk_fn(state, data, idx, key):
            keys = jax.random.split(key, args.chunk)

            def body(state, xs):
                bidx, k = xs
                return raw(state, gather_batch(data, bidx[0], cfg.obs_len), k)

            return jax.lax.scan(body, state, (idx, keys))

        run = jax.jit(chunk_fn)
        n_draw = 1

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, num_seq,
                                   (args.chunk, n_draw, args.batch)),
                      jnp.int32)
    key = jax.random.PRNGKey(0)
    if args.leg == "full" and args.n_seeds > 1:
        keys = jax.random.split(key, args.n_seeds)
        state = jax.jit(jax.vmap(
            lambda k: init_train_state(k, cfg, tcfg)))(keys)
        return run, state, data, idx, keys
    state = init_train_state(key, cfg, tcfg)
    return run, state, data, idx, key


def summarize(trace_dir, top=35):
    [path] = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    with gzip.open(path) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name"))}
    # containers (the jit program, scan bodies, trace-group rows) enclose
    # leaf op events — drop them so sums don't double count
    container = re.compile(r"^(jit_|\d+$|while)")
    tot, cnt, full_tot, full_cnt = {}, {}, {}, {}
    t0, t1 = None, None
    for e in ev:
        if e.get("pid") in dev_pids and e.get("ph") == "X":
            name = e["name"]
            if container.match(name):
                ts, te = e["ts"], e["ts"] + e["dur"]
                t0 = ts if t0 is None else min(t0, ts)
                t1 = te if t1 is None else max(t1, te)
                continue
            base = re.sub(r"[._]\d+(\.clone)?$", "", name)
            tot[base] = tot.get(base, 0.0) + e["dur"]
            cnt[base] = cnt.get(base, 0) + 1
            full_tot[name] = full_tot.get(name, 0.0) + e["dur"]
            full_cnt[name] = full_cnt.get(name, 0) + 1
    total = sum(tot.values())
    print(f"\ndevice busy (leaf ops): {total/1e3:.2f} ms   "
          f"program span: {(t1 - t0)/1e3:.2f} ms")
    print(f"{'op class':<44}{'ms':>9}{'%':>7}{'count':>8}")
    for name in sorted(tot, key=tot.get, reverse=True)[:top]:
        print(f"{name:<44}{tot[name]/1e3:>9.3f}"
              f"{100 * tot[name]/total:>6.1f}%{cnt[name]:>8}")
    print(f"\ntop individual ops:")
    print(f"{'op':<44}{'ms':>9}{'us/call':>9}{'count':>8}")
    for name in sorted(full_tot, key=full_tot.get, reverse=True)[:top]:
        print(f"{name:<44}{full_tot[name]/1e3:>9.3f}"
              f"{full_tot[name]/full_cnt[name]:>9.1f}{full_cnt[name]:>8}")
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--bucket", type=int, default=2,
                    help="bucket index (2 = widest, n_max=64 on zara1)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--d_steps", type=int, default=1)
    ap.add_argument("--g_steps", type=int, default=1)
    ap.add_argument("--leg", choices=["full", "d", "g"], default="full")
    ap.add_argument("--impl", choices=["scan", "pallas", "fused"],
                    default="scan", help="LSTM implementation to profile")
    ap.add_argument("--n_seeds", type=int, default=1,
                    help="profile the train_many vmapped chunk with this "
                         "many seed replicas (leg=full only)")
    ap.add_argument("--top", type=int, default=35)
    ap.add_argument("--bf16", type=int, default=1,
                    help="TrainConfig.bf16_nograd for the profiled step "
                         "(default 1 = the production default since round "
                         "5; pass 0 to profile the exact-f32 path)")
    args = ap.parse_args()

    import jax
    import numpy as np

    run, state, data, idx, key = build_dispatch(args)
    # warm/compile
    state2, losses = run(state, data, idx, key)
    np.asarray(jax.tree_util.tree_leaves(losses)[0])

    trace_dir = tempfile.mkdtemp(prefix="grouptraj_prof_")
    with jax.profiler.trace(trace_dir):
        state2, losses = run(state, data, idx, key)
        np.asarray(jax.tree_util.tree_leaves(losses)[0])
    total_us = summarize(trace_dir, args.top)
    per_iter = total_us / 1e3 / args.chunk
    tag = f"{args.chunk}-iter chunk, leg={args.leg}"
    if args.n_seeds > 1:
        print(f"\n-> {per_iter:.3f} ms device time per iteration = "
              f"{per_iter/args.n_seeds:.3f} ms/seed-iter "
              f"({tag}, n_seeds={args.n_seeds})")
    else:
        print(f"\n-> {per_iter:.3f} ms device time per iteration ({tag})")


if __name__ == "__main__":
    main()
