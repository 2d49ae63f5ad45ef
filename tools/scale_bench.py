"""Scale study: training throughput beyond the reference's problem sizes.

The reference pins tiny dims (encoder 32/48, decoder 32, embeddings 16,
N <= ~64 pedestrians — hardcoded at ``sgan/models.py:242-244,473``); the
grouptraj config generalizes every one of them, and the TPU ceiling
analysis (ARCHITECTURE.md round-3 closing audit) shows the flagship step
is sequential/VPU-bound at those sizes, i.e. the chip is mostly idle.
This tool measures how throughput holds up as the model and scene sizes
grow toward production scale — where the MXU finally has work to do and
the Pallas LSTM crossover (H >= 64, ARCHITECTURE.md "measured size
crossover") starts paying on the full step, not just the microbenchmark.

Method: synthetic device-resident dataset (`synthetic_device_data`) at
uniform scene width N, one bucket, the production fused-chunk dispatch
(`make_train_chunk`, 50 iterations per dispatch), end-to-end wall clock
with host-readback sync (the only valid sync through the axon tunnel —
CLAUDE.md). Reports the median of reps per configuration; at H >= 64 both
LSTM impls are timed so the auto rule's pick is visible in context.

Run on an OTHERWISE IDLE TPU (wall-clock timing under queue contention is
invalid): python tools/scale_bench.py [--reps 3] [--chunk 50] [--markdown]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts._common import setup_jax_cache  # noqa: E402

setup_jax_cache()

# (label, enc_h_g, dec_h_g, enc_h_d, emb, noise, N, batch)
GRID = [
    ("reference",        32,  32,  48,  16,  8, 64,  64),
    ("H=64",             64,  64,  64,  16,  8, 64,  64),
    ("H=128",           128, 128, 128,  32, 16, 64,  64),
    ("N=128",            32,  32,  48,  16,  8, 128, 64),
    ("H=128 N=128",     128, 128, 128,  32, 16, 128, 64),
    ("batch=256",        32,  32,  48,  16,  8, 64,  256),
    ("H=128 N=128 B=256", 128, 128, 128, 32, 16, 128, 256),
]


def bench_config(label, hg, dg, hd, emb, noise, N, batch, impl,
                 reps, chunk):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig, TrainConfig
    from grouptraj.ops.lstm import select_impl
    from grouptraj.parallel.data_parallel import synthetic_device_data
    from grouptraj.train.steps import init_train_state, make_train_chunk

    cfg = ModelConfig(encoder_h_dim_g=hg, decoder_h_dim_g=dg,
                      encoder_h_dim_d=hd, embedding_dim=emb,
                      noise_dim=(noise,))
    tcfg = TrainConfig(dataset_name="synthetic", batch_size=batch,
                       steps_per_dispatch=chunk)
    resolved = select_impl(cfg, tcfg) if impl == "auto" else impl
    num_seq = max(4 * batch, 512)
    data = synthetic_device_data(num_seq, N, cfg.obs_len, cfg.pred_len)
    run = make_train_chunk(cfg, tcfg, resolved, chunk)
    spi = tcfg.d_steps + tcfg.g_steps
    rng = np.random.default_rng(0)
    state = init_train_state(jax.random.PRNGKey(0), cfg, tcfg)
    key = jax.random.PRNGKey(1)
    mk_idx = lambda: jnp.asarray(
        rng.integers(0, num_seq, (chunk, spi, batch)), jnp.int32)

    # compile + warm
    state, losses = run(state, data, mk_idx(), key)
    np.asarray(jax.tree_util.tree_leaves(losses)[0])

    n_chunks = 4
    seq = [mk_idx() for _ in range(n_chunks)]
    times = []
    for _ in range(reps):
        t0 = time.time()
        for idx in seq:
            state, losses = run(state, data, idx, key)
        np.asarray(jax.tree_util.tree_leaves(losses)[0])   # hard sync
        times.append(time.time() - t0)
    its = n_chunks * chunk / sorted(times)[len(times) // 2]
    return resolved, its


def bench_serving_config(label, hg, dg, hd, emb, noise, N, batch, impl,
                         reps, num_samples=20):
    """Serving throughput at this config: the jitted best-of-k eval step
    (the same entry `grouptraj.serve.Predictor` compiles) on the same
    synthetic scenes the training column uses (~85% occupancy,
    `synthetic_batch`), width N, `batch` scenes per call. Returns
    predicted trajectories/s — every (pedestrian, sample) pair is one
    predicted pred_len-step trajectory (bench.py `bench_serving`
    methodology, median rep, host-readback sync)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig
    from grouptraj.eval import make_eval_step
    from grouptraj.models import init_generator
    from grouptraj.parallel.data_parallel import synthetic_batch

    cfg = ModelConfig(encoder_h_dim_g=hg, decoder_h_dim_g=dg,
                      encoder_h_dim_d=hd, embedding_dim=emb,
                      noise_dim=(noise,))
    b = synthetic_batch(batch, N, cfg.obs_len, cfg.pred_len)
    args = jax.device_put((jnp.asarray(b["obs"]), jnp.asarray(b["obs_rel"]),
                           jnp.asarray(b["group"]), jnp.asarray(b["valid"]),
                           jnp.asarray(b["pred"])))
    params = init_generator(jax.random.PRNGKey(0), cfg)
    step = make_eval_step(cfg, num_samples, impl)
    key = jax.random.PRNGKey(1)
    np.asarray(step(params, *args, key)[0])            # compile + sync
    traj_per_call = float(np.asarray(b["valid"]).sum()) * num_samples

    n_calls = 8
    times = []
    for _ in range(reps):
        t0 = time.time()
        out = None
        for _ in range(n_calls):
            key, sub = jax.random.split(key)
            out = step(params, *args, sub)
        np.asarray(out[0])                             # hard sync
        times.append(time.time() - t0)
    return n_calls * traj_per_call / sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--markdown", action="store_true",
                    help="emit a MODEL_ZOO-style markdown table")
    ap.add_argument("--no-serving", action="store_true",
                    help="skip the serving-throughput column")
    args = ap.parse_args()

    rows = []
    for (label, hg, dg, hd, emb, noise, N, batch) in GRID:
        impls = ["scan"] if max(hg, dg, hd) < 64 else ["scan", "pallas"]
        for impl in impls:
            try:
                resolved, its = bench_config(label, hg, dg, hd, emb, noise,
                                             N, batch, impl, args.reps,
                                             args.chunk)
            except Exception as e:  # e.g. the per-timestep kernel's
                # backward VMEM-OOMs at H=128/N=128/B=256 — record, move on
                print(f"{label:<20} H={hg}/{hd:<4} N={N:<4} B={batch:<4} "
                      f"impl={impl:<7} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            serve_tps = None
            if not args.no_serving:
                try:
                    serve_tps = bench_serving_config(
                        label, hg, dg, hd, emb, noise, N, batch,
                        resolved, args.reps)
                except Exception as e:
                    print(f"{label:<20} serving FAILED: "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            traj_s = its * batch * N
            rows.append((label, hg, hd, N, batch, resolved, its, traj_s,
                         serve_tps))
            serve_txt = (f"  serve {serve_tps/1e6:5.2f} M traj/s"
                         if serve_tps else "")
            print(f"{label:<20} H={hg}/{hd:<4} N={N:<4} B={batch:<4} "
                  f"impl={resolved:<7} {its:8.1f} it/s  "
                  f"{traj_s/1e6:6.2f} M ped-steps/s{serve_txt}", flush=True)

    if args.markdown:
        print("\n| config | H (g/d) | N | batch | LSTM impl | train it/s |"
              " ped-rows/s | serve traj/s |")
        print("|---|---|---|---|---|---|---|---|")
        for (label, hg, hd, N, batch, impl, its, traj_s, stps) in rows:
            s = f" {stps/1e6:.2f} M |" if stps else " — |"
            print(f"| {label} | {hg}/{hd} | {N} | {batch} | {impl} |"
                  f" {its:.1f} | {traj_s/1e6:.2f} M |{s}")


if __name__ == "__main__":
    main()
