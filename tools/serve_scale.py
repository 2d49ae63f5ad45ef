"""Serving throughput vs scenes-per-dispatch, plus the static roofline.

The serving bench (bench.py bench_serving) dispatches the Bo20 sampler at
batch_size=64 scenes. The sampler's per-step matmuls are tiny ([rows, 32] @
[32, 128] with rows = k*S*N), so throughput at small dispatches is bound by
sequential-step latency, not bandwidth — the lever is more rows per
dispatch. This sweep measures trajectories/sec at several scenes-per-
dispatch on the real zara1 test split (bf16 weight residency, the
production Predictor default), and prints XLA's static cost model per
dispatch so %-of-HBM/MXU is auditable.

Usage::

    python tools/serve_scale.py [--batches 64,128,256,602]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(batch_sizes, num_samples=20, reps=7):
    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig
    from grouptraj.data import data_loader
    from grouptraj.eval import make_eval_step
    from grouptraj.models import init_generator
    from grouptraj.utils import get_dset_path

    cfg = ModelConfig()
    params = init_generator(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    results = []
    for bs in batch_sizes:
        class A:
            obs_len = cfg.obs_len
            pred_len = cfg.pred_len
            skip = 1
            delim = "tab"
            n_max = 0
            seed = 0
            batch_size = bs

        _, loader = data_loader(A, get_dset_path("zara1", "test"),
                                shuffle=False)
        batches = list(loader)
        step = make_eval_step(cfg, num_samples)
        args_list = [
            jax.device_put((jnp.asarray(b.obs), jnp.asarray(b.obs_rel),
                            jnp.asarray(b.end_group), jnp.asarray(b.valid),
                            jnp.asarray(b.pred))) for b in batches]
        key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(key)
        np.asarray(step(params, *args_list[0], sub)[0])     # compile + sync
        cost = {}
        try:
            ca = step.lower(params, *args_list[0], sub).compile(
                ).cost_analysis()
            if ca:
                cost = {"flops": float(ca.get("flops", 0.0)),
                        "bytes": float(ca.get("bytes accessed", 0.0))}
        except Exception:
            pass

        # rep discipline (bench.py bench_serving): time >= 2 s of work per
        # rep so the tunnel's per-dispatch latency jitter can't dominate
        rep_vals, passes = [], 1
        for _ in range(reps):
            while True:
                traj = 0.0
                t0 = time.time()
                out = None
                for _ in range(passes):
                    for a, b in zip(args_list, batches):
                        key, sub = jax.random.split(key)
                        out = step(params, *a, sub)
                        traj += float(b.valid.sum()) * num_samples
                np.asarray(out[0])                          # hard sync
                dt = time.time() - t0
                if dt >= 2.0 or passes >= 256:
                    rep_vals.append(traj / dt)
                    break
                passes = max(passes + 1,
                             int(passes * 2.5 / max(dt, 1e-3)))
        med = sorted(rep_vals)[len(rep_vals) // 2]
        row = {"scenes_per_dispatch": bs, "n_dispatches": len(batches),
               "traj_per_sec_median": round(med),
               "traj_per_sec_best": round(max(rep_vals)),
               **{k: round(v) for k, v in cost.items()}}
        if cost.get("bytes"):
            # bandwidth bound: bytes per dispatch / 819 GB/s -> ceiling
            total_traj = sum(float(b.valid.sum()) for b in batches
                             ) * num_samples
            secs_bw = cost["bytes"] * len(batches) / 819e9
            row["hbm_roofline_traj_per_sec"] = round(total_traj / secs_bw)
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128,256,602")
    ap.add_argument("--num_samples", type=int, default=20)
    args = ap.parse_args()
    run([int(x) for x in args.batches.split(",")], args.num_samples)
