"""Measure bf16 weight residency for the Bo20 sampler (VERDICT r3 #6).

The round-3 scale study found the serving sampler weight-bandwidth-bound
(ARCHITECTURE.md scale-study table). Hypothesis: keeping generator weights
resident in bf16 (activations/positions stay f32 — coordinates at bf16
would cost ~cm-level error at ETH/UCY scales) halves weight HBM reads.

Quality gate + timing, zara1 test split, promoted flagship weights:
  python tools/serve_bf16_probe.py [--num_samples 20] [--reps 5]
Prints one JSON line with f32/bf16 ADE/FDE and traj/s for both.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, default=20)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--ckpt",
                    default="models/grouptraj/zara1_12_with_model.pt")
    args = ap.parse_args()

    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.compat import config_from_checkpoint_args, import_generator
    from grouptraj.config import TrainConfig
    from grouptraj.data import data_loader
    from grouptraj.eval import evaluate_bucketed, make_eval_step
    from grouptraj.train.checkpoint import load_checkpoint
    from grouptraj.utils import get_dset_path

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ck = load_checkpoint(os.path.join(root, args.ckpt))
    state = ck["g_best_state"] if ck.get("g_best_state") is not None \
        else ck["g_state"]
    cfg = config_from_checkpoint_args(ck["args"], state)
    params = import_generator(state)
    cast = lambda t, d: jax.tree_util.tree_map(
        lambda x: x.astype(d) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)

    class A:
        obs_len = cfg.obs_len
        pred_len = cfg.pred_len
        skip = 1
        delim = "tab"
        batch_size = 64
        n_max = 0
        seed = 0

    dset, loader = data_loader(A, get_dset_path("zara1", "test"),
                               shuffle=False)
    out = {}
    for tag, p in (("f32", params),
                   ("bf16", cast(params, jnp.bfloat16))):
        ade, fde = evaluate_bucketed(cfg, dset, p, args.num_samples,
                                     key=jax.random.PRNGKey(0))
        out[f"ade_{tag}"] = round(float(ade), 4)
        out[f"fde_{tag}"] = round(float(fde), 4)

        step = make_eval_step(cfg, args.num_samples)
        batches = list(loader)
        args_list = [
            jax.device_put((jnp.asarray(b.obs), jnp.asarray(b.obs_rel),
                            jnp.asarray(b.end_group), jnp.asarray(b.valid),
                            jnp.asarray(b.pred))) for b in batches]
        key = jax.random.PRNGKey(0)
        np.asarray(step(p, *args_list[0], key)[0])       # compile + sync
        total_traj = sum(float(np.asarray(b.valid).sum())
                         for b in batches) * args.num_samples
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            acc = 0.0
            for a in args_list:
                key, sub = jax.random.split(key)
                acc += step(p, *a, sub)[0]
            np.asarray(acc)                               # hard sync
            times.append(time.time() - t0)
        med = sorted(times)[len(times) // 2]
        out[f"traj_per_sec_{tag}"] = round(total_traj / med, 0)
        out[f"traj_per_sec_{tag}_best"] = round(total_traj / min(times), 0)
    out["speedup_median"] = round(
        out["traj_per_sec_bf16"] / out["traj_per_sec_f32"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
