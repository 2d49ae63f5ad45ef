"""Zoo-wide bf16 serving quality gate (VERDICT r4 item 5).

``serve.Predictor`` defaults to bf16 weight residency, but round 4 gated
that only on the zara1 flagship. This sweeps EVERY shipped zoo checkpoint
plus one reference import per model era, evaluating Bo20 ADE/FDE on each
model's own test split with f32 vs bf16 weights (same fixed PRNG key).
Gate per model: |ADE_bf16 - ADE_f32| <= 0.005 and |FDE| <= 0.01 — the
sampling-noise scale of a fixed-seed Bo20 re-draw. One JSON line per model;
a final summary line. Results table recorded in MODEL_ZOO.md/BASELINE.md.

Usage::  python tools/serve_bf16_zoo.py [--num_samples 20]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one reference import per era (family names from PARITY.json)
REFERENCE_ERA_PICKS = [
    "models/sgan-gat-models/zara1_12_model.pt",    # live GAT era
    "models/sgangat-g-p-models/eth_12_model.pt",   # gat-mh era
    "models/sgan-g-p-models/zara1_12_model.pt",    # GCNModule era
    "models/01/checkpoint_with_model.pt",          # GCNPooling era
    "models/sgan-p-models/zara1_12_model.pt",      # upstream sgan-p era
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_samples", type=int, default=20)
    ap.add_argument("--ade_tol", type=float, default=0.005)
    ap.add_argument("--fde_tol", type=float, default=0.01)
    args = ap.parse_args()

    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp

    from grouptraj.compat import (
        config_from_checkpoint_args, import_generator, load_torch_checkpoint,
    )
    from grouptraj.data import data_loader
    from grouptraj.eval import evaluate_bucketed
    from grouptraj.train.checkpoint import load_checkpoint
    from grouptraj.utils import get_dset_path

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ref_root = os.environ.get("GROUPTRAJ_REF", "/root/reference")

    targets = []
    for p in sorted(glob.glob(os.path.join(root, "models/grouptraj/*.pt"))):
        targets.append(("zoo", p))
    for rel in REFERENCE_ERA_PICKS:
        p = os.path.join(ref_root, rel)
        if os.path.exists(p):
            targets.append(("import", p))

    cast = lambda t, d: jax.tree_util.tree_map(
        lambda x: x.astype(d) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, t)

    rows, fails = [], 0
    for kind, path in targets:
        try:
            if kind == "zoo":
                ck = load_checkpoint(path)
            else:
                ck = load_torch_checkpoint(path)
            state = ck["g_best_state"] if ck.get(
                "g_best_state") is not None else ck["g_state"]
            if state is None:
                continue
            cfg = config_from_checkpoint_args(ck["args"], state)
            params = import_generator(state)
            dname = ck["args"]["dataset_name"]
            split = "val" if dname == "raw" else "test"

            class A:
                obs_len = cfg.obs_len
                pred_len = cfg.pred_len
                skip = ck["args"].get("skip", 1)
                delim = "tab"
                batch_size = 64
                n_max = 0
                seed = 0

            dset, _ = data_loader(A, get_dset_path(dname, split),
                                  shuffle=False)
            t0 = time.time()
            out = {"model": os.path.basename(path), "kind": kind,
                   "dataset": dname}
            for tag, d in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
                ade, fde = evaluate_bucketed(
                    cfg, dset, cast(params, d), args.num_samples,
                    key=jax.random.PRNGKey(0))
                out[f"ade_{tag}"] = round(float(ade), 4)
                out[f"fde_{tag}"] = round(float(fde), 4)
            out["d_ade"] = round(out["ade_bf16"] - out["ade_f32"], 4)
            out["d_fde"] = round(out["fde_bf16"] - out["fde_f32"], 4)
            out["pass"] = (abs(out["d_ade"]) <= args.ade_tol
                           and abs(out["d_fde"]) <= args.fde_tol)
            out["eval_s"] = round(time.time() - t0, 1)
            fails += 0 if out["pass"] else 1
            rows.append(out)
            print(json.dumps(out), flush=True)
        except Exception as e:
            print(json.dumps({"model": os.path.basename(path),
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)
            fails += 1
    print(json.dumps({"summary": {"models": len(rows), "fails": fails,
                                  "ade_tol": args.ade_tol,
                                  "fde_tol": args.fde_tol}}))


if __name__ == "__main__":
    main()
