"""Semantic probe for the lost era-(b) gat-mh training code.

The "sgangat-g-*" checkpoints were trained by a models.py revision that no
longer exists; the reference only ships a LATER commented-out snapshot
(models.py:296-455). Three semantic choices are ambiguous:

  adj    : 'mix'  — post-softmax ``attn @ adjacency`` (commented :332)
           'none' — pure attention over scene peds (upstream STGAT)
  concat : 'transpose' — per-ped head concat (upstream STGAT)
           'view'      — untransposed reshape (commented :384)
  input  : 'rel' — frame deltas (current train.py)
           'vel' — velocities rel*2.5 (trajectories_GCN.py:199-204 exposes
                   them; an era may have consumed them)

Fitness: best-of-20 ADE on the checkpoint's own test split. Best-of-20 must
beat the checkpoint's recorded single-sample val ADE (zara1: 1.15) by ~2-3x
if the forward is right; a wrong forward leaves Bo20 at or above val.

Usage: python tools/gatmh_probe.py [--dataset zara1] [--max_batches 0]
"""

import argparse
import dataclasses
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("GROUPTRAJ_REFERENCE", "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="zara1")
    ap.add_argument("--num_samples", type=int, default=20)
    ap.add_argument("--max_batches", type=int, default=0,
                    help="0 = full test split")
    ap.add_argument("--combos", default="",
                    help="comma list like mix-transpose-rel; empty = all 8")
    args = ap.parse_args()

    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp

    from grouptraj import losses as L
    from grouptraj.compat import (
        config_from_checkpoint_args, import_generator, load_torch_checkpoint,
    )
    from grouptraj.data import data_loader
    from grouptraj.models.generator import generator_context, generator_sample
    from grouptraj.utils import get_dset_path, relative_to_abs

    path = os.path.join(REF, "models", "sgangat-g-p-models",
                        f"{args.dataset}_12_model.pt")
    ck = load_torch_checkpoint(path)
    base_cfg = config_from_checkpoint_args(ck["args"], ck["g_state"])
    params = import_generator(ck["g_state"])
    val_ade = min(ck["metrics_val"]["ade"]) if ck.get("metrics_val") else None
    print(f"checkpoint {path}")
    print(f"recorded best single-sample val ADE: {val_ade}")

    class LoaderArgs:
        obs_len = base_cfg.obs_len
        pred_len = base_cfg.pred_len
        skip = ck["args"].get("skip", 1)
        delim = "tab"
        batch_size = 64
        n_max = 0
        seed = 0

    dpath = get_dset_path(args.dataset, "test")
    _, loader = data_loader(LoaderArgs, dpath, shuffle=False)
    batches = list(loader)
    if args.max_batches:
        batches = batches[:args.max_batches]

    def run(cfg, input_scale):
        def step(g_params, obs, obs_rel, group, valid, pred_gt, key):
            keys = jax.random.split(key, args.num_samples)
            obs_in = obs_rel * input_scale
            ctx = generator_context(g_params, cfg, obs, obs_in, group,
                                    valid, keys[0], train=False)
            preds = jax.vmap(lambda k: generator_sample(
                g_params, cfg, ctx, obs, obs_in, group, valid, k,
                train=False))(keys)
            preds = preds / input_scale
            pred_abs = relative_to_abs(preds, obs[:, :, -1, :][None])
            ade_raw = L.displacement_error(pred_abs, pred_gt[None],
                                           valid[None], mode="raw")
            fde_raw = L.final_displacement_error(
                pred_abs[:, :, :, -1], pred_gt[None][:, :, :, -1],
                valid[None], mode="raw")
            ade_sum = jnp.sum(jnp.min(jnp.sum(ade_raw, axis=-1), axis=0))
            fde_sum = jnp.sum(jnp.min(jnp.sum(fde_raw, axis=-1), axis=0))
            return ade_sum, fde_sum, jnp.sum(valid)

        jstep = jax.jit(step)
        key = jax.random.PRNGKey(0)
        at = ft = nt = 0.0
        for b in batches:
            key, sub = jax.random.split(key)
            a, f, n = jstep(params, jnp.asarray(b.obs),
                            jnp.asarray(b.obs_rel),
                            jnp.asarray(b.end_group),
                            jnp.asarray(b.valid), jnp.asarray(b.pred), sub)
            at += float(a)
            ft += float(f)
            nt += float(n)
        return at / (nt * cfg.pred_len), ft / nt

    combos = (args.combos.split(",") if args.combos else
              ["-".join(c) for c in itertools.product(
                  ("mix", "none"), ("transpose", "view"), ("rel", "vel"),
                  ("nonorm", "norm"))])
    results = {}
    for combo in combos:
        adj, concat, inp, norm = (combo.split("-") + ["nonorm"])[:4]
        cfg = dataclasses.replace(base_cfg, mh_adj=adj, mh_concat=concat,
                                  mh_norm=(norm == "norm"))
        t0 = time.time()
        ade, fde = run(cfg, 2.5 if inp == "vel" else 1.0)
        results[combo] = (ade, fde)
        print(f"{combo:24s} ADE {ade:.3f}  FDE {fde:.3f} "
              f"({time.time()-t0:.0f}s)")
    best = min(results, key=lambda k: results[k][0])
    print(f"\nbest: {best} ADE {results[best][0]:.3f} "
          f"FDE {results[best][1]:.3f}")


if __name__ == "__main__":
    main()
