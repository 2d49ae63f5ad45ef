"""Best-of-N eval at full float precision (4 decimals).

scripts/evaluate_model.py prints the reference's 2-decimal format
(reference ``scripts/evaluate_model.py:129``); promotion decisions near a
rounding boundary (e.g. zara2 FDE 0.645 vs upstream's published 0.64)
need the unrounded estimate. Same estimator and defaults as the script.

Run: python tools/exact_eval.py <ckpt-or-dir> [--use_best 1] [--use_ema 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("model_path")
parser.add_argument("--num_samples", default=20, type=int)
parser.add_argument("--dset_type", default="test", type=str)
parser.add_argument("--use_best", default=1, type=int)
parser.add_argument("--use_ema", default=0, type=int)
parser.add_argument("--seed", default=0, type=int)
parser.add_argument("--n_buckets", default=3, type=int)


def main(args):
    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax

    from scripts.evaluate_model import get_generator
    from grouptraj.data import data_loader
    from grouptraj.eval import evaluate_bucketed
    from grouptraj.train.checkpoint import load_checkpoint
    from grouptraj.utils import get_dset_path

    path = args.model_path
    if os.path.isdir(path):
        cands = [f for f in sorted(os.listdir(path))
                 if f.endswith("with_model.pt")]
        path = os.path.join(path, cands[0])
    ck = load_checkpoint(path)
    cfg, g_params = get_generator(ck, bool(args.use_best),
                                  bool(args.use_ema))
    dpath = get_dset_path(ck["args"]["dataset_name"], args.dset_type)

    class LoaderArgs:
        obs_len = cfg.obs_len
        pred_len = cfg.pred_len
        skip = ck["args"].get("skip", 1)
        delim = ck["args"].get("delim", "tab")
        batch_size = ck["args"].get("batch_size", 64)
        n_max = 0
        seed = 0

    dset, _ = data_loader(LoaderArgs, dpath, shuffle=False)
    ade, fde = evaluate_bucketed(
        cfg, dset, g_params, args.num_samples,
        batch_size=LoaderArgs.batch_size, n_buckets=args.n_buckets,
        key=jax.random.PRNGKey(args.seed))
    print(f"{path}: ADE {ade:.4f}  FDE {fde:.4f} "
          f"(Bo{args.num_samples}, seed {args.seed})")


if __name__ == "__main__":
    main(parser.parse_args())
