"""Best-of-N ADE/FDE evaluation (reference ``scripts/evaluate_model.py``).

Loads grouptraj checkpoints or reference PyTorch ``.pt`` checkpoints
transparently, rebuilds the generator from the stored args, and reports
best-of-``--num_samples`` ADE/FDE on the chosen split in the reference's
output format. Evaluation runs the generator in eval mode (the reference
calls ``.train()`` — harmless at dropout 0, consciously not reproduced;
SURVEY.md §7).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--model_path", type=str)
parser.add_argument("--num_samples", default=20, type=int)
parser.add_argument("--dset_type", default="test", type=str)
parser.add_argument("--use_best", default=0, type=int,
                    help="evaluate g_best_state instead of g_state")
parser.add_argument("--use_ema", default=0, type=int,
                    help="evaluate g_ema_state (grouptraj extension: "
                         "generator weight EMA, --g_ema_decay at training "
                         "time); takes precedence over --use_best")
parser.add_argument("--seed", default=0, type=int)
parser.add_argument("--n_buckets", default=3, type=int,
                    help="scene-size buckets for eval batches "
                         "(1 = one global pad width); same estimator, but "
                         "noise subkeys are drawn in bucket order, so "
                         "stochastic Bo-N results differ from n_buckets=1 "
                         "at a fixed seed by sampling variance")


def get_generator(checkpoint, use_best=False, use_ema=False):
    from grouptraj.compat import config_from_checkpoint_args, import_generator

    if use_ema and checkpoint.get("g_ema_state") is not None:
        state = checkpoint["g_ema_state"]
    elif use_best and checkpoint.get("g_best_state") is not None:
        state = checkpoint["g_best_state"]
    else:
        state = checkpoint["g_state"]
    cfg = config_from_checkpoint_args(checkpoint["args"], state)
    return cfg, import_generator(state)


def main(args):
    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax

    from grouptraj.data import data_loader
    from grouptraj.eval import evaluate
    from grouptraj.train.checkpoint import load_checkpoint
    from grouptraj.utils import get_dset_path

    if os.path.isdir(args.model_path):
        filenames = sorted(os.listdir(args.model_path))
        paths = [os.path.join(args.model_path, f) for f in filenames
                 if f.endswith(".pt")]
    else:
        paths = [args.model_path]

    for path in paths:
        checkpoint = load_checkpoint(path)
        if checkpoint is None or checkpoint.get("g_state") is None:
            print(f"Skipping {path}: no model weights")
            continue
        cfg, g_params = get_generator(checkpoint, bool(args.use_best),
                                      bool(args.use_ema))
        ck_args = checkpoint["args"]
        dpath = get_dset_path(ck_args["dataset_name"], args.dset_type)

        class LoaderArgs:   # the loader must use the checkpoint's horizon
            obs_len = cfg.obs_len
            pred_len = cfg.pred_len
            skip = ck_args.get("skip", 1)
            delim = ck_args.get("delim", "tab")
            batch_size = ck_args.get("batch_size", 64)
            # always re-derive the pad width from the eval split: a training
            # n_max smaller than the largest eval scene would raise
            n_max = 0
            seed = 0

        dset, loader = data_loader(LoaderArgs, dpath, shuffle=False)
        if args.n_buckets > 1:
            from grouptraj.eval import evaluate_bucketed
            ade, fde = evaluate_bucketed(
                cfg, dset, g_params, args.num_samples,
                batch_size=LoaderArgs.batch_size, n_buckets=args.n_buckets,
                key=jax.random.PRNGKey(args.seed))
        else:
            ade, fde = evaluate(cfg, loader, g_params, args.num_samples,
                                key=jax.random.PRNGKey(args.seed))
        print("Dataset: {}, Pred Len: {}, ADE: {:.2f}, FDE: {:.2f}".format(
            ck_args["dataset_name"], ck_args["pred_len"], ade, fde))
        for k, v in checkpoint["args"].items():
            print(k, v)


if __name__ == "__main__":
    main(parser.parse_args())
