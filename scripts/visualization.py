"""Plot ground truth vs sampled predictions (reference scripts/visualization.py).

For the first few scenes of the chosen split, draws each pedestrian's
observed track (solid), ground-truth future (dashed) and ``--num_samples``
sampled futures (dotted), saving PNGs instead of blocking on plt.show().
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--model_path", type=str, required=True)
parser.add_argument("--num_samples", default=20, type=int)
parser.add_argument("--dset_type", default="test", type=str)
parser.add_argument("--num_scenes", default=4, type=int)
parser.add_argument("--out_dir", default="viz", type=str)
parser.add_argument("--seed", default=0, type=int)


def main(args):
    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import matplotlib
    matplotlib.use("Agg")
    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt
    import numpy as np

    from grouptraj.config import TrainConfig
    from grouptraj.data import data_loader
    from grouptraj.models import generator_forward
    from grouptraj.train.checkpoint import load_checkpoint
    from grouptraj.utils import get_dset_path, relative_to_abs
    from scripts.evaluate_model import get_generator

    checkpoint = load_checkpoint(args.model_path)
    cfg, g_params = get_generator(checkpoint)
    ck_args = checkpoint["args"]
    dpath = get_dset_path(ck_args["dataset_name"], args.dset_type)
    _, loader = data_loader(TrainConfig(batch_size=args.num_scenes), dpath,
                            shuffle=False)
    batch = next(iter(loader))

    inputs = [jnp.asarray(a) for a in
              (batch.obs, batch.obs_rel, batch.end_group, batch.valid)]
    keys = jax.random.split(jax.random.PRNGKey(args.seed), args.num_samples)
    preds = jax.vmap(lambda k: generator_forward(
        g_params, cfg, *inputs, key=k, train=False))(keys)
    preds_abs = np.asarray(relative_to_abs(
        preds, jnp.asarray(batch.end_pos)[None]))

    os.makedirs(args.out_dir, exist_ok=True)
    cmap = plt.get_cmap("tab20")
    for s in range(min(args.num_scenes, batch.obs.shape[0])):
        fig, ax = plt.subplots(figsize=(8, 8))
        n_valid = int(batch.valid[s].sum())
        for i in range(n_valid):
            c = cmap(i % 20)
            obs = batch.obs[s, i]
            gt = batch.pred[s, i]
            ax.plot(obs[:, 0], obs[:, 1], "-", color=c, lw=2)
            ax.plot([obs[-1, 0], gt[0, 0]], [obs[-1, 1], gt[0, 1]], "--",
                    color=c, lw=1)
            ax.plot(gt[:, 0], gt[:, 1], "--", color=c, lw=1.5)
            for k in range(args.num_samples):
                p = preds_abs[k, s, i]
                ax.plot(p[:, 0], p[:, 1], ":", color=c, lw=0.6, alpha=0.5)
        ax.set_title(f"{ck_args['dataset_name']} scene {s} "
                     f"({n_valid} peds, {args.num_samples} samples)")
        ax.set_aspect("equal")
        out = os.path.join(args.out_dir, f"scene_{s}.png")
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print("wrote", out)


if __name__ == "__main__":
    main(parser.parse_args())
