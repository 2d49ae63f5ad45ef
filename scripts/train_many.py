"""Train N seeds of one configuration simultaneously on one chip.

A grouptraj extension (no reference equivalent — its sweeps rerun
``scripts/train.py`` per seed): ``jax.vmap`` over the pure training step
adds a seed axis to the whole train state, so all replicas advance in one
dispatch and the sweep costs barely more than one run (the step is
sequential-depth-bound, not FLOPs-bound; see grouptraj/train/multi.py).

Accepts every scripts/train.py flag plus ``--seeds``; each seed writes
standard checkpoints to ``<output_dir>/s<seed>/`` (``--seed`` is ignored —
the replica seeds come from ``--seeds``; the batch schedule is shared and
seeded by the first one).

Example:
    python scripts/train_many.py --dataset_name zara2 --graph_module gat-mh \
        --num_epochs 200 --seeds 13,14,15,16 --output_dir runs/z2_sweep
"""

from _common import build_parser, configs_from_args, setup_logging

parser = build_parser(gcn_variant=False)
parser.add_argument(
    "--seeds", type=str, required=True,
    help="comma-separated replica seeds, e.g. 13,14,15,16")


def main(args):
    setup_logging()
    import dataclasses

    from grouptraj.train import train_many

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]
    mcfg, tcfg = configs_from_args(args, gcn_variant=False)
    # the shared batch schedule is seeded deterministically by the sweep
    tcfg = dataclasses.replace(tcfg, seed=seeds[0])
    train_many(mcfg, tcfg, seeds, args_snapshot=vars(args))


if __name__ == "__main__":
    main(parser.parse_args())
