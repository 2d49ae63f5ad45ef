"""Train the GCN-pooling Social-GAN variant (TPU-native).

CLI-compatible with reference ``scripts/train_GCN.py`` (defaults
``pooling_type=gcn``, ``d_steps=2``, ``best_k=1``, ``bottleneck_dim=16``;
reference train_GCN.py:69,75,88,94). Unlike the reference — where this
script crashes against the current models.py because the GCNPooling class
was deleted (SURVEY.md §2.4) — the reconstructed GCNPooling pool-net makes
this a working configuration.
"""

from _common import build_parser, configs_from_args, setup_logging

parser = build_parser(gcn_variant=True)


def main(args):
    setup_logging()
    from grouptraj.train import train

    mcfg, tcfg = configs_from_args(args, gcn_variant=True)
    train(mcfg, tcfg, args_snapshot=vars(args))


if __name__ == "__main__":
    main(parser.parse_args())
