"""Train the group-aware GAT Social-GAN (TPU-native).

CLI-compatible with reference ``scripts/train.py`` (same flags and defaults,
e.g. ``--dataset_name zara1 --pred_len 12 --best_k 20``); the GPU-era flags
``--use_gpu``/``--gpu_num`` are accepted and ignored.
"""


from _common import build_parser, configs_from_args, setup_logging

parser = build_parser(gcn_variant=False)


def main(args):
    setup_logging()
    from grouptraj.train import train

    mcfg, tcfg = configs_from_args(args, gcn_variant=False)
    train(mcfg, tcfg, args_snapshot=vars(args))


if __name__ == "__main__":
    main(parser.parse_args())
