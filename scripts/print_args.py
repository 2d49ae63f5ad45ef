"""Dump the arg snapshot stored in a checkpoint (reference scripts/print_args.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--checkpoint", type=str, required=True)

if __name__ == "__main__":
    args = parser.parse_args()
    from grouptraj.train.checkpoint import load_checkpoint

    checkpoint = load_checkpoint(args.checkpoint)
    if checkpoint is None:
        sys.exit(f"no checkpoint at {args.checkpoint}")
    for k, v in checkpoint["args"].items():
        print(k, v)
