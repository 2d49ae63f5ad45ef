"""Tracker-CSV -> 5-column trajectory txt converter.

Counterpart of reference ``csv_to_txt.py:1-37``: reads a tracker export
(``frame_id,track_id,x,y,w,h,group_id``), Savitzky-Golay smooths each track
(window 19, order 3; tracks shorter than the window pass through unsmoothed),
scales pixels to meters (/100), and writes tab-separated
``frame  ped  x  y  group`` rows.

NOTE: the reference writes CSV column 4 (the bbox width ``w``) as the 5th txt
column instead of ``group_id`` — visible in its own committed output
(``datasets_group/1939_1/test.txt`` 5th column equals ``w``). This converter
writes the actual group id; pass ``--label_col w`` to reproduce the
reference's output bit-for-bit.
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd
from scipy.signal import savgol_filter

parser = argparse.ArgumentParser()
parser.add_argument("csv", help="tracker CSV (frame_id,track_id,x,y,w,h,group_id)")
parser.add_argument("out", help="output txt path")
parser.add_argument("--window", type=int, default=19)
parser.add_argument("--order", type=int, default=3)
parser.add_argument("--scale", type=float, default=100.0,
                    help="divide x,y by this (pixels->meters)")
parser.add_argument("--label_col", default="group_id",
                    help="column to write as group label "
                         "('w' reproduces the reference bug)")


def convert(df: pd.DataFrame, window: int = 19, order: int = 3,
            scale: float = 100.0, label_col: str = "group_id") -> np.ndarray:
    df = df.copy()
    for p in sorted(set(df["track_id"].astype(int))):
        sel = df["track_id"] == p
        x = df.loc[sel, "x"].values
        if len(x) < window:
            continue
        df.loc[sel, "x"] = savgol_filter(x, window, order)
        df.loc[sel, "y"] = savgol_filter(df.loc[sel, "y"].values, window,
                                         order)
    out = np.column_stack([
        df["frame_id"].values, df["track_id"].values,
        df["x"].values / scale, df["y"].values / scale,
        df[label_col].values,
    ])
    return out


def main(args):
    df = pd.read_csv(args.csv)
    rows = convert(df, args.window, args.order, args.scale, args.label_col)
    with open(args.out, "w") as f:
        for r in rows:
            f.write("{}\t{}\t{}\t{}\t{}\n".format(*r))
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main(parser.parse_args())
