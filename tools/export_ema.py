"""Export an EMA-trained checkpoint with the smoothed weights as THE model.

Zoo promotion step for --g_ema_decay runs: copies the checkpoint with
``g_state`` (and ``g_best_state``) replaced by ``g_ema_state`` so the
standard evaluation commands (``evaluate_model.py --use_best 1``, the
reference's own eval protocol) see the EMA weights — the usual way EMA
models are shipped. The original raw weights are preserved under
``g_raw_state`` and the untouched ``g_ema_state`` stays for provenance.

Run: python tools/export_ema.py <in.pt> <out.pt>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(src: str, dst: str) -> None:
    from grouptraj.train.checkpoint import _atomic_pickle, load_checkpoint

    ck = load_checkpoint(src)
    if ck.get("g_ema_state") is None:
        raise SystemExit(f"{src} has no g_ema_state (trained without "
                         "--g_ema_decay?)")
    ck["g_raw_state"] = ck["g_state"]
    ck["g_state"] = ck["g_ema_state"]
    ck["g_best_state"] = ck["g_ema_state"]
    _atomic_pickle(ck, dst)
    print(f"wrote {dst} (g_state/g_best_state <- g_ema_state; raw kept "
          "as g_raw_state)")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
