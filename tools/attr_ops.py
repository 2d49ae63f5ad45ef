"""Attribute hot ops from tools/profile_step.py to source locations.

Builds the identical production dispatch, compiles it, and greps the
optimized HLO for the named ops (e.g. ``transpose_jvp___.36``), printing
each op's shape and ``metadata`` (source op_name/file/line) so kernel work
targets a known tensor instead of a trace-name guess.

Usage::

    python tools/attr_ops.py transpose_jvp fusion.1859 split.111
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(patterns):
    from tools.profile_step import build_dispatch
    import argparse

    n_seeds = int(os.environ.get("GROUPTRAJ_ATTR_SEEDS", "1"))
    bf16 = int(os.environ.get("GROUPTRAJ_ATTR_BF16", "1"))
    args = argparse.Namespace(chunk=10, bucket=2, batch=64, d_steps=1,
                              g_steps=1, leg="full", top=35, impl="scan",
                              n_seeds=n_seeds, bf16=bf16)
    run, state, data, idx, key = build_dispatch(args)
    import jax
    compiled = jax.jit(run.__wrapped__ if hasattr(run, "__wrapped__")
                       else run).lower(state, data, idx, key).compile()
    txt = compiled.as_text()
    print(f"HLO: {len(txt)} chars")
    pats = [re.compile(re.escape(p)) for p in patterns]
    uses = int(os.environ.get("GROUPTRAJ_ATTR_USES", "0"))
    for line in txt.splitlines():
        s = line.strip()
        # definition lines look like:  %name = type op(...) , metadata={...}
        if not s.startswith("%") and not s.startswith("ROOT"):
            continue
        name = s.split(" ", 1)[0].lstrip("%")
        if any(p.search(name) for p in pats):
            print(s[:600])
            print()
        elif uses and any(p.search(s) for p in pats):
            # GROUPTRAJ_ATTR_USES=1: also print CONSUMER lines (ops whose
            # operand list mentions a matched name). For layout-residue
            # work the consumer is what demands the layout — a copy's def
            # line alone doesn't say who forced it.
            print("  use:", s[:600])
            print()


if __name__ == "__main__":
    main(sys.argv[1:] or ["transpose_jvp", "split.111", "fusion.1859",
                          "reduce.1945", "broadcast_in_dim.1376"])
