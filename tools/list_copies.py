"""Rank the `copy` ops in the compiled production dispatch by byte size.

Layout-residue work needs the BIG copies (full-slab layout conversions),
not the thousands of tile-sized ones. Compiles the same dispatch as
tools/attr_ops.py (GROUPTRAJ_ATTR_SEEDS / GROUPTRAJ_ATTR_BF16 env),
parses the optimized HLO, and prints the top-N copy defs by bytes with
their layouts and source metadata, then every consumer line of each.

Usage::

    GROUPTRAJ_ATTR_SEEDS=8 python tools/list_copies.py [top_n]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8}

_DEF_RE = re.compile(
    r"^%?(?P<name>[\w.-]+)\s*=\s*(?P<dtype>\w+)\[(?P<dims>[\d,]*)\]"
    r"(?P<layout>\{[^}]*\})?\s+copy\(")


def main(top_n: int = 15):
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
    print(f"HLO: {len(txt)} chars  (n_seeds={n_seeds}, bf16={bf16})")

    defs = []
    for line in txt.splitlines():
        s = line.strip().lstrip("ROOT ").lstrip()
        m = _DEF_RE.match(s.lstrip("%"))
        if not m:
            continue
        dims = [int(d) for d in m.group("dims").split(",") if d]
        n = 1
        for d in dims:
            n *= d
        size = n * _DTYPE_BYTES.get(m.group("dtype"), 4)
        defs.append((size, m.group("name"), s))
    defs.sort(key=lambda t: -t[0])
    print(f"{len(defs)} copy defs; top {top_n} by bytes:\n")
    names = []
    for size, name, s in defs[:top_n]:
        print(f"--- {size/1e6:8.2f} MB  {name}")
        print("   ", s[:500])
        names.append(name)
    print("\nconsumers of the top copies:")
    pats = [re.compile(r"%" + re.escape(n) + r"[,)\s]") for n in names]
    for line in txt.splitlines():
        s = line.strip()
        if " copy(" in s:
            continue
        for n, p in zip(names, pats):
            if p.search(s):
                print(f"  {n} <- {s[:400]}")
                print()
                break


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
