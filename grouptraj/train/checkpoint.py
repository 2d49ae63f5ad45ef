"""Checkpoint / resume with the reference's logical schema.

The reference saves a single dict (``scripts/train.py:246-271``) holding the
full arg snapshot, per-key loss histories, timestamped metric histories,
grad-norm histories, counters, current + best(-by-ADE) + best-nl states, and
both Adam optimizer states; twice per event (``<name>_with_model.pt`` and a
weights-stripped ``<name>_no_model.pt``, ``train.py:362-386``). We keep the
same keys and filenames. ``g_state``/``d_state`` are stored as
reference-style torch-named numpy state_dicts (via the compat exporter) so
our checkpoints and the reference's are mutually loadable; optimizer states
are optax pytrees.

Serialization is plain pickle under the ``.pt`` suffix; :func:`load_checkpoint`
sniffs pickle first and falls back to ``torch.load`` so reference ``.pt``
files load transparently (preemption resume, ``--restore_from_checkpoint``).
"""

from __future__ import annotations

import os
import pickle
from collections import defaultdict
from typing import Optional

import jax
import numpy as np

from grouptraj.compat.torch_import import (
    export_state_dicts, import_discriminator, import_generator,
)
from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.train.steps import TrainState, make_optimizers

KEY_BLACKLIST = [
    "g_state", "d_state", "g_best_state", "g_best_nl_state",
    "g_optim_state", "d_optim_state", "d_best_state", "d_best_nl_state",
    "g_ema_state",
]


def new_checkpoint(args: dict) -> dict:
    """Fresh checkpoint data structure (reference train.py:246-271)."""
    return {
        "args": dict(args),
        "G_losses": defaultdict(list),
        "D_losses": defaultdict(list),
        "losses_ts": [],
        "metrics_val": defaultdict(list),
        "metrics_train": defaultdict(list),
        "sample_ts": [],
        "restore_ts": [],
        "norm_g": [],
        "norm_d": [],
        "counters": {"t": None, "epoch": None},
        "g_state": None, "g_optim_state": None,
        "d_state": None, "d_optim_state": None,
        "g_best_state": None, "d_best_state": None, "best_t": None,
        "g_best_nl_state": None, "d_best_nl_state": None, "best_t_nl": None,
    }


def checkpoint_from_state(ckpt: dict, state: TrainState) -> dict:
    ckpt["g_state"] = export_state_dicts(
        jax.device_get(state.g_params), "generator")
    ckpt["d_state"] = export_state_dicts(
        jax.device_get(state.d_params), "discriminator")
    ckpt["g_optim_state"] = jax.device_get(state.g_opt)
    ckpt["d_optim_state"] = jax.device_get(state.d_opt)
    if getattr(state, "ema_g", None) is not None:
        ckpt["g_ema_state"] = export_state_dicts(
            jax.device_get(state.ema_g), "generator")
    return ckpt


def state_from_checkpoint(ckpt: dict, cfg: ModelConfig, tcfg: TrainConfig
                          ) -> TrainState:
    g_params = import_generator(ckpt["g_state"])
    d_params = import_discriminator(ckpt["d_state"])
    g_tx, d_tx = make_optimizers(tcfg)
    g_opt = ckpt.get("g_optim_state")
    d_opt = ckpt.get("d_optim_state")
    if g_opt is None or not _opt_compatible(g_opt, g_tx, g_params):
        g_opt = g_tx.init(g_params)
    if d_opt is None or not _opt_compatible(d_opt, d_tx, d_params):
        d_opt = d_tx.init(d_params)
    ema_g = None
    if tcfg.g_ema_decay > 0:
        # resume the saved EMA when present; a run newly switched to EMA
        # restarts it from the restored weights
        ema_g = import_generator(ckpt["g_ema_state"]) \
            if ckpt.get("g_ema_state") is not None else g_params
    return TrainState(g_params, d_params, g_opt, d_opt, ema_g)


def _opt_compatible(opt_state, tx, params) -> bool:
    try:
        ref = tx.init(params)
        ref_leaves = jax.tree_util.tree_leaves(ref)
        got_leaves = jax.tree_util.tree_leaves(opt_state)
        return len(ref_leaves) == len(got_leaves) and all(
            np.shape(a) == np.shape(b)
            for a, b in zip(ref_leaves, got_leaves))
    except Exception:
        return False


def save_checkpoint(ckpt: dict, output_dir: str, name: str) -> None:
    """Write ``<name>_with_model.pt`` and ``<name>_no_model.pt`` atomically."""
    os.makedirs(output_dir, exist_ok=True)
    full_path = os.path.join(output_dir, f"{name}_with_model.pt")
    _atomic_pickle(ckpt, full_path)
    small = {k: v for k, v in ckpt.items() if k not in KEY_BLACKLIST}
    _atomic_pickle(small, os.path.join(output_dir, f"{name}_no_model.pt"))


def _atomic_pickle(obj, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Optional[dict]:
    """Load ours (pickle) or a reference torch checkpoint transparently."""
    if not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic[:2] == b"PK" or magic[:2] == b"\x80\x02":
        # torch zip archive (or legacy torch pickle) — use the torch loader
        from grouptraj.compat.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(path)
    try:
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        if not isinstance(ckpt, dict):
            raise pickle.UnpicklingError(f"not a checkpoint dict: {type(ckpt)}")
        # pickled defaultdicts come back fine; normalize plain dicts
        for k in ("G_losses", "D_losses", "metrics_val", "metrics_train"):
            if k in ckpt and not isinstance(ckpt[k], defaultdict):
                d = defaultdict(list)
                d.update(ckpt[k])
                ckpt[k] = d
        return ckpt
    except (pickle.UnpicklingError, EOFError, KeyError, ModuleNotFoundError,
            TypeError):
        from grouptraj.compat.torch_import import load_torch_checkpoint
        return load_torch_checkpoint(path)
