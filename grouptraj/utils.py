"""Small utilities (TPU-native counterparts of reference ``sgan/utils.py``)."""

from __future__ import annotations

import contextlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def int_tuple(s):
    """argparse type: '8' or '8,16' -> (8,) / (8, 16) (reference sgan/utils.py:10-11)."""
    return tuple(int(i) for i in s.split(","))


def bool_flag(s):
    """argparse type accepting '0'/'1' (reference sgan/utils.py:19-25)."""
    if s == "1":
        return True
    if s == "0":
        return False
    raise ValueError('Invalid value "%s" for bool flag (should be 0 or 1)' % s)


def get_dset_path(dset_name: str, dset_type: str) -> str:
    """Resolve a dataset split directory.

    The reference hardwires ``<repo>/datasets_group/<name>/<split>``
    (reference sgan/utils.py:75-80). We honor ``GROUPTRAJ_DATA_DIR`` and fall
    back to the read-only reference mount so the scripts run out of the box.
    """
    candidates = []
    env = os.environ.get("GROUPTRAJ_DATA_DIR")
    if env:
        candidates.append(env)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates.append(os.path.join(here, "datasets_group"))
    candidates.append("/root/reference/datasets_group")
    for root in candidates:
        path = os.path.join(root, dset_name, dset_type)
        if os.path.isdir(path):
            return path
    # Return the preferred location even if missing so errors are legible.
    return os.path.join(candidates[0] if candidates else "datasets_group",
                        dset_name, dset_type)


def relative_to_abs(rel_traj: jnp.ndarray, start_pos: jnp.ndarray) -> jnp.ndarray:
    """Cumulative-sum relative displacements onto a start position.

    Matches reference ``sgan/utils.py:83-96`` but in dense layout:
    - rel_traj: [..., T, 2] relative displacements
    - start_pos: [..., 2]
    Returns [..., T, 2] absolute positions.
    """
    disp = jnp.cumsum(rel_traj, axis=-2)
    return disp + start_pos[..., None, :]


def find_nan(tree, name: str = "tree") -> None:
    """Debug guard: raise if any leaf contains NaN (reference sgan/utils.py:14-17)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if np.isnan(np.asarray(leaf)).any():
            raise FloatingPointError(f"{name}{jax.tree_util.keystr(path)} has nan")


def get_total_norm(tree, norm_type: float = 2.0) -> float:
    """Global norm of a pytree (used for grad-norm histories like
    reference sgan/utils.py:33-45, but computed correctly as a global norm)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return 0.0
    total = sum(jnp.sum(jnp.abs(l) ** norm_type) for l in leaves)
    return float(total ** (1.0 / norm_type))


def device_sync():
    """Barrier on all queued device work.

    A host readback of a freshly enqueued trivial program: the device
    executes programs in order, so fetching its result waits for everything
    already queued. (block_until_ready is NOT sufficient on the axon TPU
    platform — it returns before execution completes.)"""
    jax.device_get(jnp.zeros(()) + 0)


@contextlib.contextmanager
def timeit(msg: str, should_time: bool = True):
    """Wall-clock a block with device barriers (reference sgan/utils.py:48-58
    used torch.cuda.synchronize)."""
    if should_time:
        device_sync()
        t0 = time.time()
    yield
    if should_time:
        device_sync()
        print("%s: %.2f ms" % (msg, (time.time() - t0) * 1000.0))


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def get_device_memory() -> dict:
    """Per-device memory usage in MB (TPU counterpart of the reference's
    nvidia-smi probe, sgan/utils.py:61-72)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 2**20,
            }
        except Exception:
            out[str(d)] = {}
    return out
