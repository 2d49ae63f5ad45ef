"""Group-graph construction: intra-group adjacency, GPool membership, masks.

Dense replacement for the reference's per-scene adjacency construction and
``torch.unique`` row-deduplication GPool trick (reference
``sgan/models.py:254-286, 628-699``):

- ``M_intra[i, j] = (g_i == g_j ∧ g_i ≠ 0) ∨ (i == j)`` over valid peds;
- the unique rows of ``M_intra`` are exactly one row per *effective group*
  (each nonzero label's members share a row; each label-0 or singleton ped is
  its own row), so instead of deduplicating rows we assign every ped an
  effective group index — the first valid ped with the same nonzero label,
  else itself — and build the membership matrix ``R [M=N, N]`` directly. Row
  order differs from the reference's reversed-unique order, which is
  immaterial: the inter-group graph is complete, the inter GAT/GCN is
  permutation-equivariant, and GUnpool inverts with the same R.
- Both pool and unpool use the row-normalized R, reproducing the reference's
  double 1/|g| scaling (``models.py:280,286``).

All functions are batched over scenes: labels ``[S, N]``, masks ``[S, N]``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def normalize_adjacency(adj: jnp.ndarray) -> jnp.ndarray:
    """Row-normalize (reference GATEncoder.normalize, ``models.py:246-252``).

    Rows with zero sum (padded slots) normalize to zero rather than inf.
    """
    adj = adj.astype(jnp.float32)
    rowsum = jnp.sum(adj, axis=-1, keepdims=True)
    return adj / jnp.maximum(rowsum, 1.0)


def intra_group_adjacency(labels: jnp.ndarray, valid: jnp.ndarray
                          ) -> jnp.ndarray:
    """Boolean M_intra [S, N, N]: same nonzero label, or self-loop (valid i)."""
    v = valid > 0
    same = (labels[:, :, None] == labels[:, None, :]) & (
        labels[:, :, None] != 0)
    eye = jnp.eye(labels.shape[-1], dtype=bool)[None]
    m = (same | eye) & v[:, :, None] & v[:, None, :]
    return m


def group_membership(labels: jnp.ndarray, valid: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Effective-group membership.

    Returns:
    - R_raw [S, M=N, N] boolean: R_raw[s, m, i] = ped i belongs to group m
      (group index = first valid ped of the same nonzero label, else i);
    - group_valid [S, M] boolean: group slot m is populated.
    """
    S, N = labels.shape
    v = valid > 0
    same_nonzero = (labels[:, :, None] == labels[:, None, :]) & (
        labels[:, :, None] != 0) & v[:, None, :]
    # first valid j sharing my nonzero label (argmax finds first True)
    first = jnp.argmax(same_nonzero, axis=-1)                     # [S, N]
    has_match = jnp.any(same_nonzero, axis=-1)
    own = jnp.arange(N)[None, :]
    gidx = jnp.where(has_match & v, first, own)                   # [S, N]
    R_raw = (gidx[:, None, :] == jnp.arange(N)[None, :, None]) & v[:, None, :]
    group_valid = jnp.any(R_raw, axis=-1)
    return R_raw, group_valid


def inter_group_adjacency(group_valid: jnp.ndarray) -> jnp.ndarray:
    """Complete graph over populated group slots (reference M_inter = ones,
    ``models.py:282``): [S, M, M] boolean."""
    return group_valid[:, :, None] & group_valid[:, None, :]
