"""Two-level group message-passing modules (intra-group then inter-group).

Dense, scene-batched re-designs of the reference's per-scene modules:
- :func:`gat_encoder` — the live path (reference ``sgan/models.py:239-294``);
- :func:`gcn_module` — the GCN twin (reference ``sgan/models.py:583-712``,
  constructed in every reference generator but only called in the era-b
  checkpoints' forward);
- :func:`gcn_pooling` — reconstruction of the lost GCNPooling pool-net
  documented by the reference's train_GCN.py docstring and the ``models/01``
  checkpoint weight shapes (reference ``scripts/train_GCN.py:617-631``).

Shared scaffolding: build M_intra from group labels, run the intra module
over pedestrians, GPool to one node per effective group (mean via normalized
membership R), run the inter module over the complete group graph, GUnpool
with the same normalized R (preserving the reference's double 1/|g| scaling),
concat intra‖inter, project.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from grouptraj.ops.gat import gat, init_gat
from grouptraj.ops.gcn import gcn, init_gcn
from grouptraj.ops.groups import (
    group_membership, inter_group_adjacency, intra_group_adjacency,
    normalize_adjacency,
)
from grouptraj.ops.linear import init_linear, linear


# ---------------------------------------------------------------- GATEncoder

def init_gat_encoder(key: jax.Array, in_dim: int = 40, hidden_dim: int = 72,
                     out_dim: int = 16, final_dim: int = 24, n_heads: int = 1,
                     dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gat_intra": init_gat(k1, in_dim, hidden_dim, out_dim, n_heads, dtype),
        "gat_inter": init_gat(k2, out_dim, hidden_dim, out_dim, n_heads, dtype),
        "out_embedding": init_linear(k3, 2 * out_dim, final_dim, dtype),
    }


def gat_encoder(params: dict, x: jnp.ndarray, labels: jnp.ndarray,
                valid: jnp.ndarray, alpha: float = 0.2, dropout: float = 0.0,
                key: Optional[jax.Array] = None, train: bool = True
                ) -> jnp.ndarray:
    """- x: [S, N, in_dim] per-ped context features
    - labels: [S, N] group label at t_obs; valid: [S, N]
    Returns [S, N, final_dim], zero at invalid peds.
    """
    k1 = k2 = None
    if dropout > 0 and train:
        if key is None:
            raise ValueError("dropout requires a PRNG key")
        k1, k2 = jax.random.split(key)
    m_intra = intra_group_adjacency(labels, valid)
    intra = gat(params["gat_intra"], x, m_intra, alpha, dropout, k1, train)

    r_raw, group_valid = group_membership(labels, valid)
    r = normalize_adjacency(r_raw)
    x_group = r @ intra                                     # GPool  [S, M, F]
    m_inter = inter_group_adjacency(group_valid)
    y_group = gat(params["gat_inter"], x_group, m_inter, alpha, dropout, k2,
                  train)
    inter = jnp.einsum("smn,smf->snf", r, y_group)          # GUnpool (Rᵀ @ y)

    out = linear(params["out_embedding"],
                 jnp.concatenate([intra, inter], axis=-1))
    return jnp.where(valid[..., None] > 0, out, 0.0)


# ----------------------------------------------------------------- GCNModule

def init_gcn_module(key: jax.Array, input_dim: int = 40, hidden_dim: int = 72,
                    out_dim: int = 16, gcn_layers: int = 2,
                    final_dim: int = 24, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gcn_intra": init_gcn(k1, input_dim, hidden_dim, out_dim, gcn_layers,
                              dtype),
        "gcn_inter": init_gcn(k2, out_dim, hidden_dim, out_dim, gcn_layers,
                              dtype),
        "out_embedding": init_linear(k3, 2 * out_dim, final_dim, dtype),
    }


def gcn_module(params: dict, x: jnp.ndarray, labels: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """GCN twin of :func:`gat_encoder` (reference ``models.py:628-712``)."""
    a_intra = normalize_adjacency(intra_group_adjacency(labels, valid))
    intra = gcn(params["gcn_intra"], a_intra, x)

    r_raw, group_valid = group_membership(labels, valid)
    r = normalize_adjacency(r_raw)
    x_group = r @ intra
    a_inter = normalize_adjacency(inter_group_adjacency(group_valid))
    y_group = gcn(params["gcn_inter"], a_inter, x_group)
    inter = jnp.einsum("smn,smf->snf", r, y_group)

    out = linear(params["out_embedding"],
                 jnp.concatenate([intra, inter], axis=-1))
    return jnp.where(valid[..., None] > 0, out, 0.0)


# ---------------------------------------------------------------- GCNPooling

def init_gcn_pooling(key: jax.Array, embedding_dim: int = 16, h_dim: int = 32,
                     hidden_dim: int = 72, bottleneck_dim: int = 8,
                     gcn_layers: int = 2, dtype=jnp.float32) -> dict:
    """Reconstructed GCNPooling pool-net.

    Weight shapes follow the ``models/01`` checkpoint: spatial_embedding
    2→16, intra and inter GCNs both (emb+h)→72→bottleneck, out_embedding
    2·bottleneck→bottleneck.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    in_dim = embedding_dim + h_dim
    return {
        "spatial_embedding": init_linear(k1, 2, embedding_dim, dtype),
        "gcn_pooling_net_intra": init_gcn(k2, in_dim, hidden_dim,
                                          bottleneck_dim, gcn_layers, dtype),
        "gcn_pooling_net_inter": init_gcn(k3, in_dim, hidden_dim,
                                          bottleneck_dim, gcn_layers, dtype),
        "out_embedding": init_linear(k4, 2 * bottleneck_dim, bottleneck_dim,
                                     dtype),
    }


def gcn_pooling(params: dict, h: jnp.ndarray, last_rel: jnp.ndarray,
                labels: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Recovered GCNPooling pool-net (the class was deleted from the
    reference; shapes/naming from ``scripts/train_GCN.py:617-631`` and the
    ``models/01`` checkpoint).

    Semantics recovered by checkpoint-fitness search (tools/gcnpool_lab.py):
    per-ped features are the spatial embedding of the LAST RELATIVE
    DISPLACEMENT (the decoder's input convention, ``obs_traj_rel[-1]``)
    concatenated with the encoder hidden state ``[S, N, 16+32]``; BOTH GCNs
    run over the row-normalized intra-group adjacency (consistent with the
    checkpoint's identical 48-in shapes for intra and inter — the inter GCN
    consumes raw per-ped features, not GPooled ones); concat [intra ‖ inter]
    → out_embedding 16→8. With ``models/01`` this evaluates to 0.458/0.967
    Bo20 on zara1 test (the recorded golden for this config family is
    0.42/0.84 from a shorter sibling run, evaluate_model.py:129-173; the
    shipped checkpoint is a 451-epoch overtrain of it), and to 0.563
    single-sample val ADE, matching the ~0.53 a verified-correct import
    scores — vs 2.38/4.38 for the earlier centroid-relative guess.
    Eliminated alternatives (each strictly worse): centroid-relative or
    absolute positions, GPooled inter over the complete group graph,
    complement/full inter adjacencies, pairwise PoolHiddenNet-style
    features, [inter ‖ intra] concat order, no-ReLU final GCN layer.
    """
    v = valid[..., None]
    x = jnp.concatenate(
        [linear(params["spatial_embedding"], last_rel * v), h], axis=-1)

    a_intra = normalize_adjacency(intra_group_adjacency(labels, valid))
    intra = gcn(params["gcn_pooling_net_intra"], a_intra, x)
    inter = gcn(params["gcn_pooling_net_inter"], a_intra, x)

    out = linear(params["out_embedding"],
                 jnp.concatenate([intra, inter], axis=-1))
    return jnp.where(v > 0, out, 0.0)


# ----------------------------------------------------- era-(b) GATEncoder-mh

def init_gat_encoder_mh(key: jax.Array, n_units=(40, 16, 40),
                        n_heads=(4, 1), dtype=jnp.float32) -> dict:
    from grouptraj.ops.gat import init_batch_gat

    return {"gat_net": init_batch_gat(key, list(n_units), list(n_heads),
                                      dtype)}


def gat_encoder_mh(params: dict, x: jnp.ndarray, labels: jnp.ndarray,
                   valid: jnp.ndarray, alpha: float = 0.2,
                   dropout: float = 0.0, key=None, train: bool = True,
                   adj_mode: str = "mix", concat_mode: str = "transpose",
                   norm: bool = False) -> jnp.ndarray:
    """Era-(b) group GAT ("sgangat-g-*" checkpoints): a single batched
    multi-head GAT stack, followed (in the generator) by
    mlp_decoder_context — per the reference's commented forward
    (models.py:890-898). Reconstruction: the era's exact class is commented
    out of the reference; semantics follow BatchMultiHeadGraphAttention
    (models.py:296-388) with the checkpoint's layer shapes. ``adj_mode`` /
    ``concat_mode`` select between the commented code's quirks and the
    upstream-STGAT form (see :func:`grouptraj.ops.gat.batch_gat`);
    tools/gatmh_probe.py picks the combination that reproduces the shipped
    checkpoints."""
    from grouptraj.ops.gat import batch_gat

    a_intra = normalize_adjacency(intra_group_adjacency(labels, valid))
    out = batch_gat(params["gat_net"], x, a_intra, valid, alpha, dropout,
                    key, train, adj_mode, concat_mode, norm)
    return jnp.where(valid[..., None] > 0, out, 0.0)
