"""Masked dense graph attention, batched over scenes.

Reference (``sgan/models.py:184-237``) computes per-scene single-head GAT
layers by materializing all-pairs concatenations ``[N, N, 2F]``. Since the
attention logit is ``leakyrelu(a · [Wh_i ‖ Wh_j])``, it decomposes as
``leakyrelu(a₁·Wh_i + a₂·Wh_j)`` — two matvecs and a broadcast add — so the
O(N²F) intermediate never exists here. Masked entries get the reference's
exact −9e15 fill before the row softmax.

GAT module quirks preserved for checkpoint parity:
- multi-head concat -> out layer -> ELU -> **log_softmax over the feature
  dim** (``models.py:237``) — the module emits log-probabilities;
- the out layer (concat=False) skips the per-layer ELU; the module-level ELU
  applies instead.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _xavier_uniform(key: jax.Array, shape, gain: float, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_gat_layer(key: jax.Array, d_in: int, d_out: int,
                   dtype=jnp.float32) -> dict:
    """xavier_uniform with gain 1.414 like the reference (models.py:192-195)."""
    kw, ka = jax.random.split(key)
    return {
        "W": _xavier_uniform(kw, (d_in, d_out), 1.414, dtype),
        "a": _xavier_uniform(ka, (2 * d_out, 1), 1.414, dtype),
    }


def gat_layer(params: dict, x: jnp.ndarray, adj_mask: jnp.ndarray,
              alpha: float = 0.2, concat: bool = True,
              dropout: float = 0.0, key: Optional[jax.Array] = None,
              train: bool = True) -> jnp.ndarray:
    """One masked dense GAT layer.

    - x: [S, N, F]
    - adj_mask: [S, N, N] boolean; logits where False are −9e15 (reference
      ``models.py:202-203``), softmax over j.
    Rows whose mask is empty (padding) softmax to uniform garbage and must be
    masked by the caller — identical to reference behavior for real rows.
    """
    Wh = x @ params["W"]                                   # [S, N, F']
    F_out = Wh.shape[-1]
    a1 = params["a"][:F_out, 0]
    a2 = params["a"][F_out:, 0]
    e = jax.nn.leaky_relu(
        (Wh @ a1)[:, :, None] + (Wh @ a2)[:, None, :], negative_slope=alpha)
    e = jnp.where(adj_mask, e, -9e15)
    att = jax.nn.softmax(e, axis=-1)
    if dropout > 0 and train:
        if key is None:
            raise ValueError("dropout requires a PRNG key")
        keep = jax.random.bernoulli(key, 1.0 - dropout, att.shape)
        att = jnp.where(keep, att / (1.0 - dropout), 0.0)
    h = att @ Wh                                           # [S, N, F']
    return jax.nn.elu(h) if concat else h


def init_gat(key: jax.Array, nfeat: int, nhid: int, nclass: int,
             nheads: int = 1, dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, nheads + 1)
    return {
        "attentions": [init_gat_layer(keys[i], nfeat, nhid, dtype)
                       for i in range(nheads)],
        "out_att": init_gat_layer(keys[-1], nhid * nheads, nclass, dtype),
    }


def gat(params: dict, x: jnp.ndarray, adj_mask: jnp.ndarray,
        alpha: float = 0.2, dropout: float = 0.0,
        key: Optional[jax.Array] = None, train: bool = True) -> jnp.ndarray:
    """Full GAT module (reference ``models.py:222-237``): input dropout,
    multi-head concat, attention dropout, out layer, ELU, feature log_softmax.
    """
    k_mid = k_out = None
    if dropout > 0 and train:
        if key is None:
            raise ValueError("dropout requires a PRNG key")
        key, k_in, k_mid, k_out = jax.random.split(key, 4)
        keep = jax.random.bernoulli(k_in, 1.0 - dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    head_keys = (jax.random.split(key, len(params["attentions"]))
                 if (dropout > 0 and train) else
                 [None] * len(params["attentions"]))
    heads = [gat_layer(p, x, adj_mask, alpha, True, dropout, hk, train)
             for p, hk in zip(params["attentions"], head_keys)]
    x = jnp.concatenate(heads, axis=-1)
    if dropout > 0 and train:
        keep = jax.random.bernoulli(k_mid, 1.0 - dropout, x.shape)
        x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    x = jax.nn.elu(gat_layer(params["out_att"], x, adj_mask, alpha, False,
                             dropout, k_out, train))
    return jax.nn.log_softmax(x, axis=-1)


# ------------------------------------------------------------------
# Era-(b) batched multi-head GAT ("sgangat-g-*" checkpoint families).
# Reconstructed from the reference's commented-out
# BatchMultiHeadGraphAttention (models.py:296-455) whose parameters the
# sgangat checkpoints carry: per-head weights w [K, F_in, F_out],
# attention vectors a_src/a_dst [K, F_out, 1], bias [F_out]. Quirks
# preserved: softmax over ALL scene peds (no adjacency mask), then the
# post-softmax attention is MIXED with the row-normalized adjacency
# (attn @ A, models.py:332) before aggregating.

def init_batch_gat_layer(key: jax.Array, n_head: int, f_in: int, f_out: int,
                         dtype=jnp.float32) -> dict:
    kw, ks, kd = jax.random.split(key, 3)

    def xav(k, shape):  # per-head xavier like the reference's 3-D init
        return jnp.stack([_xavier_uniform(kk, shape[1:], 1.414, dtype)
                          for kk in jax.random.split(k, shape[0])])

    return {
        "w": xav(kw, (n_head, f_in, f_out)),
        "a_src": xav(ks, (n_head, f_out, 1)),
        "a_dst": xav(kd, (n_head, f_out, 1)),
        "bias": jnp.zeros((f_out,), dtype),
    }


def batch_gat_layer(params: dict, x: jnp.ndarray, adj_norm: jnp.ndarray,
                    valid: jnp.ndarray, alpha: float = 0.2,
                    dropout: float = 0.0, key: Optional[jax.Array] = None,
                    train: bool = True, adj_mode: str = "mix") -> jnp.ndarray:
    """x [S, N, F_in], adj_norm [S, N, N] row-normalized (zeros at padding),
    valid [S, N] -> [S, K, N, F_out].

    ``adj_mode``: 'mix' multiplies the post-softmax attention by the
    adjacency on the right (the reference's commented models.py:332,
    ``attn @ adj``); 'none' skips it (the upstream-STGAT form the era-(b)
    single-stack checkpoints behave like — see tools/gatmh_probe.py).
    ``dropout`` is the reference's in-layer post-softmax attention dropout
    (commented models.py:331).
    """
    h = jnp.einsum("snf,kfo->skno", x, params["w"])
    src = jnp.einsum("skno,koi->skn", h, params["a_src"])
    dst = jnp.einsum("skno,koi->skn", h, params["a_dst"])
    e = jax.nn.leaky_relu(src[:, :, :, None] + dst[:, :, None, :],
                          negative_slope=alpha)
    e = jnp.where(valid[:, None, None, :] > 0, e, -jnp.inf)
    attn = jax.nn.softmax(e, axis=-1)
    attn = jnp.where(jnp.isfinite(attn), attn, 0.0)
    if dropout > 0 and train:
        if key is None:
            raise ValueError("dropout requires a PRNG key")
        keep = jax.random.bernoulli(key, 1.0 - dropout, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout), 0.0)
    if adj_mode == "mix":
        attn = jnp.einsum("skim,smj->skij", attn, adj_norm)
    out = attn @ h + params["bias"]
    return out


def init_batch_gat(key: jax.Array, n_units, n_heads, dtype=jnp.float32) -> dict:
    layers = []
    keys = jax.random.split(key, len(n_units) - 1)
    for i, k in enumerate(keys):
        f_in = n_units[i] * n_heads[i - 1] if i else n_units[i]
        layers.append(init_batch_gat_layer(k, n_heads[i], f_in,
                                           n_units[i + 1], dtype))
    return {"layer_stack": layers}


def _masked_instance_norm(x: jnp.ndarray, valid: jnp.ndarray,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Per-scene, per-feature normalization over the (valid) pedestrian
    axis — torch ``InstanceNorm1d(affine=False)`` on a per-scene ``[1, F,
    N]`` layout, as upstream STGAT applies before each GAT layer
    (``norm_list``, reference commented models.py:372-375 constructs it;
    the era-(b) training code likely ran it). Biased variance like torch."""
    v = (valid > 0)[..., None]                              # [S, N, 1]
    cnt = jnp.maximum(jnp.sum(v, axis=1, keepdims=True), 1)
    mean = jnp.sum(jnp.where(v, x, 0.0), axis=1, keepdims=True) / cnt
    var = jnp.sum(jnp.where(v, (x - mean) ** 2, 0.0), axis=1,
                  keepdims=True) / cnt
    return jnp.where(v, (x - mean) * jax.lax.rsqrt(var + eps), 0.0)


def batch_gat(params: dict, x: jnp.ndarray, adj_norm: jnp.ndarray,
              valid: jnp.ndarray, alpha: float = 0.2, dropout: float = 0.0,
              key: Optional[jax.Array] = None, train: bool = True,
              adj_mode: str = "mix", concat_mode: str = "transpose",
              norm: bool = False) -> jnp.ndarray:
    """Stacked batch-GAT (reference commented GAT, models.py:357-388):
    intermediate layers concat heads + ELU + dropout; the final (1-head)
    layer emits raw features.

    ``concat_mode``: 'transpose' concatenates head features per pedestrian
    ([K,N,F] -> [N,K·F] via transpose, the upstream-STGAT form); 'view'
    reproduces the reference's commented ``x.contiguous().view(bs, n, -1)``
    (models.py:384) which reshapes WITHOUT transposing — rows mix
    pedestrians across heads. Both offered because the era-(b) training
    code is lost; the probe (tools/gatmh_probe.py) selects per-era.
    """
    S, N = x.shape[:2]
    n_layers = len(params["layer_stack"])
    for i, layer in enumerate(params["layer_stack"]):
        if norm:
            x = _masked_instance_norm(x, valid)
        k_att = None
        if dropout > 0 and train:
            if key is None:
                raise ValueError("dropout requires a PRNG key")
            key, k_att = jax.random.split(key)
        out = batch_gat_layer(layer, x, adj_norm, valid, alpha, dropout,
                              k_att, train, adj_mode)
        if i + 1 == n_layers:
            x = out[:, 0]                       # final layer: single head
        else:
            if concat_mode == "view":
                x = jax.nn.elu(out.reshape(S, N, -1))
            else:
                x = jax.nn.elu(jnp.moveaxis(out, 1, 2).reshape(S, N, -1))
            if dropout > 0 and train:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
                x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    return x
