"""Linear layers and make_mlp-style stacks as pure functions on pytrees.

Initialization matches the trained reference exactly: every Linear weight is
Kaiming-normal (the reference applies ``nn.init.kaiming_normal_`` to all
Linear modules, ``scripts/train.py:127-130``) and the bias keeps torch's
default U(−1/√fan_in, 1/√fan_in). Weights are stored as ``[in, out]`` (the
transpose of torch) so forward is ``x @ w + b``.

``make_mlp`` semantics (reference ``sgan/models.py:7-20``): for every
(in, out) pair — Linear, optional BatchNorm, activation, optional dropout.
The activation follows EVERY Linear including the last one; consumers such as
the discriminator's score head therefore emit ReLU'd (non-negative) scores.
This quirk is load-bearing for checkpoint parity and is preserved.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, d_in: int, d_out: int,
                dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    std = math.sqrt(2.0 / d_in)                        # kaiming normal, fan_in
    bound = 1.0 / math.sqrt(d_in)                      # torch default bias
    return {
        "w": std * jax.random.normal(kw, (d_in, d_out), dtype),
        "b": jax.random.uniform(kb, (d_out,), dtype, -bound, bound),
    }


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ params["w"] + params["b"]


def _activate(x: jnp.ndarray, activation: str) -> jnp.ndarray:
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "leakyrelu":
        return jax.nn.leaky_relu(x, negative_slope=0.01)  # torch default slope
    if activation in (None, "none"):
        return x
    raise ValueError(activation)


def init_mlp(key: jax.Array, dims: Sequence[int], batch_norm: bool = False,
             dtype=jnp.float32) -> dict:
    layers = []
    keys = jax.random.split(key, max(len(dims) - 1, 1))
    for k, (d_in, d_out) in zip(keys, zip(dims[:-1], dims[1:])):
        layer = {"linear": init_linear(k, d_in, d_out, dtype)}
        if batch_norm:
            layer["bn_scale"] = jnp.ones((d_out,), dtype)
            layer["bn_bias"] = jnp.zeros((d_out,), dtype)
        layers.append(layer)
    return {"layers": layers}


def mlp_forward(params: dict, x: jnp.ndarray, activation: str = "relu",
                batch_norm: bool = False, dropout: float = 0.0,
                key: Optional[jax.Array] = None,
                mask: Optional[jnp.ndarray] = None,
                train: bool = True) -> jnp.ndarray:
    """Apply the Linear(+BN)(+act)(+dropout) stack.

    ``mask`` (broadcastable to x[..., 0]) marks valid rows for the masked
    batch statistics of BatchNorm; with ``batch_norm=False`` (the reference
    default and all shipped checkpoints) it is unused. BatchNorm here always
    uses batch statistics (training semantics; no running averages — the
    reference never evaluates a batch_norm=1 model either).
    """
    for i, layer in enumerate(params["layers"]):
        x = linear(layer["linear"], x)
        if batch_norm:
            if mask is not None:
                m = mask[..., None].astype(x.dtype)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(x * m, axis=tuple(range(x.ndim - 1))) / cnt
                var = jnp.sum(m * (x - mean) ** 2,
                              axis=tuple(range(x.ndim - 1))) / cnt
            else:
                red = tuple(range(x.ndim - 1))
                mean, var = jnp.mean(x, axis=red), jnp.var(x, axis=red)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            x = x * layer["bn_scale"] + layer["bn_bias"]
        x = _activate(x, activation)
        if dropout > 0 and train:
            if key is None:
                raise ValueError("dropout requires a PRNG key")
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout), 0.0)
    return x
