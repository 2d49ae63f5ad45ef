"""Noise sampling with explicit PRNG keys (reference sgan/models.py:23-29
used the global CUDA RNG and hardcoded .cuda())."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_noise(key: jax.Array, shape, noise_type: str = "gaussian",
              dtype=jnp.float32) -> jnp.ndarray:
    if noise_type == "gaussian":
        return jax.random.normal(key, shape, dtype)
    if noise_type == "uniform":
        return jax.random.uniform(key, shape, dtype, -1.0, 1.0)
    raise ValueError('Unrecognized noise type "%s"' % noise_type)
