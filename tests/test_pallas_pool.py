"""Fused PoolHiddenNet pair-core kernel (ops/pallas_pool.py), interpret
mode on CPU; the same kernel compiles and is measured on the real TPU
(tools/profile_step.py). Also covers the decomposed fast path vs the
reference-shaped pair path (ops/pooling.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import grouptraj.ops.pallas_pool as PP
from grouptraj.ops.pooling import (
    init_pool_hidden_net, pool_core, pool_hidden_net,
)

jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = PP.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(PP.pl, "pallas_call", patched)


def _data(S=3, N=13, K=64, B=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    a = jax.random.normal(ks[0], (S, N, K))
    u = jax.random.normal(ks[1], (S, N, K))
    W2 = jax.random.normal(ks[2], (K, B)) / np.sqrt(K)
    b2 = jax.random.normal(ks[3], (B,))
    valid = (jax.random.uniform(ks[4], (S, N)) > 0.3).astype(jnp.float32)
    # one scene fully valid, one with a single valid ped
    valid = valid.at[0].set(1.0)
    valid = valid.at[1].set(0.0).at[1, 0].set(1.0)
    return a, u, W2, b2, valid


def test_forward_matches_xla_core():
    a, u, W2, b2, valid = _data()
    ref = pool_core(a, u, W2, b2, valid)
    out = PP.pool_core_pallas(a, u, W2, b2, valid)
    # compare only valid-i rows (invalid rows are masked by callers)
    m = np.asarray(valid)[..., None] > 0
    assert np.allclose(np.asarray(out)[m.repeat(8, -1)],
                       np.asarray(ref)[m.repeat(8, -1)], atol=1e-5)


@pytest.mark.parametrize("seed,N,B", [(0, 13, 8), (1, 8, 16), (2, 24, 8)])
def test_gradients_match_xla_core(seed, N, B):
    a, u, W2, b2, valid = _data(N=N, B=B, seed=seed)

    def loss(core):
        def f(a, u, W2, b2):
            pooled = core(a, u, W2, b2, valid)
            # the caller-side mask, so invalid-i rows carry no cotangent
            pooled = jnp.where(valid[..., None] > 0, pooled, 0.0)
            w = jnp.cos(jnp.arange(pooled.size, dtype=jnp.float32)
                        ).reshape(pooled.shape)
            return jnp.sum(pooled * w)
        return f

    g_ref = jax.grad(loss(pool_core), argnums=(0, 1, 2, 3))(a, u, W2, b2)
    g_ker = jax.grad(loss(PP.pool_core_pallas), argnums=(0, 1, 2, 3))(
        a, u, W2, b2)
    for r, k, name in zip(g_ref, g_ker, ["da", "du", "dW2", "db2"]):
        assert np.allclose(np.asarray(r), np.asarray(k), atol=2e-4), (
            name, np.abs(np.asarray(r) - np.asarray(k)).max())


def test_gradients_with_relu_ties():
    """ReLU-clipped outputs produce exact 0-ties across j; the kernel must
    split the max cotangent evenly like jnp.max autodiff."""
    a, u, W2, b2, valid = _data(seed=3)
    # force many negative pre-activations -> zero outputs -> ties
    b2 = b2 - 3.0

    def loss(core):
        def f(a, u, W2, b2):
            pooled = core(a, u, W2, b2, valid)
            pooled = jnp.where(valid[..., None] > 0, pooled, 0.0)
            return jnp.sum(pooled ** 2) + jnp.sum(pooled)
        return f

    g_ref = jax.grad(loss(pool_core), argnums=(0, 1, 2, 3))(a, u, W2, b2)
    g_ker = jax.grad(loss(PP.pool_core_pallas), argnums=(0, 1, 2, 3))(
        a, u, W2, b2)
    for r, k in zip(g_ref, g_ker):
        assert np.allclose(np.asarray(r), np.asarray(k), atol=2e-4)


def test_gradients_with_duplicate_row_ties():
    """Duplicated pedestrians (identical a_j rows) produce exact POSITIVE
    ties at the max, possibly in different j-tiles; the forward-side
    running tie count must still split the cotangent evenly like jnp.max
    autodiff."""
    a, u, W2, b2, valid = _data(N=24, seed=4)
    # duplicates within one j-tile (1<->2) and across tiles (0<->17, 3<->22)
    a = a.at[:, 2].set(a[:, 1]).at[:, 17].set(a[:, 0]).at[:, 22].set(a[:, 3])
    valid = valid.at[:, [0, 1, 2, 3, 17, 22]].set(1.0)

    def loss(core):
        def f(a, u, W2, b2):
            pooled = core(a, u, W2, b2, valid)
            pooled = jnp.where(valid[..., None] > 0, pooled, 0.0)
            return jnp.sum(pooled ** 2) + jnp.sum(pooled)
        return f

    g_ref = jax.grad(loss(pool_core), argnums=(0, 1, 2, 3))(a, u, W2, b2)
    g_ker = jax.grad(loss(PP.pool_core_pallas), argnums=(0, 1, 2, 3))(
        a, u, W2, b2)
    for r, k, name in zip(g_ref, g_ker, ["da", "du", "dW2", "db2"]):
        assert np.allclose(np.asarray(r), np.asarray(k), atol=2e-4), (
            name, np.abs(np.asarray(r) - np.asarray(k)).max())


# ------------------------------------------------- decomposed vs pair path

def test_fast_path_matches_pair_path():
    S, N, E, H, B = 4, 21, 16, 32, 8
    p = init_pool_hidden_net(jax.random.PRNGKey(0), E, H, B)
    h = jax.random.normal(jax.random.PRNGKey(1), (S, N, H))
    pos = 4.0 * jax.random.normal(jax.random.PRNGKey(2), (S, N, 2))
    valid = (jax.random.uniform(jax.random.PRNGKey(3), (S, N)) > 0.4
             ).astype(jnp.float32)
    ref = pool_hidden_net(p, h, pos, valid, impl="pair")
    fast = pool_hidden_net(p, h, pos, valid, impl="fast")
    assert np.allclose(np.asarray(ref), np.asarray(fast), atol=1e-4)

    # gradients agree too (the training path)
    def loss(impl):
        def f(p):
            out = pool_hidden_net(p, h, pos, valid, impl=impl)
            return jnp.sum(out * jnp.sin(jnp.arange(out.size,
                           dtype=jnp.float32)).reshape(out.shape))
        return f

    from jax.flatten_util import ravel_pytree
    g_ref = jax.grad(loss("pair"))(p)
    g_fast = jax.grad(loss("fast"))(p)
    flat_r, _ = ravel_pytree(g_ref)
    flat_f, _ = ravel_pytree(g_fast)
    assert np.allclose(np.asarray(flat_r), np.asarray(flat_f), atol=2e-4)


def test_fast_path_respects_quirk_gates():
    """batch_norm / train-time dropout / non-relu fall back to the pair
    path (decomposition would be wrong there)."""
    S, N, E, H, B = 2, 6, 4, 8, 5
    p = init_pool_hidden_net(jax.random.PRNGKey(0), E, H, B,
                             batch_norm=True)
    h = jax.random.normal(jax.random.PRNGKey(1), (S, N, H))
    pos = jax.random.normal(jax.random.PRNGKey(2), (S, N, 2))
    valid = jnp.ones((S, N))
    bn = pool_hidden_net(p, h, pos, valid, batch_norm=True, impl="auto")
    bn_pair = pool_hidden_net(p, h, pos, valid, batch_norm=True, impl="pair")
    assert np.allclose(np.asarray(bn), np.asarray(bn_pair))

    p2 = init_pool_hidden_net(jax.random.PRNGKey(0), E, H, B)
    k = jax.random.PRNGKey(7)
    drop = pool_hidden_net(p2, h, pos, valid, dropout=0.5, key=k,
                           train=True, impl="auto")
    drop_pair = pool_hidden_net(p2, h, pos, valid, dropout=0.5, key=k,
                                train=True, impl="pair")
    assert np.allclose(np.asarray(drop), np.asarray(drop_pair))
    # eval-mode dropout is inactive -> fast path applies and matches
    ev = pool_hidden_net(p2, h, pos, valid, dropout=0.5, train=False,
                         impl="auto")
    ev_pair = pool_hidden_net(p2, h, pos, valid, dropout=0.5, train=False,
                              impl="pair")
    assert np.allclose(np.asarray(ev), np.asarray(ev_pair), atol=1e-4)


def _rep_data(R, S=3, N=13, K=64, B=8, seed=4):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    a = jax.random.normal(ks[0], (R, S, N, K))
    u = jax.random.normal(ks[1], (R, S, N, K))
    W2 = jax.random.normal(ks[2], (R, K, B)) / np.sqrt(K)
    b2 = jax.random.normal(ks[3], (R, B))
    valid = (jax.random.uniform(ks[4], (S, N)) > 0.3).astype(jnp.float32)
    valid = valid.at[0].set(1.0).at[1].set(0.0).at[1, 0].set(1.0)
    return a, u, W2, b2, valid


def test_vmap_forward_matches_vmapped_xla_core():
    """The multi-seed trainer's exact pattern: params batched on a replica
    axis, data (valid) broadcast — the custom_vmap rule must fold the
    replica axis into the kernel grid, not fall over in Mosaic batching."""
    R = 3
    a, u, W2, b2, valid = _rep_data(R)
    out = jax.vmap(PP.pool_core_pallas,
                   in_axes=(0, 0, 0, 0, None))(a, u, W2, b2, valid)
    ref = jax.vmap(pool_core,
                   in_axes=(0, 0, 0, 0, None))(a, u, W2, b2, valid)
    m = np.broadcast_to(np.asarray(valid)[None, :, :, None] > 0, out.shape)
    assert np.allclose(np.asarray(out)[m], np.asarray(ref)[m], atol=1e-5)


def test_vmap_batched_valid_matches():
    """All-args-batched variant (per-replica masks)."""
    R = 2
    a, u, W2, b2, valid = _rep_data(R, seed=5)
    validR = jnp.stack([valid, jnp.roll(valid, 1, axis=1)])
    out = jax.vmap(PP.pool_core_pallas)(a, u, W2, b2, validR)
    ref = jax.vmap(pool_core)(a, u, W2, b2, validR)
    m = np.asarray(validR)[..., None].repeat(out.shape[-1], -1) > 0
    assert np.allclose(np.asarray(out)[m], np.asarray(ref)[m], atol=1e-5)


def test_vmap_gradients_match_vmapped_xla_core():
    """Replica-axis grads: per-replica dW2/db2 accumulator blocks must
    flush exactly once per replica (grid-indexed weight blocks)."""
    R = 3
    a, u, W2, b2, valid = _rep_data(R, seed=6)

    def loss(core):
        def f(a, u, W2, b2):
            p = core(a, u, W2, b2, valid)
            p = jnp.where(valid[..., None] > 0, p, 0.0)
            return jnp.sum(jnp.sin(p * 0.3) * 1.7)
        return f

    gP = jax.vmap(jax.grad(loss(PP.pool_core_pallas),
                           argnums=(0, 1, 2, 3)))(a, u, W2, b2)
    gX = jax.vmap(jax.grad(loss(pool_core),
                           argnums=(0, 1, 2, 3)))(a, u, W2, b2)
    for p_, x_ in zip(gP, gX):
        assert np.allclose(np.asarray(p_), np.asarray(x_), atol=2e-4)


def test_auto_select_rule_decision_points():
    """Pin the measured pair-volume auto-select rule
    (ARCHITECTURE.md 'Pair-volume-aware pool impl selection'): kernel
    at S*N*N >= 1e5 with N <= 128, XLA core below. Measured flips:
    width-8/16 buckets stay XLA, N=32/S=128 flips to the kernel."""
    from grouptraj.ops.pooling import _use_pallas_pool

    on_cpu = jax.default_backend() == "cpu"
    # explicit impls override everything
    assert _use_pallas_pool("pallas", 1, 8) is True
    assert _use_pallas_pool("xla", 4096, 64) is False
    # narrow buckets (zara1 headline mix) stay on the XLA core
    assert _use_pallas_pool("auto", 64, 8) is False    # 4.1e3 pairs
    assert _use_pallas_pool("auto", 128, 16) is False  # 3.3e4 pairs
    if not on_cpu:
        # measured flip point and the wide production buckets
        assert _use_pallas_pool("auto", 128, 32) is True   # 1.3e5
        assert _use_pallas_pool("auto", 64, 64) is True    # 2.6e5
        # the kernel's j-tile layout is only validated to N=128
        assert _use_pallas_pool("auto", 64, 256) is False
    else:
        # interpret-mode kernel is never worth it on CPU
        assert _use_pallas_pool("auto", 128, 64) is False
