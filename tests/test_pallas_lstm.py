"""Pallas fused-LSTM kernel tests (interpret mode on CPU; the same kernels
compile and are verified on real TPU — see bench.py and the kernel module)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import grouptraj.ops.pallas_lstm as PL
from grouptraj.ops.lstm import init_lstm, lstm_scan


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = PL.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(PL.pl, "pallas_call", patched)


@pytest.mark.parametrize("T,B,D,H", [(8, 100, 16, 32), (5, 8, 4, 8),
                                     (20, 33, 16, 48)])
def test_forward_matches_scan(T, B, D, H):
    p = init_lstm(jax.random.PRNGKey(0), D, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, D)) * 0.5
    ys_s, (h_s, c_s) = lstm_scan(p, xs)
    ys_p, (h_p, c_p) = lstm_scan(p, xs, impl="pallas")
    assert np.allclose(np.asarray(ys_s), np.asarray(ys_p), atol=1e-5)
    assert np.allclose(np.asarray(h_s), np.asarray(h_p), atol=1e-5)
    assert np.allclose(np.asarray(c_s), np.asarray(c_p), atol=1e-5)


def test_forward_nonzero_initial_state():
    p = init_lstm(jax.random.PRNGKey(0), 4, 8)
    xs = jax.random.normal(jax.random.PRNGKey(1), (6, 10, 4))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (10, 8))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (10, 8))
    ys_s, _ = lstm_scan(p, xs, h0, c0)
    ys_p, _ = lstm_scan(p, xs, h0, c0, impl="pallas")
    assert np.allclose(np.asarray(ys_s), np.asarray(ys_p), atol=1e-5)


@pytest.mark.parametrize("T,B,D,H", [(8, 100, 16, 32), (6, 16, 8, 16)])
def test_backward_matches_scan(T, B, D, H):
    p = init_lstm(jax.random.PRNGKey(0), D, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, D)) * 0.5

    def loss(p, xs, impl):
        ys, (h, c) = lstm_scan(p, xs, impl=impl)
        return jnp.sum(ys ** 2) + jnp.sum(h * c)

    g_s = jax.grad(lambda p, x: loss(p, x, "scan"), argnums=(0, 1))(p, xs)
    g_p = jax.grad(lambda p, x: loss(p, x, "pallas"), argnums=(0, 1))(p, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 1e-4, rel


def test_backward_initial_state_grads():
    """dh0/dc0 and the h0 contribution to dW_hh are correct."""
    p = init_lstm(jax.random.PRNGKey(0), 4, 8)
    xs = jax.random.normal(jax.random.PRNGKey(1), (5, 12, 4))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (12, 8))
    c0 = jax.random.normal(jax.random.PRNGKey(3), (12, 8))

    def loss(p, h0, c0, impl):
        ys, (h, c) = lstm_scan(p, xs, h0, c0, impl=impl)
        return jnp.sum(ys ** 2) + jnp.sum(h) + jnp.sum(c)

    g_s = jax.grad(lambda *a: loss(*a, "scan"), argnums=(0, 1, 2))(p, h0, c0)
    g_p = jax.grad(lambda *a: loss(*a, "pallas"), argnums=(0, 1, 2))(
        p, h0, c0)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_grid_setup_alignment_and_waste():
    """The batch block is 8-row aligned, divides the padded batch, respects
    the VMEM cap, and never inflates the padded batch by more than ~3%
    (regression: a 682-row block at H=192 used to force Bp to 2.66x B)."""
    from grouptraj.ops.pallas_lstm import _BLOCK_B, _grid_setup

    for H in range(8, 520, 8):
        cap = max(min(_BLOCK_B, _BLOCK_B * 128 // max(H, 128)) // 8 * 8, 8)
        for B in list(range(8, 200, 8)) + [1000, 1024, 4096, 5000]:
            Bp, block, nb = _grid_setup(B, H)
            assert Bp == block * nb
            assert block % 8 == 0 and block <= cap
            assert B <= Bp <= max(B, 8) * 1.04
