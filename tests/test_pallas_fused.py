"""Fused single-grid-step recurrence kernels (ops/pallas_fused.py),
interpret mode on CPU; the same kernels compile and are measured on the
real TPU (tools/depth_bench.py, ARCHITECTURE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import grouptraj.ops.pallas_fused as PF
from grouptraj.ops.lstm import init_lstm, lstm_gates, lstm_scan


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = PF.pl.pallas_call

    def patched(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(PF.pl, "pallas_call", patched)


def scan_recur(w, b, h0, c0, T):
    H = h0.shape[-1]

    def step(carry, _):
        h, c = carry
        h, c = lstm_gates(h @ w + b, c, H)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h0, c0), None, length=T)
    return ys


@pytest.mark.parametrize("T,B,D,H", [(8, 100, 16, 32), (5, 9, 4, 8),
                                     (20, 40, 16, 48)])
def test_lstm_recurrence_matches_scan(T, B, D, H):
    p = init_lstm(jax.random.PRNGKey(0), D, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, D)) * 0.5
    ys_s, (h_s, c_s) = lstm_scan(p, xs)

    gx = xs @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
    h0 = jnp.zeros((B, H))
    ys_p, (h_p, c_p) = PF.lstm_recurrence_pallas(p["w_hh"], gx, h0, h0)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_s), atol=1e-5)


@pytest.mark.parametrize("T,B,D,H", [(8, 50, 16, 32), (6, 16, 8, 16)])
def test_lstm_recurrence_backward_matches_scan(T, B, D, H):
    p = init_lstm(jax.random.PRNGKey(0), D, H)
    xs = jax.random.normal(jax.random.PRNGKey(1), (T, B, D)) * 0.5

    def loss_scan(p, xs):
        ys, (h, c) = lstm_scan(p, xs)
        return jnp.sum(ys ** 2) + jnp.sum(h * c)

    def loss_pallas(p, xs):
        gx = xs @ p["w_ih"] + (p["b_ih"] + p["b_hh"])
        h0 = jnp.zeros((xs.shape[1], H))
        ys, (h, c) = PF.lstm_recurrence_pallas(p["w_hh"], gx, h0, h0)
        return jnp.sum(ys ** 2) + jnp.sum(h * c)

    g_s = jax.grad(loss_scan, argnums=(0, 1))(p, xs)
    g_p = jax.grad(loss_pallas, argnums=(0, 1))(p, xs)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_p)):
        rel = float(jnp.abs(a - b).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 1e-4, rel


@pytest.mark.parametrize("T,B,H", [(11, 70, 32), (7, 9, 16)])
def test_decoder_recurrence_matches_scan(T, B, H):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(2), 4)
    w = jax.random.normal(k1, (H, 4 * H)) * 0.3
    b = jax.random.normal(k2, (4 * H,)) * 0.1
    h1 = jax.random.normal(k3, (B, H))
    c1 = jax.random.normal(k4, (B, H))
    ys_s = scan_recur(w, b, h1, c1, T)
    ys_p = PF.decoder_recurrence_pallas(w, b, h1, c1, T)
    np.testing.assert_allclose(np.asarray(ys_p), np.asarray(ys_s), atol=1e-5)


def test_decoder_recurrence_backward_matches_scan():
    T, B, H = 11, 24, 32
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(3), 4)
    w = jax.random.normal(k1, (H, 4 * H)) * 0.3
    b = jax.random.normal(k2, (4 * H,)) * 0.1
    h1 = jax.random.normal(k3, (B, H))
    c1 = jax.random.normal(k4, (B, H))

    def loss(fn):
        def f(w, b, h1, c1):
            ys = fn(w, b, h1, c1, T)
            return jnp.sum(jnp.sin(ys))
        return f

    g_s = jax.grad(loss(scan_recur), argnums=(0, 1, 2, 3))(w, b, h1, c1)
    g_p = jax.grad(loss(PF.decoder_recurrence_pallas),
                   argnums=(0, 1, 2, 3))(w, b, h1, c1)
    for a, bb in zip(g_s, g_p):
        rel = float(jnp.abs(a - bb).max()) / (float(jnp.abs(a).max()) + 1e-8)
        assert rel < 1e-4, rel


def test_pick_block_alignment():
    for B in (1, 8, 100, 4096, 81920):
        for T, H, wg in ((12, 32, False), (20, 48, True)):
            Bp, block, nb = PF._pick_block(B, T, H, wg)
            assert Bp >= B and Bp == block * nb
            assert block % 8 == 0 and block >= 8
