"""Unit tests for the dense masked ops, with golden values from tiny
hand-checkable inputs (the SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grouptraj.ops import (
    gat, gat_layer, gcn, get_noise, group_membership, init_gat, init_gat_layer,
    init_linear, init_lstm, init_mlp, init_pool_hidden_net,
    intra_group_adjacency, linear, lstm_cell, lstm_scan, mlp_forward,
    normalize_adjacency, pool_hidden_net,
)
from grouptraj.ops.groups import inter_group_adjacency
from grouptraj.utils import relative_to_abs

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------------ linear/mlp

def test_linear_shapes_and_bias():
    p = init_linear(KEY, 3, 5)
    x = jnp.ones((2, 3))
    y = linear(p, x)
    assert y.shape == (2, 5)
    assert np.allclose(y, x @ p["w"] + p["b"])


def test_mlp_trailing_activation():
    """make_mlp puts an activation after EVERY linear — outputs are ReLU'd."""
    p = init_mlp(KEY, [4, 8, 2])
    x = jax.random.normal(KEY, (10, 4))
    y = mlp_forward(p, x, "relu")
    assert float(y.min()) >= 0.0


def test_mlp_manual_two_layer():
    p = {"layers": [
        {"linear": {"w": jnp.eye(2), "b": jnp.array([-1.0, 0.0])}},
        {"linear": {"w": 2 * jnp.eye(2), "b": jnp.zeros(2)}},
    ]}
    x = jnp.array([[2.0, -3.0]])
    # layer1: relu([1, -3]) = [1, 0]; layer2: relu([2, 0]) = [2, 0]
    y = mlp_forward(p, x, "relu")
    assert np.allclose(y, [[2.0, 0.0]])


# ----------------------------------------------------------------------- lstm

def test_lstm_cell_golden_zero_weights():
    H = 4
    p = {k: jnp.zeros(s) for k, s in [
        ("w_ih", (3, 4 * H)), ("w_hh", (H, 4 * H)),
        ("b_ih", (4 * H,)), ("b_hh", (4 * H,))]}
    h, c = lstm_cell(p, jnp.ones((2, 3)), jnp.zeros((2, H)), jnp.zeros((2, H)))
    # gates all sigmoid(0)=.5 / tanh(0)=0 -> c=0, h=0
    assert np.allclose(h, 0) and np.allclose(c, 0)


def test_lstm_scan_matches_manual_loop():
    p = init_lstm(KEY, 3, 4)
    xs = jax.random.normal(KEY, (5, 2, 3))
    ys, (hT, cT) = lstm_scan(p, xs)
    h = jnp.zeros((2, 4))
    c = jnp.zeros((2, 4))
    for t in range(5):
        h, c = lstm_cell(p, xs[t], h, c)
    assert np.allclose(ys[-1], h, atol=1e-6)
    assert np.allclose(hT, h, atol=1e-6) and np.allclose(cT, c, atol=1e-6)


def test_lstm_matches_torch():
    """Numeric parity with torch.nn.LSTM (the reference's encoder backbone)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    m = torch.nn.LSTM(3, 4, 1)
    xs_t = torch.randn(6, 2, 3)
    with torch.no_grad():
        out_t, (h_t, c_t) = m(xs_t)
    p = {
        "w_ih": jnp.asarray(m.weight_ih_l0.detach().numpy().T),
        "w_hh": jnp.asarray(m.weight_hh_l0.detach().numpy().T),
        "b_ih": jnp.asarray(m.bias_ih_l0.detach().numpy()),
        "b_hh": jnp.asarray(m.bias_hh_l0.detach().numpy()),
    }
    ys, (hT, cT) = lstm_scan(p, jnp.asarray(xs_t.numpy()))
    # float32 sigmoid/tanh implementations differ between XLA-CPU and torch
    # by ~5e-5/step (exact to 4e-15 in float64), so allow 1e-3 after 6 steps.
    assert np.allclose(ys, out_t.numpy(), atol=1e-3)
    assert np.allclose(hT, h_t[0].numpy(), atol=1e-3)


# ------------------------------------------------------------------ adjacency

def test_intra_group_adjacency_untitled_fixture():
    """The reference author's own scratchpad fixture (Untitled.ipynb):
    labels [1,1,2,0] -> adjacency [[1100],[1100],[0010],[0001]]."""
    labels = jnp.array([[1.0, 1.0, 2.0, 0.0]])
    valid = jnp.ones((1, 4))
    m = intra_group_adjacency(labels, valid)
    expected = np.array([[1, 1, 0, 0], [1, 1, 0, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1]], bool)
    assert np.array_equal(np.asarray(m[0]), expected)


def test_intra_group_adjacency_masks_invalid():
    labels = jnp.array([[1.0, 1.0, 1.0]])
    valid = jnp.array([[1.0, 1.0, 0.0]])
    m = np.asarray(intra_group_adjacency(labels, valid)[0])
    assert not m[:, 2].any() and not m[2, :].any()


def test_normalize_adjacency_rows():
    adj = jnp.array([[[1.0, 1.0, 0.0], [0, 1, 0], [0, 0, 0]]])
    a = np.asarray(normalize_adjacency(adj)[0])
    assert np.allclose(a[0], [0.5, 0.5, 0])
    assert np.allclose(a[1], [0, 1, 0])
    assert np.allclose(a[2], 0)           # empty row stays zero (no inf)


def test_group_membership_and_double_normalization():
    labels = jnp.array([[3.0, 3.0, 5.0, 0.0]])
    valid = jnp.ones((1, 4))
    r_raw, gv = group_membership(labels, valid)
    r_raw = np.asarray(r_raw[0])
    gv = np.asarray(gv[0])
    # groups: {0,1} at slot 0, {2} at slot 2, {3} at slot 3; slot 1 empty
    assert gv.tolist() == [True, False, True, True]
    assert r_raw[0].tolist() == [True, True, False, False]
    assert r_raw[2].tolist() == [False, False, True, False]
    # pool+unpool with normalized R reproduces the reference double-1/|g|:
    r = normalize_adjacency(jnp.asarray(r_raw[None]))
    x = jnp.array([[[2.0], [4.0], [6.0], [8.0]]])
    pooled = r @ x                        # group mean
    unpooled = jnp.einsum("smn,smf->snf", r, pooled)
    # members of the pair get mean(2,4)/2 = 1.5
    assert np.allclose(np.asarray(unpooled[0, :2, 0]), 1.5)
    assert np.allclose(np.asarray(unpooled[0, 2, 0]), 6.0)


def test_inter_group_adjacency():
    gv = jnp.array([[True, False, True]])
    m = np.asarray(inter_group_adjacency(gv)[0])
    assert m[0, 2] and m[2, 0] and m[0, 0]
    assert not m[1].any() and not m[:, 1].any()


# ------------------------------------------------------------------------ gat

def test_gat_layer_uniform_attention_when_symmetric():
    """With a=0 all logits are equal -> attention = uniform over neighbors."""
    p = {"W": jnp.eye(2), "a": jnp.zeros((4, 1))}
    x = jnp.array([[[1.0, 0.0], [0.0, 1.0], [10.0, 10.0]]])
    adj = jnp.array([[[1, 1, 0], [1, 1, 0], [0, 0, 1]]], bool)
    out = gat_layer(p, x, adj, concat=False)
    # rows 0,1 average each other; row 2 attends to itself
    assert np.allclose(out[0, 0], [0.5, 0.5], atol=1e-6)
    assert np.allclose(out[0, 2], [10.0, 10.0], atol=1e-6)


def test_gat_layer_masking_excludes_nonneighbors():
    p = init_gat_layer(KEY, 3, 4)
    x = jax.random.normal(KEY, (1, 3, 3))
    adj_self = jnp.eye(3, dtype=bool)[None]
    out = gat_layer(p, x, adj_self, concat=False)
    # attending only to self = Wh itself
    assert np.allclose(out, x @ p["W"], atol=1e-5)


def test_gat_module_log_softmax_output():
    """GAT module output rows are log-probabilities over features
    (reference quirk models.py:237)."""
    p = init_gat(KEY, 5, 7, 4, nheads=2)
    x = jax.random.normal(KEY, (2, 3, 5))
    adj = jnp.ones((2, 3, 3), bool)
    out = gat(p, x, adj)
    assert out.shape == (2, 3, 4)
    assert np.allclose(np.exp(np.asarray(out)).sum(-1), 1.0, atol=1e-5)


def test_gat_vs_reference_formula_single_scene():
    """Cross-check the decomposed logits against the explicit [N,N,2F]
    construction of the reference (models.py:212-220)."""
    p = init_gat_layer(KEY, 3, 4)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 3))
    adj = jnp.asarray(np.random.default_rng(0).random((1, 5, 5)) > 0.4)
    adj = adj | jnp.eye(5, dtype=bool)[None]
    out = gat_layer(p, x, adj, alpha=0.2, concat=True)

    wh = np.asarray(x[0] @ p["W"])
    a = np.asarray(p["a"][:, 0])
    e = np.zeros((5, 5))
    for i in range(5):
        for j in range(5):
            z = np.concatenate([wh[i], wh[j]]) @ a
            e[i, j] = z if z > 0 else 0.2 * z
    e = np.where(np.asarray(adj[0]), e, -9e15)
    att = np.exp(e - e.max(1, keepdims=True))
    att /= att.sum(1, keepdims=True)
    ref = att @ wh
    ref = np.where(ref > 0, ref, np.expm1(ref))   # elu
    assert np.allclose(np.asarray(out[0]), ref, atol=1e-5)


# ------------------------------------------------------------------------ gcn

def test_gcn_golden():
    p = {"W": [jnp.eye(2)]}
    adj = normalize_adjacency(jnp.ones((1, 2, 2)))
    x = jnp.array([[[2.0, -2.0], [4.0, -4.0]]])
    out = gcn(p, adj, x)
    # A@X = mean -> [[3,-3],[3,-3]]; relu -> [[3,0],[3,0]]
    assert np.allclose(out, [[[3.0, 0.0], [3.0, 0.0]]])


# ------------------------------------------------------------------- pooling

def test_pool_hidden_net_matches_bruteforce():
    S, N, E, H, B = 2, 4, 3, 5, 6
    p = init_pool_hidden_net(KEY, E, H, B)
    h = jax.random.normal(jax.random.PRNGKey(1), (S, N, H))
    pos = jax.random.normal(jax.random.PRNGKey(2), (S, N, 2))
    valid = jnp.asarray(np.array([[1, 1, 1, 0], [1, 1, 0, 0]], np.float32))
    out = pool_hidden_net(p, h, pos, valid)
    # brute-force per scene over valid peds (reference loop semantics)
    for s in range(S):
        n_valid = int(valid[s].sum())
        for i in range(n_valid):
            feats = []
            for j in range(n_valid):
                rel = pos[s, j] - pos[s, i]
                emb = linear(p["spatial_embedding"], rel)
                f = mlp_forward(p["mlp_pre_pool"],
                                jnp.concatenate([emb, h[s, j]]))
                feats.append(np.asarray(f))
            expected = np.max(np.stack(feats), axis=0)
            assert np.allclose(np.asarray(out[s, i]), expected, atol=1e-5)
    # invalid rows are zero
    assert np.allclose(np.asarray(out[0, 3]), 0.0)
    assert np.allclose(np.asarray(out[1, 2:]), 0.0)


# ------------------------------------------------------------------- utils

def test_relative_to_abs():
    rel = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 4, 2))
                      .astype(np.float32))
    start = jnp.asarray(np.random.default_rng(1).normal(size=(2, 3, 2))
                        .astype(np.float32))
    out = relative_to_abs(rel, start)
    manual = np.cumsum(np.asarray(rel), axis=2) + np.asarray(start)[:, :, None]
    assert np.allclose(out, manual, atol=1e-6)


def test_get_noise_types():
    g = get_noise(KEY, (1000,), "gaussian")
    u = get_noise(KEY, (1000,), "uniform")
    assert abs(float(g.mean())) < 0.2
    assert float(u.min()) >= -1.0 and float(u.max()) <= 1.0
    with pytest.raises(ValueError):
        get_noise(KEY, (1,), "bogus")


class TestRecurrenceCustomVJP:
    """lstm_recurrence / decoder_recurrence: the one-big-matmul backward
    must match plain autodiff through the naive scan."""

    def _naive_lstm(self, w, gx, h0, c0):
        from grouptraj.ops.lstm import lstm_gates
        H = h0.shape[-1]

        def step(carry, g):
            h, c = carry
            h, c = lstm_gates(g + h @ w, c, H)
            return (h, c), h

        (hT, cT), ys = jax.lax.scan(step, (h0, c0), gx)
        return ys, hT, cT

    def test_lstm_recurrence_grads_match_autodiff(self):
        from grouptraj.ops.lstm import lstm_recurrence
        T, B, H = 7, 12, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        w = jax.random.normal(ks[0], (H, 4 * H)) * 0.3
        gx = jax.random.normal(ks[1], (T, B, 4 * H)) * 0.5
        h0 = jax.random.normal(ks[2], (B, H))
        c0 = jax.random.normal(ks[3], (B, H))

        def loss(fn):
            def f(w, gx, h0, c0):
                ys, hT, cT = fn(w, gx, h0, c0)
                return jnp.sum(ys ** 2) + jnp.sum(jnp.sin(hT) * cT)
            return f

        want_v = loss(self._naive_lstm)(w, gx, h0, c0)
        got_v = loss(lstm_recurrence)(w, gx, h0, c0)
        np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-6)
        g_want = jax.grad(loss(self._naive_lstm), argnums=(0, 1, 2, 3))(
            w, gx, h0, c0)
        g_got = jax.grad(loss(lstm_recurrence), argnums=(0, 1, 2, 3))(
            w, gx, h0, c0)
        for a, b in zip(g_want, g_got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)

    def test_decoder_recurrence_grads_match_autodiff(self):
        from grouptraj.ops.lstm import decoder_recurrence, lstm_gates
        T, B, H = 9, 10, 16
        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        w = jax.random.normal(ks[0], (H, 4 * H)) * 0.3
        b = jax.random.normal(ks[1], (4 * H,)) * 0.1
        h1 = jax.random.normal(ks[2], (B, H))
        c1 = jax.random.normal(ks[3], (B, H))

        def naive(w, b, h1, c1):
            def step(carry, _):
                h, c = carry
                h, c = lstm_gates(h @ w + b, c, H)
                return (h, c), h
            _, ys = jax.lax.scan(step, (h1, c1), None, length=T)
            return ys

        def loss(fn):
            return lambda w, b, h1, c1: jnp.sum(jnp.cos(fn(w, b, h1, c1)))

        got = decoder_recurrence(w, b, h1, c1, T)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(naive(w, b, h1, c1)),
                                   rtol=1e-6, atol=1e-6)
        g_want = jax.grad(loss(naive), argnums=(0, 1, 2, 3))(w, b, h1, c1)
        g_got = jax.grad(loss(lambda w, b, h1, c1: decoder_recurrence(
            w, b, h1, c1, T)), argnums=(0, 1, 2, 3))(w, b, h1, c1)
        for a, bb in zip(g_want, g_got):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)

    def test_encoder_recurrence_grads_match_autodiff(self):
        """The folded whole-encoder recurrence (embedding composed into the
        input gates, all weight grads accumulated in-carry, no gx/dzs slab)
        must match plain autodiff through embed -> lstm_scan."""
        from grouptraj.ops.lstm import encoder_recurrence, lstm_gates
        T, B, H = 8, 12, 16
        ks = jax.random.split(jax.random.PRNGKey(2), 5)
        w_e = jax.random.normal(ks[0], (2, 6)) * 0.5
        b_e = jax.random.normal(ks[1], (6,)) * 0.1
        lstm = {
            "w_ih": jax.random.normal(ks[2], (6, 4 * H)) * 0.3,
            "w_hh": jax.random.normal(ks[3], (H, 4 * H)) * 0.3,
            "b_ih": jnp.zeros((4 * H,)) + 0.05,
            "b_hh": jnp.zeros((4 * H,)) - 0.02,
        }
        xs = jax.random.normal(ks[4], (T, B, 2))

        def naive(w_e, b_e, lstm, xs):
            emb = xs @ w_e + b_e
            gx = emb @ lstm["w_ih"] + lstm["b_ih"] + lstm["b_hh"]

            def step(carry, g):
                h, c = carry
                h, c = lstm_gates(g + h @ lstm["w_hh"], c, H)
                return (h, c), None

            (hT, cT), _ = jax.lax.scan(
                step, (jnp.zeros((B, H)), jnp.zeros((B, H))), gx)
            return hT, cT

        def folded(w_e, b_e, lstm, xs):
            w_comp = w_e @ lstm["w_ih"]
            b_comp = b_e @ lstm["w_ih"] + lstm["b_ih"] + lstm["b_hh"]
            return encoder_recurrence(w_comp, b_comp, lstm["w_hh"], xs)

        def loss(fn):
            def f(w_e, b_e, lstm, xs):
                hT, cT = fn(w_e, b_e, lstm, xs)
                return jnp.sum(hT ** 2) + jnp.sum(jnp.sin(cT))
            return f

        hT_w, cT_w = naive(w_e, b_e, lstm, xs)
        hT_g, cT_g = folded(w_e, b_e, lstm, xs)
        np.testing.assert_allclose(np.asarray(hT_g), np.asarray(hT_w),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cT_g), np.asarray(cT_w),
                                   rtol=1e-5, atol=1e-6)
        g_want = jax.grad(loss(naive), argnums=(0, 1, 2, 3))(
            w_e, b_e, lstm, xs)
        g_got = jax.grad(loss(folded), argnums=(0, 1, 2, 3))(
            w_e, b_e, lstm, xs)
        for a, bb in zip(jax.tree_util.tree_leaves(g_want),
                         jax.tree_util.tree_leaves(g_got)):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=1e-4, atol=1e-6)

    def test_decoder_proj_recurrence_matches_unfolded(self):
        """Projection-folded decoder recurrence == decoder_recurrence
        followed by the hidden2pos matmul, values and grads."""
        from grouptraj.ops.lstm import (
            decoder_proj_recurrence, decoder_recurrence,
        )
        T, B, H = 11, 10, 16
        ks = jax.random.split(jax.random.PRNGKey(3), 6)
        w = jax.random.normal(ks[0], (H, 4 * H)) * 0.3
        b = jax.random.normal(ks[1], (4 * H,)) * 0.1
        wp = jax.random.normal(ks[2], (H, 2)) * 0.4
        bp = jax.random.normal(ks[3], (2,)) * 0.1
        h1 = jax.random.normal(ks[4], (B, H))
        c1 = jax.random.normal(ks[5], (B, H))

        def unfolded(w, b, wp, bp, h1, c1):
            return decoder_recurrence(w, b, h1, c1, T) @ wp + bp

        def folded(w, b, wp, bp, h1, c1):
            return decoder_proj_recurrence(w, b, wp, bp, h1, c1, T)

        np.testing.assert_allclose(
            np.asarray(folded(w, b, wp, bp, h1, c1)),
            np.asarray(unfolded(w, b, wp, bp, h1, c1)),
            rtol=1e-6, atol=1e-6)
        loss = lambda fn: lambda *a: jnp.sum(jnp.cos(fn(*a)))
        g_want = jax.grad(loss(unfolded), argnums=tuple(range(6)))(
            w, b, wp, bp, h1, c1)
        g_got = jax.grad(loss(folded), argnums=tuple(range(6)))(
            w, b, wp, bp, h1, c1)
        for a, bb in zip(g_want, g_got):
            np.testing.assert_allclose(np.asarray(bb), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


class TestRecurrenceCustomVmap:
    """Op-level checks of the custom_vmap replica rules (ops/lstm.py):
    vmap(grad(...)) over the replica axis must equal per-replica grads —
    including unbatched-arg broadcasting, T=1, and the large-R fallback
    to the plain batched program (GROUPTRAJ_VMAP_UNROLL_MAX)."""

    R, B, H, T = 3, 6, 8, 5

    def _dec_args(self, batched=True):
        R, B, H = self.R, self.B, self.H
        ks = jax.random.split(jax.random.PRNGKey(7), 4)
        lead = (R,) if batched else ()
        return (jax.random.normal(ks[0], lead + (H, 4 * H)) * 0.3,
                jax.random.normal(ks[1], lead + (4 * H,)) * 0.1,
                jax.random.normal(ks[2], (R, B, H)),
                jax.random.normal(ks[3], (R, B, H)))

    def _check(self, vfn, fn, args, n_batched):
        """vmap(grad) == stacked per-replica grads for the first n_batched
        (replica-leading) args; the rest are shared (broadcast) args."""
        got = jax.vmap(jax.grad(vfn, argnums=tuple(range(len(args)))),
                       in_axes=(0,) * n_batched + (None,) * (
                           len(args) - n_batched))(*args)
        for r in range(self.R):
            per = jax.grad(fn, argnums=tuple(range(len(args))))(
                *[a[r] if i < n_batched else a
                  for i, a in enumerate(args)])
            for g_v, g_p in zip(got, per):
                np.testing.assert_allclose(
                    np.asarray(g_v[r]), np.asarray(g_p),
                    rtol=2e-4, atol=1e-5)

    @pytest.mark.parametrize("T", [5, 1])
    def test_decoder_recurrence_vmap_grad(self, T):
        from grouptraj.ops.lstm import decoder_recurrence
        fn = lambda w, b, h, c: jnp.sum(
            jnp.cos(decoder_recurrence(w, b, h, c, T)))
        self._check(fn, fn, self._dec_args(), 4)

    def test_decoder_recurrence_vmap_grad_shared_weights(self):
        """Unbatched (shared) weights under vmap: grads per replica with
        the shared-arg cotangent summed by vmap itself."""
        from grouptraj.ops.lstm import decoder_recurrence
        T = self.T
        w, b, h, c = self._dec_args(batched=False)
        fn = lambda h, c, w, b: jnp.sum(
            jnp.cos(decoder_recurrence(w, b, h, c, T)))
        self._check(fn, fn, (h, c, w, b), 2)

    @pytest.mark.parametrize("T", [5, 1])
    def test_decoder_proj_recurrence_vmap_grad(self, T):
        from grouptraj.ops.lstm import decoder_proj_recurrence
        R, B, H = self.R, self.B, self.H
        ks = jax.random.split(jax.random.PRNGKey(9), 6)
        args = (jax.random.normal(ks[0], (R, H, 4 * H)) * 0.3,
                jax.random.normal(ks[1], (R, 4 * H)) * 0.1,
                jax.random.normal(ks[2], (R, H, 2)) * 0.4,
                jax.random.normal(ks[3], (R, 2)) * 0.1,
                jax.random.normal(ks[4], (R, B, H)),
                jax.random.normal(ks[5], (R, B, H)))
        fn = lambda w, b, wp, bp, h, c: jnp.sum(
            jnp.cos(decoder_proj_recurrence(w, b, wp, bp, h, c, T)))
        self._check(fn, fn, args, 6)

    @pytest.mark.parametrize("T,shared_xs", [(5, False), (1, False),
                                             (5, True)])
    def test_encoder_recurrence_vmap_grad(self, T, shared_xs):
        from grouptraj.ops.lstm import encoder_recurrence
        R, B, H = self.R, self.B, self.H
        ks = jax.random.split(jax.random.PRNGKey(11), 4)
        w_comp = jax.random.normal(ks[0], (R, 2, 4 * H)) * 0.4
        b_comp = jax.random.normal(ks[1], (R, 4 * H)) * 0.1
        w_hh = jax.random.normal(ks[2], (R, H, 4 * H)) * 0.3
        xs_shape = ((T, B, 2) if shared_xs else (R, T, B, 2))
        xs = jax.random.normal(ks[3], xs_shape)

        def fn(w_comp, b_comp, w_hh, xs):
            hT, cT = encoder_recurrence(w_comp, b_comp, w_hh, xs)
            return jnp.sum(hT ** 2) + jnp.sum(jnp.sin(cT))

        if shared_xs:
            self._check(lambda w, b, wh, x: fn(w, b, wh, x),
                        fn, (w_comp, b_comp, w_hh, xs), 3)
        else:
            self._check(fn, fn, (w_comp, b_comp, w_hh, xs), 4)

    def test_large_axis_fallback_matches(self, monkeypatch):
        """Above GROUPTRAJ_VMAP_UNROLL_MAX the rules fall back to the plain
        batched program — same numbers, no per-replica unrolling."""
        from grouptraj.ops.lstm import decoder_recurrence
        T = self.T
        args = self._dec_args()
        fn = lambda w, b, h, c: jnp.sum(
            jnp.cos(decoder_recurrence(w, b, h, c, T)))
        monkeypatch.setenv("GROUPTRAJ_VMAP_UNROLL_MAX", "1")
        self._check(fn, fn, args, 4)

    def test_unrolled_path_matches(self, monkeypatch):
        """The replica-unrolled rules (the pre-round-5 default, kept
        env-gated for re-measurement) still produce the batched path's
        numbers."""
        from grouptraj.ops.lstm import decoder_recurrence
        T = self.T
        args = self._dec_args()
        fn = lambda w, b, h, c: jnp.sum(
            jnp.cos(decoder_recurrence(w, b, h, c, T)))
        monkeypatch.setenv("GROUPTRAJ_VMAP_UNROLL_MAX", "16")
        self._check(fn, fn, args, 4)

    def test_per_family_fallback_override_matches(self, monkeypatch):
        """GROUPTRAJ_VMAP_UNROLL_MAX_<FAMILY> flips ONE rule family's path
        (a measurement knob for the perf audits) without changing numbers;
        other families keep the global setting."""
        from grouptraj.ops.lstm import decoder_recurrence
        T = self.T
        args = self._dec_args()
        fn = lambda w, b, h, c: jnp.sum(
            jnp.cos(decoder_recurrence(w, b, h, c, T)))
        monkeypatch.setenv("GROUPTRAJ_VMAP_UNROLL_MAX", "16")
        monkeypatch.setenv("GROUPTRAJ_VMAP_UNROLL_MAX_DEC", "1")
        self._check(fn, fn, args, 4)
        # and the precedence: family env first, then the global
        from grouptraj.ops.replica_scan import vmap_unroll_max
        assert vmap_unroll_max("dec") == 1
        assert vmap_unroll_max("enc") == 16
        assert vmap_unroll_max() == 16
        monkeypatch.delenv("GROUPTRAJ_VMAP_UNROLL_MAX")
        assert vmap_unroll_max() == 1  # the round-5 default: batched

    def test_decoder_first_step_matches_inline(self):
        """decoder_first_step == the inline gates+projection it replaced
        (models/generator.py _decode_folded step 1), values and grads,
        plain and under vmap(grad) over a replica axis."""
        from grouptraj.ops.lstm import decoder_first_step, lstm_gates
        H, B, R = 16, 10, 3
        ks = jax.random.split(jax.random.PRNGKey(13), 7)
        base = (jax.random.normal(ks[0], (2, 4 * H)) * 0.4,
                jax.random.normal(ks[1], (4 * H,)) * 0.1,
                jax.random.normal(ks[2], (H, 4 * H)) * 0.3,
                jax.random.normal(ks[3], (H, 2)) * 0.4,
                jax.random.normal(ks[4], (2,)) * 0.1,
                jax.random.normal(ks[5], (B, 2)),
                jax.random.normal(ks[6], (B, H)))

        def inline(w_r, b1c, w_hh, w_p, b_p, x0, h0):
            h1, c1 = lstm_gates(x0 @ w_r + h0 @ w_hh + b1c,
                                jnp.zeros_like(h0), H)
            return h1, c1, h1 @ w_p + b_p

        for a, b in zip(inline(*base), decoder_first_step(*base)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-7)
        loss = lambda fn: lambda *a: sum(
            jnp.sum(jnp.sin(o) * (i + 1)) for i, o in enumerate(fn(*a)))
        g_w = jax.grad(loss(inline), argnums=tuple(range(7)))(*base)
        g_g = jax.grad(loss(decoder_first_step),
                       argnums=tuple(range(7)))(*base)
        for a, b in zip(g_w, g_g):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
        argsR = [jnp.stack([a * (r + 1) / 2.0 for r in range(R)])
                 for a in base]
        gv = jax.vmap(jax.grad(loss(decoder_first_step),
                               argnums=tuple(range(7))))(*argsR)
        for r in range(R):
            gp = jax.grad(loss(inline), argnums=tuple(range(7)))(
                *[a[r] for a in argsR])
            for i in range(7):
                np.testing.assert_allclose(
                    np.asarray(gv[i][r]), np.asarray(gp[i]),
                    rtol=2e-4, atol=1e-5)

    def test_pool_precompute_matches_inline(self):
        """pool_precompute == the inline two-dot form (ops/pooling.py
        _pool_fast), values and grads, plain and under vmap(grad)."""
        from grouptraj.ops.pooling import pool_precompute
        S, N, H, K, R = 4, 6, 16, 32, 3
        ks = jax.random.split(jax.random.PRNGKey(17), 5)
        base = (jax.random.normal(ks[0], (S, N, 2)),
                jax.random.normal(ks[1], (S, N, H)),
                jax.random.normal(ks[2], (2, K)) * 0.4,
                jax.random.normal(ks[3], (H, K)) * 0.3,
                jax.random.normal(ks[4], (K,)) * 0.1)

        def inline(p, h, Wu, W1h, cvec):
            u = p @ Wu
            return u + h @ W1h + cvec, u

        for a, b in zip(inline(*base), pool_precompute(*base)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-6, atol=1e-7)
        loss = lambda fn: lambda *a: (jnp.sum(jnp.sin(fn(*a)[0]))
                                      + jnp.sum(jnp.cos(fn(*a)[1])))
        g_w = jax.grad(loss(inline), argnums=tuple(range(5)))(*base)
        g_g = jax.grad(loss(pool_precompute), argnums=tuple(range(5)))(*base)
        for a, b in zip(g_w, g_g):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
        argsR = [jnp.stack([a * (r + 1) / 2.0 for r in range(R)])
                 for a in base]
        gv = jax.vmap(jax.grad(loss(pool_precompute),
                               argnums=tuple(range(5))))(*argsR)
        for r in range(R):
            gp = jax.grad(loss(inline), argnums=tuple(range(5)))(
                *[a[r] for a in argsR])
            for i in range(5):
                np.testing.assert_allclose(
                    np.asarray(gv[i][r]), np.asarray(gp[i]),
                    rtol=2e-4, atol=1e-5)

    def test_ppre_batched_matches_vmap(self):
        """The batched branch of _ppre_fwd_rule phrases the dots as
        3-D-flattened batched dot_generals (layout fix, round 5); values
        must match a plain per-replica loop of _ppre_one exactly — the
        flattening changes the dot's M-dim shape, not its contraction."""
        from grouptraj.ops.pooling import pool_precompute, _ppre_one
        S, N, H, K, R = 4, 6, 16, 32, 5
        ks = jax.random.split(jax.random.PRNGKey(23), 5)
        argsR = (jax.random.normal(ks[0], (R, S, N, 2)),
                 jax.random.normal(ks[1], (R, S, N, H)),
                 jax.random.normal(ks[2], (R, 2, K)) * 0.4,
                 jax.random.normal(ks[3], (R, H, K)) * 0.3,
                 jax.random.normal(ks[4], (R, K)) * 0.1)
        a_b, u_b = jax.vmap(pool_precompute)(*argsR)   # batched rule (R>1)
        for r in range(R):
            a_r, u_r = _ppre_one(*[x[r] for x in argsR])
            np.testing.assert_allclose(np.asarray(a_b[r]), np.asarray(a_r),
                                       rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(np.asarray(u_b[r]), np.asarray(u_r),
                                       rtol=1e-6, atol=1e-6)


class TestReplicaScan:
    """Direct contract tests of ops/replica_scan.replica_scan — the shared
    buffer-IO-fused scaffolding all custom_vmap replica rules route through
    (round 5). The rules' numerics are pinned end-to-end by
    TestRecurrenceCustomVmap; this pins the helper itself."""

    def test_matches_naive_loop(self):
        from grouptraj.ops.replica_scan import replica_scan, stack_slots
        R, T, B, D = 3, 5, 2, 4
        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.standard_normal((R, T, B, D)), jnp.float32)
        ws = [jnp.asarray(rng.standard_normal((D, D)), jnp.float32)
              for _ in range(R)]

        def step(r, c, reads):
            (x,) = reads
            c2 = jnp.tanh(c + x @ ws[r])
            return c2, (c2, c2.sum(-1))

        init = tuple(jnp.zeros((B, D)) for _ in range(R))
        fin, (ebuf, sbuf) = replica_scan(step, init, (xs,), T)
        assert ebuf.shape == (R, T, B, D) and sbuf.shape == (R, T, B)
        # naive per-replica python loop
        for r in range(R):
            c = np.zeros((B, D), np.float32)
            for t in range(T):
                c = np.tanh(c + np.asarray(xs[r, t]) @ np.asarray(ws[r]))
                np.testing.assert_allclose(np.asarray(ebuf[r, t]), c,
                                           rtol=1e-6, atol=1e-6)
                np.testing.assert_allclose(np.asarray(sbuf[r, t]), c.sum(-1),
                                           rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(fin[r]), c,
                                       rtol=1e-6, atol=1e-6)
        st = stack_slots(tuple((f,) for f in fin), 1)
        assert st[0].shape == (R, B, D)

    def test_reverse_emissions_land_at_own_t(self):
        from grouptraj.ops.replica_scan import replica_scan
        R, T = 2, 4
        xs = jnp.arange(R * T, dtype=jnp.float32).reshape(R, T, 1)

        def step(r, c, reads):
            (x,) = reads
            c2 = c + x
            return c2, (c2,)

        fin, (ebuf,) = replica_scan(
            step, tuple(jnp.zeros((1,)) for _ in range(R)), (xs,), T,
            reverse=True)
        # reverse suffix-sums: emission at t is sum of xs[t:]
        want = np.cumsum(np.asarray(xs)[:, ::-1], axis=1)[:, ::-1]
        np.testing.assert_allclose(np.asarray(ebuf), want)
        np.testing.assert_allclose(np.asarray(fin[0]),
                                   np.asarray(xs[0]).sum(0))
