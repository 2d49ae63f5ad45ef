"""Loss/metric golden-value tests (reference semantics from sgan/losses.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from grouptraj import losses


def test_bce_loss_golden():
    # max(x,0) - x*y + log(1+exp(-|x|))
    x = jnp.array([0.0, 2.0, -3.0])
    y = jnp.array([1.0, 0.0, 1.0])
    expected = np.mean([
        0 - 0 * 1 + np.log(2),
        2 - 0 + np.log1p(np.exp(-2)),
        0 + 3 + np.log1p(np.exp(-3)),
    ])
    assert np.isclose(float(losses.bce_loss(x, y)), expected, atol=1e-6)


def test_bce_loss_masked_ignores_invalid():
    x = jnp.array([1.0, 99.0])
    y = jnp.array([1.0, 1.0])
    m = jnp.array([1.0, 0.0])
    full = losses.bce_loss(x[:1], y[:1])
    assert np.isclose(float(losses.bce_loss(x, y, m)), float(full))


def test_gan_losses_label_smoothing_range():
    key = jax.random.PRNGKey(0)
    s = jnp.zeros((5,))
    # g loss with logits 0: bce(0, y) = log(2) regardless of y -> constant
    g = losses.gan_g_loss(s, key)
    assert np.isclose(float(g), np.log(2), atol=1e-6)
    d = losses.gan_d_loss(s, s, key)
    assert np.isclose(float(d), 2 * np.log(2), atol=1e-6)


def test_l2_loss_modes():
    pred = jnp.zeros((2, 3, 4, 2))       # [S, N, T, 2]
    gt = jnp.ones((2, 3, 4, 2))
    lm = jnp.ones((2, 3, 4))
    assert float(losses.l2_loss(pred, gt, lm, "sum")) == 2 * 3 * 4 * 2
    assert np.isclose(float(losses.l2_loss(pred, gt, lm, "average")), 2.0)
    raw = losses.l2_loss(pred, gt, lm, "raw")
    assert raw.shape == (2, 3)
    assert np.allclose(raw, 8.0)


def test_l2_loss_respects_mask():
    pred = jnp.zeros((1, 2, 3, 2))
    gt = jnp.ones((1, 2, 3, 2))
    lm = jnp.array([[[1.0, 1, 0], [0, 0, 0]]])
    raw = losses.l2_loss(pred, gt, lm, "raw")
    assert np.allclose(raw, [[4.0, 0.0]])


def test_displacement_error_golden():
    gt = jnp.zeros((1, 2, 3, 2))
    pred = gt.at[0, 0].set(jnp.array([[3, 4], [0, 0], [0, 0]], jnp.float32))
    # ped 0: ||(3,4)|| + 0 + 0 = 5; ped 1: 0
    raw = losses.displacement_error(pred, gt, mode="raw")
    assert np.allclose(raw, [[5.0, 0.0]])
    assert float(losses.displacement_error(pred, gt)) == 5.0
    cp = jnp.array([[0.0, 1.0]])
    assert float(losses.displacement_error(pred, gt, cp)) == 0.0


def test_final_displacement_error():
    gt = jnp.zeros((1, 2, 2))
    pred = jnp.asarray([[[3.0, 4.0], [6.0, 8.0]]])
    raw = losses.final_displacement_error(pred, gt, mode="raw")
    assert np.allclose(raw, [[5.0, 10.0]])


def test_variety_loss_min_over_k_per_scene():
    # 2 scenes, 2 peds, 1 step; K=2 samples.
    gt = jnp.zeros((2, 2, 1, 2))
    # sample 0 perfect for scene 0, bad for scene 1; sample 1 the reverse
    pred = np.zeros((2, 2, 2, 1, 2), np.float32)
    pred[0, 1] = 1.0   # sample 0, scene 1: error 2*2=4 per ped
    pred[1, 0] = 1.0
    lm = jnp.ones((2, 2, 1))
    valid = jnp.ones((2, 2))
    out = losses.variety_l2_loss(jnp.asarray(pred), gt, lm, valid)
    # each scene's best sample has zero error
    assert float(out) == 0.0

    # remove the perfect samples: per scene, error = 2 peds * 1 step * 2
    # sq-coords = 4, normalized by loss_mask sum (2 entries) -> 2; x2 scenes
    pred[:] = 1.0
    out = losses.variety_l2_loss(jnp.asarray(pred), gt, lm, valid)
    assert np.isclose(float(out), 4.0)


def test_variety_loss_ignores_padded():
    gt = jnp.zeros((1, 3, 2, 2))
    pred = jnp.ones((1, 1, 3, 2, 2))
    lm = jnp.asarray(np.stack([np.array([[1, 1], [1, 1], [0, 0]],
                                        np.float32)]))
    valid = jnp.array([[1.0, 1.0, 0.0]])
    out = losses.variety_l2_loss(pred, gt, lm, valid)
    # 2 valid peds * (2 steps * 2 coords) = 8 error, / 4 mask entries
    assert np.isclose(float(out), 8 / 4.0)
