"""Training subsystem tests: GAN steps update params, losses finite and
decreasing on a learnable toy task, checkpoint round-trip, check_accuracy."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.eval import evaluate
from grouptraj.parallel.data_parallel import synthetic_batch
from grouptraj.train import (
    checkpoint_from_state, init_train_state, load_checkpoint,
    make_check_accuracy_step, make_d_step, make_g_step, new_checkpoint,
    save_checkpoint, state_from_checkpoint,
)
from grouptraj.train.steps import check_accuracy

CFG = ModelConfig()
TCFG = TrainConfig(best_k=2, batch_size=4)


@pytest.fixture(scope="module")
def state():
    return init_train_state(jax.random.PRNGKey(0), CFG, TCFG)


@pytest.fixture(scope="module")
def batch():
    return synthetic_batch(4, 6)


def _tree_diff(a, b):
    return max(float(jnp.max(jnp.abs(x - y)))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_d_step_updates_discriminator_only(state, batch):
    d_step = make_d_step(CFG, TCFG)
    new_state, losses = d_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["D_total_loss"]))
    assert _tree_diff(new_state.d_params, state.d_params) > 0
    assert _tree_diff(new_state.g_params, state.g_params) == 0


def test_sparse_best_k_matches_dense(state):
    """The sparse best-of-k backward (decode all k without a grad graph,
    differentiably re-decode only the argmin + last samples) must produce
    the same losses and the same generator update as the dense path —
    grad(min) = grad at the argmin, and the re-decode reproduces the
    selected samples bitwise (scene-row independence)."""
    batch = synthetic_batch(6, 8, seed=3)
    tcfg = dataclasses.replace(TCFG, best_k=5)
    key = jax.random.PRNGKey(7)
    sparse_step = make_g_step(CFG, tcfg)
    dense_step = make_g_step(
        CFG, dataclasses.replace(tcfg, sparse_best_k=False))
    st_s, l_s = sparse_step(state, batch, key)
    st_d, l_d = dense_step(state, batch, key)
    # same loss VALUES (the re-decoded argmin sample equals the min sample)
    np.testing.assert_allclose(float(l_s["G_l2_loss_rel"]),
                               float(l_d["G_l2_loss_rel"]), rtol=1e-5)
    np.testing.assert_allclose(float(l_s["G_discriminator_loss"]),
                               float(l_d["G_discriminator_loss"]), rtol=1e-5)
    # same update (tolerance: backward runs over differently-shaped
    # batches, so accumulation order differs)
    for a, b in zip(jax.tree_util.tree_leaves(st_s.g_params),
                    jax.tree_util.tree_leaves(st_d.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_g_step_updates_generator_only(state, batch):
    g_step = make_g_step(CFG, TCFG)
    new_state, losses = g_step(state, batch, jax.random.PRNGKey(2))
    for k in ("G_l2_loss_rel", "G_discriminator_loss", "G_total_loss"):
        assert np.isfinite(float(losses[k])), k
    assert _tree_diff(new_state.g_params, state.g_params) > 0
    assert _tree_diff(new_state.d_params, state.d_params) == 0


def test_g_clip_matches_torch_order(state, batch):
    """clipping_threshold_g clips the gradient global norm BEFORE Adam: with a
    tiny threshold the update must still be Adam-sized (normalized), not
    zero — i.e. clip-then-adam, not adam-then-clip."""
    tcfg_small = dataclasses.replace(TCFG, clipping_threshold_g=1e-8)
    g_step = make_g_step(CFG, tcfg_small)
    new_state, _ = g_step(state, batch, jax.random.PRNGKey(2))
    diff = _tree_diff(new_state.g_params, state.g_params)
    # Adam normalizes the clipped grad, so steps are ~lr-sized, not ~1e-8
    assert diff > 1e-6


def test_training_reduces_variety_loss():
    """A few G-only steps on a fixed batch should reduce the variety loss
    (the model can memorize one batch)."""
    tcfg = dataclasses.replace(TCFG, best_k=1, g_learning_rate=1e-3)
    st = init_train_state(jax.random.PRNGKey(3), CFG, tcfg)
    b = synthetic_batch(4, 6, seed=5)
    g_step = make_g_step(CFG, tcfg)
    first = last = None
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, sub = jax.random.split(key)
        st, losses = g_step(st, b, sub)
        if first is None:
            first = float(losses["G_l2_loss_rel"])
        last = float(losses["G_l2_loss_rel"])
    assert last < first, (first, last)


def test_check_accuracy_metrics(state, batch):
    acc = make_check_accuracy_step(CFG)
    out = acc(state, batch, jax.random.PRNGKey(0))
    assert float(out["total_traj"]) == float(batch["valid"].sum())
    assert float(out["total_traj_l"] + out["total_traj_nl"]) == \
        pytest.approx(float(out["total_traj"]))
    for k in ("d_loss", "disp_error", "f_disp_error"):
        assert np.isfinite(float(out[k]))


def test_checkpoint_roundtrip(tmp_path, state):
    ckpt = new_checkpoint({"dataset_name": "test", "pred_len": 12})
    ckpt["counters"]["t"] = 7
    ckpt["metrics_val"]["ade"].append(1.0)
    ckpt = checkpoint_from_state(ckpt, state)
    save_checkpoint(ckpt, str(tmp_path), "checkpoint")
    assert os.path.exists(tmp_path / "checkpoint_with_model.pt")
    assert os.path.exists(tmp_path / "checkpoint_no_model.pt")

    loaded = load_checkpoint(str(tmp_path / "checkpoint_with_model.pt"))
    assert loaded["counters"]["t"] == 7
    restored = state_from_checkpoint(loaded, CFG, TCFG)
    assert jax.tree_util.tree_structure(restored.g_params) == \
        jax.tree_util.tree_structure(state.g_params)
    for a, b in zip(jax.tree_util.tree_leaves(restored.g_params),
                    jax.tree_util.tree_leaves(state.g_params)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # optimizer state round-trips too
    for a, b in zip(jax.tree_util.tree_leaves(restored.g_opt),
                    jax.tree_util.tree_leaves(state.g_opt)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    # no_model checkpoint has weights stripped
    small = load_checkpoint(str(tmp_path / "checkpoint_no_model.pt"))
    assert "g_state" not in small


def test_load_missing_checkpoint_returns_none(tmp_path):
    assert load_checkpoint(str(tmp_path / "nope.pt")) is None


def test_evaluate_harness_on_synthetic():
    """Best-of-N eval: more samples can only improve (min over a superset)."""
    from grouptraj.data.batching import DenseBatch

    b = synthetic_batch(3, 6, seed=2)

    class FakeLoader:
        def __iter__(self):
            yield DenseBatch(
                obs=np.asarray(b["obs"]), pred=np.asarray(b["pred"]),
                obs_rel=np.asarray(b["obs_rel"]),
                pred_rel=np.asarray(b["pred_rel"]),
                obs_g=np.repeat(np.asarray(b["group"])[:, :, None], 8, 2),
                pred_g=np.repeat(np.asarray(b["group"])[:, :, None], 12, 2),
                non_linear=np.asarray(b["non_linear"]),
                loss_mask=np.asarray(b["loss_mask"]),
                valid=np.asarray(b["valid"]))

    st = init_train_state(jax.random.PRNGKey(0), CFG, TCFG)
    ade1, fde1 = evaluate(CFG, FakeLoader(), st.g_params, num_samples=1,
                          key=jax.random.PRNGKey(7))
    ade20, fde20 = evaluate(CFG, FakeLoader(), st.g_params, num_samples=20,
                            key=jax.random.PRNGKey(7))
    assert np.isfinite(ade1) and np.isfinite(fde1)
    assert ade20 <= ade1 * 1.05   # min over more samples shouldn't be worse


def test_evaluate_bucketed_matches_global(tmp_path):
    """Bucketed eval is metric-identical to single-width eval on real
    mixed-size scenes for a DETERMINISTIC generator (noise_dim=()) — the
    estimator is padding-invariant; stochastic generators differ only by
    which PRNG subkey each scene's samples draw (see evaluate_bucketed)."""
    from grouptraj.data import TrajectoryDataset, data_loader
    from grouptraj.eval import evaluate_bucketed

    rng = np.random.default_rng(3)
    d = tmp_path / "test"
    d.mkdir()
    rows = []
    for t in range(60):
        peds = (1, 2, 3) if (t < 20 or t >= 40) else tuple(range(1, 13))
        for p in peds:
            x = 0.1 * t + p + 0.01 * rng.standard_normal()
            rows.append(f"{t*10.0}\t{p}.0\t{x:.4f}\t{0.05*t-p:.4f}"
                        f"\t{p % 3}.0")
    (d / "s.txt").write_text("\n".join(rows) + "\n")

    class A:
        obs_len, pred_len, skip, delim = 8, 12, 1, "tab"
        batch_size = 4
        n_max = 0
        seed = 0

    dset, loader = data_loader(A, str(d), shuffle=False)
    # noise_dim=() makes the generator deterministic, so the metric cannot
    # depend on how scenes are grouped into batches (RNG keys are drawn per
    # batch) and the two evals must agree to f32 accumulation order
    import dataclasses
    cfg = dataclasses.replace(CFG, noise_dim=())
    st = init_train_state(jax.random.PRNGKey(1), cfg, TCFG)
    a1, f1 = evaluate(cfg, loader, st.g_params, num_samples=1,
                      key=jax.random.PRNGKey(0))
    a2, f2 = evaluate_bucketed(cfg, dset, st.g_params, num_samples=1,
                               batch_size=4, n_buckets=3,
                               key=jax.random.PRNGKey(0))
    assert np.isclose(a1, a2, rtol=2e-3), (a1, a2)
    assert np.isclose(f1, f2, rtol=2e-3), (f1, f2)


def test_bf16_nograd_g_step_matches_f32_when_argmin_agrees(state):
    """--bf16_nograd runs the no-gradient best-of-k PROBE decode in bf16,
    but the reported variety loss and the whole generator update come from
    the f32 re-decode of the argmin sample (train/steps.py loss_fn). So as
    long as the per-scene argmin picks agree (ties at bf16 resolution are
    the only divergence channel), the g-step is BIT-EQUAL to the f32 path.
    """
    batch = synthetic_batch(6, 8, seed=3)
    tcfg = dataclasses.replace(TCFG, best_k=5)
    key = jax.random.PRNGKey(7)
    st_f, l_f = make_g_step(CFG, tcfg)(state, batch, key)
    st_b, l_b = make_g_step(
        CFG, dataclasses.replace(tcfg, bf16_nograd=True))(state, batch, key)
    np.testing.assert_allclose(float(l_b["G_l2_loss_rel"]),
                               float(l_f["G_l2_loss_rel"]), rtol=1e-6)
    np.testing.assert_allclose(float(l_b["G_total_loss"]),
                               float(l_f["G_total_loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st_b.g_params),
                    jax.tree_util.tree_leaves(st_f.g_params)):
        assert a.dtype == jnp.float32              # residency is per-leg
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_bf16_nograd_d_step_close_to_f32(state, batch):
    """The d-step's generator sample is bf16 under --bf16_nograd (no grad
    flows through it); the discriminator update must stay f32 and land
    within bf16-decode distance of the f32 path (same noise via the
    sample_noises seam)."""
    key = jax.random.PRNGKey(11)
    st_f, l_f = make_d_step(CFG, TCFG)(state, batch, key)
    st_b, l_b = make_d_step(
        CFG, dataclasses.replace(TCFG, bf16_nograd=True))(state, batch, key)
    assert np.isfinite(float(l_b["D_total_loss"]))
    np.testing.assert_allclose(float(l_b["D_total_loss"]),
                               float(l_f["D_total_loss"]), rtol=5e-2)
    for a, b in zip(jax.tree_util.tree_leaves(st_b.d_params),
                    jax.tree_util.tree_leaves(st_f.d_params)):
        assert a.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.1, atol=5e-3)
