"""Model-level tests: shapes, masking invariance, determinism, variants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from grouptraj.config import MODEL_PRESETS
from grouptraj.models import (
    discriminator_forward, gat_encoder, gcn_module, gcn_pooling,
    init_discriminator, init_gat_encoder, init_gcn_module, init_gcn_pooling,
    init_generator, generator_forward,
)

KEY = jax.random.PRNGKey(0)


def _fake_batch(S=3, N=6, To=8, Tp=12, seed=0):
    r = np.random.default_rng(seed)
    obs_rel = r.normal(scale=0.1, size=(S, N, To, 2)).astype(np.float32)
    obs = np.cumsum(obs_rel, axis=2) + r.normal(size=(S, 1, 1, 2))
    group = r.integers(0, 3, size=(S, N)).astype(np.float32)
    valid = np.ones((S, N), np.float32)
    valid[:, -2:] = 0.0
    obs = obs * valid[..., None, None]
    obs_rel = obs_rel * valid[..., None, None]
    group = group * valid
    return (jnp.asarray(obs), jnp.asarray(obs_rel), jnp.asarray(group),
            jnp.asarray(valid))


# ------------------------------------------------------------- graph modules

def test_gat_encoder_shapes_and_masking():
    p = init_gat_encoder(KEY, in_dim=10, final_dim=7)
    x = jax.random.normal(KEY, (2, 5, 10))
    labels = jnp.asarray([[1, 1, 0, 0, 2], [0, 0, 0, 0, 0]], jnp.float32)
    valid = jnp.asarray([[1, 1, 1, 0, 1], [1, 1, 0, 0, 0]], jnp.float32)
    out = gat_encoder(p, x, labels, valid)
    assert out.shape == (2, 5, 7)
    assert np.allclose(np.asarray(out[0, 3]), 0)     # invalid -> zero


def test_gat_encoder_padding_invariance():
    """Adding padded peds must not change real peds' outputs."""
    p = init_gat_encoder(KEY, in_dim=6, final_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6))
    labels = jnp.asarray([[1.0, 1.0, 0.0]])
    valid = jnp.ones((1, 3))
    out_small = gat_encoder(p, x, labels, valid)

    x_pad = jnp.concatenate([x, 99.0 * jnp.ones((1, 4, 6))], axis=1)
    labels_pad = jnp.concatenate([labels, 7 * jnp.ones((1, 4))], axis=1)
    valid_pad = jnp.concatenate([valid, jnp.zeros((1, 4))], axis=1)
    out_pad = gat_encoder(p, x_pad, labels_pad, valid_pad)
    assert np.allclose(np.asarray(out_small), np.asarray(out_pad[:, :3]),
                       atol=1e-5)


def test_gcn_module_padding_invariance():
    p = init_gcn_module(KEY, input_dim=6, final_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 6))
    labels = jnp.asarray([[2.0, 2.0, 0.0]])
    valid = jnp.ones((1, 3))
    out_small = gcn_module(p, x, labels, valid)
    x_pad = jnp.concatenate([x, jnp.ones((1, 2, 6))], axis=1)
    labels_pad = jnp.concatenate([labels, 2 * jnp.ones((1, 2))], axis=1)
    valid_pad = jnp.concatenate([valid, jnp.zeros((1, 2))], axis=1)
    out_pad = gcn_module(p, x_pad, labels_pad, valid_pad)
    assert np.allclose(np.asarray(out_small), np.asarray(out_pad[:, :3]),
                       atol=1e-5)


def test_gcn_pooling_shapes_and_padding():
    p = init_gcn_pooling(KEY, h_dim=8, bottleneck_dim=8)
    h = jax.random.normal(KEY, (2, 4, 8))
    last_rel = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 2))
    labels = jnp.asarray([[1.0, 1.0, 0.0, 0.0], [0.0, 2.0, 2.0, 2.0]])
    valid = jnp.ones((2, 4))
    out = gcn_pooling(p, h, last_rel, labels, valid)
    assert out.shape == (2, 4, 8)
    # the recovered semantics consume relative displacements, so the module
    # is translation-invariant by construction; padded peds are inert
    h_pad = jnp.concatenate([h, jnp.ones((2, 2, 8))], axis=1)
    rel_pad = jnp.concatenate([last_rel, jnp.ones((2, 2, 2))], axis=1)
    lab_pad = jnp.concatenate([labels, jnp.ones((2, 2))], axis=1)
    val_pad = jnp.concatenate([valid, jnp.zeros((2, 2))], axis=1)
    out_pad = gcn_pooling(p, h_pad, rel_pad, lab_pad, val_pad)
    assert np.allclose(np.asarray(out), np.asarray(out_pad[:, :4]), atol=1e-5)
    assert np.allclose(np.asarray(out_pad[:, 4:]), 0.0)


# ---------------------------------------------------------------- generator

@pytest.mark.parametrize("preset", list(MODEL_PRESETS))
def test_generator_variants_forward(preset):
    cfg = MODEL_PRESETS[preset]
    params = init_generator(KEY, cfg)
    obs, obs_rel, group, valid = _fake_batch()
    out = generator_forward(params, cfg, obs, obs_rel, group, valid,
                            jax.random.PRNGKey(1))
    assert out.shape == (3, 6, cfg.pred_len, 2)
    assert np.isfinite(np.asarray(out)).all()
    # padded peds emit zeros
    assert np.allclose(np.asarray(out)[:, -2:], 0.0)


def test_generator_noise_changes_output_deterministically():
    cfg = MODEL_PRESETS["gat"]
    params = init_generator(KEY, cfg)
    obs, obs_rel, group, valid = _fake_batch()
    a = generator_forward(params, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(1))
    b = generator_forward(params, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(1))
    c = generator_forward(params, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(2))
    assert np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_generator_global_noise_shared_within_scene():
    """noise_mix_type='global': same noise for all peds of a scene; with
    identical contexts, user noise distinguishes scenes, not peds."""
    cfg = MODEL_PRESETS["gat"]
    params = init_generator(KEY, cfg)
    S, N = 2, 3
    obs = jnp.zeros((S, N, 8, 2))
    obs_rel = jnp.zeros((S, N, 8, 2))
    group = jnp.zeros((S, N))
    valid = jnp.ones((S, N))
    z = jnp.asarray(np.random.default_rng(0).normal(
        size=(S, cfg.noise_first_dim)).astype(np.float32))
    out = generator_forward(params, cfg, obs, obs_rel, group, valid,
                            jax.random.PRNGKey(0), user_noise=z)
    out = np.asarray(out)
    # identical peds within a scene -> identical outputs
    assert np.allclose(out[:, 0], out[:, 1], atol=1e-6)
    # different noise across scenes -> different outputs
    assert not np.allclose(out[0, 0], out[1, 0])


def test_generator_jit_and_vmap_best_of_k():
    cfg = MODEL_PRESETS["gat"]
    params = init_generator(KEY, cfg)
    obs, obs_rel, group, valid = _fake_batch()

    fwd = jax.jit(lambda p, k: generator_forward(p, cfg, obs, obs_rel, group,
                                                 valid, k))
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    outs = jax.vmap(lambda k: fwd(params, k))(keys)
    assert outs.shape == (4, 3, 6, cfg.pred_len, 2)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_pool_every_timestep_variant():
    cfg = dataclasses.replace(MODEL_PRESETS["gat"], pool_every_timestep=True)
    params = init_generator(KEY, cfg)
    assert "pool_net" in params["decoder"]
    obs, obs_rel, group, valid = _fake_batch()
    out = generator_forward(params, cfg, obs, obs_rel, group, valid,
                            jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------ discriminator

@pytest.mark.parametrize("d_type", ["local", "global"])
def test_discriminator_forward(d_type):
    cfg = dataclasses.replace(MODEL_PRESETS["gat"], d_type=d_type)
    params = init_discriminator(KEY, cfg)
    r = np.random.default_rng(0)
    traj_rel = jnp.asarray(r.normal(size=(2, 4, 20, 2)).astype(np.float32))
    traj = jnp.cumsum(traj_rel, axis=2)
    valid = jnp.ones((2, 4))
    scores = discriminator_forward(params, cfg, traj, traj_rel, valid)
    assert scores.shape == (2, 4)
    # make_mlp trailing ReLU quirk: scores are non-negative
    assert float(jnp.min(scores)) >= 0.0


def test_discriminator_global_padding_invariance():
    cfg = MODEL_PRESETS["gat"]
    params = init_discriminator(KEY, cfg)
    r = np.random.default_rng(0)
    traj_rel = jnp.asarray(r.normal(size=(1, 3, 20, 2)).astype(np.float32))
    traj = jnp.cumsum(traj_rel, axis=2)
    valid = jnp.ones((1, 3))
    s_small = discriminator_forward(params, cfg, traj, traj_rel, valid)
    pad = lambda a: jnp.concatenate([a, jnp.zeros((1, 2) + a.shape[2:])], 1)
    s_pad = discriminator_forward(params, cfg, pad(traj), pad(traj_rel),
                                  jnp.concatenate([valid, jnp.zeros((1, 2))],
                                                  1))
    assert np.allclose(np.asarray(s_small), np.asarray(s_pad[:, :3]),
                       atol=1e-5)


def test_pool_every_timestep_checkpoint_roundtrip():
    """Decoder pool_net/mlp params survive export->import (review finding:
    they were silently dropped, losing trained weights)."""
    from grouptraj.compat.torch_import import (
        export_state_dicts, import_generator,
    )

    cfg = dataclasses.replace(MODEL_PRESETS["gat"], pool_every_timestep=True)
    params = init_generator(KEY, cfg)
    sd = export_state_dicts(params, "generator")
    assert "decoder.pool_net.spatial_embedding.weight" in sd
    assert "decoder.mlp.0.weight" in sd
    restored = import_generator(sd)
    assert "pool_net" in restored["decoder"]
    obs, obs_rel, group, valid = _fake_batch()
    a = generator_forward(params, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(1))
    b = generator_forward(restored, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(1))
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dropout_paths_train():
    """dropout/dropout1 > 0 runs (review finding: the GAT out-attention
    layer raised for want of a key) and is deterministic given the key."""
    cfg = dataclasses.replace(MODEL_PRESETS["gat"], dropout=0.2, dropout1=0.2)
    params = init_generator(KEY, cfg)
    obs, obs_rel, group, valid = _fake_batch()
    a = generator_forward(params, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(1), train=True)
    b = generator_forward(params, cfg, obs, obs_rel, group, valid,
                          jax.random.PRNGKey(1), train=True)
    assert np.isfinite(np.asarray(a)).all()
    assert np.allclose(np.asarray(a), np.asarray(b))
    from grouptraj.models import init_discriminator

    dparams = init_discriminator(KEY, cfg)
    traj = jnp.concatenate([obs, obs], axis=2)[:, :, :20]
    pad = 20 - traj.shape[2]
    if pad:
        traj = jnp.concatenate(
            [traj, jnp.zeros(traj.shape[:2] + (pad, 2))], axis=2)
    s = discriminator_forward(dparams, cfg, traj, traj, valid,
                              jax.random.PRNGKey(2), train=True)
    assert np.isfinite(np.asarray(s)).all()


def test_num_layers_not_one_fails_fast():
    """The reference itself crashes for num_layers > 1 (models.py:908-912);
    grouptraj refuses at config time instead of silently training a
    single-layer model (VERDICT r2 item 6)."""
    import pytest

    from grouptraj.config import ModelConfig

    with pytest.raises(ValueError, match="num_layers"):
        ModelConfig(num_layers=2)


def test_decode_folded_matches_stepwise():
    """_decode_folded's collapsed recurrence (W_eff = W_hh + W_p W_e W_ih)
    is exact algebra on the reference step (models.py:157-175): compare
    against a brute-force embed -> lstm_cell -> hidden2pos loop."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig
    from grouptraj.models.generator import _decode_folded, init_generator
    from grouptraj.ops.linear import linear
    from grouptraj.ops.lstm import lstm_cell

    cfg = ModelConfig()
    params = init_generator(jax.random.PRNGKey(7), cfg)
    dec = params["decoder"]
    S, N, H = 3, 8, cfg.decoder_h_dim_g
    rng = np.random.default_rng(0)
    h0 = jnp.asarray(rng.normal(size=(S, N, H)), jnp.float32)
    rel0 = jnp.asarray(rng.normal(size=(S, N, 2)), jnp.float32)
    valid = jnp.asarray((rng.random((S, N)) < 0.8), jnp.float32)

    got = _decode_folded(dec, cfg, h0, rel0, valid, impl="scan")

    # brute-force stepwise reference
    h = h0.reshape(S * N, H)
    c = jnp.zeros_like(h)
    rel = rel0.reshape(S * N, 2)
    rels = []
    for _ in range(cfg.pred_len):
        inp = linear(dec["spatial_embedding"], rel)
        h, c = lstm_cell(dec["lstm"], inp, h, c)
        rel = linear(dec["hidden2pos"], h)
        rels.append(rel)
    want = jnp.moveaxis(jnp.stack(rels), 0, 1).reshape(S, N, cfg.pred_len, 2)
    want = want * valid[..., None, None]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_generator_sample_many_matches_vmap():
    """The scene-tiled K-sample decode is bit-compatible with the per-key
    vmap of generator_sample (same noise key splits)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig
    from grouptraj.models.generator import (
        generator_context, generator_sample, generator_sample_many,
        init_generator,
    )

    for mix in ("global", "ped"):
        cfg = ModelConfig(noise_mix_type=mix)
        params = init_generator(jax.random.PRNGKey(1), cfg)
        rng = np.random.default_rng(2)
        S, N, To = 4, 8, cfg.obs_len
        obs_rel = jnp.asarray(rng.normal(scale=0.2, size=(S, N, To, 2)),
                              jnp.float32)
        obs = jnp.cumsum(obs_rel, axis=2)
        group = jnp.asarray(rng.integers(0, 3, (S, N)), jnp.float32)
        valid = jnp.asarray(rng.random((S, N)) < 0.9, jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(3), 5)

        ctx = generator_context(params, cfg, obs, obs_rel, group, valid,
                                keys[0], train=False)
        want = jax.vmap(lambda k: generator_sample(
            params, cfg, ctx, obs, obs_rel, group, valid, k,
            train=False))(keys)
        got = generator_sample_many(params, cfg, ctx, obs, obs_rel, group,
                                    valid, keys, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=1e-5)
