"""Checkpoint-import parity tests.

Loads the reference pretrained PyTorch checkpoints (era (c): sgan-gat-models,
the family matching the reference's current code) and asserts our dense JAX
forward matches the reference model's ragged forward on real data, with the
reference code itself executed on CPU as the oracle (``.cuda()`` calls
monkeypatched to no-ops). Skipped when the reference mount or torch is absent.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
CKPT = os.path.join(REF, "models/sgan-gat-models/zara1_12_model.pt")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.exists(CKPT), reason="reference checkpoints not mounted")

from grouptraj.compat import (  # noqa: E402
    config_from_checkpoint_args, import_discriminator, import_generator,
    load_torch_checkpoint,
)
from grouptraj.compat.torch_import import export_state_dicts  # noqa: E402
from grouptraj.data import TrajectoryDataset  # noqa: E402
from grouptraj.models import (  # noqa: E402
    discriminator_forward, generator_forward,
)
from grouptraj.utils import get_dset_path  # noqa: E402


@pytest.fixture(scope="module")
def ckpt():
    return load_torch_checkpoint(CKPT)


@pytest.fixture(scope="module")
def ref_models(ckpt):
    """Instantiate the reference models on CPU with the checkpoint weights."""
    sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    from sgan.models import TrajectoryDiscriminator, TrajectoryGenerator

    args = ckpt["args"]
    gen = TrajectoryGenerator(
        obs_len=args["obs_len"], pred_len=args["pred_len"],
        embedding_dim=args["embedding_dim"],
        encoder_h_dim=args["encoder_h_dim_g"],
        decoder_h_dim=args["decoder_h_dim_g"], mlp_dim=args["mlp_dim"],
        num_layers=args["num_layers"], noise_dim=tuple(args["noise_dim"]),
        noise_type=args["noise_type"], noise_mix_type=args["noise_mix_type"],
        pooling_type=args["pooling_type"],
        pool_every_timestep=args["pool_every_timestep"],
        dropout=args["dropout"], bottleneck_dim=args["bottleneck_dim"],
        batch_norm=args["batch_norm"], n_heads=args["n_heads"],
        dropout1=args["dropout1"], alpha=args["alpha"])
    gen.load_state_dict(
        {k: torch.tensor(v) for k, v in ckpt["g_state"].items()})
    gen.eval()
    disc = TrajectoryDiscriminator(
        obs_len=args["obs_len"], pred_len=args["pred_len"],
        embedding_dim=args["embedding_dim"], h_dim=args["encoder_h_dim_d"],
        mlp_dim=args["mlp_dim"], num_layers=args["num_layers"],
        dropout=args["dropout"], batch_norm=args["batch_norm"],
        d_type=args["d_type"])
    disc.load_state_dict(
        {k: torch.tensor(v) for k, v in ckpt["d_state"].items()})
    disc.eval()
    return gen, disc


@pytest.fixture(scope="module")
def scene():
    """First real zara1 test-split window (multi-ped, has group labels)."""
    dset = TrajectoryDataset(get_dset_path("zara1", "test"))
    w = max(dset.windows[:50], key=lambda w: (w.group > 0).sum())
    return w


def test_config_resurrection(ckpt):
    cfg = config_from_checkpoint_args(ckpt["args"], ckpt["g_state"])
    assert cfg.graph_module == "gat"
    assert cfg.pooling_type == "pool_net"
    assert cfg.noise_dim == (8,)
    assert cfg.encoder_h_dim_g == 32 and cfg.encoder_h_dim_d == 48


def test_import_shapes(ckpt):
    params = import_generator(ckpt["g_state"])
    assert params["encoder"]["spatial_embedding"]["w"].shape == (2, 16)
    assert params["encoder"]["lstm"]["w_ih"].shape == (16, 128)
    assert params["gatencoder"]["gat_intra"]["attentions"][0]["W"].shape == \
        (40, 72)
    assert params["gatencoder"]["out_embedding"]["w"].shape == (32, 24)
    assert "gcn_module" not in params      # dead weights dropped
    d = import_discriminator(ckpt["d_state"])
    assert d["encoder"]["lstm"]["w_hh"].shape == (48, 192)
    assert d["pool_net"]["mlp_pre_pool"]["layers"][0]["linear"]["w"].shape \
        == (64, 512)


def _dense_inputs(w, pad_to=None):
    n = w.num_peds
    N = pad_to or n
    obs = np.zeros((1, N, 8, 2), np.float32)
    obs_rel = np.zeros((1, N, 8, 2), np.float32)
    group = np.zeros((1, N), np.float32)
    valid = np.zeros((1, N), np.float32)
    obs[0, :n] = w.xy[:, :8]
    obs_rel[0, :n] = w.rel[:, :8]
    group[0, :n] = w.group[:, 7]
    valid[0, :n] = 1.0
    return map(jnp.asarray, (obs, obs_rel, group, valid))


def _ragged_inputs(w):
    obs = torch.tensor(w.xy[:, :8]).permute(1, 0, 2)          # [To, n, 2]
    obs_rel = torch.tensor(w.rel[:, :8]).permute(1, 0, 2)
    obs_g = torch.tensor(w.group[:, :8]).T.unsqueeze(-1)       # [To, n, 1]
    sse = torch.tensor([[0, w.num_peds]])
    return obs, obs_rel, obs_g, sse


def test_generator_forward_parity(ckpt, ref_models, scene):
    """Dense JAX forward == reference ragged forward, same weights, zero noise,
    including with padding slots present."""
    gen, _ = ref_models
    obs_t, obs_rel_t, obs_g_t, sse = _ragged_inputs(scene)
    user_noise_t = torch.zeros(1, 8)
    with torch.no_grad():
        ref_out = gen(obs_t, obs_rel_t, sse, obs_g_t, user_noise=user_noise_t)
    ref_out = ref_out.numpy()                                  # [Tp, n, 2]

    cfg = config_from_checkpoint_args(ckpt["args"], ckpt["g_state"])
    params = import_generator(ckpt["g_state"])
    for pad in (None, scene.num_peds + 5):
        obs, obs_rel, group, valid = _dense_inputs(scene, pad)
        out = generator_forward(
            params, cfg, obs, obs_rel, group, valid,
            key=jax.random.PRNGKey(0),
            user_noise=jnp.zeros((1, 8)), train=False)
        ours = np.asarray(out[0, :scene.num_peds])             # [n, Tp, 2]
        assert np.allclose(ours.transpose(1, 0, 2), ref_out, atol=2e-3), \
            f"max diff {np.abs(ours.transpose(1,0,2) - ref_out).max()}"


def test_generator_parity_multi_scene(ckpt, ref_models):
    """Two scenes batched densely == reference with seq_start_end offsets."""
    gen, _ = ref_models
    dset = TrajectoryDataset(get_dset_path("zara1", "test"))
    w1, w2 = dset.windows[3], dset.windows[40]
    n1, n2 = w1.num_peds, w2.num_peds
    obs = torch.tensor(np.concatenate([w1.xy[:, :8], w2.xy[:, :8]])
                       ).permute(1, 0, 2)
    obs_rel = torch.tensor(np.concatenate([w1.rel[:, :8], w2.rel[:, :8]])
                           ).permute(1, 0, 2)
    obs_g = torch.tensor(np.concatenate([w1.group[:, :8], w2.group[:, :8]])
                         ).T.unsqueeze(-1)
    sse = torch.tensor([[0, n1], [n1, n1 + n2]])
    with torch.no_grad():
        ref_out = gen(obs, obs_rel, sse, obs_g,
                      user_noise=torch.zeros(2, 8)).numpy()

    cfg = config_from_checkpoint_args(ckpt["args"], ckpt["g_state"])
    params = import_generator(ckpt["g_state"])
    N = max(n1, n2) + 2
    dobs = np.zeros((2, N, 8, 2), np.float32)
    drel = np.zeros((2, N, 8, 2), np.float32)
    dg = np.zeros((2, N), np.float32)
    dv = np.zeros((2, N), np.float32)
    for s, w in enumerate((w1, w2)):
        n = w.num_peds
        dobs[s, :n] = w.xy[:, :8]
        drel[s, :n] = w.rel[:, :8]
        dg[s, :n] = w.group[:, 7]
        dv[s, :n] = 1.0
    out = generator_forward(
        params, cfg, *map(jnp.asarray, (dobs, drel, dg, dv)),
        key=jax.random.PRNGKey(0), user_noise=jnp.zeros((2, 8)), train=False)
    ours1 = np.asarray(out[0, :n1]).transpose(1, 0, 2)
    ours2 = np.asarray(out[1, :n2]).transpose(1, 0, 2)
    assert np.allclose(ours1, ref_out[:, :n1], atol=2e-3)
    assert np.allclose(ours2, ref_out[:, n1:], atol=2e-3)


def test_discriminator_forward_parity(ckpt, ref_models, scene):
    _, disc = ref_models
    n = scene.num_peds
    traj = torch.tensor(scene.xy).permute(1, 0, 2)             # [20, n, 2]
    traj_rel = torch.tensor(scene.rel).permute(1, 0, 2)
    sse = torch.tensor([[0, n]])
    with torch.no_grad():
        ref_scores = disc(traj, traj_rel, sse).numpy()[:, 0]

    cfg = config_from_checkpoint_args(ckpt["args"], ckpt["g_state"])
    params = import_discriminator(ckpt["d_state"])
    N = n + 3
    dt = np.zeros((1, N, 20, 2), np.float32)
    dr = np.zeros((1, N, 20, 2), np.float32)
    dv = np.zeros((1, N), np.float32)
    dt[0, :n] = scene.xy
    dr[0, :n] = scene.rel
    dv[0, :n] = 1.0
    scores = discriminator_forward(
        params, cfg, *map(jnp.asarray, (dt, dr, dv)), train=False)
    assert np.allclose(np.asarray(scores[0, :n]), ref_scores, atol=2e-3), \
        np.abs(np.asarray(scores[0, :n]) - ref_scores).max()


def test_export_roundtrip(ckpt):
    params = import_generator(ckpt["g_state"])
    sd = export_state_dicts(params, "generator")
    for k, v in sd.items():
        assert np.allclose(v, ckpt["g_state"][k]), k
    d = import_discriminator(ckpt["d_state"])
    sd = export_state_dicts(d, "discriminator")
    for k, v in sd.items():
        assert np.allclose(v, ckpt["d_state"][k]), k


def test_export_roundtrip_batch_norm():
    """batch_norm=1 params survive export -> re-import (BN scale/bias land
    on nn.Sequential BatchNorm indices, not silently dropped)."""
    from grouptraj.compat.torch_import import _mlp
    from grouptraj.config import ModelConfig
    from grouptraj.models import init_generator

    cfg = ModelConfig(batch_norm=True)
    params = init_generator(jax.random.PRNGKey(0), cfg)
    # perturb BN params so the round-trip is non-trivial
    mlp0 = params["pool_net"]["mlp_pre_pool"]["layers"][0]
    assert "bn_scale" in mlp0
    mlp0["bn_scale"] = mlp0["bn_scale"] * 1.5 + 0.25
    sd = export_state_dicts(params, "generator")
    assert "pool_net.mlp_pre_pool.1.weight" in sd        # BN at stride-3 idx
    assert "pool_net.mlp_pre_pool.3.weight" in sd        # next Linear
    back = _mlp(sd, "pool_net.mlp_pre_pool")
    assert len(back["layers"]) == len(
        params["pool_net"]["mlp_pre_pool"]["layers"])
    np.testing.assert_allclose(np.asarray(back["layers"][0]["bn_scale"]),
                               np.asarray(mlp0["bn_scale"]))
    np.testing.assert_allclose(np.asarray(back["layers"][0]["bn_bias"]),
                               np.asarray(mlp0["bn_bias"]))


@pytest.mark.parametrize("family,expect", [
    ("models/sgan-g-p-models/zara1_12_model.pt", "gcn"),
    ("models/01/checkpoint_with_model.pt", "none"),
])
def test_other_eras_import(family, expect):
    path = os.path.join(REF, family)
    if not os.path.exists(path):
        pytest.skip("era checkpoint missing")
    ck = load_torch_checkpoint(path)
    cfg = config_from_checkpoint_args(ck["args"], ck["g_state"])
    params = import_generator(ck["g_state"])
    if expect == "gcn":
        assert cfg.graph_module == "gcn"
        assert "gcn_module" in params
    else:
        assert "mlp_decoder_context" in params or "pool_net" in params


def test_gat_mh_era_import_and_forward():
    """sgangat-g-p family (batched multi-head GAT era) loads and runs."""
    path = os.path.join(REF, "models/sgangat-g-p-models/zara1_12_model.pt")
    if not os.path.exists(path):
        pytest.skip("era checkpoint missing")
    import jax.numpy as jnp

    from grouptraj.parallel.data_parallel import synthetic_batch

    ck = load_torch_checkpoint(path)
    cfg = config_from_checkpoint_args(ck["args"], ck["g_state"])
    assert cfg.graph_module == "gat-mh"
    assert cfg.mh_n_units == (40, 16, 40) and cfg.mh_n_heads == (4, 1)
    params = import_generator(ck["g_state"])
    b = synthetic_batch(2, 6)
    out = generator_forward(params, cfg, b["obs"], b["obs_rel"], b["group"],
                            b["valid"], jax.random.PRNGKey(0), train=False)
    assert out.shape == (2, 6, 12, 2)
    assert bool(jnp.isfinite(out).all())
    sd = export_state_dicts(params, "generator")
    for k, v in sd.items():
        assert np.allclose(v, ck["g_state"][k]), k


def test_gcn_pooling_era_recovered_semantics():
    """models/01 (lost GCNPooling class) through the recovered semantics
    scores sanely on real data — single-sample ADE on zara1 val batches must
    be far below the ~2.2+ every eliminated formulation produced
    (tools/gcnpool_lab.py; full-split numbers in PARITY.md)."""
    path = os.path.join(REF, "models/01/checkpoint_with_model.pt")
    if not os.path.exists(path):
        pytest.skip("era checkpoint missing")
    from grouptraj import losses as L
    from grouptraj.data import data_loader
    from grouptraj.utils import relative_to_abs

    ck = load_torch_checkpoint(path)
    cfg = config_from_checkpoint_args(ck["args"], ck["g_state"])
    assert cfg.pooling_type == "gcn"
    params = import_generator(ck["g_state"])

    class A:
        obs_len = cfg.obs_len
        pred_len = cfg.pred_len
        skip = 1
        delim = "tab"
        batch_size = 64
        n_max = 0
        seed = 0

    _, loader = data_loader(A, get_dset_path("zara1", "val"), shuffle=False)
    tot = n = 0.0
    key = jax.random.PRNGKey(0)
    for i, b in enumerate(loader):
        if i >= 3:
            break
        key, sub = jax.random.split(key)
        pr = generator_forward(params, cfg, jnp.asarray(b.obs),
                               jnp.asarray(b.obs_rel),
                               jnp.asarray(b.end_group),
                               jnp.asarray(b.valid), sub, train=False)
        pa = relative_to_abs(pr, jnp.asarray(b.obs)[:, :, -1, :])
        tot += float(L.displacement_error(pa, jnp.asarray(b.pred),
                                          jnp.asarray(b.valid)))
        n += float(np.sum(b.valid))
    ade = tot / (n * cfg.pred_len)
    assert ade < 0.85, ade


class _TorchBatchGAT(torch.nn.Module):
    """Torch oracle for the reference's commented-out era-(b) GAT stack
    (reference models.py:296-388), re-typed from its semantics:
    per-head W / a_src / a_dst, logits src_i + dst_j, LeakyReLU, softmax
    over ALL peds, post-softmax ``attn @ adj`` mix, bias add; intermediate
    layers ELU over the reshaped head concat (``view`` without transpose —
    the quirk at models.py:384), final single-head layer raw."""

    def __init__(self, weights, alpha=0.2, concat_mode="view"):
        super().__init__()
        self.layers = [
            {k: torch.as_tensor(np.asarray(v)) for k, v in lw.items()}
            for lw in weights
        ]
        self.alpha = alpha
        self.concat_mode = concat_mode

    def forward(self, x, adj):
        bs, n = x.shape[:2]
        n_layers = len(self.layers)
        for i, lw in enumerate(self.layers):
            h = torch.matmul(x.unsqueeze(1), lw["w"])      # [bs, K, n, f_out]
            attn_src = torch.matmul(h, lw["a_src"])        # [bs, K, n, 1]
            attn_dst = torch.matmul(h, lw["a_dst"])
            attn = (attn_src.expand(-1, -1, -1, n) +
                    attn_dst.expand(-1, -1, -1, n).permute(0, 1, 3, 2))
            attn = torch.nn.functional.leaky_relu(attn, self.alpha)
            attn = torch.softmax(attn, dim=-1)
            attn = torch.matmul(attn.squeeze(0), adj).unsqueeze(0)
            out = torch.matmul(attn, h) + lw["bias"]
            if i + 1 == n_layers:
                x = out.squeeze(dim=1)
            else:
                if self.concat_mode == "view":
                    x = out.contiguous().view(bs, n, -1)
                else:
                    x = out.transpose(1, 2).contiguous().view(bs, n, -1)
                x = torch.nn.functional.elu(x)
        return x


@pytest.mark.parametrize("concat_mode", ["view", "transpose"])
def test_batch_gat_matches_torch_oracle(concat_mode):
    """grouptraj.ops.gat.batch_gat reproduces the reference's commented
    BatchMultiHeadGraphAttention/GAT stack numerically, for both head-concat
    conventions, using real sgangat-g-p checkpoint weights on a dense scene."""
    path = os.path.join(REF, "models/sgangat-g-p-models/zara1_12_model.pt")
    if not os.path.exists(path):
        pytest.skip("era checkpoint missing")
    from grouptraj.ops.gat import batch_gat
    from grouptraj.ops.groups import (
        intra_group_adjacency, normalize_adjacency,
    )

    ck = load_torch_checkpoint(path)
    params = import_generator(ck["g_state"])
    stack = params["gatencoder"]["gat_net"]["layer_stack"]

    rng = np.random.default_rng(0)
    N = 7
    x = rng.normal(size=(1, N, 40)).astype(np.float32)
    labels = np.array([[1, 1, 0, 2, 2, 2, 0]], np.float32)
    valid = np.ones((1, N), np.float32)

    adj = normalize_adjacency(intra_group_adjacency(
        jnp.asarray(labels), jnp.asarray(valid)))
    ours = batch_gat(stack if isinstance(stack, dict) else
                     {"layer_stack": stack}, jnp.asarray(x), adj,
                     jnp.asarray(valid), train=False,
                     adj_mode="mix", concat_mode=concat_mode)

    oracle = _TorchBatchGAT(
        [{k: np.asarray(v) for k, v in lw.items()} for lw in stack],
        concat_mode=concat_mode)
    with torch.no_grad():
        ref = oracle(torch.as_tensor(x), torch.as_tensor(np.asarray(adj[0])))
    np.testing.assert_allclose(np.asarray(ours)[0], ref.numpy()[0],
                               atol=2e-5)


def test_resolved_config_roundtrip():
    """Self-describing checkpoints (round 4): the RESOLVED ModelConfig that
    train()/train_many snapshot under args['resolved_model_config']
    reconstructs the exact training config from args alone — no weight-name
    forensics — even for configs whose raw flag dicts are era-ambiguous."""
    import dataclasses

    from grouptraj.config import ModelConfig

    cfg = ModelConfig(graph_module="gat-mh", mlp_decoder_context=True,
                      encoder_h_dim_g=72, decoder_h_dim_g=96,
                      bottleneck_dim=16, noise_dim=(12,),
                      mh_n_units=(40, 24, 40), mh_n_heads=(2, 1),
                      pool_impl="pallas")
    # what loop.py stores: a raw (possibly misleading) flag dict plus the
    # resolved config — reconstruction must use the latter
    args = {"graph_module": None, "encoder_h_dim_g": 32,
            "resolved_model_config": dataclasses.asdict(cfg)}
    got = config_from_checkpoint_args(args, g_state=None)
    # pool_impl is an execution preference, reset to the eval default
    assert got == dataclasses.replace(cfg, pool_impl="auto")
    # absent the resolved snapshot (reference files), forensics still runs
    legacy = config_from_checkpoint_args(
        {"encoder_h_dim_g": 72}, g_state=None)
    assert legacy.encoder_h_dim_g == 72 and legacy.graph_module == "gat"
