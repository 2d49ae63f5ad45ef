"""CLI surface tests: every reference flag parses with the reference default.

The reference duplicates ~45 argparse flags across its two training scripts
(scripts/train.py:25-124, train_GCN.py:24-110); checkpoints snapshot them.
These tests pin the preserved flag surface without touching a device.
"""

import importlib.util
import os
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts")
sys.path.insert(0, SCRIPTS)

from _common import build_parser, configs_from_args  # noqa: E402

REFERENCE_TRAIN_DEFAULTS = {
    # flag: default (reference scripts/train.py:31-124)
    "dataset_name": "zara2", "delim": "tab", "loader_num_workers": 4,
    "obs_len": 8, "pred_len": 12, "skip": 1, "batch_size": 64,
    "num_iterations": 10000, "num_epochs": 200, "embedding_dim": 16,
    "num_layers": 1, "dropout": 0.0, "batch_norm": False, "mlp_dim": 64,
    "encoder_h_dim_g": 32, "decoder_h_dim_g": 32, "noise_dim": (8,),
    "noise_type": "gaussian", "noise_mix_type": "global",
    "clipping_threshold_g": 2.0, "g_learning_rate": 1e-4, "g_steps": 1,
    "pooling_type": "pool_net", "pool_every_timestep": False,
    "bottleneck_dim": 8, "neighborhood_size": 2.0, "grid_size": 8,
    "d_type": "global", "encoder_h_dim_d": 48, "d_learning_rate": 1e-3,
    "d_steps": 1, "clipping_threshold_d": 0, "l2_loss_weight": 1,
    "best_k": 20, "print_every": 100, "checkpoint_every": 300,
    "checkpoint_name": "checkpoint", "checkpoint_start_from": None,
    "restore_from_checkpoint": 1, "num_samples_check": 5000, "use_gpu": 1,
    "timing": 0, "gpu_num": "0", "n_heads": 1, "hidden_units": "16",
    "dropout1": 0.0, "alpha": 0.2,
}

GCN_DIVERGENCES = {
    # train_GCN.py default divergences (reference train_GCN.py:69,75,88,94)
    "pooling_type": "gcn", "bottleneck_dim": 16, "d_steps": 2, "best_k": 1,
}


def test_train_flags_match_reference_defaults():
    args = build_parser(gcn_variant=False).parse_args([])
    for flag, want in REFERENCE_TRAIN_DEFAULTS.items():
        got = getattr(args, flag)
        assert got == want, f"--{flag}: {got!r} != reference {want!r}"


def test_train_gcn_flag_divergences():
    args = build_parser(gcn_variant=True).parse_args([])
    for flag, want in GCN_DIVERGENCES.items():
        assert getattr(args, flag) == want, flag
    # GAT-only flags are absent like the reference
    assert not hasattr(args, "n_heads")


def test_reference_example_invocation_parses():
    """The reference run_traj.sh style of full invocation parses cleanly."""
    argv = ("--dataset_name zara1 --delim tab --d_type global --pred_len 12 "
            "--encoder_h_dim_g 32 --encoder_h_dim_d 48 --embedding_dim 16 "
            "--bottleneck_dim 8 --mlp_dim 64 --num_layers 1 --noise_dim 8 "
            "--noise_type gaussian --noise_mix_type global "
            "--pool_every_timestep 0 --l2_loss_weight 1 --batch_norm 0 "
            "--dropout 0 --batch_size 64 --g_learning_rate 1e-4 "
            "--g_steps 1 --d_learning_rate 1e-3 --d_steps 1 "
            "--checkpoint_every 300 --print_every 100 --num_epochs 200 "
            "--use_gpu 1 --gpu_num 0 --best_k 20").split()
    args = build_parser().parse_args(argv)
    assert args.noise_dim == (8,)
    mcfg, tcfg = configs_from_args(args)
    assert mcfg.graph_module == "gat"
    assert tcfg.best_k == 20


def test_configs_roundtrip_through_checkpoint_args():
    """args snapshot -> config_from_checkpoint_args reproduces the config."""
    from grouptraj.compat import config_from_checkpoint_args

    args = build_parser().parse_args(["--pred_len", "8",
                                      "--encoder_h_dim_d", "64"])
    mcfg, _ = configs_from_args(args)
    resurrected = config_from_checkpoint_args(vars(args))
    assert resurrected.pred_len == 8
    assert resurrected.encoder_h_dim_d == 64
    assert resurrected.noise_dim == mcfg.noise_dim


@pytest.mark.parametrize("script", ["train.py", "train_GCN.py",
                                    "evaluate_model.py", "print_args.py",
                                    "visualization.py"])
def test_scripts_importable(script):
    spec = importlib.util.spec_from_file_location(
        "s_" + script[:-3], os.path.join(SCRIPTS, script))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert hasattr(mod, "parser") or hasattr(mod, "main")


def test_bench_wait_for_device_guards(monkeypatch):
    """bench.wait_for_device must return immediately for deliberate CPU
    benches and when the wait budget is zeroed out — never probe-loop."""
    import time

    repo = os.path.dirname(SCRIPTS)
    sys.path.insert(0, repo)
    import bench

    # the container pins JAX_PLATFORMS=axon globally; GROUPTRAJ_PLATFORM=cpu
    # must still win (it is the documented CPU override)
    monkeypatch.setenv("GROUPTRAJ_PLATFORM", "cpu")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    t0 = time.time()
    bench.wait_for_device()
    assert time.time() - t0 < 1.0

    monkeypatch.setenv("GROUPTRAJ_PLATFORM", "")
    monkeypatch.setenv("GROUPTRAJ_BENCH_WAIT", "0")
    t0 = time.time()
    bench.wait_for_device()            # budget 0: falls through instantly
    assert time.time() - t0 < 1.0
