"""Shared CLI plumbing for the training scripts.

Preserves the reference's flag surface (reference ``scripts/train.py:25-124``)
— every reference flag parses, including GPU-era flags which are accepted and
ignored on TPU — and maps the namespace onto (ModelConfig, TrainConfig).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grouptraj.config import ModelConfig, TrainConfig  # noqa: E402
from grouptraj.utils import bool_flag, int_tuple  # noqa: E402

FORMAT = "[%(levelname)s: %(filename)s: %(lineno)4d]: %(message)s"


def setup_logging():
    logging.basicConfig(level=logging.INFO, format=FORMAT, stream=sys.stdout)
    setup_jax_cache()


def setup_jax_cache():
    """Persistent XLA compilation cache: first compiles of the train/eval
    steps take minutes on a tunneled TPU; every later script invocation with
    the same shapes then loads from disk."""
    import jax

    # honor an explicit platform request even when a site plugin (axon)
    # pre-empts the JAX_PLATFORMS env var
    platform = os.environ.get("GROUPTRAJ_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    cache = os.environ.get(
        "GROUPTRAJ_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "grouptraj_xla"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the flags — cache is an optimization only


def build_parser(gcn_variant: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # Dataset options
    p.add_argument("--dataset_name", default="zara2", type=str)
    p.add_argument("--delim", default="tab")
    p.add_argument("--loader_num_workers", default=4, type=int)
    p.add_argument("--obs_len", default=8, type=int)
    p.add_argument("--pred_len", default=12, type=int)
    p.add_argument("--skip", default=1, type=int)
    # Optimization
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--num_iterations", default=10000, type=int)
    p.add_argument("--num_epochs", default=200, type=int)
    # Model options
    p.add_argument("--embedding_dim", default=16, type=int)
    p.add_argument("--num_layers", default=1, type=int)
    p.add_argument("--dropout", default=0, type=float)
    p.add_argument("--batch_norm", default=0, type=bool_flag)
    p.add_argument("--mlp_dim", default=64, type=int)
    # Generator options
    p.add_argument("--encoder_h_dim_g", default=32, type=int)
    p.add_argument("--decoder_h_dim_g", default=32, type=int)
    p.add_argument("--noise_dim", default=(8,), type=int_tuple)
    p.add_argument("--noise_type", default="gaussian")
    p.add_argument("--noise_mix_type", default="global")
    p.add_argument("--clipping_threshold_g", default=2.0, type=float)
    p.add_argument("--g_learning_rate", default=1e-4, type=float)
    p.add_argument("--g_steps", default=1, type=int)
    # Pooling options
    p.add_argument("--pooling_type",
                   default="gcn" if gcn_variant else "pool_net")
    p.add_argument("--pool_every_timestep", default=0, type=bool_flag)
    p.add_argument("--bottleneck_dim", default=16 if gcn_variant else 8,
                   type=int)
    # Social pooling options (parsed for compatibility; grid pooling is not a
    # live path in the reference either)
    p.add_argument("--neighborhood_size", default=2.0, type=float)
    p.add_argument("--grid_size", default=8, type=int)
    # Discriminator options
    p.add_argument("--d_type", default="global", type=str)
    p.add_argument("--encoder_h_dim_d", default=48, type=int)
    p.add_argument("--d_learning_rate", default=1e-3, type=float)
    p.add_argument("--d_steps", default=2 if gcn_variant else 1, type=int)
    p.add_argument("--clipping_threshold_d", default=0, type=float)
    # Loss options
    p.add_argument("--l2_loss_weight", default=1, type=float)
    p.add_argument("--best_k", default=1 if gcn_variant else 20, type=int)
    # grouptraj extension: generator weight EMA (0 = off, reference
    # semantics; see TrainConfig.g_ema_decay)
    p.add_argument("--g_ema_decay", default=0.0, type=float)
    # grouptraj extension: sparse best-of-k backward (1 = on; gradients
    # equal the dense path except on exact ties — TrainConfig.sparse_best_k)
    p.add_argument("--sparse_best_k", default=1, type=int)
    # grouptraj extension (perf): bf16 no-gradient generator forwards in the
    # training step (probe decode + d-step sample; TrainConfig.bf16_nograd)
    p.add_argument("--bf16_nograd", default=1, type=int)
    # Output
    p.add_argument("--output_dir", default=os.getcwd())
    p.add_argument("--print_every", default=100, type=int)
    p.add_argument("--checkpoint_every", default=300, type=int)
    p.add_argument("--checkpoint_name", default="checkpoint")
    p.add_argument("--checkpoint_start_from", default=None)
    p.add_argument("--restore_from_checkpoint", default=1, type=int)
    p.add_argument("--num_samples_check", default=5000, type=int)
    # Misc (GPU-era flags accepted for CLI compatibility, ignored on TPU)
    p.add_argument("--use_gpu", default=1, type=int)
    p.add_argument("--timing", default=0, type=int)
    p.add_argument("--gpu_num", default="0", type=str)
    if not gcn_variant:
        # GAT options
        p.add_argument("--n_heads", type=int, default=1)
        p.add_argument("--hidden_units", type=str, default="16")
        p.add_argument("--dropout1", type=float, default=0)
        p.add_argument("--alpha", type=float, default=0.2)
    # TPU-native extensions
    p.add_argument("--graph_module", default=None, type=str,
                   choices=["gat", "gcn", "gat-mh", "none"],
                   help="override the group graph module "
                        "(default: gat for train.py, none for train_GCN.py)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--steps_per_dispatch", default=100, type=int,
                   help="training iterations fused per device dispatch")
    p.add_argument("--n_max", default=0, type=int,
                   help="pad scenes to this many peds (0 = derive)")
    p.add_argument("--n_buckets", default=3, type=int,
                   help="scene-size buckets for training dispatches "
                        "(1 = one global pad width)")
    p.add_argument("--use_pallas", default=0, type=bool_flag,
                   help="force the fused Pallas LSTM kernels (legacy alias "
                        "for --lstm_impl pallas)")
    p.add_argument("--lstm_impl", default="auto",
                   choices=["auto", "scan", "pallas", "fused"],
                   help="LSTM implementation (scan = XLA, pallas = "
                        "per-timestep-grid kernel, fused = whole-loop "
                        "single-launch kernel); auto = scan, the measured "
                        "end-to-end winner at every size (ARCHITECTURE.md)")
    p.add_argument("--pool_impl", default="auto",
                   choices=["auto", "pair", "fast", "pallas"],
                   help="PoolHiddenNet implementation (pair = reference-"
                        "shaped NxN MLP, fast = decomposed XLA, pallas = "
                        "fused VMEM kernel); auto = pallas on TPU")
    p.add_argument("--num_devices", default=1, type=int,
                   help="data-parallel devices: 1 = single (default), "
                        "0 = all visible, N = first N; batch_size must "
                        "divide evenly")
    p.add_argument("--profile_dir", default="", type=str,
                   help="emit a jax.profiler trace of iterations 50-60")
    return p


def configs_from_args(args, gcn_variant: bool = False):
    if gcn_variant:
        graph_module, mlp_ctx = "none", True
    else:
        graph_module, mlp_ctx = "gat", False
    if getattr(args, "graph_module", None):
        graph_module = args.graph_module
        # gat-mh and plain 'none' route context through mlp_decoder_context
        mlp_ctx = graph_module in ("gat-mh", "none")
    mcfg = ModelConfig(
        obs_len=args.obs_len, pred_len=args.pred_len,
        embedding_dim=args.embedding_dim, num_layers=args.num_layers,
        dropout=args.dropout, batch_norm=args.batch_norm,
        mlp_dim=args.mlp_dim, encoder_h_dim_g=args.encoder_h_dim_g,
        decoder_h_dim_g=args.decoder_h_dim_g, noise_dim=args.noise_dim,
        noise_type=args.noise_type, noise_mix_type=args.noise_mix_type,
        pooling_type=args.pooling_type,
        pool_every_timestep=args.pool_every_timestep,
        bottleneck_dim=args.bottleneck_dim,
        graph_module=graph_module, mlp_decoder_context=mlp_ctx,
        n_heads=getattr(args, "n_heads", 1),
        dropout1=getattr(args, "dropout1", 0.0),
        alpha=getattr(args, "alpha", 0.2),
        d_type=args.d_type, encoder_h_dim_d=args.encoder_h_dim_d,
        neighborhood_size=args.neighborhood_size, grid_size=args.grid_size,
        pool_impl=getattr(args, "pool_impl", "auto"),
    )
    tcfg = TrainConfig(
        dataset_name=args.dataset_name, delim=args.delim,
        loader_num_workers=args.loader_num_workers, skip=args.skip,
        batch_size=args.batch_size, num_iterations=args.num_iterations,
        num_epochs=args.num_epochs, g_learning_rate=args.g_learning_rate,
        g_steps=args.g_steps, clipping_threshold_g=args.clipping_threshold_g,
        d_learning_rate=args.d_learning_rate, d_steps=args.d_steps,
        clipping_threshold_d=args.clipping_threshold_d,
        l2_loss_weight=args.l2_loss_weight, best_k=args.best_k,
        g_ema_decay=args.g_ema_decay,
        sparse_best_k=bool(args.sparse_best_k),
        bf16_nograd=bool(args.bf16_nograd),
        output_dir=args.output_dir, print_every=args.print_every,
        checkpoint_every=args.checkpoint_every,
        checkpoint_name=args.checkpoint_name,
        checkpoint_start_from=args.checkpoint_start_from,
        restore_from_checkpoint=bool(args.restore_from_checkpoint),
        num_samples_check=args.num_samples_check, timing=bool(args.timing),
        profile_dir=args.profile_dir,
        seed=args.seed, steps_per_dispatch=args.steps_per_dispatch,
        n_max=args.n_max, use_pallas=bool(args.use_pallas),
        lstm_impl=args.lstm_impl,
        num_devices=args.num_devices, n_buckets=args.n_buckets,
    )
    return mcfg, tcfg
