"""Model / training configuration.

One dataclass config with per-variant presets replacing the reference's ~45
argparse flags duplicated across ``scripts/train.py`` (reference
``scripts/train.py:25-124``) and ``scripts/train_GCN.py:24-110``. Flag names
are preserved by the CLI layer in ``scripts/``; the checkpoint snapshots the
full config exactly like the reference stores ``args.__dict__``
(reference ``scripts/train.py:247``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture config for generator + discriminator.

    Defaults mirror the retuned reference defaults (reference
    ``scripts/train.py:31-124``), not the upstream-sgan docs.
    """

    obs_len: int = 8
    pred_len: int = 12
    embedding_dim: int = 16
    num_layers: int = 1
    dropout: float = 0.0
    batch_norm: bool = False
    mlp_dim: int = 64

    # Generator
    encoder_h_dim_g: int = 32
    decoder_h_dim_g: int = 32
    noise_dim: Tuple[int, ...] = (8,)
    noise_type: str = "gaussian"          # gaussian | uniform
    noise_mix_type: str = "global"        # global | ped

    # Pooling between encoder and graph module
    # 'pool_net' = PoolHiddenNet max-pool (reference models.py:458-549)
    # 'gcn'      = GCNPooling reconstruction (reference train_GCN.py:617-631)
    # 'none'     = no pooling
    pooling_type: str = "pool_net"
    pool_every_timestep: bool = False
    bottleneck_dim: int = 8

    # Graph module between pooling and noise
    # 'gat'    = GATEncoder two-level group GAT (reference models.py:239-294, live)
    # 'gcn'    = GCNModule two-level group GCN (reference models.py:583-712, era-b)
    # 'gat-mh' = batched multi-head group GAT + mlp_decoder_context
    #            ("sgangat-g-*" era; reference models.py:296-388,890-898)
    # 'none'   = plain MLP decoder-context (upstream-sgan path)
    graph_module: str = "gat"
    # gat-mh stack shape (the reference CLI's [40]+hidden_units+[40],
    # train.py:166-170, with the checkpoints' head counts)
    mh_n_units: Tuple[int, ...] = (40, 16, 40)
    mh_n_heads: Tuple[int, ...] = (4, 1)
    # gat-mh semantic quirks (the era's training code is lost; these select
    # between the reference's commented code and the upstream-STGAT form —
    # defaults chosen by the checkpoint-fitness probe, tools/gatmh_probe.py):
    # mh_adj: 'mix' = post-softmax attn @ adjacency (commented models.py:332)
    #         'none' = pure attention over scene peds (upstream STGAT)
    # mh_concat: 'transpose' = per-ped head concat (upstream STGAT)
    #            'view' = untransposed reshape (commented models.py:384)
    # mh_norm: masked per-scene InstanceNorm before each layer (upstream
    #          STGAT's norm_list; constructed-but-commented in the reference)
    mh_adj: str = "mix"
    mh_concat: str = "transpose"
    mh_norm: bool = False
    # Whether an mlp_decoder_context MLP maps context -> decoder_h - noise_dim
    # (only used when graph_module == 'none'; reference models.py:796-804)
    mlp_decoder_context: bool = False

    # GAT options (reference scripts/train.py:116-124)
    n_heads: int = 1
    hidden_units: int = 72               # GAT hidden per head (hardcoded 72 in reference)
    dropout1: float = 0.0                # GAT dropout
    alpha: float = 0.2                   # LeakyReLU slope in GAT

    # Graph-module internal dims (hardcoded in reference models.py:242-244,592-605)
    graph_out_dim: int = 16              # per-level output features
    gcn_hidden_dim: int = 72
    gcn_layers: int = 2

    # Discriminator
    d_type: str = "global"               # local | global
    encoder_h_dim_d: int = 48

    # Social-pooling grid options (parsed but unused by the live reference path)
    neighborhood_size: float = 2.0
    grid_size: int = 8

    # Dense-batching (TPU) options — no reference equivalent
    activation: str = "relu"
    # PoolHiddenNet implementation (ops/pooling.py): 'pair' = the
    # reference-shaped [S, N, N, 512] path, 'fast' = the decomposed XLA
    # form, 'pallas' = the fused VMEM kernel (ops/pallas_pool.py), 'auto' =
    # pallas on TPU / fast on CPU, deferring to $GROUPTRAJ_POOL_IMPL.
    # Execution detail only — all four compute the same function (tested),
    # and the pallas kernel composes with jax.vmap (replica-aware grid +
    # custom_vmap rules; the multi-seed trainer rides it directly).
    pool_impl: str = "auto"

    def __post_init__(self):
        if self.num_layers != 1:
            raise ValueError(
                f"num_layers={self.num_layers} is not supported: the "
                "reference's live path itself crashes for num_layers > 1 "
                "(TrajectoryGenerator hands the decoder LSTM a [1, B, H] "
                "hidden state against a [num_layers, B, H] cell state, "
                "reference sgan/models.py:908-912, and flattens the "
                "multi-layer encoder state into the batch axis at "
                "models.py:885). grouptraj's LSTMs are single-layer; fail "
                "fast instead of silently training a different model.")

    @property
    def noise_first_dim(self) -> int:
        if not self.noise_dim or self.noise_dim[0] == 0:
            return 0
        return self.noise_dim[0]

    @property
    def context_dim(self) -> int:
        """encoder_h (+ bottleneck if pooling) — reference models.py:791-794."""
        if self.pooling_type and self.pooling_type != "none":
            return self.encoder_h_dim_g + self.bottleneck_dim
        return self.encoder_h_dim_g

    @property
    def decoder_context_dim(self) -> int:
        """What the graph module / context MLP must emit: decoder_h − noise."""
        return self.decoder_h_dim_g - self.noise_first_dim


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization / loop configuration (reference scripts/train.py:40-113)."""

    dataset_name: str = "zara2"
    delim: str = "tab"
    loader_num_workers: int = 4
    skip: int = 1

    batch_size: int = 64                  # scenes per batch
    num_iterations: int = 10000
    num_epochs: int = 200

    g_learning_rate: float = 1e-4
    g_steps: int = 1
    clipping_threshold_g: float = 2.0
    d_learning_rate: float = 1e-3
    d_steps: int = 1
    clipping_threshold_d: float = 0.0

    l2_loss_weight: float = 1.0
    best_k: int = 20
    # grouptraj extension (no reference equivalent): exponential moving
    # average of the generator weights, the standard GAN smoothing trick.
    # 0 = off (reference semantics). When on, the g-step maintains
    # ema <- d*ema + (1-d)*g and checkpoints add a 'g_ema_state' entry
    # (evaluate_model --use_ema evaluates it).
    g_ema_decay: float = 0.0
    # grouptraj extension (perf, semantics-preserving): the variety loss's
    # min-over-k propagates gradient through the argmin sample only, so the
    # g-step decodes all k WITHOUT a backward graph, then differentiably
    # re-decodes just (argmin sample, last sample) — a 2-scene-row decode
    # instead of a k-row one in the backward. Gradients equal the dense
    # formulation except on exact per-scene l2 ties (measure zero; XLA's
    # min-VJP splits ties, this picks argmin). Auto-falls-back to the dense
    # path when the equivalence conditions don't hold (dropout on,
    # per-step re-pooling, best_k == 1, or no variety loss).
    sparse_best_k: bool = True
    # grouptraj extension (perf): run the training step's NO-GRADIENT
    # generator forwards in bfloat16 — the g-step's best-of-k probe decode
    # (stop_gradient'd by sparse_best_k; the step's largest forward at
    # k·S·N rows) and the d-step's generator sample. Weights/activations
    # cast to bf16, noise still DRAWN in f32 (and bit-shared with the f32
    # re-decode via the user_noises seam), outputs return to f32 at the
    # valid-mask multiply. Gradients stay exact f32 — the only semantic
    # effect is which sample the variety argmin picks on near-ties and
    # bf16-rounded fake trajectories feeding D's loss (training
    # stochasticity; quality-gated on an N-seed sweep, see BASELINE.md).
    # Default ON since round 5: a 12-seed-per-arm zara1 EMA gate measured
    # d(ADE) = +0.0024 ± 0.0035, d(FDE) = +0.0045 ± 0.0073 vs f32 —
    # statistically zero, best seed overall was a bf16 seed — for a
    # measured ~4% step-time win (BASELINE.md round 5). --bf16_nograd 0
    # restores exact-f32 training.
    bf16_nograd: bool = True

    output_dir: str = "."
    print_every: int = 100
    checkpoint_every: int = 300
    checkpoint_name: str = "checkpoint"
    checkpoint_start_from: Optional[str] = None
    restore_from_checkpoint: bool = True
    num_samples_check: int = 5000

    timing: bool = False
    profile_dir: str = ""                 # emit a jax.profiler trace of
                                          # iterations [50, 60) when set
    seed: int = 0

    # TPU-specific
    # Training iterations fused into one dispatch (lax.scan over the
    # device-resident dataset). >1 amortizes host->device roundtrips — the
    # dominant cost on a tunneled TPU; semantics are identical. Measured on
    # the v5e (zara1, Bo20, bucketed): with the round-2 step, 5/10/20 ≈
    # 110-112 it/s, 50 ≈ 128, 100 ≈ 126; after the round-3 kernel fusions
    # the faster step moved the knee up: 50 ≈ 309, 100 ≈ 315, 200 ≈ 317
    # (bench.py --spd). 100 balances the last ~2% against compile time and
    # metric/checkpoint granularity (both are per-dispatch).
    steps_per_dispatch: int = 100
    n_max: int = 0                        # 0 = derive from dataset (rounded up to 8)
    # Scene-size buckets for training dispatches (SURVEY.md §7): >1 pads
    # each batch only to its bucket's width instead of the global max
    # (ETH/UCY p50 is 5-6 peds vs max 57 — ~80% padding waste unbucketed).
    # Each fused chunk runs at one bucket's width; XLA compiles once per
    # (chunk, width). 1 = off.
    n_buckets: int = 3
    # Data parallelism over scenes: 1 = single device (default), 0 = all
    # visible devices, N = first N devices. When >1 the training loop builds
    # a 1-D mesh, replicates params + the device-resident dataset, and shards
    # every batch's scene axis; GSPMD inserts the gradient all-reduce
    # (psum over ICI on a TPU slice). batch_size must divide evenly.
    num_devices: int = 1
    # LSTM implementation: 'auto' = scan. The Pallas kernels win the
    # isolated-recurrence microbenchmark at H >= 64 (ARCHITECTURE.md) but
    # measure slower in the END-TO-END step at every tested size
    # (tools/scale_bench.py, tools/profile_step.py --impl), so they are
    # explicit opt-ins: 'pallas' (per-timestep grid) / 'fused'
    # (whole-loop). use_pallas=True is a legacy alias for 'pallas'.
    lstm_impl: str = "auto"
    use_pallas: bool = False


# Per-variant presets matching the reference model families (SURVEY.md §6).
MODEL_PRESETS = {
    # scripts/train.py defaults — the live GAT path ("sgan-gat" family)
    "gat": ModelConfig(),
    # scripts/train_GCN.py working intent — GCNPooling pool-net, no graph module,
    # mlp_decoder_context (models/01 & sgan-models checkpoint family)
    "gcn-pool": ModelConfig(
        pooling_type="gcn", graph_module="none", mlp_decoder_context=True,
        bottleneck_dim=16,
    ),
    # era-b "sgan-g-p": PoolHiddenNet + GCNModule graph module
    "gcn": ModelConfig(graph_module="gcn"),
    # upstream-style sgan-p: pool only, plain decoder-context MLP
    "sgan-p": ModelConfig(graph_module="none", mlp_decoder_context=True),
    # upstream-style sgan: no pooling
    "sgan": ModelConfig(pooling_type="none", graph_module="none",
                        mlp_decoder_context=True),
}

TRAIN_PRESETS = {
    "gat": TrainConfig(),
    # train_GCN.py default divergences (reference train_GCN.py:69,75,88,94)
    "gcn-pool": TrainConfig(d_steps=2, best_k=1),
}
