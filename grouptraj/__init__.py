"""grouptraj — TPU-native group-aware Social-GAN trajectory prediction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
peaceminusones/Group-GAN-GCN-GAT (itself a fork of agrimgupta92/sgan):
adversarially trained pedestrian-trajectory prediction on ETH/UCY with
group-aware social pooling (intra-group + inter-group GCN/GAT message
passing driven by per-frame group labels).

Design stance (see SURVEY.md §7): the reference's ragged per-scene Python
loops become scene-padded dense batched ops — a batch is ``[S, N_max]``
pedestrians with validity masks; every per-scene loop is a masked batched
matmul; best-of-k sampling is a vmapped axis; data parallelism shards the
scene axis over a ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from grouptraj import config, losses, utils  # noqa: F401
