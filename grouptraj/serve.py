"""Inference / serving API: checkpoint -> jitted best-of-k predictor.

The reference has no serving story (evaluation scripts only); production use
of a trajectory predictor is "given the observed window of a live scene,
return k sampled futures". :class:`Predictor` wraps any grouptraj or
reference checkpoint into a single padded, jitted, pre-compiled entry point:

    p = Predictor.from_checkpoint("models/grouptraj/zara1_12_with_model.pt")
    samples = p.predict(xy, groups)      # xy [n, obs_len, 2] -> [k, n, pred_len, 2]

Scenes pad to fixed bucket sizes so repeated calls hit one compiled
executable per bucket; batches of scenes amortize further via
:meth:`predict_batch`. Both axes bucket: pedestrians-per-scene to
``buckets`` and scenes-per-call to ``s_buckets``, so a production caller
with varying batch sizes compiles one executable per (scene-count,
scene-width) bucket pair instead of one per distinct batch size —
serving is dispatch-latency-bound (BASELINE.md serving roofline), and a
recompile is ~seconds against a ~ms dispatch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from grouptraj.config import ModelConfig
from grouptraj.models.generator import (
    generator_context, generator_sample_many,
)
from grouptraj.utils import relative_to_abs, round_up


class Predictor:
    def __init__(self, params, cfg: ModelConfig, num_samples: int = 20,
                 buckets: Sequence[int] = (8, 16, 32, 64), seed: int = 0,
                 param_dtype="bfloat16",
                 s_buckets: Sequence[int] = (1, 4, 16, 64, 256)):
        """``param_dtype``: weights are held on device in this dtype
        (default bf16 — halves weight HBM reads on the weight-bandwidth-
        bound sampler for a measured 1.45x throughput). Zoo-validated:
        all 15 shipped checkpoints plus one reference import per model
        era pass |dADE| <= 0.005 / |dFDE| <= 0.01 at Bo20 vs f32
        (tools/serve_bf16_zoo.py; table in MODEL_ZOO.md — largest
        deviation +0.0031 FDE on the wide-coordinate eth import).
        Inputs/positions stay f32 — coordinates at bf16 would cost
        cm-level error. Pass ``param_dtype=None`` (or "float32") for
        exact-f32 serving.

        ``s_buckets``: scene-count pad targets for :meth:`predict_batch`
        (above the largest, round up to its multiple). Padding scenes are
        all-invalid (``valid == 0``) and sliced off before returning;
        scenes are independent through the whole model (pooling/GAT/GCN
        act within a scene), so pad scenes cannot perturb real outputs."""
        if param_dtype is not None:
            d = jnp.dtype(param_dtype)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(d)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
                params)
        self.params = params
        self.cfg = cfg
        self.num_samples = num_samples
        self.buckets = sorted(buckets)
        self.s_buckets = sorted(s_buckets)
        self._key = jax.random.PRNGKey(seed)
        self._compiled = {}

    @classmethod
    def from_checkpoint(cls, path: str, num_samples: int = 20,
                        use_best: bool = True, **kw) -> "Predictor":
        from grouptraj.compat import (
            config_from_checkpoint_args, import_generator,
        )
        from grouptraj.train.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        if ckpt is None or ckpt.get("g_state") is None:
            raise FileNotFoundError(f"no model weights at {path}")
        state = ckpt["g_best_state"] if (
            use_best and ckpt.get("g_best_state") is not None
        ) else ckpt["g_state"]
        cfg = config_from_checkpoint_args(ckpt["args"], state)
        return cls(import_generator(state), cfg, num_samples, **kw)

    def _fn(self, S: int, N: int):
        if (S, N) not in self._compiled:
            cfg, k = self.cfg, self.num_samples

            @jax.jit
            def fn(params, obs, obs_rel, group, valid, key):
                keys = jax.random.split(key, k)
                # context once (eval mode is deterministic), all k samples
                # in one scene-tiled decode (generator_sample_many)
                ctx = generator_context(params, cfg, obs, obs_rel, group,
                                        valid, keys[0], train=False)
                preds = generator_sample_many(
                    params, cfg, ctx, obs, obs_rel, group, valid, keys,
                    train=False)                        # [k, S, N, Tp, 2]
                return relative_to_abs(preds, obs[:, :, -1, :][None])

            self._compiled[(S, N)] = fn
        return self._compiled[(S, N)]

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return round_up(n, self.buckets[-1])

    def _s_bucket(self, s: int) -> int:
        for b in self.s_buckets:
            if s <= b:
                return b
        return round_up(s, self.s_buckets[-1])

    def predict(self, xy: np.ndarray, groups: Optional[np.ndarray] = None,
                key: Optional[jax.Array] = None) -> np.ndarray:
        """One scene: xy [n, obs_len, 2] absolute positions, groups [n]
        (0 = ungrouped; omit for no group info) -> [num_samples, n, pred_len, 2].
        """
        out = self.predict_batch([xy], [groups] if groups is not None
                                 else None, key)
        return out[0]

    def predict_batch(self, scenes: Sequence[np.ndarray],
                      groups: Optional[Sequence[np.ndarray]] = None,
                      key: Optional[jax.Array] = None) -> list:
        To = self.cfg.obs_len
        S_real = len(scenes)
        S = self._s_bucket(S_real)
        N = self._bucket(max(s.shape[0] for s in scenes))
        obs = np.zeros((S, N, To, 2), np.float32)
        grp = np.zeros((S, N), np.float32)
        valid = np.zeros((S, N), np.float32)
        for i, s in enumerate(scenes):
            n = s.shape[0]
            if s.shape != (n, To, 2):
                raise ValueError(
                    f"scene {i}: expected [n, {To}, 2], got {s.shape}")
            obs[i, :n] = s
            valid[i, :n] = 1.0
            if groups is not None and groups[i] is not None:
                grp[i, :n] = groups[i]
        obs_rel = np.zeros_like(obs)
        obs_rel[:, :, 1:] = obs[:, :, 1:] - obs[:, :, :-1]
        obs_rel *= valid[..., None, None]

        if key is None:
            self._key, key = jax.random.split(self._key)
        preds = self._fn(S, N)(self.params, jnp.asarray(obs),
                               jnp.asarray(obs_rel), jnp.asarray(grp),
                               jnp.asarray(valid), key)
        preds = np.asarray(preds)
        return [preds[:, i, :scenes[i].shape[0]] for i in range(S_real)]
