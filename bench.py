"""Benchmark: full GAN training-iteration throughput on real zara1 data.

Measures complete training iterations (1 discriminator update + 1 generator
update with the best-of-20 vmapped variety loss, batch = 64 scenes padded
dense) on whatever device JAX provides, and prints ONE JSON line.

``vs_baseline`` is the ratio against the reference PyTorch implementation
executing the identical workload (same data, same schedule, best_k=20,
batch 64) measured on this container's CPU with torch 2.13 — the reference
repo records no GPU throughput anywhere (BASELINE.md). Re-measure with
``python bench.py --measure-reference``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference torch-CPU zara1 iterations/sec on this container (measured via
# --measure-reference; d_steps=1, g_steps=1, best_k=20, batch 64 scenes).
REFERENCE_ITERS_PER_SEC = 0.131


def bench_grouptraj(iters: int = 200, batch_size: int = 64,
                    impl_override: str = "", spd: int = 0,
                    n_buckets: int = 0, n_seeds: int = 1):
    """Measures the production training path: device-resident dataset,
    scene-size-bucketed chunked dispatch (``TrainConfig.steps_per_dispatch``
    iterations per lax.scan dispatch, default 100; override with --spd),
    zara1, d+g alternation with best-of-20 variety loss.

    ``n_seeds > 1`` measures the vmapped multi-seed trainer
    (grouptraj/train/multi.py): N replicas per dispatch, reported as
    iters/s of the SHARED schedule (multiply by N for seed-iters/s)."""
    from scripts._common import setup_jax_cache
    setup_jax_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig, TrainConfig
    from grouptraj.data.batching import DenseDataset
    from grouptraj.train.device_data import (
        BucketScheduler, IndexStream, device_dataset, make_buckets,
    )
    from grouptraj.train.loop import build_loaders
    from grouptraj.train.steps import (
        build_train_chunk, init_train_state, make_train_chunk,
    )

    cfg = ModelConfig()
    tcfg = TrainConfig(dataset_name="zara1", batch_size=batch_size)
    import dataclasses
    if spd:
        tcfg = dataclasses.replace(tcfg, steps_per_dispatch=spd)
    if n_buckets:
        tcfg = dataclasses.replace(tcfg, n_buckets=n_buckets)
    impl = impl_override or "scan"
    chunk = tcfg.steps_per_dispatch
    sched = None
    try:
        train_dset, train_loader, _ = build_loaders(cfg, tcfg)
        if tcfg.n_buckets > 1:
            buckets = make_buckets(train_dset, tcfg.n_buckets, batch_size)
            datas = [device_dataset(
                DenseDataset(train_dset, w, indices=bidx), cfg.obs_len)
                for w, bidx in buckets]
            sched = BucketScheduler([len(i) for _, i in buckets], batch_size)
            data, num_seq = None, 0     # bucketed path never dispatches these
        else:
            data = device_dataset(train_loader.dense, cfg.obs_len)
            num_seq = train_loader.dense.num_seq
    except FileNotFoundError:
        from grouptraj.parallel.data_parallel import synthetic_device_data

        data = synthetic_device_data(256, 64, cfg.obs_len, cfg.pred_len)
        num_seq = 256

    stream = (iter(IndexStream(num_seq, batch_size))
              if sched is None else None)
    key = jax.random.PRNGKey(0)
    if n_seeds > 1:
        # the Pallas pool kernel batches natively under the seed-axis vmap
        # (replica-aware grid + custom_vmap rules, ops/pallas_pool.py) —
        # exactly what train_many runs
        run = jax.jit(jax.vmap(build_train_chunk(cfg, tcfg, impl, chunk),
                               in_axes=(0, None, None, 0)))
        init_keys = jnp.stack([jax.random.PRNGKey(s)
                               for s in range(n_seeds)])
        state = jax.jit(jax.vmap(
            lambda k: init_train_state(k, cfg, tcfg)))(init_keys)
        key = jax.vmap(jax.random.fold_in, (0, None))(init_keys, 7)

        def split(k):
            ks = jax.vmap(lambda x: jax.random.split(x, 2))(k)
            return ks[:, 0], ks[:, 1]
    else:
        run = make_train_chunk(cfg, tcfg, impl, chunk)
        state = init_train_state(key, cfg, tcfg)
        split = jax.random.split

    def next_dispatch():
        # device_put the indices NOW, outside the timed window: an implicit
        # transfer inside the timed loop costs one tunnel round trip per
        # dispatch, which on a degraded tunnel dominates the measurement
        if sched is not None:
            b, idx = sched.next_dispatch(chunk, 2)
            return datas[b], jax.device_put(jnp.asarray(idx))
        return data, jax.device_put(jnp.asarray(np.stack([
            np.stack([next(stream) for _ in range(2)])
            for _ in range(chunk)])))

    # warmup/compile every bucket width with index 0 — always valid for any
    # bucket, and independent of which bucket the scheduler would pick next
    # (a host readback is the only reliable sync on the axon platform —
    # block_until_ready returns early)
    warm_idx = jnp.zeros((chunk, 2, batch_size), jnp.int32)
    cost = {"flops": 0.0, "bytes": 0.0}
    for d in (datas if sched is not None else [data]):
        key, sub = split(key)
        state, losses = run(state, d, warm_idx, sub)
        try:
            # XLA's static cost model for the compiled dispatch — the
            # hardware-utilization audit trail (VERDICT r4 item 7). Summed
            # over bucket widths weighted equally (the scheduler's mix is
            # near-uniform per epoch); normalized per iteration below.
            ca = run.lower(state, d, warm_idx, sub).compile().cost_analysis()
            if ca:
                cost["flops"] += float(ca.get("flops", 0.0)) / chunk
                cost["bytes"] += float(ca.get("bytes accessed", 0.0)) / chunk
        except Exception:
            pass
    np.asarray(losses["G_total_loss"])
    n_widths = len(datas) if sched is not None else 1
    cost = {k: v / max(n_widths, 1) for k, v in cost.items()}

    # 3 reps over the SAME dispatch sequence, each with a hard sync: the
    # host<->TPU tunnel adds variable latency between identical runs (same
    # rationale as bench_serving), and at chunk=50 a naive --iters 200
    # window is only 4 dispatches. Keep >=8 dispatches per rep so one slow
    # dispatch cannot dominate, and reuse one precomputed sequence so every
    # rep times an identical bucket mix. The headline number is the MEDIAN
    # rep (methodology-comparable with the single averaged reference
    # measurement); the max rep is reported alongside as the tunnel-noise-
    # free estimate of device throughput.
    n_chunks = max(8, iters // chunk)
    if n_chunks * chunk != iters:
        print(f"bench: timing {n_chunks * chunk} iterations/rep "
              f"(--iters {iters} rounded to whole {chunk}-step dispatches, "
              f"floor 8 dispatches)", file=sys.stderr)
    seq = [next_dispatch() for _ in range(n_chunks)]
    reps = []
    for _ in range(3):
        t0 = time.time()
        for d, idx in seq:
            key, sub = split(key)
            state, losses = run(state, d, idx, sub)
        np.asarray(losses["G_total_loss"])      # hard sync
        reps.append(n_chunks * chunk / (time.time() - t0))
    return sorted(reps)[len(reps) // 2], max(reps), cost


def bench_serving(num_samples: int = 20, batch_size: int = 64):
    """Prediction (serving) throughput: best-of-k sampling on real zara1
    test scenes through the jitted eval step. Returns predicted
    trajectories/sec on this chip — every (pedestrian, sample) pair is one
    predicted 12-step trajectory; only VALID pedestrians count."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from grouptraj.config import ModelConfig, TrainConfig
    from grouptraj.data import data_loader
    from grouptraj.eval import make_eval_step
    from grouptraj.models import init_generator
    from grouptraj.utils import get_dset_path

    cfg = ModelConfig()

    class A:
        obs_len = cfg.obs_len
        pred_len = cfg.pred_len
        skip = 1
        delim = "tab"
        n_max = 0
        seed = 0

    A.batch_size = batch_size
    try:
        _, loader = data_loader(A, get_dset_path("zara1", "test"),
                                shuffle=False)
        batches = list(loader)
    except FileNotFoundError:
        return None
    params = init_generator(jax.random.PRNGKey(0), cfg)
    # production serving config: bf16 weight residency (serve.Predictor
    # default since round 4 — halves weight HBM reads on the weight-
    # bandwidth-bound sampler, measured 1.45x; quality-gated at Bo20
    # 0.3312/0.6439 vs f32 0.3312/0.6444 on the zara1 flagship,
    # tools/serve_bf16_probe.py). Activations/positions stay f32.
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    step = make_eval_step(cfg, num_samples)
    args_list = [
        jax.device_put((jnp.asarray(b.obs), jnp.asarray(b.obs_rel),
                        jnp.asarray(b.end_group), jnp.asarray(b.valid),
                        jnp.asarray(b.pred))) for b in batches]
    key = jax.random.PRNGKey(0)
    key, sub = jax.random.split(key)
    np.asarray(step(params, *args_list[0], sub)[0])     # compile + sync

    # Per-rep timing with a hard sync per rep. The tunnel between host and
    # TPU adds variable latency (observed ±40% between identical runs);
    # report the median rep as the headline (like-for-like with the
    # reference methodology) and the best rep as the tunnel-noise-free
    # device estimate. Rep discipline (round 5, VERDICT r4 item 4): one
    # pass over the split is only ~10 dispatches / well under a second —
    # tunnel latency dominated and made the number swing ±15% between
    # sessions. Each rep now loops the split until it has timed >= 2 s of
    # work, the same fix the train metric got in round 4.
    passes = 1
    reps = []
    for _ in range(5):
        while True:
            rep_traj = 0.0
            t0 = time.time()
            out = None
            for _ in range(passes):
                for a, b in zip(args_list, batches):
                    key, sub = jax.random.split(key)
                    out = step(params, *a, sub)
                    rep_traj += float(b.valid.sum()) * num_samples
            np.asarray(out[0])                          # hard sync
            dt = time.time() - t0
            if dt >= 2.0 or passes >= 256:
                reps.append(rep_traj / dt)
                break
            passes = max(passes + 1, int(passes * 2.5 / max(dt, 1e-3)))
    return sorted(reps)[len(reps) // 2], max(reps)


def bench_multichip_scaling(iters: int = 8, chunk: int = 4) -> dict | None:
    """Data-parallel scaling datapoint on the 8-virtual-device CPU mesh.

    The container exposes one physical TPU chip, so the multi-chip axis is
    validated the standard JAX way: a subprocess pins the CPU platform with
    ``xla_force_host_platform_device_count=8`` and times the PRODUCTION
    chunked train dispatch (make_train_chunk, synthetic data, batch 64)
    with the scene axis sharded over 1 vs 8 mesh devices. Reports the
    speedup — the sharding/collective layout working end-to-end, not TPU
    throughput (CPU 'devices' share the host's cores).
    """
    import json as _json
    import subprocess
    import sys as _sys

    code = f"""
import json, time
import jax, numpy as np
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from grouptraj.config import ModelConfig, TrainConfig
from grouptraj.parallel.mesh import DATA_AXIS, make_mesh, replicated_sharding
from grouptraj.parallel.data_parallel import synthetic_device_data
from grouptraj.train.steps import init_train_state, make_train_chunk
cfg = ModelConfig(); out = {{}}
for n in (1, 8):
    tcfg = TrainConfig(batch_size=64, best_k=5, steps_per_dispatch={chunk})
    mesh = make_mesh(n)
    data = synthetic_device_data(256, 16, sharding=replicated_sharding(mesh))
    idx_shard = NamedSharding(mesh, P(None, None, DATA_AXIS))
    run = make_train_chunk(cfg, tcfg, 'scan', {chunk})
    state = jax.device_put(init_train_state(jax.random.PRNGKey(0), cfg, tcfg),
                           replicated_sharding(mesh))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    n_chunks = {iters} // {chunk}
    seq = [jax.device_put(rng.integers(0, 256, ({chunk}, 2, 64)).astype(
        np.int32), idx_shard) for _ in range(n_chunks)]
    state, losses = run(state, data, seq[0], key)       # compile
    np.asarray(losses['G_total_loss'])
    t0 = time.time()
    for idx in seq:
        key, sub = jax.random.split(key)
        state, losses = run(state, data, idx, sub)
    np.asarray(losses['G_total_loss'])
    out[f'dp{{n}}'] = n_chunks * {chunk} / (time.time() - t0)
print(json.dumps(out))
"""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    env["XLA_FLAGS"] = flags.strip()
    env["JAX_PLATFORMS"] = "cpu"
    env["GROUPTRAJ_PLATFORM"] = "cpu"
    repo = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    try:
        res = subprocess.run([_sys.executable, "-c", code], check=True,
                             env=env, cwd=repo, capture_output=True,
                             text=True, timeout=1200)
        return _json.loads(res.stdout.strip().splitlines()[-1])
    except Exception as e:  # scaling datapoint is auxiliary — never fatal
        print(f"bench: multichip scaling skipped ({type(e).__name__})",
              file=sys.stderr)
        return None


def bench_reference(iters: int = 3, batch_size: int = 64) -> float:
    """Time the reference PyTorch implementation on the same workload (CPU)."""
    sys.path.insert(0, "/root/reference")
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    import importlib
    import sgan.models as M
    importlib.reload(M)

    from sgan.data.loader import data_loader as ref_loader
    from sgan.losses import gan_d_loss, gan_g_loss, l2_loss
    from sgan.utils import relative_to_abs

    class A:
        obs_len, pred_len, skip, delim = 8, 12, 1, "tab"
        batch_size = 64
        loader_num_workers = 0

    A.batch_size = batch_size
    _, loader = ref_loader(A, "/root/reference/datasets_group/zara1/train")
    gen = M.TrajectoryGenerator(
        obs_len=8, pred_len=12, embedding_dim=16, encoder_h_dim=32,
        decoder_h_dim=32, mlp_dim=64, num_layers=1, noise_dim=(8,),
        noise_type="gaussian", noise_mix_type="global",
        pooling_type="pool_net", pool_every_timestep=False, dropout=0.0,
        bottleneck_dim=8, batch_norm=False, n_heads=1, dropout1=0, alpha=0.2)
    disc = M.TrajectoryDiscriminator(
        obs_len=8, pred_len=12, embedding_dim=16, h_dim=48, mlp_dim=64,
        num_layers=1, dropout=0.0, batch_norm=False, d_type="global")
    og = torch.optim.Adam(gen.parameters(), lr=1e-4)
    od = torch.optim.Adam(disc.parameters(), lr=1e-3)

    batches = []
    it = iter(loader)
    for _ in range(2):
        batches.append(next(it))

    def one_iter(batch):
        (obs, pred_gt, obs_rel, pred_gt_rel, *_rest, loss_mask, sse) = batch
        # D step
        out = gen(obs, obs_rel, sse, _rest[2])
        fake = relative_to_abs(out, obs[-1])
        tr = torch.cat([obs, pred_gt], 0)
        trr = torch.cat([obs_rel, pred_gt_rel], 0)
        tf = torch.cat([obs, fake], 0)
        tfr = torch.cat([obs_rel, out], 0)
        loss = gan_d_loss(disc(tr, trr, sse), disc(tf, tfr, sse))
        od.zero_grad(); loss.backward(); od.step()
        # G step with best_k=20
        lm = loss_mask[:, 8:]
        l2s = []
        for _ in range(20):
            out = gen(obs, obs_rel, sse, _rest[2])
            l2s.append(l2_loss(out, pred_gt_rel, lm, mode="raw"))
        stacked = torch.stack(l2s, 1)
        total = torch.zeros(1)
        for s, e in sse:
            per = torch.sum(stacked[s:e], 0)
            total = total + torch.min(per) / torch.sum(lm[s:e])
        fake = relative_to_abs(out, obs[-1])
        tf = torch.cat([obs, fake], 0)
        tfr = torch.cat([obs_rel, out], 0)
        loss = total + gan_g_loss(disc(tf, tfr, sse))
        og.zero_grad(); loss.backward()
        torch.nn.utils.clip_grad_norm_(gen.parameters(), 2.0)
        og.step()

    one_iter(batches[0])        # warmup
    t0 = time.time()
    for i in range(iters):
        one_iter(batches[i % len(batches)])
    return iters / (time.time() - t0)


def wait_for_device(budget_s: float = 1800.0) -> None:
    """Block until a trivial device op succeeds, up to ``budget_s``.

    The axon host<->TPU tunnel intermittently wedges for minutes to hours
    (CLAUDE.md); a bench launched into a wedged tunnel would otherwise hang
    inside the warmup dispatch with nothing recorded. Probe in a SUBPROCESS
    with a hard timeout (the wedge blocks in C++ where Python signal
    handlers never run), and only start measuring once a probe round-trips.
    After the budget, fall through and let the normal path try anyway —
    never worse than the old behavior. Opt out with GROUPTRAJ_BENCH_WAIT=0.
    """
    import subprocess

    # GROUPTRAJ_PLATFORM wins: this container pins JAX_PLATFORMS=axon
    # globally, and GROUPTRAJ_PLATFORM=cpu is the documented way to override
    # it (CLAUDE.md / scripts/_common.py)
    plat = (os.environ.get("GROUPTRAJ_PLATFORM", "")
            or os.environ.get("JAX_PLATFORMS", "")).strip().lower()
    if plat == "cpu":        # deliberate CPU bench — nothing to wait for
        return
    budget_s = float(os.environ.get("GROUPTRAJ_BENCH_WAIT", budget_s))
    deadline = time.time() + budget_s
    probe = ("import jax, numpy as np\n"
             "np.asarray(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))\n")
    first = True
    while time.time() < deadline:
        try:
            subprocess.run([sys.executable, "-c", probe], check=True,
                           timeout=120, capture_output=True)
            return
        except Exception:
            if first:
                print("bench: device probe failed (wedged tunnel?); "
                      f"retrying for up to {budget_s:.0f}s", file=sys.stderr)
                first = False
            time.sleep(60)
    print("bench: device never became healthy within the wait budget; "
          "attempting the measurement anyway", file=sys.stderr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--spd", type=int, default=0,
                    help="override steps_per_dispatch (0 = config default)")
    ap.add_argument("--impl", default="", choices=["", "scan", "pallas"])
    ap.add_argument("--n_buckets", type=int, default=0,
                    help="override scene-size bucket count (0 = default)")
    ap.add_argument("--measure-reference", action="store_true")
    ap.add_argument("--no-scaling", action="store_true",
                    help="skip the 8-virtual-device CPU-mesh DP datapoint")
    ap.add_argument("--no-multiseed", action="store_true",
                    help="skip the 8-replica vmapped-trainer datapoint")
    ap.add_argument("--n_seeds", type=int, default=8,
                    help="replica count for the multi-seed datapoint")
    args = ap.parse_args()
    if args.measure_reference:
        ref = bench_reference()
        print(json.dumps({"metric": "reference_train_iters_per_sec",
                          "value": round(ref, 4), "unit": "iters/s",
                          "vs_baseline": 1.0}))
    else:
        wait_for_device()
        ips_med, ips_best, cost = bench_grouptraj(
            args.iters, impl_override=args.impl, spd=args.spd,
            n_buckets=args.n_buckets)
        tps = bench_serving()
        out = {
            "metric": "train_iters_per_sec_zara1_bo20",
            "value": round(ips_med, 3),
            "unit": "iters/s",
            "vs_baseline": round(ips_med / REFERENCE_ITERS_PER_SEC, 2),
            "best_rep": round(ips_best, 3),
        }
        if cost.get("flops"):
            # hardware-utilization audit (XLA static cost model, averaged
            # over bucket widths): %-of-v5e peaks at the MEASURED rate, so
            # "fast" is checkable against the chip, not only the reference
            # baseline (method note in BASELINE.md). v5e-1: 197 TFLOP/s
            # bf16 MXU, 819 GB/s HBM.
            out["flops_per_iter"] = round(cost["flops"])
            out["hbm_bytes_per_iter"] = round(cost["bytes"])
            out["pct_v5e_mxu"] = round(
                100 * cost["flops"] * ips_med / 197e12, 2)
            out["pct_v5e_hbm"] = round(
                100 * cost["bytes"] * ips_med / 819e9, 2)
        if tps is not None:
            # BASELINE.json's second metric: best-of-20 sampling throughput;
            # each (valid pedestrian, sample) is one predicted trajectory
            out["pred_trajectories_per_sec_per_chip"] = round(tps[0], 0)
            out["pred_trajectories_per_sec_best_rep"] = round(tps[1], 0)
        if not args.no_multiseed and args.n_seeds > 1:
            try:
                # the vmapped multi-seed trainer: N replicas advance per
                # dispatch on one chip — seed-iters/s is the useful-work
                # headline for the zoo's seed sweeps (train/multi.py)
                ms_med, ms_best, _ = bench_grouptraj(
                    args.iters, impl_override=args.impl, spd=args.spd,
                    n_buckets=args.n_buckets, n_seeds=args.n_seeds)
                out[f"multiseed{args.n_seeds}_seed_iters_per_sec"] = round(
                    ms_med * args.n_seeds, 1)
                out[f"multiseed{args.n_seeds}_seed_iters_best_rep"] = round(
                    ms_best * args.n_seeds, 1)
            except Exception as e:   # auxiliary datapoint — never fatal
                print(f"bench: multiseed skipped ({type(e).__name__}: {e})",
                      file=sys.stderr)
        if not args.no_scaling:
            sc = bench_multichip_scaling()
            if sc:
                # 8-virtual-CPU-device mesh datapoint: the production DP
                # dispatch compiles + runs sharded; 'devices' share host
                # cores so ~1x is expected — layout validation, not speed
                out["dp8_vs_dp1_cpu_mesh"] = round(sc["dp8"] / sc["dp1"], 2)
        print(json.dumps(out))
