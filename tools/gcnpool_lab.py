"""Exploratory lab for the lost GCNPooling pool-net (models/01 era).

Shape constraints from the checkpoint (models/01/checkpoint_with_model.pt):
  spatial_embedding 2->16, gcn_intra 48->72->8, gcn_inter 48->72->8,
  out_embedding 16->8.
Note the INTER GCN consumes 48-dim input — the same raw [embed(16) | h(32)]
features as intra, NOT intra's 8-dim output (unlike the later GCNModule
whose inter eats intra's output). That admits a no-GPool design: two
parallel ped-level GCNs over different adjacencies.

Fitness: single-sample val ADE on zara1 (a correct import scores ~0.5x the
checkpoint-recorded 1.0676 ≈ 0.53; see the sgan-g-p / sgan-gat calibration
in ARCHITECTURE.md), then best-of-20 test ADE/FDE vs the reference's
recorded golden 0.42/0.84 (evaluate_model.py:129).

Run: GROUPTRAJ_PLATFORM=cpu python tools/gcnpool_lab.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("GROUPTRAJ_REFERENCE", "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="zara1")
    ap.add_argument("--bo20", action="store_true",
                    help="also run best-of-20 on test for the top variants")
    ap.add_argument("--only", default="", help="comma list of variant names")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms",
                      os.environ.get("GROUPTRAJ_PLATFORM", "cpu"))
    import jax.numpy as jnp
    import numpy as np

    from grouptraj import losses as L
    from grouptraj.compat import (
        config_from_checkpoint_args, import_generator, load_torch_checkpoint,
    )
    from grouptraj.data import data_loader
    from grouptraj.models.generator import _encode, generator_sample
    from grouptraj.ops.gcn import gcn
    from grouptraj.ops.groups import (
        group_membership, intra_group_adjacency, normalize_adjacency,
    )
    from grouptraj.ops.linear import linear, mlp_forward
    from grouptraj.utils import get_dset_path, relative_to_abs

    path = os.path.join(REF, "models", "01", "checkpoint_with_model.pt")
    ck = load_torch_checkpoint(path)
    cfg = config_from_checkpoint_args(ck["args"], ck["g_state"])
    params = import_generator(ck["g_state"])
    print("recorded val ade:", min(ck["metrics_val"]["ade"]))

    class A:
        obs_len = cfg.obs_len
        pred_len = cfg.pred_len
        skip = 1
        delim = "tab"
        batch_size = 64
        n_max = 0
        seed = 0

    _, vloader = data_loader(A, get_dset_path(args.dataset, "val"),
                             shuffle=False)
    vbatches = list(vloader)

    pn = params["pool_net"]

    def feats(kind, end_pos, h, labels, valid):
        v = (valid > 0)[..., None]
        if kind == "abs":
            p = end_pos
        elif kind == "cent":
            cnt = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
            c = jnp.sum(end_pos * v, axis=1, keepdims=True) / cnt[..., None]
            p = end_pos - c
        else:
            raise ValueError(kind)
        emb = linear(pn["spatial_embedding"], p * v)
        return jnp.concatenate([emb, h], axis=-1)

    def adjacency(kind, labels, valid):
        m_intra = intra_group_adjacency(labels, valid)
        vmask = (valid[:, :, None] * valid[:, None, :]) > 0
        eye = jnp.eye(valid.shape[-1], dtype=bool)[None]
        if kind == "intra":
            return normalize_adjacency(m_intra)
        if kind == "full":
            return normalize_adjacency(vmask)
        if kind == "complement":
            return normalize_adjacency((~m_intra & vmask) | (eye & vmask))
        raise ValueError(kind)

    # ---- variants ------------------------------------------------------
    def parallel_pool(feat_kind, inter_adj):
        """Two parallel ped-level GCNs, no GPool."""
        def pool(h, end_pos, labels, valid):
            x = feats(feat_kind, end_pos, h, labels, valid)
            intra = gcn(pn["gcn_pooling_net_intra"],
                        adjacency("intra", labels, valid), x)
            inter = gcn(pn["gcn_pooling_net_inter"],
                        adjacency(inter_adj, labels, valid), x)
            out = linear(pn["out_embedding"],
                         jnp.concatenate([intra, inter], axis=-1))
            return jnp.where(valid[..., None] > 0, out, 0.0)
        return pool

    def gpool_pool(feat_kind):
        """Current reconstruction: GPool raw features for inter."""
        from grouptraj.ops.groups import inter_group_adjacency
        def pool(h, end_pos, labels, valid):
            x = feats(feat_kind, end_pos, h, labels, valid)
            intra = gcn(pn["gcn_pooling_net_intra"],
                        adjacency("intra", labels, valid), x)
            r_raw, gv = group_membership(labels, valid)
            r = normalize_adjacency(r_raw)
            y = gcn(pn["gcn_pooling_net_inter"],
                    normalize_adjacency(inter_group_adjacency(gv)), r @ x)
            inter = jnp.einsum("smn,smf->snf", r, y)
            out = linear(pn["out_embedding"],
                         jnp.concatenate([intra, inter], axis=-1))
            return jnp.where(valid[..., None] > 0, out, 0.0)
        return pool

    def pairwise_pool(reduce, inter_adj, rel_sign=1, h_src="j",
                      a_norm=True):
        """PoolHiddenNet-style pairwise features through the GCNs.

        For each target ped i: X_i[j] = [embed(p_j - p_i) | h_j]; run both
        GCNs on X_i; reduce over j (take row i / max / mean)."""
        def pool(h, end_pos, labels, valid):
            v = (valid > 0)
            rel = end_pos[:, :, None, :] - end_pos[:, None, :, :]  # p_j - p_i at [s,i,j]
            rel = rel_sign * rel * (v[:, :, None] & v[:, None, :])[..., None]
            emb = linear(pn["spatial_embedding"], rel)             # [S,I,J,16]
            if h_src == "j":
                hh = jnp.broadcast_to(h[:, None],
                                      emb.shape[:3] + (h.shape[-1],))
            else:
                hh = jnp.broadcast_to(h[:, :, None],
                                      emb.shape[:3] + (h.shape[-1],))
            x = jnp.concatenate([emb, hh], axis=-1)                # [S,I,J,48]
            a_in = adjacency("intra", labels, valid)
            a_out = adjacency(inter_adj, labels, valid)
            if not a_norm:
                m_intra = intra_group_adjacency(labels, valid)
                a_in = m_intra.astype(x.dtype)
                a_out = ((valid[:, :, None] * valid[:, None, :]) > 0
                         ).astype(x.dtype)
            run = lambda p, a, xi: gcn(p, a, xi)
            intra = jax.vmap(run, in_axes=(None, None, 1), out_axes=1)(
                pn["gcn_pooling_net_intra"], a_in, x)              # [S,I,J,8]
            inter = jax.vmap(run, in_axes=(None, None, 1), out_axes=1)(
                pn["gcn_pooling_net_inter"], a_out, x)
            vm = (v[:, :, None] & v[:, None, :])[..., None]
            if reduce == "take_i":
                idx = jnp.arange(x.shape[1])
                intra = intra[:, idx, idx]
                inter = inter[:, idx, idx]
            elif reduce == "max":
                intra = jnp.where(vm, intra, -jnp.inf).max(axis=2)
                inter = jnp.where(vm, inter, -jnp.inf).max(axis=2)
                intra = jnp.where(jnp.isfinite(intra), intra, 0.0)
                inter = jnp.where(jnp.isfinite(inter), inter, 0.0)
            else:
                cnt = jnp.maximum(vm.sum(axis=2), 1)
                intra = jnp.where(vm, intra, 0.0).sum(axis=2) / cnt
                inter = jnp.where(vm, inter, 0.0).sum(axis=2) / cnt
            out = linear(pn["out_embedding"],
                         jnp.concatenate([intra, inter], axis=-1))
            return jnp.where(valid[..., None] > 0, out, 0.0)
        return pool

    def gcn_norelu_last(p, a, x):
        h = x
        ws = p["W"]
        for w in ws[:-1]:
            h = jax.nn.relu(a @ h @ w)
        return a @ h @ ws[-1]

    def perped_pool(feat_kind, both_adj="intra", inter_adj=None,
                    swap_out=False, last_relu=True):
        """Per-ped features [embed(r_i) | h_i]; both GCNs over one adjacency."""
        def pool(h, end_pos, labels, valid, obs_rel_last=None):
            v = (valid > 0)[..., None]
            if feat_kind == "zero":
                p = jnp.zeros_like(end_pos)
            elif feat_kind == "disp":
                p = obs_rel_last
            elif feat_kind == "vel":
                p = obs_rel_last * 2.5
            elif feat_kind == "abs":
                p = end_pos
            else:
                cnt = jnp.maximum(jnp.sum(valid, -1, keepdims=True), 1.0)
                c = jnp.sum(end_pos * v, 1, keepdims=True) / cnt[..., None]
                p = end_pos - c
            x = jnp.concatenate(
                [linear(pn["spatial_embedding"], p * v), h], axis=-1)
            a = adjacency(both_adj, labels, valid)
            a2 = adjacency(inter_adj, labels, valid) if inter_adj else a
            g = gcn if last_relu else gcn_norelu_last
            intra = g(pn["gcn_pooling_net_intra"], a, x)
            inter = g(pn["gcn_pooling_net_inter"], a2, x)
            pair = ([inter, intra] if swap_out else [intra, inter])
            out = linear(pn["out_embedding"],
                         jnp.concatenate(pair, axis=-1))
            return jnp.where(v > 0, out, 0.0)
        return pool

    def make_fwd(pool):
        def fwd(p, obs, obs_rel, group, valid, key):
            final_h = _encode(p["encoder"], obs_rel, "scan")
            end_pos = obs[:, :, -1, :]
            try:
                pool_h = pool(final_h, end_pos, group, valid,
                              obs_rel_last=obs_rel[:, :, -1, :])
            except TypeError:
                pool_h = pool(final_h, end_pos, group, valid)
            ctx = jnp.concatenate([final_h, pool_h], axis=-1)
            ni = mlp_forward(p["mlp_decoder_context"], ctx, cfg.activation,
                             cfg.batch_norm, 0.0, None, mask=valid,
                             train=False)
            return generator_sample(p, cfg, ni, obs, obs_rel, group, valid,
                                    key, train=False)
        return fwd

    def val_ade(fwd):
        j = jax.jit(fwd)
        tot = n_tot = 0.0
        key = jax.random.PRNGKey(0)
        for b in vbatches:
            key, sub = jax.random.split(key)
            pr = j(params, jnp.asarray(b.obs), jnp.asarray(b.obs_rel),
                   jnp.asarray(b.end_group), jnp.asarray(b.valid), sub)
            pa = relative_to_abs(pr, jnp.asarray(b.obs)[:, :, -1, :])
            tot += float(L.displacement_error(pa, jnp.asarray(b.pred),
                                              jnp.asarray(b.valid)))
            n_tot += float(np.sum(b.valid))
        return tot / (n_tot * cfg.pred_len)

    variants = {
        "gpool_cent(current)": gpool_pool("cent"),
        "gpool_abs": gpool_pool("abs"),
        "par_abs_full": parallel_pool("abs", "full"),
        "par_abs_comp": parallel_pool("abs", "complement"),
        "par_cent_full": parallel_pool("cent", "full"),
        "par_cent_comp": parallel_pool("cent", "complement"),
        "pair_takei_full": pairwise_pool("take_i", "full"),
        "pair_takei_comp": pairwise_pool("take_i", "complement"),
        "pair_max_full": pairwise_pool("max", "full"),
        "pair_max_comp": pairwise_pool("max", "complement"),
        "pair_mean_full": pairwise_pool("mean", "full"),
        "pair_takei_full_sign": pairwise_pool("take_i", "full", rel_sign=-1),
        "pair_takei_full_hi": pairwise_pool("take_i", "full", h_src="i"),
        "pair_takei_full_raw": pairwise_pool("take_i", "full", a_norm=False),
        "pair_takei_intra2": pairwise_pool("take_i", "intra"),
        "pair_takei_intra2_sign": pairwise_pool("take_i", "intra",
                                                rel_sign=-1),
        "pair_takei_intra2_hi": pairwise_pool("take_i", "intra", h_src="i"),
        "pair_takei_intra2_sign_hi": pairwise_pool("take_i", "intra",
                                                   rel_sign=-1, h_src="i"),
        "pair_takei_comp_sign": pairwise_pool("take_i", "complement",
                                              rel_sign=-1),
        "pair_max_intra2": pairwise_pool("max", "intra"),
        "pair_mean_intra2": pairwise_pool("mean", "intra"),
        "perped_zero": perped_pool("zero"),
        "perped_disp": perped_pool("disp"),
        "perped_vel": perped_pool("vel"),
        "perped_abs_intra2": perped_pool("abs"),
        "perped_cent_intra2": perped_pool("cent"),
        "perped_disp_full": perped_pool("disp", "full"),
        "perped_disp_swap": perped_pool("disp", swap_out=True),
        "perped_disp_norelu": perped_pool("disp", last_relu=False),
        "perped_disp_comp": perped_pool("disp", inter_adj="complement"),
        "perped_vel_swap": perped_pool("vel", swap_out=True),
    }
    only = set(args.only.split(",")) if args.only else None
    scores = {}
    for name, pool in variants.items():
        if only and name not in only:
            continue
        scores[name] = val_ade(make_fwd(pool))
        print(f"{name:24s} val ADE {scores[name]:.3f}", flush=True)

    if args.bo20 and scores:
        _, tloader = data_loader(A, get_dset_path(args.dataset, "test"),
                                 shuffle=False)
        tbatches = list(tloader)
        top = sorted(scores, key=scores.get)[:3]
        for name in top:
            fwd = make_fwd(variants[name])
            j = jax.jit(fwd)
            at = ft = nt = 0.0
            key = jax.random.PRNGKey(0)
            for b in tbatches:
                preds = []
                for _ in range(20):
                    key, sub = jax.random.split(key)
                    preds.append(j(params, jnp.asarray(b.obs),
                                   jnp.asarray(b.obs_rel),
                                   jnp.asarray(b.end_group),
                                   jnp.asarray(b.valid), sub))
                preds = jnp.stack(preds)
                pa = relative_to_abs(preds,
                                     jnp.asarray(b.obs)[:, :, -1, :][None])
                vv = jnp.asarray(b.valid)[None]
                ade_raw = L.displacement_error(pa, jnp.asarray(b.pred)[None],
                                               vv, mode="raw")
                fde_raw = L.final_displacement_error(
                    pa[:, :, :, -1], jnp.asarray(b.pred)[None][:, :, :, -1],
                    vv, mode="raw")
                at += float(jnp.sum(jnp.min(jnp.sum(ade_raw, -1), 0)))
                ft += float(jnp.sum(jnp.min(jnp.sum(fde_raw, -1), 0)))
                nt += float(np.sum(b.valid))
            print(f"BO20 {name:24s} ADE {at/(nt*cfg.pred_len):.3f} "
                  f"FDE {ft/nt:.3f} (golden 0.42/0.84)", flush=True)


if __name__ == "__main__":
    main()
