"""Exploratory lab for the lost era-(b) gat-mh forward semantics.

Fitness: single-sample val ADE through our harness. Correctly-imported
families score ~0.58-0.60 here (sgan-gat zara1: 0.595, sgan-g-p: 0.581)
even though the reference recorded ~1.15 for all of them (a consistent
reference-side normalization bias); a wrong gat-mh forward scores ~1.8.

Each variant reimplements the batched multi-head GAT stack inline with
toggles, then routes through mlp_decoder_context and the shared
noise+decoder. Run: GROUPTRAJ_PLATFORM=cpu python tools/gatmh_lab.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = os.environ.get("GROUPTRAJ_REFERENCE", "/root/reference")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="zara1")
    ap.add_argument("--split", default="val")
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
    from grouptraj.models.generator import _encode, _pool, generator_sample
    from grouptraj.ops.gat import _masked_instance_norm
    from grouptraj.ops.groups import (
        inter_group_adjacency, intra_group_adjacency, normalize_adjacency,
        group_membership,
    )
    from grouptraj.ops.linear import mlp_forward
    from grouptraj.utils import get_dset_path, relative_to_abs

    path = os.path.join(REF, "models", "sgangat-g-p-models",
                        f"{args.dataset}_12_model.pt")
    ck = load_torch_checkpoint(path)
    cfg = config_from_checkpoint_args(ck["args"], ck["g_state"])
    params = import_generator(ck["g_state"])

    class A:
        obs_len = cfg.obs_len
        pred_len = cfg.pred_len
        skip = 1
        delim = "tab"
        batch_size = 64
        n_max = 0
        seed = 0

    _, loader = data_loader(A, get_dset_path(args.dataset, args.split),
                            shuffle=False)
    batches = list(loader)

    stack = params["gatencoder"]["gat_net"]["layer_stack"]

    def gat_stack(x, labels, valid, *, e_swap=False, mask="none",
                  adj="norm_intra", concat="transpose", norm=False,
                  final_elu=False):
        S, N = valid.shape
        m_intra = intra_group_adjacency(labels, valid)        # bool incl. eye
        if adj == "norm_intra":
            A_mix = normalize_adjacency(m_intra)
        elif adj == "raw_intra":
            A_mix = m_intra.astype(x.dtype)
        elif adj == "full_norm":
            full = (valid[:, :, None] * valid[:, None, :]) > 0
            A_mix = normalize_adjacency(full)
        else:
            A_mix = None
        n_layers = len(stack)
        for i, layer in enumerate(stack):
            if norm:
                x = _masked_instance_norm(x, valid)
            h = jnp.einsum("snf,kfo->skno", x, layer["w"])
            src = jnp.einsum("skno,koi->skn", h, layer["a_src"])
            dst = jnp.einsum("skno,koi->skn", h, layer["a_dst"])
            if e_swap:
                e = src[:, :, None, :] + dst[:, :, :, None]
            else:
                e = src[:, :, :, None] + dst[:, :, None, :]
            e = jax.nn.leaky_relu(e, negative_slope=cfg.alpha)
            if mask == "group":
                e = jnp.where(m_intra[:, None], e, -9e15)
            e = jnp.where(valid[:, None, None, :] > 0, e, -jnp.inf)
            att = jax.nn.softmax(e, axis=-1)
            att = jnp.where(jnp.isfinite(att), att, 0.0)
            if A_mix is not None:
                att = jnp.einsum("skim,smj->skij", att, A_mix)
            out = att @ h + layer["bias"]
            if i + 1 == n_layers:
                x = out[:, 0]
                if final_elu:
                    x = jax.nn.elu(x)
            else:
                if concat == "view":
                    x = jax.nn.elu(out.reshape(S, N, -1))
                else:
                    x = jax.nn.elu(jnp.moveaxis(out, 1, 2).reshape(S, N, -1))
        return x

    def make_fwd(post="id", **kw):
        def fwd(p, obs, obs_rel, group, valid, key):
            final_h = _encode(p["encoder"], obs_rel, "scan")
            end_pos = obs[:, :, -1, :]
            pool_h = _pool(p["pool_net"], cfg, final_h, end_pos,
                           obs_rel[:, :, -1, :], group, valid, "encoder",
                           key, False)
            ctx = jnp.concatenate([final_h, pool_h], axis=-1)
            gm = gat_stack(ctx, group, valid, **kw)
            if post == "ctx_res":
                gm = gm + ctx
            elif post == "elu":
                gm = jax.nn.elu(gm)
            elif post == "relu":
                gm = jax.nn.relu(gm)
            elif post == "logsoftmax":
                gm = jax.nn.log_softmax(gm, axis=-1)
            gm = jnp.where(valid[..., None] > 0, gm, 0.0)
            ni = mlp_forward(p["mlp_decoder_context"], gm, cfg.activation,
                             cfg.batch_norm, 0.0, None, mask=valid,
                             train=False)
            return generator_sample(p, cfg, ni, obs, obs_rel, group, valid,
                                    key, train=False)
        return fwd

    def val_ade(fwd):
        j = jax.jit(fwd)
        tot = n_tot = 0.0
        key = jax.random.PRNGKey(0)
        for b in batches:
            key, sub = jax.random.split(key)
            pr = j(params, jnp.asarray(b.obs), jnp.asarray(b.obs_rel),
                   jnp.asarray(b.end_group), jnp.asarray(b.valid), sub)
            pa = relative_to_abs(pr, jnp.asarray(b.obs)[:, :, -1, :])
            tot += float(L.displacement_error(pa, jnp.asarray(b.pred),
                                              jnp.asarray(b.valid)))
            n_tot += float(np.sum(b.valid))
        return tot / (n_tot * cfg.pred_len)

    variants = {
        "stgat(base: none-transpose)": dict(adj="none"),
        "e_swap": dict(adj="none", e_swap=True),
        "mask_group": dict(adj="none", mask="group"),
        "mask_group+mix": dict(adj="norm_intra", mask="group"),
        "mix_norm_intra": dict(adj="norm_intra"),
        "mix_raw_intra": dict(adj="raw_intra"),
        "mix_full": dict(adj="full_norm"),
        "norm+none": dict(adj="none", norm=True),
        "view+none": dict(adj="none", concat="view"),
        "final_elu": dict(adj="none", final_elu=True),
    }
    posts = {
        "post_ctx_res": ("ctx_res", dict(adj="none")),
        "post_elu": ("elu", dict(adj="none")),
        "post_relu": ("relu", dict(adj="none")),
        "post_logsoftmax": ("logsoftmax", dict(adj="none")),
    }
    for name, kw in variants.items():
        print(f"{name:32s} val ADE {val_ade(make_fwd(**kw)):.3f}", flush=True)
    for name, (post, kw) in posts.items():
        print(f"{name:32s} val ADE {val_ade(make_fwd(post=post, **kw)):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
