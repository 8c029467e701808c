"""R-GCN link prediction with a DistMult decoder (parity:
``examples/pytorch/rgcn/link_predict.py`` on FB15k-237-style data).

NOTE: the offline synthetic KG has uniformly random triples, so the only
learnable signal is memorization — expect slow MRR growth; with the real
FB15k-237 files present under the data dir the usual dynamics apply."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--num-bases", type=int, default=8)
    p.add_argument("--neg-k", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--scale", type=int, default=8,
                   help="divide the synthetic KG size by this")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--presorted", action="store_true",
                   help="use the grouped-GEMM (ragged_dot) path; its grad "
                        "compiles slowly on CPU with many relations")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.models import RGCN

    # Scaled synthetic KG (CPU-friendly).
    from dgl1_tpu.data.knowledge import _typed_graph

    num_nodes, num_edges, num_rels = (14541 // args.scale,
                                      310116 // args.scale, 237)
    g = _typed_graph(num_nodes, num_edges, num_rels, seed=1)
    print(f"[data] synthetic KG: {num_nodes} nodes, {num_edges} edges, "
          f"{num_rels} relations")

    etypes = np.asarray(g.edata["etype"])
    order = np.argsort(etypes, kind="stable")
    e = g.num_edges()
    src = np.asarray(g.src)[:e][order]
    dst = np.asarray(g.dst)[:e][order]
    etypes = etypes[order]
    g2 = dgl.graph((src, dst), num_nodes=num_nodes)
    counts = jnp.asarray(np.bincount(etypes, minlength=num_rels)
                         .astype(np.int32))
    etypes_j = jnp.asarray(etypes.astype(np.int32))

    model = RGCN(num_nodes=num_nodes, hidden_feats=args.hidden,
                 out_feats=args.hidden, num_rels=num_rels,
                 num_bases=args.num_bases, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), g2, etypes_j,
                        presorted=args.presorted, etype_counts=counts)
    # DistMult relation embeddings.
    rel_w = jax.random.normal(jax.random.PRNGKey(1),
                              (num_rels, args.hidden)) * 0.1
    opt = optax.adam(args.lr)
    opt_state = opt.init((params, rel_w))

    rng = np.random.default_rng(0)

    def score(h, rel_w, s, r, d):
        return jnp.sum(h[s] * rel_w[r] * h[d], axis=-1)

    def loss_fn(both, pos, neg):
        params, rel_w = both
        h = model.apply(params, g2, etypes_j, presorted=args.presorted,
                        etype_counts=counts)
        ps, pr, pd = pos
        ns, nr, nd = neg
        pos_s = score(h, rel_w, ps, pr, pd)
        neg_s = score(h, rel_w, ns, nr, nd)
        scores = jnp.concatenate([pos_s, neg_s])
        y = jnp.concatenate([jnp.ones_like(pos_s), jnp.zeros_like(neg_s)])
        reg = 1e-5 * (jnp.sum(h ** 2) + jnp.sum(rel_w ** 2))
        return optax.sigmoid_binary_cross_entropy(scores, y).mean() + reg

    @jax.jit
    def step(both, opt_state, pos, neg):
        loss, grads = jax.value_and_grad(loss_fn)(both, pos, neg)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(both, updates), opt_state, loss

    both = (params, rel_w)
    batch = min(4096, e)
    for epoch in range(args.epochs):
        eids = rng.choice(e, size=batch, replace=False)
        pos = (jnp.asarray(src[eids]), jnp.asarray(etypes[eids]),
               jnp.asarray(dst[eids]))
        # Corrupt heads/tails uniformly.
        neg_s = rng.integers(0, num_nodes, size=batch * args.neg_k)
        neg_d = rng.integers(0, num_nodes, size=batch * args.neg_k)
        neg_r = np.tile(etypes[eids], args.neg_k)
        neg = (jnp.asarray(neg_s), jnp.asarray(neg_r), jnp.asarray(neg_d))
        both, opt_state, loss = step(both, opt_state, pos, neg)
        if (epoch + 1) % 10 == 0 or epoch == 0:
            print(f"epoch {epoch + 1:3d} loss {float(loss):.4f}")

    # MRR on a sample (filtered-free, quick).
    params, rel_w = both
    h = model.apply(params, g2, etypes_j, presorted=args.presorted,
                    etype_counts=counts)
    sample = rng.choice(e, size=min(200, e), replace=False)
    ranks = []
    h_np = np.asarray(h)
    r_np = np.asarray(rel_w)
    for i in sample:
        s, r, d = src[i], etypes[i], dst[i]
        scores = (h_np[s] * r_np[r]) @ h_np.T
        rank = 1 + int((scores > scores[d]).sum())
        ranks.append(rank)
    mrr = float(np.mean(1.0 / np.asarray(ranks)))
    print(f"MRR (raw, {len(sample)} samples): {mrr:.4f}")


if __name__ == "__main__":
    main()
