"""Link prediction with GraphSAGE encoder + dot-product scorer (parity:
``examples/pytorch/graphsage/train_sampling_unsupervised.py`` /
link-prediction EdgeDataLoader pattern)."""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--neg-k", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import (
        EdgeDataLoader,
        NeighborSampler,
        negative_sampler,
    )
    from dgl1_tpu.models import GraphSAGE

    g = dgl.data.synthetic_classification_graph(
        num_nodes=4000, num_classes=8, feat_dim=64, avg_degree=8, seed=0
    )
    feat = np.asarray(g.ndata["feat"])
    print(f"[data] {g.num_nodes()} nodes, {g.num_edges()} edges")

    sampler = NeighborSampler([10, 10], static_shapes=False)
    loader = EdgeDataLoader(
        g, np.arange(g.num_edges()), sampler,
        batch_size=args.batch_size,
        negative_sampler=negative_sampler.Uniform(args.neg_k), seed=0,
    )

    model = GraphSAGE(hidden_feats=args.hidden, out_feats=args.hidden)

    inp, pos_g, neg_g, blocks = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0), blocks, jnp.asarray(feat[inp])
    )
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, blocks, x, pos_g, neg_g):
        h = model.apply(p, blocks, x)
        pos = dgl.ops.u_dot_v(pos_g, h, h)[: pos_g.num_edges(), 0]
        neg = dgl.ops.u_dot_v(neg_g, h, h)[: neg_g.num_edges(), 0]
        scores = jnp.concatenate([pos, neg])
        y = jnp.concatenate([jnp.ones_like(pos), jnp.zeros_like(neg)])
        return optax.sigmoid_binary_cross_entropy(scores, y).mean()

    # Pair graphs are data-dependent in size: jit per-shape (CPU demo).
    step = jax.jit(lambda p, st, blocks, x, pg, ng: _step(p, st, blocks, x,
                                                          pg, ng))

    def _step(p, st, blocks, x, pg, ng):
        loss, grads = jax.value_and_grad(loss_fn)(p, blocks, x, pg, ng)
        updates, st = opt.update(grads, st)
        return optax.apply_updates(p, updates), st, loss

    for epoch in range(args.epochs):
        tot = nb = 0
        for inp, pos_g, neg_g, blocks in loader:
            x = jnp.asarray(feat[inp])
            params, opt_state, loss = step(params, opt_state, blocks, x,
                                           pos_g, neg_g)
            tot += float(loss)
            nb += 1
            if nb >= 8:  # keep the demo quick
                break
        print(f"epoch {epoch} loss {tot / max(nb, 1):.4f}")

    # AUC on a held-out sample of positives vs random negatives.
    from dgl1_tpu.sampling import global_uniform_negative_sampling

    h = model.apply(
        params,
        [g, g],
        jnp.asarray(feat),
    )
    e = g.num_edges()
    pos_idx = np.random.default_rng(1).choice(e, size=min(2000, e),
                                              replace=False)
    ps = np.asarray(g.src)[pos_idx]
    pd = np.asarray(g.dst)[pos_idx]
    ns, nd = global_uniform_negative_sampling(g, len(pos_idx))
    hp = np.asarray(h)
    pos_s = (hp[ps] * hp[pd]).sum(1)
    neg_s = (hp[ns] * hp[nd]).sum(1)
    labels = np.concatenate([np.ones_like(pos_s), np.zeros_like(neg_s)])
    scores = np.concatenate([pos_s, neg_s])
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    auc = (ranks[labels == 1].sum() - n_pos * (n_pos + 1) / 2) / (
        n_pos * n_neg
    )
    print(f"link-pred AUC: {auc:.4f}")


if __name__ == "__main__":
    main()
