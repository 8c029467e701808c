"""PinSAGE item-embedding training (parity: ``examples/pytorch/pinsage``,
simplified): random-walk neighbor sampling on an item co-interaction
graph, visit-count-weighted SAGE aggregation, max-margin triplet loss;
positives are random-walk co-visited items (the PinSAGE recipe).

Data: synthetic user-item interactions with latent item categories;
evaluation reports top-k neighbor category purity of the learned
embeddings (1.0 = perfectly category-clustered, 1/C = random).
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--items", type=int, default=500)
    p.add_argument("--users", type=int, default=300)
    p.add_argument("--categories", type=int, default=5)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as fnn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.sampling import PinSAGESampler

    rng = np.random.default_rng(0)
    cat = rng.integers(0, args.categories, args.items)
    # Users prefer one category; interactions mostly within it.
    u_cat = rng.integers(0, args.categories, args.users)
    n_inter = args.users * 12
    iu = rng.integers(0, args.users, n_inter)
    in_cat = rng.random(n_inter) < 0.85
    it = np.where(
        in_cat,
        rng.permutation(args.items)[
            np.searchsorted(np.sort(cat), u_cat[iu], side="left").clip(
                0, args.items - 1)],
        rng.integers(0, args.items, n_inter),
    )
    # Correct within-category draw: sample uniformly among same-cat items.
    items_by_cat = [np.flatnonzero(cat == c) for c in range(args.categories)]
    it = np.where(
        in_cat,
        np.asarray([items_by_cat[c][rng.integers(0, len(items_by_cat[c]))]
                    for c in u_cat[iu]]),
        it,
    )

    # Item-item projection: items co-interacted by the same user.
    order = np.argsort(iu, kind="stable")
    iu_s, it_s = iu[order], it[order]
    starts = np.searchsorted(iu_s, np.arange(args.users), side="left")
    ends = np.searchsorted(iu_s, np.arange(args.users), side="right")
    ss, dd = [], []
    for a, b in zip(starts, ends):
        its = np.unique(it_s[a:b])
        if len(its) > 1:
            pairs = np.array(np.meshgrid(its, its)).reshape(2, -1)
            keep = pairs[0] != pairs[1]
            ss.append(pairs[0][keep])
            dd.append(pairs[1][keep])
    g = dgl.to_simple(dgl.graph(
        (np.concatenate(ss), np.concatenate(dd)), num_nodes=args.items))
    print(f"[data] item graph: {g.num_nodes()} items, {g.num_edges()} "
          f"co-interaction edges, {args.categories} categories")

    sampler = PinSAGESampler(g, num_traversals=2, termination_prob=0.5,
                             num_random_walks=16, num_neighbors=5, seed=1)

    feat = jnp.asarray(
        (rng.normal(size=(args.items, 16))
         + 0.5 * np.eye(args.categories)[cat] @ rng.normal(
             size=(args.categories, 16))).astype(np.float32))

    class PinSAGEConv(fnn.Module):
        """Visit-count-weighted neighbor mean + self, l2-normalized."""

        hidden: int

        @fnn.compact
        def __call__(self, frontier, x):
            w = frontier.edata["weights"]
            num = dgl.ops.gspmm(frontier, "mul", "sum", x,
                                w[:, None])
            den = dgl.ops.gspmm(frontier, "copy_rhs", "sum", None,
                                w[:, None])
            agg = num / jnp.maximum(den, 1e-6)
            h = fnn.Dense(self.hidden)(jnp.concatenate([x, agg], axis=1))
            h = fnn.relu(h)
            h = fnn.Dense(self.hidden)(h)
            return h / jnp.maximum(
                jnp.linalg.norm(h, axis=1, keepdims=True), 1e-6)

    model = PinSAGEConv(hidden=args.hidden)

    frontier0 = sampler(np.arange(args.items))
    params = model.init(jax.random.PRNGKey(0), frontier0, feat)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, frontier, x, q, pos, neg):
        def loss_fn(p):
            z = model.apply(p, frontier, x)
            zq, zp, zn = z[q], z[pos], z[neg]
            margin = jnp.sum(zq * zn, 1) - jnp.sum(zq * zp, 1) + 0.5
            return jnp.mean(jnp.maximum(margin, 0.0))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    e = g.num_edges()
    src_np = np.asarray(g.src)[:e]
    dst_np = np.asarray(g.dst)[:e]
    for i in range(args.steps):
        q = rng.integers(0, args.items, args.batch_size)
        # Positives: a co-interaction neighbor (fallback: self).
        pos = q.copy()
        for j, s in enumerate(q):
            nbrs = dst_np[src_np == s]
            if len(nbrs):
                pos[j] = nbrs[rng.integers(0, len(nbrs))]
        neg = rng.integers(0, args.items, args.batch_size)
        params, opt_state, loss = step(
            params, opt_state, frontier0, feat,
            jnp.asarray(q), jnp.asarray(pos), jnp.asarray(neg))
        if (i + 1) % 100 == 0:
            print(f"step {i + 1} loss {float(loss):.4f}")

    z = np.asarray(model.apply(params, frontier0, feat))
    sims = z @ z.T
    np.fill_diagonal(sims, -np.inf)
    topk = np.argsort(-sims, axis=1)[:, :5]
    purity = (cat[topk] == cat[:, None]).mean()
    print(f"top-5 neighbor category purity: {purity:.4f} "
          f"(random = {1 / args.categories:.2f})")


if __name__ == "__main__":
    main()
