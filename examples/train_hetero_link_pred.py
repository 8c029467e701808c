"""Heterogeneous link prediction (user-item recommendation) with sampled
blocks (parity: the reference's hetero link-prediction tutorial /
``EdgeDataLoader`` on heterographs).

A planted-cluster bipartite graph (users buy items of their own group)
gives a verifiable signal: held-out AUC must clearly beat chance. The
encoder is a 2-layer HeteroGraphConv over per-etype sampled blocks;
scoring is the dot product on the positive/negative pair graphs, with
``exclude='reverse_types'`` guarding the reverse relation from leakage.

Usage: python examples/train_hetero_link_pred.py [--cpu]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--users", type=int, default=200)
    p.add_argument("--items", type=int, default=150)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--edges", type=int, default=2000)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.dataloading import NeighborSampler
    from dgl1_tpu.dataloading.edge_dataloader import EdgeDataLoader
    from dgl1_tpu.dataloading.negative_sampler import Uniform
    from dgl1_tpu.nn.conv import GraphConv
    from dgl1_tpu.nn.hetero import HeteroGraphConv

    rng = np.random.default_rng(0)
    gu = rng.integers(0, args.groups, args.users)
    gi = rng.integers(0, args.groups, args.items)
    # 90% of purchases stay within the user's group.
    src, dst = [], []
    for _ in range(args.edges):
        u = rng.integers(args.users)
        if rng.random() < 0.9:
            pool = np.nonzero(gi == gu[u])[0]
        else:
            pool = np.arange(args.items)
        src.append(u)
        dst.append(int(rng.choice(pool)))
    src = np.asarray(src)
    dst = np.asarray(dst)
    hg = dgl.heterograph({
        ("user", "buys", "item"): (src, dst),
        ("item", "bought_by", "user"): (dst, src),
    }, num_nodes_dict={"user": args.users, "item": args.items})

    eids = rng.permutation(args.edges)
    n_train = int(0.8 * args.edges)
    train_eids, test_eids = eids[:n_train], eids[n_train:]

    etypes = ["buys", "bought_by"]
    sampler = NeighborSampler([{e: 5 for e in etypes}] * 2,
                              static_shapes=False)
    loader = EdgeDataLoader(
        hg, {"buys": train_eids}, sampler, batch_size=args.batch_size,
        negative_sampler=Uniform(4), exclude="reverse_types",
        reverse_etypes={"buys": "bought_by", "bought_by": "buys"}, seed=0)

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, blocks, x):
            h = HeteroGraphConv({e: GraphConv(args.hidden) for e in etypes},
                                name="l0")(blocks[0], x)
            h = {k: nn.relu(v) for k, v in h.items()}
            return HeteroGraphConv(
                {e: GraphConv(args.hidden) for e in etypes},
                name="l1")(blocks[1], h)

    model = Encoder()
    # Learnable input embeddings (featureless graph).
    key = jax.random.PRNGKey(0)
    emb = {
        "user": 0.1 * jax.random.normal(key, (args.users, args.hidden)),
        "item": 0.1 * jax.random.normal(
            jax.random.fold_in(key, 1), (args.items, args.hidden)),
    }

    def batch_inputs(input_nodes, params_emb):
        return {nt: jnp.take(params_emb[nt], jnp.asarray(ids), axis=0,
                             mode="clip")
                for nt, ids in input_nodes.items()}

    inp0, pos0, neg0, blocks0 = next(iter(loader))
    enc_params = model.init(jax.random.PRNGKey(1), blocks0,
                            batch_inputs(inp0, emb))
    params = {"enc": enc_params, "emb": emb}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def score(h, pair, c=("user", "buys", "item")):
        rel = pair.rel_graphs[c]
        e = rel.num_edges()
        s = jnp.asarray(rel.src)[:e]
        d = jnp.asarray(rel.dst)[:e]
        # Pair-graph local ids index the per-ntype unique endpoint lists,
        # which are exactly the blocks' seed (dst) prefix per ntype.
        return jnp.sum(h["user"][s] * h["item"][d], axis=-1)

    def _step(params, opt_state, blocks, inp, pos, neg):
        def loss_fn(p):
            x = batch_inputs(inp, p["emb"])
            h = model.apply(p["enc"], blocks, x)
            ps = score(h, pos)
            ns = score(h, neg)
            return -(jnp.mean(jax.nn.log_sigmoid(ps))
                     + jnp.mean(jax.nn.log_sigmoid(-ns)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    # Pair graphs / blocks vary in node count per batch: jit per shape
    # (CPU demo; the TPU pipeline pins shapes via static_shapes=True).
    step = jax.jit(_step, static_argnames=())

    import time

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        losses = []
        for inp, pos, neg, blocks in loader:
            params, opt_state, loss = step(params, opt_state, blocks, inp,
                                           pos, neg)
            losses.append(float(loss))
        print(f"epoch {epoch + 1:2d} loss {np.mean(losses):.4f}")

    # Held-out AUC with the trained embeddings through a full (unsampled)
    # encoder pass: score test edges vs random non-edge corruptions.
    full_sampler = NeighborSampler([{e: -1 for e in etypes}] * 2,
                                   static_shapes=False)
    all_nodes = {"user": np.arange(args.users),
                 "item": np.arange(args.items)}
    inp, _, blocks = full_sampler.sample_blocks(hg, all_nodes)
    h = model.apply(params["enc"], blocks, batch_inputs(inp, params["emb"]))
    hu = np.asarray(h["user"])
    hi = np.asarray(h["item"])
    ts, td = src[test_eids], dst[test_eids]
    neg_d = rng.integers(0, args.items, len(test_eids))
    pos_s = np.sum(hu[ts] * hi[td], axis=-1)
    neg_s = np.sum(hu[ts] * hi[neg_d], axis=-1)
    auc = float(np.mean(pos_s[:, None] > neg_s[None, :]))
    dt = time.perf_counter() - t0
    print(f"done in {dt:.1f}s; held-out AUC {auc:.3f}")
    if auc < 0.70:
        raise SystemExit(f"SIGNAL GATE FAILED: AUC {auc:.3f} < 0.70")
    print("signal gate passed")


if __name__ == "__main__":
    main()
