"""HAN on a synthetic ACM-style heterograph (parity:
``examples/pytorch/han/main.py``).

Papers connect to authors and fields; the label of a paper is determined
by a community structure visible only through the paper-author-paper and
paper-field-paper metapaths, so metapath attention is required.
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--hidden", type=int, default=8)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.models import HAN

    rng = np.random.default_rng(0)
    n_papers, n_authors, n_fields, n_classes = 600, 200, 30, 3
    paper_label = rng.integers(0, n_classes, size=n_papers)
    # Authors and fields belong to communities; papers mostly link within
    # their own community.
    author_comm = rng.integers(0, n_classes, size=n_authors)
    field_comm = rng.integers(0, n_classes, size=n_fields)

    def links(n_per, comm_of, n_targets, target_comm):
        src, dst = [], []
        for paper in range(n_papers):
            c = comm_of[paper]
            for _ in range(n_per):
                if rng.random() < 0.85:
                    pool = np.nonzero(target_comm == c)[0]
                else:
                    pool = np.arange(n_targets)
                dst.append(int(rng.choice(pool)))
                src.append(paper)
        return np.asarray(src), np.asarray(dst)

    pa_s, pa_d = links(3, paper_label, n_authors, author_comm)
    pf_s, pf_d = links(2, paper_label, n_fields, field_comm)
    hg = dgl.heterograph({
        ("paper", "pa", "author"): (pa_s, pa_d),
        ("author", "ap", "paper"): (pa_d, pa_s),
        ("paper", "pf", "field"): (pf_s, pf_d),
        ("field", "fp", "paper"): (pf_d, pf_s),
    }, num_nodes_dict={"paper": n_papers, "author": n_authors,
                       "field": n_fields})

    # Metapath-reachable graphs (precomputed on the host, once).
    graphs = [
        dgl.metapath_reachable_graph(hg, ["pa", "ap"]),
        dgl.metapath_reachable_graph(hg, ["pf", "fp"]),
    ]

    feat = jnp.asarray(rng.normal(size=(n_papers, 32)).astype(np.float32))
    labels = jnp.asarray(paper_label.astype(np.int32))
    n_train = n_papers // 2
    train_mask = np.zeros(n_papers, dtype=bool)
    train_mask[rng.permutation(n_papers)[:n_train]] = True
    train_mask = jnp.asarray(train_mask)

    model = HAN(num_metapaths=2, hidden_feats=args.hidden,
                out_feats=n_classes, num_heads=args.heads, dropout=0.4)
    params = model.init(jax.random.PRNGKey(0), graphs, feat)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(params):
            logits = model.apply(params, graphs, feat,
                                 deterministic=False,
                                 rngs={"dropout": key})
            ll = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return jnp.where(train_mask, ll, 0.0).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, graphs, feat)
        pred = jnp.argmax(logits, axis=-1)
        correct = (pred == labels) & ~train_mask
        return correct.sum() / (~train_mask).sum()

    key = jax.random.PRNGKey(1)
    for epoch in range(args.epochs):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if (epoch + 1) % 20 == 0:
            print(f"epoch {epoch + 1:3d}  loss {float(loss):.4f}  "
                  f"test acc {float(evaluate(params)):.3f}")
    acc = float(evaluate(params))
    print(f"final test accuracy: {acc:.3f}")
    return acc


if __name__ == "__main__":
    main()
