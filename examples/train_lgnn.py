"""LGNN community detection on SBM mixtures.

Parity: ``examples/pytorch/line_graph/train.py`` — supervised community
detection with a line-graph GNN; the loss is permutation-invariant over
community relabelings (min over label permutations).
"""

from __future__ import annotations

import argparse
import itertools
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--graphs", type=int, default=60)
    p.add_argument("--nodes", type=int, default=60)
    p.add_argument("--communities", type=int, default=2)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    from dgl1_tpu.data import SBMMixtureDataset
    from dgl1_tpu.models import LGNN

    ds = SBMMixtureDataset(args.graphs, args.nodes, args.communities,
                           avg_deg=8.0, pq=2.0, seed=0)
    print(f"[data] SBM mixture: {len(ds)} graphs, {args.nodes} nodes, "
          f"{args.communities} communities")

    model = LGNN(hidden=args.hidden, communities=args.communities)
    g0, lg0, pm_pd0 = ds[0]
    params = model.init(jax.random.PRNGKey(0), g0, lg0, pm_pd0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    perms = list(itertools.permutations(range(args.communities)))
    perms = jnp.asarray(np.asarray(perms))

    def perm_invariant_loss(logits, labels):
        logp = jax.nn.log_softmax(logits)
        # (P,) losses, one per community relabeling; take the min.
        losses = jax.vmap(
            lambda pm: -jnp.mean(
                jnp.take_along_axis(logp, pm[labels][:, None], axis=1))
        )(perms)
        return jnp.min(losses)

    @jax.jit
    def train_step(params, opt_state, g, lg, pm_pd, labels):
        def loss_fn(p):
            return perm_invariant_loss(model.apply(p, g, lg, pm_pd), labels)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def overlap(params, g, lg, pm_pd, labels):
        pred = jnp.argmax(model.apply(params, g, lg, pm_pd), axis=1)
        accs = jax.vmap(lambda pm: jnp.mean(pm[pred] == labels))(perms)
        return jnp.max(accs)

    n_train = max(len(ds) - max(len(ds)//6, 1), 1)
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        total = 0.0
        for i in range(n_train):
            g, lg, pm_pd = ds[i]
            labels = jnp.asarray(ds.labels[i].astype(np.int32))
            params, opt_state, loss = train_step(
                params, opt_state, g, lg, pm_pd, labels)
            total += float(loss)
        dt = time.perf_counter() - t0
        print(f"epoch {epoch} loss {total / n_train:.4f} ({dt:.2f}s)")

    accs = []
    for i in range(n_train, len(ds)):
        g, lg, pm_pd = ds[i]
        labels = jnp.asarray(ds.labels[i].astype(np.int32))
        accs.append(float(overlap(params, g, lg, pm_pd, labels)))
    print(f"held-out community overlap: {np.mean(accs):.4f}")


if __name__ == "__main__":
    main()
