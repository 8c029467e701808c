"""DiffPool graph classification on MiniGC (parity:
``examples/pytorch/diffpool``).

Hierarchical pooling: a DenseSAGEConv embed branch and a DenseSAGEConv
assignment branch; the soft cluster assignment S coarsens the graph
(A' = S^T A S, X' = S^T Z) before a second embed + readout. Graphs are
padded to a static max size with a node mask (the TPU-native batched
dense tier — MiniGC graphs are tiny, so the dense form IS the fast
form on the MXU).

Usage: python examples/train_diffpool.py [--cpu]
"""

from __future__ import annotations

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-graphs", type=int, default=400)
    p.add_argument("--min-nv", type=int, default=10)
    p.add_argument("--max-nv", type=int, default=20)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--clusters", type=int, default=6)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=5e-3)
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
    from dgl1_tpu.nn import DenseSAGEConv

    ds = dgl.data.MiniGCDataset(args.num_graphs, args.min_nv, args.max_nv,
                                seed=0)
    # Some topology classes round node counts up (hypercube, ladder) —
    # pad to the realized maximum.
    N = max(ds[i][0].num_nodes() for i in range(len(ds)))
    adjs = np.zeros((len(ds), N, N), np.float32)
    feats = np.zeros((len(ds), N, 2), np.float32)
    masks = np.zeros((len(ds), N), np.float32)
    labels = np.zeros((len(ds),), np.int32)
    for i in range(len(ds)):
        g, y = ds[i]
        n, e = g.num_nodes(), g.num_edges()
        src = np.asarray(g.src)[:e]
        dst = np.asarray(g.dst)[:e]
        adjs[i, dst, src] = 1.0
        deg = np.diff(np.asarray(g.csc_indptr))
        feats[i, :n, 0] = deg / max(args.max_nv - 1, 1)
        feats[i, :n, 1] = 1.0
        masks[i, :n] = 1.0
        labels[i] = y

    BSAGE = nn.vmap(DenseSAGEConv, in_axes=(0, 0), out_axes=0,
                    variable_axes={"params": None},
                    split_rngs={"params": False})

    class DiffPool(nn.Module):
        @nn.compact
        def __call__(self, adj, x, mask):
            z = jax.nn.relu(BSAGE(args.hidden, name="embed1")(adj, x))
            s_logit = BSAGE(args.clusters, name="assign1")(adj, x)
            # Padded nodes must not contribute to any cluster.
            s = jax.nn.softmax(s_logit, axis=-1) * mask[..., None]
            a2 = jnp.einsum("bnk,bnm,bml->bkl", s, adj, s)
            x2 = jnp.einsum("bnk,bnf->bkf", s, z)
            z2 = jax.nn.relu(BSAGE(args.hidden, name="embed2")(a2, x2))
            h = jnp.concatenate([z2.mean(axis=1), z2.max(axis=1)], axis=-1)
            h = jax.nn.relu(nn.Dense(args.hidden)(h))
            return nn.Dense(ds.num_classes)(h)

    rng = np.random.default_rng(0)
    perm = rng.permutation(len(ds))
    n_train = int(0.8 * len(ds))
    tr, te = perm[:n_train], perm[n_train:]

    model = DiffPool()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(adjs[:2]),
                        jnp.asarray(feats[:2]), jnp.asarray(masks[:2]))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    data = {k: jnp.asarray(v) for k, v in
            dict(adj=adjs, x=feats, m=masks, y=labels).items()}
    tr_j, te_j = jnp.asarray(tr), jnp.asarray(te)

    @jax.jit
    def train_step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, data["adj"][tr_j], data["x"][tr_j],
                                 data["m"][tr_j])
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(
                logp, data["y"][tr_j][:, None], axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    @jax.jit
    def accuracy(params, ix):
        logits = model.apply(params, data["adj"][ix], data["x"][ix],
                             data["m"][ix])
        return jnp.mean(
            (jnp.argmax(logits, axis=1) == data["y"][ix]).astype(
                jnp.float32))

    import time

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        params, opt_state, loss = train_step(params, opt_state)
        if (epoch + 1) % 50 == 0 or epoch == 0:
            print(f"epoch {epoch + 1:4d} loss {float(loss):.4f} "
                  f"train acc {float(accuracy(params, tr_j)):.3f} "
                  f"test acc {float(accuracy(params, te_j)):.3f}")
    acc = float(accuracy(params, te_j))
    print(f"done in {time.perf_counter() - t0:.1f}s; test acc {acc:.3f}")
    if acc < 0.5:  # 8-class problem, chance = 0.125
        raise SystemExit(f"SIGNAL GATE FAILED: DiffPool test acc {acc:.3f}")
    print("signal gate passed")


if __name__ == "__main__":
    main()
