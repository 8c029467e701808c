"""GGNN on a bAbI-style graph reasoning task (parity:
``examples/pytorch/ggnn`` — Li et al. gated graph neural networks on the
bAbI graph tasks).

Task (bAbI 18-flavoured reachability): random directed graphs with two
edge types; one node is marked as the source; the model must label every
node as reachable / not reachable from the source following type-0 edges
only. This is the canonical GGNN setting: propagation must route
information along directed typed edges for multiple steps, which the GRU
update does and a plain GCN cannot.

TPU-native: graphs are padded to a fixed (N, E) budget at generation
time so the jitted train step compiles exactly once; edge types feed the
``gather_mm`` grouped GEMM inside ``GatedGraphConv``.
"""

from __future__ import annotations

import argparse
import time


def gen_task(rng, n_graphs, n_nodes, n_edges, n_steps):
    """Directed random graphs, 2 edge types; label = reachability from a
    random source within n_steps hops over type-0 edges."""
    import numpy as np

    srcs = rng.integers(0, n_nodes, size=(n_graphs, n_edges))
    dsts = rng.integers(0, n_nodes, size=(n_graphs, n_edges))
    etypes = rng.integers(0, 2, size=(n_graphs, n_edges))
    roots = rng.integers(0, n_nodes, size=n_graphs)
    labels = np.zeros((n_graphs, n_nodes), np.int32)
    for i in range(n_graphs):
        reach = np.zeros(n_nodes, bool)
        reach[roots[i]] = True
        s, d = srcs[i], dsts[i]
        keep = etypes[i] == 0
        for _ in range(n_steps):
            new = reach[s] & keep
            reach[d[new]] = True
        labels[i] = reach
    return srcs, dsts, etypes, roots, labels


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-graphs", type=int, default=256)
    p.add_argument("--nodes", type=int, default=16)
    p.add_argument("--edges", type=int, default=28)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--epochs", type=int, default=60)
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
    from dgl1_tpu.nn import GatedGraphConv

    rng = np.random.default_rng(0)
    srcs, dsts, etypes, roots, labels = gen_task(
        rng, args.num_graphs, args.nodes, args.edges, args.steps)
    n_train = int(0.8 * args.num_graphs)
    print(f"[data] bAbI-style reachability: {args.num_graphs} graphs, "
        f"{args.nodes} nodes, {args.edges} typed edges, "
        f"positive rate {labels.mean():.2f}")

    # Every graph has the same static (N, E): build once per graph, all
    # compiled under one XLA program (the graph structure is a jit arg).
    graphs = [dgl.graph((srcs[i], dsts[i]), num_nodes=args.nodes)
              for i in range(args.num_graphs)]
    et = jnp.asarray(etypes)
    onehot_root = np.zeros((args.num_graphs, args.nodes, 1), np.float32)
    onehot_root[np.arange(args.num_graphs), roots, 0] = 1.0
    x = jnp.asarray(onehot_root)
    y = jnp.asarray(labels)

    class GGNN(nn.Module):
        @nn.compact
        def __call__(self, g, feat, et):
            h = GatedGraphConv(out_feats=args.hidden,
                               n_steps=args.steps + 1,
                               n_etypes=2)(g, feat, et)
            # Output model conditions on the original annotation too
            # (Li et al. eq. 7 concatenates h_v and x_v).
            h = jnp.concatenate([h, feat], axis=-1)
            h = nn.relu(nn.Dense(args.hidden)(h))
            return nn.Dense(2)(h)

    model = GGNN()
    params = model.init(jax.random.PRNGKey(0), graphs[0], x[0], et[0])
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, st, g, feat, ets, lab):
        def loss_fn(p):
            logits = model.apply(p, g, feat, ets)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, lab).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, st = opt.update(grads, st)
        return optax.apply_updates(p, updates), st, loss

    @jax.jit
    def accuracy(p, g, feat, ets, lab):
        logits = model.apply(p, g, feat, ets)
        return jnp.mean(jnp.argmax(logits, -1) == lab)

    for epoch in range(1, args.epochs + 1):
        t0 = time.perf_counter()
        tot = 0.0
        for i in range(n_train):
            params, opt_state, loss = train_step(
                params, opt_state, graphs[i], x[i], et[i], y[i])
            tot += float(loss)
        if epoch % 10 == 0 or epoch == 1:
            print(f"epoch {epoch:3d} loss {tot / n_train:.4f} "
                  f"({time.perf_counter() - t0:.1f}s)")

    accs = [float(accuracy(params, graphs[i], x[i], et[i], y[i]))
            for i in range(n_train, args.num_graphs)]
    acc = float(np.mean(accs))
    print(f"[ggnn] test node accuracy {acc:.3f}")
    assert acc > 0.9, f"gate failed: acc {acc:.3f} <= 0.9"
    print("gate passed: accuracy > 0.9")


if __name__ == "__main__":
    main()
