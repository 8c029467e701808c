"""R-GCN entity classification (BASELINE config #4 track; parity:
``examples/pytorch/rgcn/entity_classify.py`` on AIFB-style data).

TPU-native: by default the typed aggregation runs one dense projection
+ one SpMM per relation over static per-relation subgraphs
(``dgl.typed_subgraphs``) — no per-edge feature tensor exists at any
point. ``--grouped-gemm`` switches to the edge-sorted grouped-GEMM path
(``segment_mm`` -> ``lax.ragged_dot``), the direct analog of the
reference's per-edge typed projection.
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--num-bases", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--identity", action="store_true",
                   help="identity-rate typed layouts: "
                        "typed_subgraphs(identity=True) relabels nodes "
                        "hub-first and pins every relation's hub layout "
                        "to the shared numbering, skipping the "
                        "descriptor expand (PERF_NOTES r6; R-GCN "
                        "mag-scale 23.7 -> 20.0 ms/epoch)")
    p.add_argument("--grouped-gemm", action="store_true",
                   help="per-edge grouped-GEMM path instead of the "
                        "per-relation SpMM fast path")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.models import RGCN

    ds = dgl.data.AIFBDataset()
    g = ds[0]
    print(f"[data] aifb{'(synthetic)' if ds.is_synthetic else ''}: "
          f"{g.num_nodes()} nodes, {g.num_edges()} edges, "
          f"{ds.num_rels} relations")

    # Sort edges by relation so the typed matmul is a grouped GEMM.
    etypes = np.asarray(g.edata["etype"])
    order = np.argsort(etypes, kind="stable")
    e = g.num_edges()
    src = np.asarray(g.src)[:e][order]
    dst = np.asarray(g.dst)[:e][order]
    etypes = etypes[order]
    g2 = dgl.graph((src, dst), num_nodes=g.num_nodes())
    counts = jnp.asarray(
        np.bincount(etypes, minlength=ds.num_rels).astype(np.int32)
    )
    etypes_j = jnp.asarray(etypes.astype(np.int32))
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"]
    test_mask = g.ndata["test_mask"]
    if args.identity and not args.grouped_gemm:
        rel_graphs, perm = dgl.typed_subgraphs(g2, etypes, ds.num_rels,
                                               identity=True)
        n_ident = sum(1 for gr in rel_graphs
                      if gr.hub_dst_meta is not None
                      and gr.hub_dst_meta.identity_expand)
        print(f"[identity] {n_ident}/{ds.num_rels} relations on the "
              f"identity layout")
        # Node-aligned data rides the hub-first relabel.
        pj = jnp.asarray(perm)
        labels = jnp.take(labels, pj, axis=0)
        train_mask = jnp.take(train_mask, pj, axis=0)
        test_mask = jnp.take(test_mask, pj, axis=0)
    elif args.grouped_gemm:
        rel_graphs = None
    else:
        rel_graphs = dgl.typed_subgraphs(g2, etypes, ds.num_rels)
    num_classes = int(np.asarray(labels).max()) + 1

    model = RGCN(num_nodes=g.num_nodes(), hidden_feats=args.hidden,
                 out_feats=num_classes, num_rels=ds.num_rels,
                 num_bases=args.num_bases)
    params = model.init(jax.random.PRNGKey(0), g2, etypes_j,
                        presorted=args.grouped_gemm, etype_counts=counts,
                        rel_graphs=rel_graphs)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(params):
        logits = model.apply(params, g2, etypes_j,
                             presorted=args.grouped_gemm,
                             etype_counts=counts, rel_graphs=rel_graphs)
        logp = jax.nn.log_softmax(logits)
        m = train_mask.astype(jnp.float32)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        return jnp.sum(ce * m) / jnp.sum(m)

    @jax.jit
    def train_step(params, opt_state):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, g2, etypes_j,
                             presorted=args.grouped_gemm,
                             etype_counts=counts, rel_graphs=rel_graphs)
        pred = jnp.argmax(logits, axis=1)
        correct = (pred == labels).astype(jnp.float32)

        def acc(mask):
            m = mask.astype(jnp.float32)
            return jnp.sum(correct * m) / jnp.maximum(jnp.sum(m), 1.0)

        return acc(train_mask), acc(test_mask)

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        params, opt_state, loss = train_step(params, opt_state)
        if (epoch + 1) % 10 == 0 or epoch == 0:
            tr, te = evaluate(params)
            print(f"epoch {epoch + 1:3d} loss {float(loss):.4f} "
                  f"train {float(tr):.4f} test {float(te):.4f}")
    print(f"done in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
