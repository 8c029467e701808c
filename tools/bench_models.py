"""Model-level benchmark: full-graph train-step time for GCN / GAT.

Measures the full fwd+bwd+adam step (epochs chained inside one jitted
fori_loop with a scalar fetch — the only honest timing on a
remote-attached TPU, see docs/PERF_NOTES.md). Prints one JSON line per
config. Parity target: the reference's published per-epoch timings for
the same model configs (DGL paper, table 5-era numbers).

Usage: python tools/bench_models.py [--scale cora|arxiv] [--model gcn|gat|all]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax


def make_graph(scale: str):
    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import powerlaw_graph

    if scale == "cora":
        n, deg, in_f, classes = 2708, 4, 1433, 7
        g = dgl.rand_graph(n, n * deg, seed=0)
    elif scale == "pubmed":
        n, deg, in_f, classes = 19717, 5, 500, 3
        g = powerlaw_graph(n, deg, seed=0)
    else:  # ogbn-arxiv scale
        n, deg, in_f, classes = 169343, 26, 128, 40
        g = powerlaw_graph(n, deg, seed=0)
    g = dgl.add_self_loop(g)
    return g, n, in_f, classes


def bench(model_name: str, scale: str, epochs: int = 20,
          fwd_only: bool = False, huborder: bool = False,
          union: bool = False):
    import dgl1_tpu as dgl  # noqa: F401
    from dgl1_tpu.models import GAT, GCN, RGCN

    num_rels = 0
    if model_name == "rgcn":
        # BASELINE config #4 shape (ogbn-mag-style typed edges): the
        # per-relation SpMM runs as relation-bucketed grouped matmuls.
        import dgl1_tpu as dgl
        from dgl1_tpu.data.synthetic import powerlaw_graph

        n, in_f, classes, num_rels = 169343, 128, 40, 8
        g = powerlaw_graph(n, 26, seed=0)
        rng = np.random.default_rng(0)
        g.edata["etype"] = jnp.asarray(
            rng.integers(0, num_rels, size=g.num_edges_padded())
            .astype(np.int32))
        et_host = np.asarray(g.edata["etype"])[: g.num_edges()]
        union_g = None
        if union:
            # Stacked-source union path (dgl.typed_union_graph) — kept
            # for comparison; measured SLOWER than per-relation at R=8
            # (R x source-space streams; PERF_NOTES r6).
            union_g, _ = dgl.typed_union_graph(g, et_host, num_rels)
            assert union_g.hub_dst_meta.identity_expand
            rel_graphs = None
        elif huborder:
            # Identity-rate typed path (VERDICT r4 #2): per-relation
            # layouts with the parent's PINNED hub/tail geometry — all
            # R relations claim identity_expand (typed_subgraphs
            # identity=True; features/labels random, no data shuffle).
            rel_graphs, _ = dgl.typed_subgraphs(g, et_host, num_rels,
                                                identity=True)
            assert all(gr.hub_dst_meta.identity_expand
                       for gr in rel_graphs)
        else:
            rel_graphs = dgl.typed_subgraphs(g, et_host, num_rels)
    else:
        g, n, in_f, classes = make_graph(scale)
        rel_graphs = None
        union_g = None
        if huborder and g.hub_dst is not None:
            # Hub-first relabel: identity-expand layout for BOTH the
            # hub SpMM (fused-pad forward) and the attention merges
            # (mraw/num/den/ger concat instead of t_inv gathers).
            g = dgl.reorder_graph(g, node_permute_algo="hub")
            assert g.hub_dst_meta.identity_expand
    hidden = 256 if scale == "arxiv" else 64

    if model_name == "gcn":
        model = GCN(hidden_feats=hidden, out_feats=classes, dropout=0.0)
    elif model_name == "rgcn":
        model = RGCN(num_nodes=n, hidden_feats=64, out_feats=classes,
                     num_rels=num_rels, num_bases=4)
    else:
        model = GAT(hidden_feats=hidden // 8 if scale == "arxiv" else 8,
                    out_feats=classes, heads=8, feat_drop=0.0, attn_drop=0.0)

    etypes = g.edata.pop("etype", None)
    g = jax.device_put(g)
    jax.block_until_ready(jax.tree.leaves(g))
    feat = jax.random.normal(jax.random.PRNGKey(0), (n, in_f), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, classes)

    if model_name == "rgcn":
        etypes = jax.device_put(etypes)
        if union:
            union_g = jax.device_put(union_g)
            jax.block_until_ready(jax.tree.leaves(union_g))
        else:
            rel_graphs = jax.device_put(rel_graphs)
            jax.block_until_ready(jax.tree.leaves(rel_graphs))
        params = model.init(jax.random.PRNGKey(2), g, etypes, feat,
                            rel_graphs=rel_graphs, union_graph=union_g)
    else:
        params = model.init(jax.random.PRNGKey(2), g, feat)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    def loss_fn(params, g, rel_graphs, union_g):
        if model_name == "rgcn":
            # TPU-native per-relation path: no per-edge feature tensor.
            logits = model.apply(params, g, etypes, feat,
                                 rel_graphs=rel_graphs,
                                 union_graph=union_g)
        else:
            logits = model.apply(params, g, feat)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    @jax.jit
    def run(g, rel_graphs, union_g, params, opt_state):
        def body(i, carry):
            params, opt_state = carry
            if fwd_only:
                # Perturb one leaf by the loss so the chain can't hoist.
                leaves, tree = jax.tree.flatten(params)
                leaves[0] = leaves[0] + loss_fn(params, g, rel_graphs,
                                                union_g) * 1e-12
                return jax.tree.unflatten(tree, leaves), opt_state
            grads = jax.grad(loss_fn)(params, g, rel_graphs, union_g)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state

        return jax.lax.fori_loop(0, epochs, body, (params, opt_state))

    t0 = time.time()
    out = run(g, rel_graphs, union_g, params, opt_state)
    jax.block_until_ready(out)
    _ = float(jax.tree.leaves(out[0])[0].reshape(-1)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    out = run(g, rel_graphs, union_g, params, opt_state)
    _ = float(jax.tree.leaves(out[0])[0].reshape(-1)[0])
    dt = (time.time() - t0) / epochs

    print(json.dumps({
        "model": model_name + ("+union" if union else "")
        + ("+identity" if huborder and model_name == "rgcn" else ""),
        "scale": scale,
        "nodes": n, "edges": g.num_edges(), "hidden": hidden,
        "ms_per_epoch": round(dt * 1e3, 2),
        "epochs_per_s": round(1.0 / dt, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="arxiv",
                   choices=["cora", "pubmed", "arxiv"])
    p.add_argument("--model", default="all",
                   choices=["gcn", "gat", "rgcn", "all"])
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--precision", default="f32", choices=["f32", "bf16"],
                   help="MXU matmul precision for the hub/attention "
                        "kernels (ops/precision.py; bf16 verdict "
                        "measured in PERF_NOTES r4)")
    p.add_argument("--fwd-only", action="store_true",
                   help="time the forward pass only (no grad/adam)")
    p.add_argument("--huborder", action="store_true",
                   help="hub_order-relabel the graph first (identity-"
                        "expand layout; the preprocessing bench.py "
                        "applies to the power-law family)")
    p.add_argument("--union", action="store_true",
                   help="rgcn only: the identity-rate typed path — ONE "
                        "bipartite hub SpMM over the relation-stacked "
                        "source space (dgl.typed_union_graph) instead "
                        "of per-relation SpMMs (PERF_NOTES r6)")
    args = p.parse_args()
    if args.precision != "f32":
        from dgl1_tpu.ops import set_matmul_precision

        set_matmul_precision(args.precision)
    models = ["gcn", "gat"] if args.model == "all" else [args.model]
    for mname in models:
        bench(mname, args.scale, args.epochs, args.fwd_only,
              huborder=args.huborder, union=args.union)


if __name__ == "__main__":
    main()
