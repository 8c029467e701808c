"""Explainability (parity: ``python/dgl/nn/pytorch/explain/``)."""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
import optax

__all__ = ["GNNExplainer", "khop_in_subgraph"]


def khop_in_subgraph(g, node, k: int):
    """k-hop in-neighborhood subgraph around ``node`` (parity:
    ``dgl.khop_in_subgraph``). Returns (subgraph, new_center_id);
    original ids in ``ndata['_ID']`` / ``edata['_ID']``."""
    from dgl1_tpu.transform import node_subgraph

    e = g.num_edges()
    src = np.asarray(g.src)[:e]
    dst = np.asarray(g.dst)[:e]
    seen = {int(node)}
    frontier = {int(node)}
    for _ in range(k):
        mask = np.isin(dst, list(frontier))
        frontier = set(src[mask].tolist()) - seen
        if not frontier:
            break
        seen |= frontier
    nodes = np.sort(np.asarray(list(seen), np.int64))
    sg = node_subgraph(g, nodes)
    center = int(np.searchsorted(nodes, int(node)))
    return sg, center


class GNNExplainer:
    """Learn soft edge and feature masks that preserve the model's
    prediction (parity: ``explain/gnnexplainer.py``, "GNNExplainer:
    Generating Explanations for Graph Neural Networks").

    ``model_fn(graph, feat, eweight) -> logits`` — the model must accept
    a per-edge weight vector (multiply messages by ``eweight``), the
    same contract the reference imposes. The mask optimization is one
    jitted optax-adam loop (static shapes; runs on device).
    """

    def __init__(self, model_fn: Callable, num_hops: int, lr: float = 0.01,
                 num_epochs: int = 100, alpha1: float = 0.005,
                 alpha2: float = 1.0, beta1: float = 1.0,
                 beta2: float = 0.1):
        self.model_fn = model_fn
        self.num_hops = num_hops
        self.lr = lr
        self.num_epochs = num_epochs
        self.alpha1, self.alpha2 = alpha1, alpha2
        self.beta1, self.beta2 = beta1, beta2

    def _optimize(self, g, feat, target_fn, rng):
        ne = g.src.shape[0]  # padded edge count
        nf = feat.shape[-1]
        k1, k2 = jax.random.split(rng)
        params = {
            "edge_mask": 0.1 * jax.random.normal(k1, (ne,)),
            "feat_mask": 0.1 * jax.random.normal(k2, (1, nf)),
        }
        opt = optax.adam(self.lr)

        def loss_fn(p):
            em = jax.nn.sigmoid(p["edge_mask"])
            fm = jax.nn.sigmoid(p["feat_mask"])
            logits = self.model_fn(g, feat * fm, em)
            pred_loss = target_fn(logits)
            eps = 1e-15
            ent_e = -(em * jnp.log(em + eps)
                      + (1 - em) * jnp.log(1 - em + eps)).mean()
            ent_f = -(fm * jnp.log(fm + eps)
                      + (1 - fm) * jnp.log(1 - fm + eps)).mean()
            return (pred_loss + self.alpha1 * em.sum()
                    + self.alpha2 * ent_e + self.beta1 * fm.mean()
                    + self.beta2 * ent_f)

        @jax.jit
        def run(params):
            state = opt.init(params)

            def body(i, carry):
                params, state = carry
                grads = jax.grad(loss_fn)(params)
                updates, state = opt.update(grads, state)
                return optax.apply_updates(params, updates), state

            params, _ = jax.lax.fori_loop(0, self.num_epochs, body,
                                          (params, state))
            return params

        p = run(params)
        return (jax.nn.sigmoid(p["feat_mask"][0]),
                jax.nn.sigmoid(p["edge_mask"]))

    def explain_node(self, node_id, g, feat, rng=None):
        """Returns (new_center, subgraph, feat_mask (F,), edge_mask (E,))
        for the k-hop in-subgraph around ``node_id``."""
        sg, center = khop_in_subgraph(g, node_id, self.num_hops)
        sub_feat = feat[np.asarray(sg.ndata["_ID"])]
        rng = rng if rng is not None else jax.random.PRNGKey(0)

        base = self.model_fn(sg, sub_feat, jnp.ones(sg.src.shape[0]))
        target = int(jnp.argmax(base[center]))

        def target_fn(logits):
            logp = jax.nn.log_softmax(logits[center])
            return -logp[target]

        fm, em = self._optimize(sg, sub_feat, target_fn, rng)
        return center, sg, fm, em[: sg.num_edges()]

    def explain_graph(self, g, feat, rng=None):
        """Graph-level explanation: masks that preserve the graph-level
        prediction. ``model_fn`` gets the full graph; its output is
        treated as (num_classes,) or (1, num_classes)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        base = self.model_fn(g, feat, jnp.ones(g.src.shape[0]))
        base = base.reshape(-1)
        target = int(jnp.argmax(base))

        def target_fn(logits):
            logp = jax.nn.log_softmax(logits.reshape(-1))
            return -logp[target]

        fm, em = self._optimize(g, feat, target_fn, rng)
        return fm, em[: g.num_edges()]
