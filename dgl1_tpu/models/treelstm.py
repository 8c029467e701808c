"""Tree-LSTM (Tai et al. 2015) on topological propagation.

Parity: ``examples/pytorch/tree_lstm/tree_lstm.py`` — the reference's
showcase for ``dgl.prop_nodes_topo`` and the degree-bucketed UDF reduce
path. Edges point child -> parent; the recurrence runs leaves-to-root
via :func:`dgl1_tpu.prop_nodes_topo`, with mailbox UDFs for the per-child
forget gates.

Two cells:

* ``ChildSumTreeLSTMCell`` — h̃ = Σ children h; one shared forget gate
  transform applied to each child independently.
* ``NAryTreeLSTMCell`` — fixed arity ``n_ary`` (2 for constituency
  trees); position-dependent U matrices over the concatenated child
  states. Relies on degree bucketing grouping all arity-``n`` interior
  nodes into one mailbox batch.

Divergence note: the reference's child-sum reduce overwrites ``iou`` with
``U_iou(h̃)`` (correct there because interior nodes carry no word, so
``W_iou x = 0`` under the mask); here the reduce *adds* to the stored
``W_iou x`` term, which is the paper's full formulation and identical
under the mask.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgl1_tpu.graph import Graph

__all__ = ["TreeLSTM", "ChildSumTreeLSTMCell", "NAryTreeLSTMCell"]


class ChildSumTreeLSTMCell(nn.Module):
    h_size: int

    def setup(self):
        self.W_iou = nn.Dense(3 * self.h_size, use_bias=False)
        self.U_iou = nn.Dense(3 * self.h_size, use_bias=False)
        self.b_iou = self.param("b_iou", nn.initializers.zeros,
                                (3 * self.h_size,))
        self.U_f = nn.Dense(self.h_size)

    def message_func(self, edges):
        return {"h": edges.src["h"], "c": edges.src["c"]}

    def reduce_func(self, nodes):
        h_tild = jnp.sum(nodes.mailbox["h"], axis=1)
        f = jax.nn.sigmoid(self.U_f(nodes.mailbox["h"]))
        c = jnp.sum(f * nodes.mailbox["c"], axis=1)
        return {"iou": nodes.data["iou"] + self.U_iou(h_tild), "c": c}

    def apply_node_func(self, nodes):
        iou = nodes.data["iou"] + self.b_iou
        i, o, u = jnp.split(iou, 3, axis=-1)
        i = jax.nn.sigmoid(i)
        o = jax.nn.sigmoid(o)
        u = jnp.tanh(u)
        c = i * u + nodes.data["c"]
        h = o * jnp.tanh(c)
        return {"h": h, "c": c}


class NAryTreeLSTMCell(nn.Module):
    h_size: int
    n_ary: int = 2

    def setup(self):
        self.W_iou = nn.Dense(3 * self.h_size, use_bias=False)
        self.U_iou = nn.Dense(3 * self.h_size, use_bias=False)
        self.b_iou = self.param("b_iou", nn.initializers.zeros,
                                (3 * self.h_size,))
        self.U_f = nn.Dense(self.n_ary * self.h_size)

    def message_func(self, edges):
        return {"h": edges.src["h"], "c": edges.src["c"]}

    def reduce_func(self, nodes):
        n, d = nodes.mailbox["h"].shape[:2]
        if d > self.n_ary:
            raise ValueError(
                f"NAryTreeLSTMCell(n_ary={self.n_ary}) got a node with "
                f"{d} children"
            )
        h_cat = nodes.mailbox["h"].reshape(n, d * self.h_size)
        if d < self.n_ary:  # ragged arity: zero-pad the child slots
            h_cat = jnp.pad(h_cat, ((0, 0),
                                    (0, (self.n_ary - d) * self.h_size)))
        f = jax.nn.sigmoid(self.U_f(h_cat)[:, : d * self.h_size])
        f = f.reshape(n, d, self.h_size)
        c = jnp.sum(f * nodes.mailbox["c"], axis=1)
        return {"iou": nodes.data["iou"] + self.U_iou(h_cat), "c": c}

    apply_node_func = ChildSumTreeLSTMCell.apply_node_func


class TreeLSTM(nn.Module):
    """Sentiment-style tree classifier: embed leaf tokens, run the
    Tree-LSTM recurrence leaves-to-root, classify every node's hidden
    state (parity: the reference SST example's ``TreeLSTM``)."""

    num_vocab: int
    x_size: int
    h_size: int
    num_classes: int
    dropout: float = 0.0
    cell_type: str = "childsum"  # or "nary"
    n_ary: int = 2

    @nn.compact
    def __call__(self, g: Graph, tokens, token_mask,
                 deterministic: bool = True, schedule=None):
        """``tokens``: (N,) int vocab ids (0 for interior nodes).
        ``token_mask``: (N,) 1.0 for leaf/word nodes, 0.0 otherwise.

        ``schedule``: a static topological schedule from
        ``dgl.topo_schedule(g)`` — switches the recurrence to the
        COMPILED level loop (one traced program, jit-safe; compute the
        schedule outside jit). Without it the eager host-scheduled
        frontier loop runs (reference parity)."""
        from dgl1_tpu import core

        if self.cell_type == "childsum":
            cell = ChildSumTreeLSTMCell(self.h_size)
        elif self.cell_type == "nary":
            cell = NAryTreeLSTMCell(self.h_size, self.n_ary)
        else:
            raise ValueError(self.cell_type)

        emb = nn.Embed(self.num_vocab, self.x_size, name="embedding")(tokens)
        if self.dropout > 0 and not deterministic:
            emb = nn.Dropout(self.dropout, deterministic=False)(emb)
        n = g.num_dst_nodes()
        g.ndata["iou"] = cell.W_iou(emb) * token_mask[:, None]
        g.ndata["h"] = jnp.zeros((n, self.h_size), emb.dtype)
        g.ndata["c"] = jnp.zeros((n, self.h_size), emb.dtype)
        # Materialize every cell parameter before the data-dependent
        # recurrence (flax init must see one call per submodule).
        _ = cell.U_iou(jnp.zeros((1, (self.n_ary if self.cell_type == "nary"
                                      else 1) * self.h_size)))
        _ = cell.U_f(jnp.zeros((1, (self.n_ary if self.cell_type == "nary"
                                    else 1) * self.h_size)))
        _ = cell.b_iou
        if schedule is not None:
            core.prop_nodes_topo_compiled(
                g, schedule, cell.message_func, cell.reduce_func,
                apply_node_func=cell.apply_node_func)
        else:
            core.prop_nodes_topo(g, cell.message_func, cell.reduce_func,
                                 apply_node_func=cell.apply_node_func)
        h = g.ndata.pop("h")
        g.ndata.pop("c", None)
        g.ndata.pop("iou", None)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        return nn.Dense(self.num_classes, name="cls")(h)
