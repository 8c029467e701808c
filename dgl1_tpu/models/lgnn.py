"""LGNN — line-graph neural network for community detection.

Parity: ``examples/pytorch/line_graph/gnn.py`` (Chen et al., supervised
community detection with line-graph GNNs): paired updates on the graph
and its non-backtracking line graph, coupled through the ``Pm+Pd``
incidence factor, with multi-scale adjacency powers. TPU notes: the
adjacency powers are repeated fused SpMMs; the ``Pm+Pd`` lift is a dense
(N, 2E) matmul that lands on the MXU (SBM community graphs are small and
dense enough that dense incidence beats a scatter).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dgl1_tpu.graph import Graph
from dgl1_tpu.ops import gspmm

__all__ = ["LGNN", "LGNNLayer", "LGNNCore"]


class LGNNCore(nn.Module):
    """One half of an LGNN layer: aggregate {identity, degree, adjacency
    powers A^(2^j), projected partner signal} and fuse with the
    half-linear / half-ReLU split of the reference."""

    out_feats: int
    radius: int = 2

    @nn.compact
    def __call__(self, g: Graph, x, pmpd_partner):
        result = nn.Dense(self.out_feats, name="theta_x")(x)
        deg = g.in_degrees().astype(x.dtype)[:, None]
        result += nn.Dense(self.out_feats, name="theta_deg")(deg * x)
        ax = x
        for j in range(self.radius):
            # A^(2^j) x by 2^j fused SpMM hops; mean-normalized so the
            # multi-scale inputs stay O(1) (the reference relies on BN to
            # absorb the degree^k growth — normalized hops optimize better
            # and cost the same fused kernel).
            for _ in range(2 ** j if j else 1):
                ax = gspmm(g, "copy_lhs", "mean", ax, None)
            result += nn.Dense(self.out_feats, name=f"theta_a{j}")(ax)
        result += nn.Dense(self.out_feats, name="theta_pmpd")(pmpd_partner)
        half = self.out_feats // 2
        result = jnp.concatenate(
            [result[:, :half], nn.relu(result[:, half:])], axis=1)
        return nn.LayerNorm(name="bn")(result)


class LGNNLayer(nn.Module):
    """Coupled (graph, line-graph) update (parity: the example's
    ``LGNNLayer``)."""

    out_feats: int
    radius: int = 2

    @nn.compact
    def __call__(self, g: Graph, lg: Graph, x, y, pm_pd):
        next_x = LGNNCore(self.out_feats, self.radius, name="g_core")(
            g, x, pm_pd @ y)
        next_y = LGNNCore(self.out_feats, self.radius, name="lg_core")(
            lg, y, pm_pd.T @ next_x)
        return next_x, next_y


class LGNN(nn.Module):
    """``LGNN(hidden, num_communities)``: stacked LGNN layers, degree
    inputs on both graphs, community logits per node."""

    hidden: int = 16
    communities: int = 2
    num_layers: int = 3
    radius: int = 2

    @nn.compact
    def __call__(self, g: Graph, lg: Graph, pm_pd):
        x = g.in_degrees().astype(jnp.float32)[:, None]
        y = lg.in_degrees().astype(jnp.float32)[:, None]
        for i in range(self.num_layers):
            x, y = LGNNLayer(self.hidden, self.radius, name=f"layer{i}")(
                g, lg, x, y, pm_pd)
        return nn.Dense(self.communities, name="classify")(x)
