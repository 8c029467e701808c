"""Graph convolution modules (flax.linen).

Parity: ``python/dgl/nn/pytorch/conv/*.py`` — same math, same defaults,
functional API. Each docstring cites the reference module it mirrors.
All modules lower to the fused op layer (:mod:`dgl1_tpu.ops`), so they run
on the Pallas kernels on TPU and the XLA engine elsewhere.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from dgl1_tpu import function as fn
from dgl1_tpu.graph import Graph
from dgl1_tpu.ops import gspmm, gsddmm
from dgl1_tpu.ops.edge_softmax import edge_softmax
from dgl1_tpu.ops.segment import gather_mm, segment_mm

__all__ = [
    "GraphConv",
    "GATConv",
    "DotGatConv",
    "SAGEConv",
    "RelGraphConv",
    "GINConv",
    "SGConv",
    "APPNPConv",
    "TAGConv",
    "ChebConv",
    "EdgeConv",
    "GatedGraphConv",
    "AGNNConv",
    "NNConv",
    "DenseGraphConv",
    "DenseSAGEConv",
    "DenseChebConv",
    "CFConv",
    "GATv2Conv",
    "EGATConv",
    "EdgeGATConv",
    "GCN2Conv",
    "PNAConv",
    "HGTConv",
    "EdgeWeightNorm",
]


def _split_feat(feat):
    """DGL modules accept a single tensor or an (src, dst) pair (blocks)."""
    if isinstance(feat, (tuple, list)):
        return feat[0], feat[1]
    return feat, feat


def _dst_slice(g: Graph, feat):
    """On a block, the first num_dst rows of the src feature are the dst
    nodes (to_block puts seeds first)."""
    if g.is_block:
        return feat[: g.num_dst_nodes()]
    return feat


class GraphConv(nn.Module):
    """GCN layer (parity: ``python/dgl/nn/pytorch/conv/graphconv.py``).

    out = sigma( D^-1/2 A D^-1/2 X W + b ) for norm='both'.
    """

    out_feats: int
    norm: str = "both"
    use_weight: bool = True
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, feat, edge_weight=None):
        if self.norm not in ("both", "right", "left", "none"):
            raise ValueError(f"invalid norm {self.norm!r}")
        feat_src, _ = _split_feat(feat)

        if self.norm in ("both", "left"):
            deg = g.out_degrees().astype(feat_src.dtype)
            power = -0.5 if self.norm == "both" else -1.0
            norm = jnp.where(deg > 0, deg, 1.0) ** power
            feat_src = feat_src * norm[: feat_src.shape[0], None]

        # Per-edge scalar weights (parity: graphconv.py edge_weight; the
        # GNNExplainer mask contract): u_mul_e instead of copy_u.
        def agg(x):
            if edge_weight is None:
                return gspmm(g, "copy_lhs", "sum", x, None)
            ew = edge_weight.reshape(-1, *([1] * (x.ndim - 1)))
            return gspmm(g, "mul", "sum", x, ew)

        in_feats = feat_src.shape[-1]
        if self.use_weight:
            dense = nn.Dense(self.out_feats, use_bias=False, name="weight")
            if in_feats > self.out_feats:
                # mult-order optimization (reference does the same): project
                # first when it shrinks the aggregated width.
                rst = agg(dense(feat_src))
            else:
                rst = dense(agg(feat_src))
        else:
            rst = agg(feat_src)

        if self.norm in ("both", "right"):
            deg = g.in_degrees().astype(rst.dtype)
            power = -0.5 if self.norm == "both" else -1.0
            norm = jnp.where(deg > 0, deg, 1.0) ** power
            rst = rst * norm[:, None]

        if self.use_bias:
            rst = rst + self.param(
                "bias", nn.initializers.zeros, (self.out_feats,)
            )
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class EdgeWeightNorm:
    """Normalize scalar edge weights for weighted-GCN aggregation
    (parity: ``python/dgl/nn/pytorch/conv/graphconv.py :: EdgeWeightNorm``).

    norm='both':  c_ij = w_ij / sqrt(out_w(i) * in_w(j))
    norm='right': c_ij = w_ij / in_w(j)

    where in_w/out_w are the weighted in/out degrees. Stateless (no
    parameters), so it is a plain callable rather than a flax module.
    The reference raises DGLError on non-positive weights under
    norm='both'; that check is data-dependent so it cannot run under jit
    — it runs on the EAGER path (concrete ``edge_weight``), while traced
    callers get the jit-safe clamp of zero-weighted degree products
    (isolated nodes contribute nothing either way).
    """

    def __init__(self, norm: str = "both", eps: float = 0.0):
        if norm not in ("both", "right"):
            raise ValueError(f"invalid norm {norm!r}")
        self.norm = norm
        self.eps = eps

    def __call__(self, g: Graph, edge_weight: jnp.ndarray) -> jnp.ndarray:
        w = edge_weight
        if self.norm == "both" and not isinstance(
                w, jax.core.Tracer):
            import numpy as _np

            real = _np.asarray(w)[: g.num_edges()]
            if (real <= 0).any():
                raise ValueError(
                    "EdgeWeightNorm: non-positive edge weights are not "
                    "allowed with norm='both' (reference parity)")
        # Weighted in-degree per destination (copy_e + sum).
        in_w = gspmm(g, "copy_rhs", "sum", None, w) + self.eps
        src, dst = g.edges()
        if self.norm == "right":
            denom = jnp.where(in_w > 0, in_w, 1.0)
            out = w / denom[dst]
        else:
            out_w = gspmm(g.reverse(copy_edata=False), "copy_rhs", "sum",
                          None, w) + self.eps
            prod = out_w[src] * in_w[dst]
            out = w / jnp.sqrt(jnp.where(prod > 0, prod, 1.0))
        # Padded edge slots clamp-gather arbitrary degrees: zero them so
        # the per-edge output is clean when inspected directly.
        return jnp.where(g.edge_mask, out, 0.0)


class GATConv(nn.Module):
    """Graph attention layer (parity:
    ``python/dgl/nn/pytorch/conv/gatconv.py``): fc -> per-edge u_add_v
    logits -> leaky_relu -> edge_softmax -> weighted SpMM, multi-head.
    """

    out_feats: int
    num_heads: int = 1
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h_src, h_dst = _split_feat(feat)
        h_src = nn.Dropout(self.feat_drop, deterministic=deterministic)(h_src)
        h_dst = nn.Dropout(self.feat_drop, deterministic=deterministic)(h_dst)

        H, F = self.num_heads, self.out_feats
        feat_src = nn.Dense(H * F, use_bias=False, name="fc")(h_src)
        feat_src = feat_src.reshape(-1, H, F)
        if g.is_block:
            feat_dst = feat_src[: g.num_dst_nodes()]
        else:
            feat_dst = feat_src

        attn_l = self.param(
            "attn_l", nn.initializers.xavier_normal(), (1, H, F)
        )
        attn_r = self.param(
            "attn_r", nn.initializers.xavier_normal(), (1, H, F)
        )
        el = jnp.sum(feat_src * attn_l, axis=-1, keepdims=True)  # (N,H,1)
        er = jnp.sum(feat_dst * attn_r, axis=-1, keepdims=True)

        # Fused flash-style attention on hub-format graphs: the whole
        # SDDMM -> leaky_relu -> edge_softmax -> weighted-SpMM chain in
        # chunked MXU passes, no per-edge (E, H) tensor in HBM (those
        # pad 16x on TPU and OOM large graphs). Attention dropout runs
        # IN KERNEL (per-edge masks hashed from a step seed + edge id),
        # so training with attn_drop keeps the fused path too.
        from dgl1_tpu.ops.attention import can_fuse_attention, gat_attention

        rst = None
        if can_fuse_attention(g):
            drop = 0.0 if deterministic else self.attn_drop
            seed = None
            if drop > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), -(2 ** 31), 2 ** 31 - 1,
                    dtype=jnp.int32)
            rst = gat_attention(g, el, er, feat_src,
                                self.negative_slope, drop, seed)
        if rst is None and (deterministic or self.attn_drop == 0.0):
            # Hub-free graphs carrying the block-dense layout: exact
            # row-blocked attention (ops/battention.py) — still no
            # per-edge (E, H) tensor in HBM.
            from dgl1_tpu.ops.battention import bdense_gat_attention

            rst = bdense_gat_attention(g, el, er, feat_src,
                                       self.negative_slope)
        if rst is None:
            e = gsddmm(g, "add", el, er, lhs_target="u", rhs_target="v")
            e = nn.leaky_relu(e, negative_slope=self.negative_slope)
            a = edge_softmax(g, e)
            a = nn.Dropout(self.attn_drop, deterministic=deterministic)(a)
            rst = gspmm(g, "mul", "sum", feat_src, a)  # (N_dst,H,F)

        if self.residual:
            res = nn.Dense(H * F, use_bias=False, name="res_fc")(h_dst)
            rst = rst + res.reshape(-1, H, F)
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros, (1, H, F))
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class DotGatConv(nn.Module):
    """Dot-product attention conv (parity:
    ``python/dgl/nn/pytorch/conv/dotgatconv.py``): shared fc ->
    scaled u_dot_v logits -> edge_softmax -> weighted SpMM.
    """

    out_feats: int
    num_heads: int = 1

    @nn.compact
    def __call__(self, g: Graph, feat):
        h_src, h_dst = _split_feat(feat)
        H, F = self.num_heads, self.out_feats
        fc = nn.Dense(H * F, use_bias=False, name="fc")
        feat_src = fc(h_src).reshape(-1, H, F)
        if g.is_block:
            feat_dst = feat_src[: g.num_dst_nodes()]
        else:
            feat_dst = fc(h_dst).reshape(-1, H, F)

        e = gsddmm(g, "dot", feat_src, feat_dst,
                   lhs_target="u", rhs_target="v")  # (E, H, 1)
        a = edge_softmax(g, e / jnp.sqrt(jnp.asarray(F, feat_src.dtype)))
        return gspmm(g, "mul", "sum", feat_src, a)  # (N_dst, H, F)


class SAGEConv(nn.Module):
    """GraphSAGE layer (parity: ``python/dgl/nn/pytorch/conv/sageconv.py``).

    aggregator_type: 'mean' | 'gcn' | 'pool' | 'lstm'.
    """

    out_feats: int
    aggregator_type: str = "mean"
    feat_drop: float = 0.0
    use_bias: bool = True
    norm: Optional[Callable] = None
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]
        drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
        h_src = drop(h_src)
        h_dst = drop(h_dst)

        agg = self.aggregator_type
        if agg == "mean":
            h_neigh = gspmm(g, "copy_lhs", "mean", h_src, None)
            h_neigh = nn.Dense(self.out_feats, use_bias=False,
                               name="fc_neigh")(h_neigh)
        elif agg == "gcn":
            s = gspmm(g, "copy_lhs", "sum", h_src, None)
            deg = g.in_degrees().astype(h_src.dtype)[:, None]
            h_neigh = (s + h_dst) / (deg + 1.0)
            h_neigh = nn.Dense(self.out_feats, use_bias=False,
                               name="fc_neigh")(h_neigh)
        elif agg == "pool":
            h_pool = nn.relu(
                nn.Dense(h_src.shape[-1], name="fc_pool")(h_src)
            )
            h_neigh = gspmm(g, "copy_lhs", "max", h_pool, None)
            h_neigh = nn.Dense(self.out_feats, use_bias=False,
                               name="fc_neigh")(h_neigh)
        elif agg == "lstm":
            # Neighbor-sequence LSTM over the degree-bucketed ELL layout:
            # each bucket is a dense (rows, k, F) sequence batch, shorter
            # real degrees handled via seq_lengths; final hidden state is
            # the aggregation (parity: sageconv.py _lstm_reducer).
            if g.ell_dst is None:
                raise ValueError("lstm aggregator requires ELL layout")
            cell = nn.OptimizedLSTMCell(features=h_src.shape[-1],
                                        name="lstm")
            rnn = nn.RNN(cell, name="lstm_rnn")
            idx = g.ell_dst["idx"]
            outs = []
            off = 0
            for k, n_b in g.ell_dst_meta:
                sl = idx[off:off + n_b * k]
                seq = jnp.take(h_src, sl, axis=0, mode="clip").reshape(
                    n_b, k, -1)
                valid = (sl < (1 << 29)).reshape(n_b, k)
                seq = jnp.where(valid[..., None], seq, 0.0)
                lengths = jnp.maximum(valid.sum(axis=1), 1)
                ys = rnn(seq, seq_lengths=lengths)
                last = jnp.take_along_axis(
                    ys, (lengths - 1)[:, None, None].astype(jnp.int32),
                    axis=1,
                )[:, 0]
                outs.append(last)
                off += n_b * k
            stacked = (jnp.concatenate(outs, axis=0) if outs else
                       jnp.zeros((0, h_src.shape[-1])))
            h_neigh = jnp.take(stacked, g.ell_dst["inv_perm"], axis=0,
                               mode="fill", fill_value=0.0)
            h_neigh = nn.Dense(self.out_feats, use_bias=False,
                               name="fc_neigh")(h_neigh)
        else:
            raise ValueError(f"invalid aggregator {agg!r}")

        if agg == "gcn":
            rst = h_neigh
        else:
            rst = nn.Dense(self.out_feats, use_bias=False, name="fc_self")(
                h_dst
            ) + h_neigh
        if self.use_bias:
            rst = rst + self.param(
                "bias", nn.initializers.zeros, (self.out_feats,)
            )
        if self.activation is not None:
            rst = self.activation(rst)
        if self.norm is not None:
            rst = self.norm(rst)
        return rst


class RelGraphConv(nn.Module):
    """Relational GCN layer (parity:
    ``python/dgl/nn/pytorch/conv/relgraphconv.py``).

    Per-relation weights with optional basis decomposition; messages are
    ``h[src] @ W[etype]``. TPU-native: when edges are sorted by relation
    (``presorted=True``, pass per-relation counts as ``etype_counts``), the
    per-edge matmul is a grouped GEMM on the MXU via ``segment_mm``
    (= ``jax.lax.ragged_dot``); otherwise a one-hot ``gather_mm``.
    """

    in_feats: int
    out_feats: int
    num_rels: int
    regularizer: Optional[str] = None  # None | 'basis'
    num_bases: int = 0
    use_bias: bool = True
    activation: Optional[Callable] = None
    self_loop: bool = True
    dropout: float = 0.0

    def _weights(self):
        if self.regularizer == "basis":
            basis = self.param(
                "basis",
                nn.initializers.xavier_uniform(),
                (self.num_bases, self.in_feats, self.out_feats),
            )
            coeff = self.param(
                "coeff",
                nn.initializers.xavier_uniform(),
                (self.num_rels, self.num_bases),
            )
            return jnp.einsum("rb,bio->rio", coeff, basis)
        if self.regularizer is None:
            return self.param(
                "weight",
                nn.initializers.xavier_uniform(),
                (self.num_rels, self.in_feats, self.out_feats),
            )
        raise ValueError(f"unsupported regularizer {self.regularizer!r}")

    @nn.compact
    def __call__(self, g: Graph, feat, etypes=None, norm=None, *,
                 presorted: bool = False, etype_counts=None,
                 rel_graphs=None, union_graph=None,
                 deterministic: bool = True):
        weight = self._weights()  # (R, in, out)
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]

        if union_graph is not None:
            # Identity-rate typed path (``dgl.typed_union_graph``): ONE
            # bipartite hub SpMM over the relation-stacked source space
            # — the stacked per-relation projections ride the source
            # axis (Z[r*N + s] = (X W_r)[s]), so a single identity-
            # expand layout serves every relation where per-relation
            # layouts structurally cannot share one (VERDICT r4 #2;
            # reference: relgraphconv.py segment-matmul + gspmm).
            z = jnp.einsum("nf,rfo->rno", h_src, weight).reshape(
                self.num_rels * h_src.shape[0], self.out_feats)
            rst = gspmm(union_graph, "copy_lhs", "sum", z, None)
            if norm is not None:
                rst = rst * norm
        elif rel_graphs is not None:
            # TPU-native path (``transform.typed_subgraphs``): one dense
            # projection + one hub/ELL SpMM per relation — no per-edge
            # (E, F) feature tensor is ever materialized (the reference's
            # per-edge ``h[src] @ W[etype]`` costs one gathered row per
            # edge, the dominant cost on TPU). ``norm``, if given, must
            # be per-destination (num_dst, 1) — per-edge norms need the
            # generic path.
            rst = 0.0
            for r, gr in enumerate(rel_graphs):
                if self.out_feats <= self.in_feats:
                    # Project first: the SpMM moves the narrower tensor.
                    rst = rst + gspmm(gr, "copy_lhs", "sum",
                                      h_src @ weight[r], None)
                else:
                    rst = rst + gspmm(gr, "copy_lhs", "sum",
                                      h_src, None) @ weight[r]
            if norm is not None:
                rst = rst * norm
        else:
            # Per-edge typed projection of the source feature.
            h_edge_in = gsddmm(g, "copy_lhs", h_src, None, lhs_target="u")
            if presorted:
                if etype_counts is None:
                    raise ValueError("presorted=True requires etype_counts")
                msg = segment_mm(h_edge_in, weight, etype_counts)
            else:
                msg = gather_mm(h_edge_in, weight, etypes)
            if norm is not None:
                msg = msg * norm
            rst = gspmm(g, "copy_rhs", "sum", None, msg)

        if self.self_loop:
            w_loop = self.param(
                "loop_weight",
                nn.initializers.xavier_uniform(),
                (self.in_feats, self.out_feats),
            )
            rst = rst + h_dst @ w_loop
        if self.use_bias:
            rst = rst + self.param(
                "h_bias", nn.initializers.zeros, (self.out_feats,)
            )
        if self.activation is not None:
            rst = self.activation(rst)
        return nn.Dropout(self.dropout, deterministic=deterministic)(rst)


class GINConv(nn.Module):
    """Graph isomorphism network layer (parity: ``ginconv.py``):
    h' = apply_func((1 + eps) * h + aggregate(neighbors))."""

    apply_func: Optional[Callable] = None
    aggregator_type: str = "sum"
    init_eps: float = 0.0
    learn_eps: bool = False

    @nn.compact
    def __call__(self, g: Graph, feat):
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]
        if self.aggregator_type not in ("sum", "max", "mean"):
            raise ValueError(f"invalid aggregator {self.aggregator_type!r}")
        agg = gspmm(g, "copy_lhs", self.aggregator_type, h_src, None)
        if self.learn_eps:
            eps = self.param(
                "eps", nn.initializers.constant(self.init_eps), ()
            )
        else:
            eps = self.init_eps
        rst = (1.0 + eps) * h_dst + agg
        if self.apply_func is not None:
            rst = self.apply_func(rst)
        return rst


def _gcn_norm_spmm(g: Graph, feat):
    """One symmetric-normalized propagation step D^-1/2 A D^-1/2 X."""
    deg_out = g.out_degrees().astype(feat.dtype)
    deg_in = g.in_degrees().astype(feat.dtype)
    norm_src = jnp.where(deg_out > 0, deg_out, 1.0) ** -0.5
    norm_dst = jnp.where(deg_in > 0, deg_in, 1.0) ** -0.5
    x = feat * norm_src[:, None]
    x = gspmm(g, "copy_lhs", "sum", x, None)
    return x * norm_dst[:, None]


class SGConv(nn.Module):
    """Simplified GCN (parity: ``sgconv.py``): (Ahat)^k X W."""

    out_feats: int
    k: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat):
        x = feat
        for _ in range(self.k):
            x = _gcn_norm_spmm(g, x)
        return nn.Dense(self.out_feats, use_bias=self.use_bias, name="fc")(x)


class APPNPConv(nn.Module):
    """Approximate personalized propagation (parity: ``appnpconv.py``):
    h_{t+1} = (1-alpha) Ahat h_t + alpha h_0."""

    k: int = 10
    alpha: float = 0.1
    edge_drop: float = 0.0

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h0 = feat
        h = feat
        for _ in range(self.k):
            h = (1.0 - self.alpha) * _gcn_norm_spmm(g, h) + self.alpha * h0
        return h


class TAGConv(nn.Module):
    """Topology-adaptive GCN (parity: ``tagconv.py``):
    sum_k (Ahat)^k X W_k implemented as one Dense over concatenated hops."""

    out_feats: int
    k: int = 2
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, feat):
        hops = [feat]
        x = feat
        for _ in range(self.k):
            x = _gcn_norm_spmm(g, x)
            hops.append(x)
        rst = nn.Dense(self.out_feats, use_bias=self.use_bias, name="lin")(
            jnp.concatenate(hops, axis=-1)
        )
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class ChebConv(nn.Module):
    """Chebyshev spectral conv (parity: ``chebconv.py``), lambda_max=2
    approximation on the symmetric-normalized Laplacian."""

    out_feats: int
    k: int = 2
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, lambda_max: float = 2.0):
        # Scaled Laplacian: L_hat = 2/lambda_max * (I - Ahat) - I.
        def l_hat(x):
            return (2.0 / lambda_max) * (x - _gcn_norm_spmm(g, x)) - x

        t_prev = feat
        t_cur = l_hat(feat)
        terms = [t_prev] + ([t_cur] if self.k > 1 else [])
        for _ in range(2, self.k):
            t_next = 2.0 * l_hat(t_cur) - t_prev
            terms.append(t_next)
            t_prev, t_cur = t_cur, t_next
        return nn.Dense(self.out_feats, use_bias=self.use_bias, name="fc")(
            jnp.concatenate(terms, axis=-1)
        )


class EdgeConv(nn.Module):
    """EdgeConv from DGCNN (parity: ``edgeconv.py``):
    h' = max_e theta(h_u - h_v) + phi(h_v)."""

    out_feats: int

    @nn.compact
    def __call__(self, g: Graph, feat):
        h_src, h_dst = _split_feat(feat)
        diff = gsddmm(g, "sub", h_src, h_dst, lhs_target="u", rhs_target="v")
        theta = nn.Dense(self.out_feats, name="theta")(diff)
        phi = nn.Dense(self.out_feats, name="phi")(h_dst)
        phi_e = gsddmm(g, "copy_lhs", phi, None, lhs_target="v")
        return gspmm(g, "copy_rhs", "max", None, theta + phi_e)


class GatedGraphConv(nn.Module):
    """Gated graph conv (parity: ``gatedgraphconv.py``): n_steps of
    GRU(h, sum_neighbors W_etype h)."""

    out_feats: int
    n_steps: int = 1
    n_etypes: int = 1

    @nn.compact
    def __call__(self, g: Graph, feat, etypes=None):
        n = feat.shape[0]
        if feat.shape[-1] < self.out_feats:
            feat = jnp.pad(
                feat, ((0, 0), (0, self.out_feats - feat.shape[-1]))
            )
        weight = self.param(
            "weight",
            nn.initializers.xavier_uniform(),
            (self.n_etypes, self.out_feats, self.out_feats),
        )
        gru = nn.GRUCell(features=self.out_feats, name="gru")
        h = feat
        for _ in range(self.n_steps):
            src_h = gsddmm(g, "copy_lhs", h, None, lhs_target="u")
            if self.n_etypes == 1 or etypes is None:
                msg = src_h @ weight[0]
            else:
                msg = gather_mm(src_h, weight, etypes)
            a = gspmm(g, "copy_rhs", "sum", None, msg)
            h, _ = gru(h, a)  # GRUCell returns (new_carry, out); out == carry
        return h


class AGNNConv(nn.Module):
    """Attention-based GNN (parity: ``agnnconv.py``): cosine-similarity
    attention with learnable temperature beta."""

    init_beta: float = 1.0
    learn_beta: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat):
        h_src, h_dst = _split_feat(feat)
        if self.learn_beta:
            beta = self.param(
                "beta", nn.initializers.constant(self.init_beta), ()
            )
        else:
            beta = self.init_beta
        norm_src = h_src / jnp.maximum(
            jnp.linalg.norm(h_src, axis=-1, keepdims=True), 1e-12
        )
        norm_dst = h_dst / jnp.maximum(
            jnp.linalg.norm(h_dst, axis=-1, keepdims=True), 1e-12
        )
        cos = gsddmm(g, "dot", norm_src, norm_dst, lhs_target="u",
                     rhs_target="v")
        a = edge_softmax(g, beta * cos)
        return gspmm(g, "mul", "sum", h_src, a)


class NNConv(nn.Module):
    """Edge-conditioned conv (parity: ``nnconv.py``): message =
    reshape(edge_func(e)) @ h_src."""

    in_feats: int
    out_feats: int
    edge_func: Callable = None
    aggregator_type: str = "mean"

    @nn.compact
    def __call__(self, g: Graph, feat, efeat):
        h_src, h_dst = _split_feat(feat)
        w = self.edge_func(efeat).reshape(-1, self.in_feats, self.out_feats)
        src_h = gsddmm(g, "copy_lhs", h_src, None, lhs_target="u")
        msg = jnp.einsum("ei,eio->eo", src_h, w)
        rst = gspmm(g, "copy_rhs", self.aggregator_type, None, msg)
        rst = rst + nn.Dense(self.out_feats, use_bias=False, name="res_fc")(
            h_dst
        )
        return rst + self.param(
            "bias", nn.initializers.zeros, (self.out_feats,)
        )


class DenseGraphConv(nn.Module):
    """GraphConv on a dense adjacency (parity: ``densegraphconv.py``)."""

    out_feats: int
    norm: str = "both"
    use_bias: bool = True

    @nn.compact
    def __call__(self, adj, feat):
        adj = adj.astype(feat.dtype)
        if self.norm == "both":
            deg_out = jnp.maximum(adj.sum(axis=0), 1.0) ** -0.5
            deg_in = jnp.maximum(adj.sum(axis=1), 1.0) ** -0.5
            feat = feat * deg_out[:, None]
        h = nn.Dense(self.out_feats, use_bias=False, name="weight")(feat)
        rst = adj @ h
        if self.norm == "both":
            rst = rst * deg_in[:, None]
        elif self.norm == "right":
            rst = rst / jnp.maximum(adj.sum(axis=1, keepdims=True), 1.0)
        if self.use_bias:
            rst = rst + self.param(
                "bias", nn.initializers.zeros, (self.out_feats,)
            )
        return rst


class DenseSAGEConv(nn.Module):
    """SAGEConv (mean) on a dense adjacency (parity: ``densesageconv.py``)."""

    out_feats: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, adj, feat):
        adj = adj.astype(feat.dtype)
        h_neigh = (adj @ feat) / jnp.maximum(
            adj.sum(axis=1, keepdims=True), 1.0
        )
        return nn.Dense(self.out_feats, use_bias=self.use_bias, name="fc")(
            jnp.concatenate([feat, h_neigh], axis=-1)
        )


class GMMConv(nn.Module):
    """Gaussian mixture model conv / MoNet (parity: ``gmmconv.py``):
    per-edge pseudo-coordinates weighted by K learned gaussians."""

    in_feats: int
    out_feats: int
    dim: int  # pseudo-coordinate dimensionality
    n_kernels: int
    aggregator_type: str = "sum"

    @nn.compact
    def __call__(self, g: Graph, feat, pseudo):
        h_src, h_dst = _split_feat(feat)
        mu = self.param("mu", nn.initializers.normal(0.1),
                        (self.n_kernels, self.dim))
        inv_sigma = self.param("inv_sigma", nn.initializers.ones,
                               (self.n_kernels, self.dim))
        # Gaussian weights per edge/kernel: (E, K).
        diff = pseudo[:, None, :] - mu[None, :, :]
        w = jnp.exp(-0.5 * jnp.sum((diff * inv_sigma[None]) ** 2, axis=-1))
        # Per-kernel projections of source features, mixed by w.
        proj = nn.Dense(self.n_kernels * self.out_feats, use_bias=False,
                        name="fc")(h_src)
        proj = proj.reshape(-1, self.n_kernels, self.out_feats)
        src_e = gsddmm(g, "copy_lhs", proj, None, lhs_target="u")
        msg = jnp.sum(src_e * w[..., None], axis=1)
        return gspmm(g, "copy_rhs", self.aggregator_type, None, msg)


class DenseChebConv(nn.Module):
    """Chebyshev spectral conv on a dense adjacency (parity:
    ``python/dgl/nn/pytorch/conv/densechebconv.py``): K Chebyshev
    polynomial terms of the scaled normalized Laplacian, each with its own
    projection — K dense MXU matmuls."""

    out_feats: int
    k: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, adj, feat, lambda_max: float = 2.0):
        adj = adj.astype(feat.dtype)
        n = adj.shape[0]
        deg = jnp.maximum(adj.sum(axis=1), 1.0) ** -0.5
        lap = jnp.eye(n, dtype=feat.dtype) - deg[:, None] * adj * deg[None, :]
        lap_hat = (2.0 / lambda_max) * lap - jnp.eye(n, dtype=feat.dtype)
        t_prev, t_cur = feat, None
        out = nn.Dense(self.out_feats, use_bias=False, name="W_0")(t_prev)
        if self.k > 1:
            t_cur = lap_hat @ feat
            out = out + nn.Dense(self.out_feats, use_bias=False,
                                 name="W_1")(t_cur)
        for i in range(2, self.k):
            t_next = 2.0 * (lap_hat @ t_cur) - t_prev
            out = out + nn.Dense(self.out_feats, use_bias=False,
                                 name=f"W_{i}")(t_next)
            t_prev, t_cur = t_cur, t_next
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_feats,)
            )
        return out


def shifted_softplus(x):
    """ssp(x) = ln(1 + e^x) - ln 2 (SchNet nonlinearity)."""
    return jax.nn.softplus(x) - jnp.log(2.0)


class CFConv(nn.Module):
    """Continuous-filter conv from SchNet (parity:
    ``python/dgl/nn/pytorch/conv/cfconv.py``): an edge-feature filter
    network modulates projected source features; sum-aggregate."""

    hidden_feats: int
    out_feats: int

    @nn.compact
    def __call__(self, g: Graph, node_feat, edge_feat):
        h_src, _ = _split_feat(node_feat)
        h = nn.Dense(self.hidden_feats, use_bias=False,
                     name="project_node")(h_src)
        w = nn.Dense(self.hidden_feats, name="filter_1")(edge_feat)
        w = shifted_softplus(w)
        w = nn.Dense(self.hidden_feats, name="filter_2")(w)
        w = shifted_softplus(w)
        rst = gspmm(g, "mul", "sum", h, w)
        rst = nn.Dense(self.out_feats, name="project_out1")(rst)
        rst = shifted_softplus(rst)
        return rst


class AtomicConv(nn.Module):
    """Atomic convolution (ACNN) layer (parity:
    ``python/dgl/nn/pytorch/conv/atomicconv.py``): per-edge radial
    pooling of interatomic distances with learnable (mean, std, cutoff)
    per radial filter, then per-atom-type sum aggregation.

    ``interaction_cutoffs``/``rbf_kernel_means``/``rbf_kernel_scaling``
    are (K,) arrays defining K radial filters; ``features_to_use`` lists
    the atomic numbers (Z values) to one-hot against, giving an output of
    shape (N, len(features_to_use) * K) like the reference.
    """

    interaction_cutoffs: tuple
    rbf_kernel_means: tuple
    rbf_kernel_scaling: tuple
    features_to_use: tuple = (1.0,)

    @nn.compact
    def __call__(self, g: Graph, feat, distances):
        # Radial filters on each edge distance.
        cut = jnp.asarray(self.interaction_cutoffs)    # (K,)
        mu = jnp.asarray(self.rbf_kernel_means)        # (K,)
        beta = jnp.asarray(self.rbf_kernel_scaling)    # (K,)
        d = distances.reshape(-1, 1)                   # (E, 1)
        rbf = jnp.exp(-beta[None, :] * (d - mu[None, :]) ** 2)  # (E, K)
        # Smooth cosine cutoff, zero beyond the interaction cutoff.
        inside = (d <= cut[None, :]).astype(rbf.dtype)
        env = 0.5 * (jnp.cos(jnp.pi * d / jnp.maximum(cut[None, :], 1e-6))
                     + 1.0)
        e_feat = rbf * env * inside                    # (E, K)
        # One-hot the source atom types against features_to_use.
        h_src, _ = _split_feat(feat)
        z = h_src.reshape(-1, 1)                       # (N, 1) atomic numbers
        types = jnp.asarray(self.features_to_use)      # (T,)
        onehot = (jnp.abs(z - types[None, :]) < 1e-6).astype(e_feat.dtype)
        # For every (type t, filter k): sum_e onehot[src_e, t]*e_feat[e, k]
        # = one fused u_mul_e SpMM with an outer-product edge weight.
        ue = gspmm(g, "mul", "sum",
                   onehot[:, :, None],                  # (N, T, 1)
                   e_feat[:, None, :])                  # (E, 1, K)
        return ue.reshape(-1, onehot.shape[1] * e_feat.shape[1])


class GATv2Conv(nn.Module):
    """GATv2 layer (parity: ``python/dgl/nn/pytorch/conv/gatv2conv.py``).

    "How Attentive are GATs?" — the attention vector is applied AFTER the
    nonlinearity on the combined features, making the attention function
    on each edge a universal approximator:
    ``e_ij = a^T leaky_relu(W_l h_i + W_r h_j)``.
    """

    out_feats: int
    num_heads: int = 1
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    share_weights: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]
        drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
        h_src, h_dst = drop(h_src), drop(h_dst)

        H, F = self.num_heads, self.out_feats
        fc_src = nn.Dense(H * F, use_bias=self.use_bias, name="fc_src")
        feat_src = fc_src(h_src).reshape(-1, H, F)
        if self.share_weights:
            feat_dst = (feat_src[: g.num_dst_nodes()]
                        if g.is_block else feat_src)
        else:
            feat_dst = nn.Dense(H * F, use_bias=self.use_bias,
                                name="fc_dst")(h_dst).reshape(-1, H, F)

        # (E, H, F) combined features, nonlinearity BEFORE the attn dot.
        eij = gsddmm(g, "add", feat_src, feat_dst,
                     lhs_target="u", rhs_target="v")
        eij = nn.leaky_relu(eij, negative_slope=self.negative_slope)
        attn = self.param("attn", nn.initializers.xavier_normal(),
                          (1, H, F))
        e = jnp.sum(eij * attn, axis=-1, keepdims=True)  # (E, H, 1)
        a = edge_softmax(g, e)
        a = nn.Dropout(self.attn_drop, deterministic=deterministic)(a)
        rst = gspmm(g, "mul", "sum", feat_src, a)

        if self.residual:
            res = nn.Dense(H * F, use_bias=False, name="res_fc")(h_dst)
            rst = rst + res.reshape(-1, H, F)
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class EGATConv(nn.Module):
    """GAT with edge features, returns (node_out, edge_out) (parity:
    ``python/dgl/nn/pytorch/conv/egatconv.py``):
    ``f_ij = leaky_relu(A h_i + B h_j + C f_ij)`` becomes both the new
    edge feature and (dotted with a per-head vector) the attention logit.
    """

    out_node_feats: int
    out_edge_feats: int
    num_heads: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, efeat):
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]
        H, Fn, Fe = self.num_heads, self.out_node_feats, self.out_edge_feats

        f_ni = nn.Dense(H * Fe, use_bias=self.use_bias,
                        name="fc_ni")(h_src).reshape(-1, H, Fe)
        f_nj = nn.Dense(H * Fe, use_bias=self.use_bias,
                        name="fc_nj")(h_dst).reshape(-1, H, Fe)
        f_fij = nn.Dense(H * Fe, use_bias=self.use_bias,
                         name="fc_fij")(efeat).reshape(-1, H, Fe)
        f_tmp = gsddmm(g, "add", f_ni, f_nj,
                       lhs_target="u", rhs_target="v") + f_fij
        f_out = nn.leaky_relu(f_tmp, negative_slope=0.2)

        attn = self.param("attn", nn.initializers.xavier_normal(),
                          (1, H, Fe))
        e = jnp.sum(f_out * attn, axis=-1, keepdims=True)
        a = edge_softmax(g, e)
        feat_src = nn.Dense(H * Fn, use_bias=self.use_bias,
                            name="fc_node")(h_src).reshape(-1, H, Fn)
        h_out = gspmm(g, "mul", "sum", feat_src, a)
        return h_out, f_out


class EdgeGATConv(nn.Module):
    """GAT whose logits AND messages incorporate edge features (parity:
    ``python/dgl/nn/pytorch/conv/edgegatconv.py``): edge features are
    projected per head and added to the source term of both the
    attention logit and the message.
    """

    out_feats: int
    num_heads: int = 1
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = True
    activation: Optional[Callable] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, efeat, deterministic: bool = True):
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]
        drop = nn.Dropout(self.feat_drop, deterministic=deterministic)
        h_src, h_dst = drop(h_src), drop(h_dst)

        H, F = self.num_heads, self.out_feats
        feat_src = nn.Dense(H * F, use_bias=False,
                            name="fc")(h_src).reshape(-1, H, F)
        feat_dst = (feat_src[: g.num_dst_nodes()] if g.is_block
                    else feat_src)
        feat_edge = nn.Dense(H * F, use_bias=False,
                             name="fc_edge")(efeat).reshape(-1, H, F)

        attn_l = self.param("attn_l", nn.initializers.xavier_normal(),
                            (1, H, F))
        attn_r = self.param("attn_r", nn.initializers.xavier_normal(),
                            (1, H, F))
        attn_e = self.param("attn_e", nn.initializers.xavier_normal(),
                            (1, H, F))
        el = jnp.sum(feat_src * attn_l, axis=-1, keepdims=True)
        er = jnp.sum(feat_dst * attn_r, axis=-1, keepdims=True)
        ee = jnp.sum(feat_edge * attn_e, axis=-1, keepdims=True)
        e = gsddmm(g, "add", el, er, lhs_target="u", rhs_target="v") + ee
        e = nn.leaky_relu(e, negative_slope=self.negative_slope)
        a = edge_softmax(g, e)
        a = nn.Dropout(self.attn_drop, deterministic=deterministic)(a)
        # Message: (W h_u + W_e e_uv), weighted by attention.
        msg = gsddmm(g, "copy_lhs", feat_src, None,
                     lhs_target="u") + feat_edge
        rst = gspmm(g, "copy_rhs", "sum", None, msg * a)

        if self.residual:
            res = nn.Dense(H * F, use_bias=False, name="res_fc")(h_dst)
            rst = rst + res.reshape(-1, H, F)
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros,
                                   (1, H, F))
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class GCN2Conv(nn.Module):
    """GCNII layer (parity: ``python/dgl/nn/pytorch/conv/gcn2conv.py``):
    initial residual + identity mapping,
    ``H' = ((1-a) P H + a H0)((1-b) I + b W)``, ``b = ln(lam/l + 1)``.
    ``in_feats`` must equal ``out_feats`` (square weight).
    """

    layer: int = 1
    alpha: float = 0.1
    lambda_: float = 1.0
    project_initial_features: bool = False
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, g: Graph, feat, feat_0):
        import math

        beta = math.log(self.lambda_ / self.layer + 1.0)
        # Symmetric normalization (GraphConv norm='both').
        deg_out = jnp.maximum(g.out_degrees().astype(feat.dtype), 1.0)
        deg_in = jnp.maximum(g.in_degrees().astype(feat.dtype), 1.0)
        h = feat * (deg_out ** -0.5)[:, None]
        h = gspmm(g, "copy_lhs", "sum", h, None)
        h = h * (deg_in ** -0.5)[:, None]

        h = (1.0 - self.alpha) * h
        h0 = self.alpha * feat_0
        w = nn.Dense(feat.shape[-1], use_bias=self.use_bias, name="fc")
        if self.project_initial_features:
            # One shared weight for smoothed + initial terms.
            rst = (1.0 - beta) * (h + h0) + beta * w(h + h0)
        else:
            w0 = nn.Dense(feat.shape[-1], use_bias=self.use_bias,
                          name="fc_0")
            rst = (1.0 - beta) * (h + h0) + beta * (w(h) + w0(h0))
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class PNAConv(nn.Module):
    """Principal Neighbourhood Aggregation (parity:
    ``python/dgl/nn/pytorch/conv/pnaconv.py``): multiple aggregators x
    degree scalers, tower decomposition, mixing linear.

    aggregators: subset of {'mean','max','min','std','var','sum'};
    scalers: subset of {'identity','amplification','attenuation'};
    ``delta``: avg log-degree of the training graphs.
    """

    out_feats: int
    aggregators: Tuple[str, ...] = ("mean", "max", "min", "std")
    scalers: Tuple[str, ...] = ("identity", "amplification", "attenuation")
    delta: float = 1.0
    num_towers: int = 1
    dropout: float = 0.0
    residual: bool = True

    @nn.compact
    def __call__(self, g: Graph, feat, deterministic: bool = True):
        h_src, h_dst = _split_feat(feat)
        if not isinstance(feat, (tuple, list)) and g.is_block:
            h_dst = h_src[: g.num_dst_nodes()]
        fin = h_src.shape[-1]
        if fin % self.num_towers:
            raise ValueError("in_feats must divide num_towers")

        # Aggregations are tower-independent: compute once on full width.
        aggs = []
        mean = None
        for name in self.aggregators:
            if name == "mean":
                mean = gspmm(g, "copy_lhs", "mean", h_src, None)
                aggs.append(mean)
            elif name == "sum":
                aggs.append(gspmm(g, "copy_lhs", "sum", h_src, None))
            elif name == "max":
                aggs.append(gspmm(g, "copy_lhs", "max", h_src, None))
            elif name == "min":
                aggs.append(gspmm(g, "copy_lhs", "min", h_src, None))
            elif name in ("var", "std"):
                if mean is None:
                    mean = gspmm(g, "copy_lhs", "mean", h_src, None)
                sq = gspmm(g, "copy_lhs", "mean", h_src * h_src, None)
                var = jnp.maximum(sq - mean * mean, 0.0)
                aggs.append(jnp.sqrt(var + 1e-5) if name == "std" else var)
            else:
                raise ValueError(f"unknown aggregator {name!r}")
        h_agg = jnp.concatenate(aggs, axis=-1)  # (N, A*fin)

        deg = jnp.maximum(g.in_degrees().astype(h_agg.dtype), 1.0)
        logd = jnp.log(deg + 1.0)[:, None]
        scaled = []
        for name in self.scalers:
            if name == "identity":
                scaled.append(h_agg)
            elif name == "amplification":
                scaled.append(h_agg * (logd / self.delta))
            elif name == "attenuation":
                scaled.append(h_agg * (self.delta / jnp.maximum(logd,
                                                                1e-5)))
            else:
                raise ValueError(f"unknown scaler {name!r}")
        h_cat = jnp.concatenate(scaled, axis=-1)  # (N, S*A*fin)

        # Towers: split input and aggregate widths, per-tower U linear on
        # [h_dst_tower || aggregated_tower], then mixing across towers.
        T = self.num_towers
        A, S = len(self.aggregators), len(self.scalers)
        tw_in, tw_out = fin // T, self.out_feats // T
        h_cat = h_cat.reshape(-1, S * A, fin)
        outs = []
        for t in range(T):
            part = h_cat[:, :, t * tw_in:(t + 1) * tw_in].reshape(
                h_cat.shape[0], -1)
            inp = jnp.concatenate(
                [h_dst[:, t * tw_in:(t + 1) * tw_in], part], axis=-1)
            outs.append(nn.Dense(tw_out, name=f"tower_{t}")(inp))
        rst = jnp.concatenate(outs, axis=-1)
        rst = nn.Dense(self.out_feats, name="mixing")(rst)
        rst = nn.Dropout(self.dropout, deterministic=deterministic)(rst)
        if self.residual and h_dst.shape[-1] == self.out_feats:
            rst = rst + h_dst
        return rst


class HGTConv(nn.Module):
    """Heterogeneous Graph Transformer layer (parity:
    ``python/dgl/nn/pytorch/conv/hgtconv.py``): operates on a homogeneous
    graph carrying integer node/edge type arrays (the reference's
    calling convention). Per-type Q/K/V projections (TypedLinear),
    per-relation attention/message transforms and priority scaling,
    edge softmax, typed output projection with a learnable skip gate.
    """

    in_size: int
    head_size: int
    num_heads: int
    num_ntypes: int
    num_etypes: int
    dropout: float = 0.2
    use_norm: bool = False

    @nn.compact
    def __call__(self, g: Graph, x, ntype, etype,
                 deterministic: bool = True):
        from dgl1_tpu.nn.linear import TypedLinear

        H, D = self.num_heads, self.head_size
        q = TypedLinear(self.in_size, H * D, self.num_ntypes,
                        name="linear_q")(x, ntype).reshape(-1, H, D)
        k = TypedLinear(self.in_size, H * D, self.num_ntypes,
                        name="linear_k")(x, ntype).reshape(-1, H, D)
        v = TypedLinear(self.in_size, H * D, self.num_ntypes,
                        name="linear_v")(x, ntype).reshape(-1, H, D)

        rel_att = self.param("relation_att",
                             nn.initializers.xavier_uniform(),
                             (self.num_etypes, H, D, D))
        rel_msg = self.param("relation_msg",
                             nn.initializers.xavier_uniform(),
                             (self.num_etypes, H, D, D))
        rel_pri = self.param("relation_pri", nn.initializers.ones,
                             (self.num_etypes, H))

        # Per-edge K/V with the relation transform folded in (one-hot
        # mixture over etypes; R is small in practice).
        k_e = gsddmm(g, "copy_lhs", k, None, lhs_target="u")  # (E,H,D)
        v_e = gsddmm(g, "copy_lhs", v, None, lhs_target="u")
        q_e = gsddmm(g, "copy_rhs", None, q, rhs_target="v")
        et = jnp.asarray(etype)
        if et.shape[0] < k_e.shape[0]:  # pad to the padded edge count
            et = jnp.concatenate(
                [et, jnp.zeros((k_e.shape[0] - et.shape[0],), et.dtype)])
        oh = jax.nn.one_hot(et, self.num_etypes, dtype=k_e.dtype)
        kt = jnp.einsum("er,ehd,rhdf->ehf", oh, k_e, rel_att)
        mt = jnp.einsum("er,ehd,rhdf->ehf", oh, v_e, rel_msg)
        pri = oh @ rel_pri  # (E, H)
        logits = jnp.sum(kt * q_e, axis=-1) * pri / (D ** 0.5)  # (E,H)
        a = edge_softmax(g, logits[..., None])
        a = nn.Dropout(self.dropout, deterministic=deterministic)(a)
        h_agg = gspmm(g, "copy_rhs", "sum", None, mt * a)  # (N,H,D)

        h = nn.gelu(h_agg.reshape(-1, H * D))
        h = TypedLinear(H * D, H * D, self.num_ntypes,
                        name="linear_a")(h, ntype)
        alpha = jax.nn.sigmoid(
            self.param("skip", nn.initializers.ones, (self.num_ntypes,)))
        alpha = alpha[ntype][:, None]
        if x.shape == h.shape:
            h = alpha * h + (1.0 - alpha) * x
        if self.use_norm:
            h = nn.LayerNorm(name="norm")(h)
        return h
