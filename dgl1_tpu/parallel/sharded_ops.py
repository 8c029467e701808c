"""Sharded sparse ops: halo exchange + local aggregation inside shard_map.

The TPU-native replacement for DistDGL's RPC pull + NCCL allreduce split
(SURVEY.md §2.3 "communication backend"): remote source features travel as
ONE ``all_to_all`` over the ICI mesh axis per layer, then aggregation is a
purely local segment reduction over the destination-owned edges. XLA
overlaps the all_to_all with the local-edge portion of the gather when
scheduling allows; gradients transpose automatically (all_to_all is its
own transpose with swapped axes, gather <-> scatter-add).

These helpers are written to be called INSIDE ``jax.shard_map`` with mesh
axis ``axis_name`` (the per-device view: leading P axis of size 1).
:func:`make_sharded_gcn_matvec` wraps the whole thing for callers that
just want ``y = normalized-adjacency @ x`` as a jittable sharded function.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dgl1_tpu.parallel.halo import PartitionedGraph

__all__ = [
    "halo_exchange",
    "sharded_gspmm",
    "make_sharded_gcn_matvec",
    "local_spmm_sum",
]


def halo_exchange(pg: PartitionedGraph, feat_local: jnp.ndarray,
                  axis_name: str = "p") -> jnp.ndarray:
    """Per-device: gather owned rows into send blocks and all_to_all them.

    ``feat_local``: (n_loc, F) this device's owned features. Returns the
    combined (n_loc + P*m_halo, F) feature table that local edge ``esrc``
    indices point into.
    """
    send_idx = pg.send_idx  # inside shard_map: (1, P, m_halo)
    sbuf = jnp.take(feat_local, send_idx[0], axis=0, mode="clip")
    # (P, m_halo, F) -> exchanged -> (P, m_halo, F) where [q] is from q.
    rbuf = jax.lax.all_to_all(sbuf, axis_name, split_axis=0, concat_axis=0)
    halo = rbuf.reshape((-1,) + feat_local.shape[1:])
    return jnp.concatenate([feat_local, halo], axis=0)


def local_spmm_sum(pg: PartitionedGraph, combined: jnp.ndarray) -> jnp.ndarray:
    """Per-device segment-sum over destination-owned edges.

    ``combined``: (n_loc + P*m_halo, F). Returns (n_loc, F). Padded edges
    carry sentinel dst == n_loc and are dropped by scatter OOB semantics.
    """
    msg = jnp.take(combined, pg.esrc[0], axis=0, mode="clip")
    return jax.ops.segment_sum(
        msg, pg.edst[0], num_segments=pg.n_loc, indices_are_sorted=True
    )


def sharded_gspmm(pg: PartitionedGraph, feat_local: jnp.ndarray,
                  axis_name: str = "p", edge_weight: Optional[jnp.ndarray] = None
                  ) -> jnp.ndarray:
    """copy_u/u_mul_e + sum over the partitioned graph (per-device view)."""
    combined = halo_exchange(pg, feat_local, axis_name)
    msg = jnp.take(combined, pg.esrc[0], axis=0, mode="clip")
    if edge_weight is not None:
        msg = msg * edge_weight[0]
    return jax.ops.segment_sum(
        msg, pg.edst[0], num_segments=pg.n_loc, indices_are_sorted=True
    )


def make_sharded_gcn_matvec(pg: PartitionedGraph, mesh: Mesh,
                            axis_name: str = "p"):
    """Build a jittable ``y = D^-1/2 A D^-1/2 x`` over the mesh.

    ``x``/``y`` layout: (P, n_loc, F) sharded on the mesh axis. The degree
    normalization uses precomputed *global* degrees, so the result matches
    the single-device GraphConv exactly.
    """

    def body(pg_local, x):
        # Per-device blocks carry a leading axis of size 1.
        norm_out = jnp.where(pg_local.out_deg[0] > 0,
                             pg_local.out_deg[0], 1.0) ** -0.5
        norm_in = jnp.where(pg_local.in_deg[0] > 0,
                            pg_local.in_deg[0], 1.0) ** -0.5
        h = x[0] * norm_out[:, None]
        agg = sharded_gspmm(pg_local, h, axis_name)
        return (agg * norm_in[:, None])[None]

    spec_pg = jax.tree.map(lambda _: P(axis_name), pg)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_pg, P(axis_name)),
        out_specs=P(axis_name),
    )
    return functools.partial(fn, pg)
