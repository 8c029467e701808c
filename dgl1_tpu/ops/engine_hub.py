"""Hub-dense HYB engine for g-SpMM: MXU matmuls instead of gathers.

Every other scatter-free engine pays one gathered feature row per edge,
capped by the TPU gather unit (~90M rows/s measured on v5e —
docs/PERF_NOTES.md). This engine removes the gather from the hot path
for edges whose destination is a *hub* (head of the in-degree
distribution, compacted into dense groups by ``hub_format.py``):

* forward, per 256-edge chunk: ``out_group += S_hub^T @ (S_src @ U_win)``
  — the per-edge "gather" is a one-hot matmul against a contiguous
  128-row source window and the per-destination reduce is the transposed
  one-hot matmul, both on the MXU (measured ~1.5G one-hot rows/s vs 90M
  gathered rows/s);
* backward-u is the same kernel on the window-major chunk layout
  (outputs are source windows, inputs are the compacted hub cotangent
  rows) — the SpMM duality of ``backend/pytorch/sparse.py :: GSpMM``
  holds inside one format;
* backward-e (u_mul_e) is a third chunk kernel computing per-edge
  ``<u[src], ct[dst]>`` dots from the same two one-hot matmuls;
* tail edges (non-hub destinations) run on the ELL engine's bucket
  stack, and the dense block is appended before ELL's final
  inverse-permute gather — the hub/tail merge costs zero extra passes.

Edge weights (``u_mul_e`` with a scalar per edge — GCN edge_weight,
normalized adjacency) fold into the source-side one-hot for free.

Parity: covers ``src/array/cuda/spmm.cu`` / cuSPARSE for power-law
graphs; the reference needs atomics for exactly the rows this engine
turns into dense MXU work.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgl1_tpu.graph import Graph
from dgl1_tpu.hub_format import BLK, CHUNK, DENSE_RB, SENT, HubMeta
from dgl1_tpu.ops.engine_ell import ell_reduce, ell_stack

__all__ = ["gspmm_hub"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# Chunk kernels
# ----------------------------------------------------------------------

def _chunk_kernel(weighted: bool, in_id_ref, out_id_ref, first_ref,
                  a_ref, b_ref, *rest):
    """out[out_id] += S_b^T @ (diag(w) S_a @ IN[in_id]) for one chunk."""
    if weighted:
        w_ref, in_ref, out_ref = rest
    else:
        in_ref, out_ref = rest
    t = pl.program_id(1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLK), 1)
    one_a = (a_ref[:][:, None] == iota).astype(in_ref.dtype)
    if weighted:
        one_a = one_a * w_ref[:][:, None].astype(in_ref.dtype)
    m = jax.lax.dot_general(
        one_a, in_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    one_b = (b_ref[:][:, None] == iota).astype(jnp.float32)
    partial = jax.lax.dot_general(
        one_b, m, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(first_ref[t] == 1)
    def _init():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(first_ref[t] != 1)
    def _accum():
        out_ref[:] = out_ref[:] + partial.astype(out_ref.dtype)


def _chunk_call(weighted: bool, in_id, out_id, first, a, b, w, inp,
                n_out_blocks: int):
    """inp: (n_in_blocks*BLK, F_pad) f32/bf16. Returns
    (n_out_blocks*BLK, F_pad) float32."""
    n_chunks = in_id.shape[0]
    f_pad = inp.shape[1]
    n_fb = f_pad // BLK

    def slot_spec():
        return pl.BlockSpec((CHUNK,), lambda fb, t, i, o, f: (t,))

    in_specs = [slot_spec(), slot_spec()]
    operands = [a, b]
    if weighted:
        in_specs.append(slot_spec())
        operands.append(w)
    in_specs.append(
        pl.BlockSpec((BLK, BLK), lambda fb, t, i, o, f: (i[t], fb))
    )
    operands.append(inp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # in_id, out_id, first
        grid=(n_fb, n_chunks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BLK, BLK), lambda fb, t, i, o, f: (o[t], fb)
        ),
    )
    flops = 2 * n_chunks * n_fb * (CHUNK * BLK * BLK * 2)
    return pl.pallas_call(
        functools.partial(_chunk_kernel, weighted),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_blocks * BLK, f_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_chunks * n_fb * BLK * BLK * 4
            + n_out_blocks * f_pad * BLK * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(in_id, out_id, first, *operands)


def _dense_fwd_kernel(c_ref, u_ref, out_ref):
    """out (Kd, FB) accumulates C_block^T @ U_block over all row blocks.

    XLA's dot_general leaves ~3x on the table for this tall-skinny
    reduction shape (measured 2.0ms vs the 0.65ms two-stream HBM floor at
    N=2^19, Kd=128); a sequential-accumulation kernel is DMA-bound."""
    t = pl.program_id(1)
    part = jax.lax.dot_general(
        c_ref[:], u_ref[:].astype(jnp.float32),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == 0)
    def _init():
        out_ref[:] = part

    @pl.when(t != 0)
    def _accum():
        out_ref[:] = out_ref[:] + part


def _dense_fwd_call(c, u_pad):
    n_rows, kd = c.shape
    f_pad = u_pad.shape[1]
    n_rb = n_rows // DENSE_RB
    n_fb = f_pad // BLK
    return pl.pallas_call(
        _dense_fwd_kernel,
        grid=(n_fb, n_rb),
        in_specs=[
            pl.BlockSpec((DENSE_RB, kd), lambda fb, t: (t, 0)),
            pl.BlockSpec((DENSE_RB, BLK), lambda fb, t: (t, fb)),
        ],
        out_specs=pl.BlockSpec((kd, BLK), lambda fb, t: (0, fb)),
        out_shape=jax.ShapeDtypeStruct((kd, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * kd * f_pad,
            bytes_accessed=(c.size + u_pad.size) * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(c, u_pad)


def _edge_dot_kernel(in1_ref, in2_ref, a_ref, b_ref, u_ref, ct_ref, out_ref):
    """Per-edge <u[src], ct[dst]> for one chunk (grad_e of u_mul_e)."""
    fb = pl.program_id(1)
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLK), 1)
    one_a = (a_ref[:][:, None] == iota).astype(u_ref.dtype)
    one_b = (b_ref[:][:, None] == iota).astype(ct_ref.dtype)
    m1 = jax.lax.dot_general(
        one_a, u_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m2 = jax.lax.dot_general(
        one_b, ct_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = jnp.sum(m1 * m2, axis=1)

    @pl.when(fb == 0)
    def _init():
        out_ref[:] = s

    @pl.when(fb != 0)
    def _accum():
        out_ref[:] = out_ref[:] + s


def _edge_dot_call(in1_id, in2_id, a, b, u_pad, ct_pad):
    n_chunks = in1_id.shape[0]
    f_pad = u_pad.shape[1]
    n_fb = f_pad // BLK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # in1_id (window), in2_id (group)
        grid=(n_chunks, n_fb),  # fb innermost: out block t accumulates
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda t, fb, i1, i2: (t,)),
            pl.BlockSpec((CHUNK,), lambda t, fb, i1, i2: (t,)),
            pl.BlockSpec((BLK, BLK), lambda t, fb, i1, i2: (i1[t], fb)),
            pl.BlockSpec((BLK, BLK), lambda t, fb, i1, i2: (i2[t], fb)),
        ],
        out_specs=pl.BlockSpec((CHUNK,), lambda t, fb, i1, i2: (t,)),
    )
    return pl.pallas_call(
        _edge_dot_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_chunks * CHUNK,), jnp.float32),
        interpret=_interpret(),
    )(in1_id, in2_id, a, b, u_pad, ct_pad)


# ----------------------------------------------------------------------
# Padding helpers (XLA side)
# ----------------------------------------------------------------------

def _pad_2d(x, rows: int, cols: int):
    if x.shape == (rows, cols):
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


class _Static(NamedTuple):
    op: str
    num_src: int
    num_dst: int
    has_e: bool
    u_feat: Tuple[int, ...]
    e_feat: Tuple[int, ...]
    meta: HubMeta


def _float0_like(tree):
    return jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), tree
    )


# ----------------------------------------------------------------------
# custom_vjp: dense hub block + ELL tail fused through one inverse-permute
# ----------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gspmm_hub_sum(static: _Static, hub, u, e):
    return _hub_forward(static, hub, u, e)


def _hub_forward(static, hub, u, e):
    m: HubMeta = static.meta
    op = static.op
    weighted = op == "mul"

    ff = int(np.prod(static.u_feat)) if static.u_feat else 1
    f_pad = _round_up(ff, BLK)
    u2 = u.reshape(u.shape[0], ff)
    rows_pad = hub["dense_c"].shape[0]  # round_up(num_src, DENSE_RB)

    if weighted:
        # Per-edge weights can't live in the static count matrix: all hub
        # edges go through the full chunk layouts, weight folded into the
        # source one-hot.
        u_pad = _pad_2d(u2, rows_pad, f_pad)
        lay = hub["full_fwd"]
        w = jnp.take(e.reshape(-1), lay["eid"], mode="clip").astype(
            jnp.float32)
        hub_block = _chunk_call(True, lay["in_id"], lay["out_id"],
                                lay["first"], lay["a"], lay["b"], w, u_pad,
                                m.n_groups)
    else:
        u_pad = _pad_2d(u2, rows_pad, f_pad)
        parts = []
        if m.n_dense:
            # Dense tier: the whole reduce is one sequential-accumulation
            # MXU pass against the static count matrix — per-edge cost
            # amortizes away.
            parts.append(_dense_fwd_call(hub["dense_c"], u_pad)[:, :ff])
        if m.n_groups > m.n_dense:
            lay = hub["part_fwd"]
            out = _chunk_call(False, lay["in_id"], lay["out_id"],
                              lay["first"], lay["a"], lay["b"], None, u_pad,
                              m.n_groups - m.n_dense)
            parts.append(out[:, :ff])
        hub_block = jnp.concatenate(parts, axis=0) if len(parts) > 1 \
            else parts[0]
    hub_block = hub_block[:, :ff].astype(u.dtype).reshape(
        (m.n_groups * BLK,) + tuple(static.u_feat)
    )

    stacked = ell_stack(m.tail_meta_dst, hub["t_idx"], hub["t_eid"], op,
                        "sum", u, e)
    merged = jnp.concatenate([stacked, hub_block], axis=0)
    return jnp.take(merged, hub["t_inv"], axis=0, mode="fill",
                    fill_value=0.0)


def _fwd(static, hub, u, e):
    return _gspmm_hub_sum(static, hub, u, e), (hub, u, e)


def _bwd(static, res, ct):
    hub, u, e = res
    m: HubMeta = static.meta
    op = static.op
    weighted = op == "mul"

    ff = int(np.prod(static.u_feat)) if static.u_feat else 1
    f_pad = _round_up(ff, BLK)
    ct2 = ct.reshape(ct.shape[0], ff)
    # Compact hub cotangent rows (K-row gather — cheap), then pad.
    ct_hubs = jnp.take(ct2, hub["hub_ids"], axis=0, mode="fill",
                       fill_value=0.0)
    ct_pad = _pad_2d(ct_hubs, m.n_groups * BLK, f_pad)

    # grad_u: dense-tier matmul + transpose chunk kernel (window-major
    # layout) + tail reverse ELL. Chunk output is in natural node order.
    gu_hub = jnp.zeros((static.num_src, ff), jnp.float32)
    if weighted:
        lay = hub["full_bwd"]
        w_b = jnp.take(e.reshape(-1), lay["eid"], mode="clip").astype(
            jnp.float32)
        out = _chunk_call(True, lay["in_id"], lay["out_id"], lay["first"],
                          lay["a"], lay["b"], w_b, ct_pad, m.n_win)
        win_rows = jnp.repeat(hub["win_mask_full"], BLK,
                              total_repeat_length=m.n_win * BLK)
        out = jnp.where(win_rows[:, None], out, jnp.zeros_like(out))
        gu_hub = out[: static.num_src, :ff]
    else:
        if m.n_dense:
            gu_hub = gu_hub + jax.lax.dot_general(
                hub["dense_c"], ct_hubs[: m.n_dense * BLK],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[: static.num_src]
        if m.n_groups > m.n_dense:
            lay = hub["part_bwd"]
            ct_part = ct_pad[m.n_dense * BLK:]
            out = _chunk_call(False, lay["in_id"], lay["out_id"],
                              lay["first"], lay["a"], lay["b"], None,
                              ct_part, m.n_win)
            win_rows = jnp.repeat(hub["win_mask_part"], BLK,
                                  total_repeat_length=m.n_win * BLK)
            out = jnp.where(win_rows[:, None], out, jnp.zeros_like(out))
            gu_hub = gu_hub + out[: static.num_src, :ff]
    gu_hub = gu_hub.astype(u.dtype)

    tail_src_ell = {"idx": hub["r_idx"], "eid": hub["r_eid"],
                    "inv_perm": hub["r_inv"]}
    if op == "copy_lhs":
        gu_tail = ell_reduce(m.tail_meta_src, tail_src_ell, "copy_lhs",
                             "sum", ct, None, static.num_src)
    else:  # mul
        gu_tail = ell_reduce(m.tail_meta_src, tail_src_ell, "mul", "sum",
                             ct, e, static.num_src)
    gu = (gu_tail.reshape(static.num_src, ff) + gu_hub).reshape(
        (static.num_src,) + tuple(static.u_feat)
    )

    if static.has_e and op == "mul":
        # grad_e = <u[src], ct[dst]> per edge: hub chunks via the MXU dot
        # kernel (full layout), tail via compact (tail-only) gathers —
        # never a full-E feature gather.
        lay = hub["full_fwd"]
        u_pad = _pad_2d(u.reshape(u.shape[0], ff),
                        hub["dense_c"].shape[0], f_pad)
        ge_hub = _edge_dot_call(lay["in_id"], lay["out_id"], lay["a"],
                                lay["b"], u_pad, ct_pad)
        us = jnp.take(u.reshape(u.shape[0], ff), hub["tail_src"], axis=0,
                      mode="fill", fill_value=0.0)
        cs = jnp.take(ct2, hub["tail_dst"], axis=0, mode="fill",
                      fill_value=0.0)
        ge_tail = jnp.sum(us * cs, axis=1)
        ge = (
            jnp.take(ge_hub, hub["edge_to_fslot"], mode="fill",
                     fill_value=0.0)
            + jnp.take(ge_tail, hub["edge_to_tslot"], mode="fill",
                       fill_value=0.0)
        ).astype(e.dtype)
        # e has a scalar per edge (all feature dims are 1 by dispatch).
        ge = ge.reshape(e.shape)
    else:
        ge = jnp.zeros_like(e)

    return (_float0_like(hub), gu, ge)


_gspmm_hub_sum.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# Dispatch entry
# ----------------------------------------------------------------------

def gspmm_hub(g: Graph, op: str, reduce_op: str, u, e):
    """Returns the result or None when not covered (dispatch falls back)."""
    if g.hub_dst is None or g.hub_dst_meta is None:
        return None
    if reduce_op not in ("sum", "mean"):
        return None
    if op == "copy_lhs":
        if u is None:
            return None
    elif op == "mul":
        # Scalar weight per edge only (broadcasts over features).
        if u is None or e is None:
            return None
        if int(np.prod(e.shape[1:])) != 1 or e.ndim - 1 > u.ndim - 1:
            return None
    else:
        return None
    for data in (u, e):
        if data is not None and not jnp.issubdtype(data.dtype, jnp.floating):
            return None

    static = _Static(
        op=op,
        num_src=g.num_src_nodes(),
        num_dst=g.num_dst_nodes(),
        has_e=e is not None,
        u_feat=tuple(u.shape[1:]),
        e_feat=tuple(e.shape[1:]) if e is not None else (),
        meta=g.hub_dst_meta,
    )
    e_in = e if e is not None else jnp.zeros((1, 1), u.dtype)
    out = _gspmm_hub_sum(static, g.hub_dst, u, e_in)
    if reduce_op == "mean":
        deg = jnp.maximum(g.in_degrees().astype(out.dtype), 1.0)
        out = out / deg.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return out


def register():
    from dgl1_tpu.ops import dispatch

    dispatch.register_engine("hub", gspmm_hub, None)
