"""Hub-dense HYB engine for g-SpMM: MXU matmuls instead of gathers.

Every other scatter-free engine pays one gathered feature row per edge,
capped by the TPU gather unit (~90M rows/s measured on v5e —
docs/PERF_NOTES.md). This engine removes the gather from the hot path
for edges whose destination is a *hub* (head of the in-degree
distribution, compacted into dense groups by ``hub_format.py``), with
three tiers:

* **dense** — mega-hub groups as a static count matrix ``C``; the whole
  reduce is one sequential-accumulation Pallas matmul pass ``C^T @ U``
  (backward ``C @ ct``) — per-edge cost amortizes away entirely;
* **chunked** — per 1024-edge chunk ``out_group += S_hub^T @ W ∘ (S_src
  @ U_win)``: the per-edge "gather" is a one-hot matmul against a
  contiguous 128-row source window and the reduce is the transposed
  one-hot matmul, both on the MXU. Per-edge weights — scalar or
  per-head (``u_mul_e`` with ``e: (E, H, 1)``, the GAT pattern) — ride a
  tiny static replication matmul ``w_exp = W_chunk^T @ R`` instead of a
  gather; ``copy_e``-style sums (edge softmax denominator) are the same
  kernel without the source matmul;
* **ELL tail** for the rest; the dense results are appended before the
  tail's inverse-permute gather, so the three-way merge is free.

Backward-u reuses the chunk kernel on a window-major layout (the SpMM
duality of ``backend/pytorch/sparse.py :: GSpMM`` holds inside one
format); backward-e is a chunked kernel producing per-(edge, head) dots
in a transposed (H, slots) layout so the lane dimension stays 1024-wide.

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
from dgl1_tpu.hub_format import (BLK, CHUNK, DENSE_RB, EXPAND_PACK,
                                 EXPAND_RB, SENT, HubMeta)
from dgl1_tpu.ops.engine_ell import ell_reduce, ell_stack

__all__ = ["gspmm_hub"]

H_SUB = 8  # sublane padding of the per-head weight rows (f32 tile)


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# ----------------------------------------------------------------------
# Chunk kernels. Modes: "plain" = copy_u, "mul" = u_mul_e, "rhs" = copy_e.
# ----------------------------------------------------------------------

def _chunk_kernel(mode: str, dt, n_fb: int, in_id_ref, out_id_ref,
                  first_ref, a_ref, b_ref, *rest):
    """out[out_id] += S_b^T @ msg for one chunk, where msg is
    S_a @ IN (plain), (S_a @ IN) * (W^T R) (mul), or W^T R (rhs).
    Grid is (chunks,) with an unrolled in-kernel feature loop: one-hots
    are built once per chunk and per-grid-step overhead is paid once
    per chunk instead of once per (feature block, chunk)."""
    if mode == "plain":
        in_ref, out_ref = rest
    elif mode == "mul":
        wt_ref, r_ref, in_ref, out_ref = rest
    else:  # rhs
        wt_ref, r_ref, out_ref = rest
    t = pl.program_id(0)
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLK), 1)
    if mode != "rhs":
        one_a = (a_ref[:][:, None] == iota).astype(dt)
    one_b = (b_ref[:][:, None] == iota).astype(dt)

    for fb in range(n_fb):
        sl = slice(fb * BLK, (fb + 1) * BLK)
        if mode != "rhs":
            msg = jax.lax.dot_general(
                one_a, in_ref[:, sl].astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if mode != "plain":
            # (H_pad, CHUNK) x (H_pad, FB) -> (CHUNK, FB): per-head
            # weights expanded over their feature span by the static 0/1
            # matrix R.
            w_exp = jax.lax.dot_general(
                wt_ref[:], r_ref[:, sl],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            msg = msg * w_exp if mode == "mul" else w_exp

        partial = jax.lax.dot_general(
            one_b, msg.astype(dt), dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first_ref[t] == 1)
        def _init():
            out_ref[:, pl.ds(fb * BLK, BLK)] = partial

        @pl.when(first_ref[t] != 1)
        def _accum():
            cur = out_ref[:, pl.ds(fb * BLK, BLK)]
            out_ref[:, pl.ds(fb * BLK, BLK)] = cur + partial


def _chunk_call(mode: str, lay, wt, r, inp, n_out_blocks: int,
                f_pad: int, dt=jnp.float32):
    """lay: chunk layout dict. wt: (H_pad, n_slots) weights or None.
    inp: (n_in_blocks*BLK, f_pad) or None (rhs). Returns
    (n_out_blocks*BLK, f_pad) float32."""
    n_chunks = lay["in_id"].shape[0]
    n_fb = f_pad // BLK

    def slot_spec():
        return pl.BlockSpec((CHUNK,), lambda t, i, o, f: (t,))

    in_specs = [slot_spec(), slot_spec()]
    operands = [lay["a"], lay["b"]]
    if mode != "plain":
        h_pad = wt.shape[0]
        in_specs.append(
            pl.BlockSpec((h_pad, CHUNK), lambda t, i, o, f: (0, t)))
        in_specs.append(
            pl.BlockSpec((h_pad, f_pad), lambda t, i, o, f: (0, 0)))
        operands += [wt, r]
    if mode != "rhs":
        in_specs.append(
            pl.BlockSpec((BLK, f_pad), lambda t, i, o, f: (i[t], 0)))
        operands.append(inp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # in_id, out_id, first
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BLK, f_pad), lambda t, i, o, f: (o[t], 0)
        ),
    )
    flops = 2 * n_chunks * n_fb * (CHUNK * BLK * BLK * 2)
    return pl.pallas_call(
        functools.partial(_chunk_kernel, mode, dt, n_fb),
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
    )(lay["in_id"], lay["out_id"], lay["first"], *operands)


def _dense_fwd_kernel(dt, c_ref, u_ref, out_ref):
    """out (Kd, FB) accumulates C_block^T @ U_block over all row blocks.

    XLA's dot_general leaves ~3x on the table for this tall-skinny
    reduction shape (measured 2.0ms vs the 0.65ms two-stream HBM floor at
    N=2^19, Kd=128); a sequential-accumulation kernel is DMA-bound."""
    t = pl.program_id(1)
    part = jax.lax.dot_general(
        c_ref[:].astype(dt), u_ref[:].astype(dt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t == 0)
    def _init():
        out_ref[:] = part

    @pl.when(t != 0)
    def _accum():
        out_ref[:] = out_ref[:] + part


def _dense_fwd_call(c, u_pad, dt=jnp.float32):
    n_rows, kd = c.shape
    f_pad = u_pad.shape[1]
    n_rb = n_rows // DENSE_RB
    n_fb = f_pad // BLK
    return pl.pallas_call(
        functools.partial(_dense_fwd_kernel, dt),
        grid=(n_fb, n_rb),
        in_specs=[
            pl.BlockSpec((DENSE_RB, kd), lambda fb, t: (t, 0)),
            pl.BlockSpec((DENSE_RB, BLK), lambda fb, t: (t, fb)),
        ],
        out_specs=pl.BlockSpec((kd, BLK), lambda fb, t: (0, fb)),
        out_shape=jax.ShapeDtypeStruct((kd, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * kd * f_pad,
            bytes_accessed=c.size * c.dtype.itemsize + u_pad.size * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(c, u_pad)


def _dense_bwd_fused_kernel(dt, starts_ref, desc_ref, c_ref, ct_ref,
                            tail_ref, out_ref):
    """grad_u row block = C_block @ ct, then += the block's compact
    tail-src stack rows via descriptors (p = local_row * EXPAND_PACK +
    stacked_row) — one HBM write pass replaces dense-out + full-size
    tail expand + add (the backward's dominant XLA glue)."""
    rb = pl.program_id(1)
    out_ref[:] = jax.lax.dot_general(
        c_ref[:].astype(dt), ct_ref[:].astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    start = starts_ref[rb]
    end = starts_ref[rb + 1]

    def body(i, carry):
        p = desc_ref[i]
        r = p // EXPAND_PACK
        m = p - r * EXPAND_PACK
        out_ref[pl.ds(r, 1), :] = (out_ref[pl.ds(r, 1), :]
                                   + tail_ref[pl.ds(m, 1), :])
        return carry

    jax.lax.fori_loop(start, end, body, 0)


def _dense_bwd_fused_call(c, ct_pad, tail2, gb_starts, gb_desc,
                          dt=jnp.float32):
    """tail2: (m_pad, f_pad) compact tail-src stack (f32). Returns the
    combined (n_rows, f_pad) grad_u of dense tier + ELL tail."""
    n_rows, kd = c.shape
    f_pad = ct_pad.shape[1]
    m_pad = tail2.shape[0]
    return pl.pallas_call(
        functools.partial(_dense_bwd_fused_kernel, dt),
        grid=(f_pad // BLK, n_rows // DENSE_RB),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((DENSE_RB, kd), lambda fb, t: (t, 0)),
            pl.BlockSpec((kd, BLK), lambda fb, t: (0, fb)),
            pl.BlockSpec((m_pad, BLK), lambda fb, t: (0, fb)),
        ],
        out_specs=pl.BlockSpec((DENSE_RB, BLK), lambda fb, t: (t, fb)),
        out_shape=jax.ShapeDtypeStruct((n_rows, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * kd * f_pad,
            bytes_accessed=c.size * c.dtype.itemsize
            + n_rows * f_pad * 4 + tail2.size * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(gb_starts, gb_desc, c, ct_pad, tail2)


def _dense_bwd_kernel(dt, c_ref, ct_ref, out_ref):
    """grad_u row block = C_block @ ct (C may be bf16; converted
    per-block in VMEM — an XLA-level astype would materialize the whole
    f32 count matrix in HBM)."""
    out_ref[:] = jax.lax.dot_general(
        c_ref[:].astype(dt), ct_ref[:].astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dense_bwd_call(c, ct_pad, dt=jnp.float32):
    n_rows, kd = c.shape
    f_pad = ct_pad.shape[1]
    return pl.pallas_call(
        functools.partial(_dense_bwd_kernel, dt),
        grid=(f_pad // BLK, n_rows // DENSE_RB),
        in_specs=[
            pl.BlockSpec((DENSE_RB, kd), lambda fb, t: (t, 0)),
            pl.BlockSpec((kd, BLK), lambda fb, t: (0, fb)),
        ],
        out_specs=pl.BlockSpec((DENSE_RB, BLK), lambda fb, t: (t, fb)),
        out_shape=jax.ShapeDtypeStruct((n_rows, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * kd * f_pad,
            bytes_accessed=c.size * c.dtype.itemsize
            + n_rows * f_pad * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(c, ct_pad)


def _expand_kernel(starts_ref, desc_ref, merged_ref, out_ref):
    """Descriptor-driven inverse-permute: out[v] = merged[t_inv[v]].

    The XLA gather for this runs ~2.5x off the HBM write floor (most
    rows are zero-fill on hub-concentrated graphs). Here `merged` sits
    whole in VMEM; each output row-block writes zeros then copies its
    few real rows, so HBM traffic is one sequential write pass. Packed
    descriptor p = local_row * EXPAND_PACK + merged_row, sorted by
    destination; per-block [start, end) offsets in SMEM."""
    rb = pl.program_id(1)
    out_ref[:] = jnp.zeros_like(out_ref)
    start = starts_ref[rb]
    end = starts_ref[rb + 1]

    def body(i, carry):
        p = desc_ref[i]
        r = p // EXPAND_PACK
        m = p - r * EXPAND_PACK
        out_ref[pl.ds(r, 1), :] = merged_ref[pl.ds(m, 1), :]
        return carry

    jax.lax.fori_loop(start, end, body, 0)


# VMEM budget for the resident merged block (v5e has ~16MB more total;
# leave room for the output block and double buffering).
_EXPAND_VMEM_BYTES = 4 * 1024 * 1024
# Separate (larger) budget for the fused backward's resident tail-src
# stack: its kernel co-residents are small (one 1024x128 int8 C block,
# a (kd, 128) ct block and the 1024x128 output block, ~1.3 MB with
# double buffering), so the 16 MB scoped-vmem limit admits a ~12 MB
# tail. The old shared 4 MB gate silently dropped the fused path at
# N=2^19 (tail ~4.6 MB) — the backward then paid a FULL-SIZE 524k-row
# tail inverse-permute, 1.45 ms of the 1.66 ms backward (profiled
# 2026-08-21, PROF_LOG2N=19 tools/profile_hub_bwd.py).
_BWD_TAIL_VMEM_BYTES = 12 * 1024 * 1024


def _expand_call(merged2, x_starts, x_desc, num_dst: int):
    m_rows, f_pad = merged2.shape
    n_fb = f_pad // BLK
    n_rb = -(-num_dst // EXPAND_RB)
    return pl.pallas_call(
        _expand_kernel,
        grid=(n_fb, n_rb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((m_rows, BLK), lambda fb, rb: (0, fb)),
        ],
        out_specs=pl.BlockSpec((EXPAND_RB, BLK), lambda fb, rb: (rb, fb)),
        out_shape=jax.ShapeDtypeStruct((num_dst, f_pad), merged2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=num_dst * f_pad * merged2.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(x_starts, x_desc, merged2)


def _edge_grad_kernel(mode: str, dt, n_fb: int, in1_ref, in2_ref, a_ref,
                      b_ref, r_ref, *rest):
    """Per-(edge, head) grads in transposed (H_pad, CHUNK) layout:
    ge = R @ (m1 * m2)^T (mul) or R @ m2^T (rhs). Grid (chunks,) with an
    unrolled in-kernel feature loop (one-hots built once per chunk)."""
    if mode == "mul":
        u_ref, ct_ref, out_ref = rest
    else:
        ct_ref, out_ref = rest
    iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, BLK), 1)
    one_b = (b_ref[:][:, None] == iota).astype(dt)
    if mode == "mul":
        one_a = (a_ref[:][:, None] == iota).astype(dt)

    acc = None
    for fb in range(n_fb):
        sl = slice(fb * BLK, (fb + 1) * BLK)
        m2 = jax.lax.dot_general(
            one_b, ct_ref[:, sl].astype(dt),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if mode == "mul":
            m1 = jax.lax.dot_general(
                one_a, u_ref[:, sl].astype(dt),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = m1 * m2
        else:
            p = m2
        part = jax.lax.dot_general(
            r_ref[:, sl].astype(dt), p.astype(dt),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H_pad, CHUNK)
        acc = part if acc is None else acc + part
    out_ref[:] = acc


def _edge_grad_call(mode: str, lay, r, u_pad, ct_pad, f_pad: int,
                    dt=jnp.float32):
    """Returns (H_pad, n_slots) float32 per-(head, slot) grads."""
    n_chunks = lay["in_id"].shape[0]
    n_fb = f_pad // BLK
    h_pad = r.shape[0]

    in_specs = [
        pl.BlockSpec((CHUNK,), lambda t, i1, i2: (t,)),
        pl.BlockSpec((CHUNK,), lambda t, i1, i2: (t,)),
        pl.BlockSpec((h_pad, f_pad), lambda t, i1, i2: (0, 0)),
    ]
    operands = [lay["a"], lay["b"], r]
    if mode == "mul":
        in_specs.append(
            pl.BlockSpec((BLK, f_pad), lambda t, i1, i2: (i1[t], 0)))
        operands.append(u_pad)
    in_specs.append(
        pl.BlockSpec((BLK, f_pad), lambda t, i1, i2: (i2[t], 0)))
    operands.append(ct_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # in1_id (window), in2_id (group)
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((h_pad, CHUNK), lambda t, i1, i2: (0, t)),
    )
    return pl.pallas_call(
        functools.partial(_edge_grad_kernel, mode, dt, n_fb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h_pad, n_chunks * CHUNK),
                                       jnp.float32),
        interpret=_interpret(),
    )(lay["in_id"], lay["out_id"], *operands)


# ----------------------------------------------------------------------
# Padding / weight-layout helpers (XLA side)
# ----------------------------------------------------------------------

def _pad_2d(x, rows: int, cols: int):
    if x.shape == (rows, cols):
        return x
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _weights_t(e, he: int, eids):
    """Gather per-edge weights into chunk-slot order, transposed to
    (H_pad, n_slots) so the lane dimension stays CHUNK-wide."""
    e2 = e.reshape(e.shape[0], he).astype(jnp.float32)
    w = jnp.take(e2, eids, axis=0, mode="clip").T  # (he, n_slots)
    h_pad = _round_up(he, H_SUB)
    if h_pad != he:
        w = jnp.pad(w, ((0, h_pad - he), (0, 0)))
    return w


def _replication_r(mode: str, he: int, rep: int, f_pad: int):
    """Static 0/1 expansion matrix: row h covers its feature span."""
    h_pad = _round_up(he, H_SUB)
    r = np.zeros((h_pad, f_pad), np.float32)
    if mode == "mul":
        for h in range(he):
            r[h, h * rep:(h + 1) * rep] = 1.0
    else:  # rhs: identity into the first he columns
        r[np.arange(he), np.arange(he)] = 1.0
    return jnp.asarray(r)


class _Static(NamedTuple):
    op: str
    num_src: int
    num_dst: int
    has_e: bool
    he: int          # per-edge weight heads (prod of e feature dims)
    rep: int         # features per head (flat_F // he)
    u_feat: Tuple[int, ...]
    e_feat: Tuple[int, ...]
    out_feat: Tuple[int, ...]
    meta: HubMeta
    prec: str = "f32"  # ops.precision matmul mode, captured at trace time


def _dtype_of(static):
    return jnp.bfloat16 if static.prec == "bf16" else jnp.float32


def _diag_term(static, hub, u, e):
    """Contribution of the extracted single self-loop edges (node-level
    O(N) — see hub_format: they would otherwise give every node a tail
    row on add_self_loop graphs)."""
    nd = static.num_dst
    diag = hub["diag"]
    if static.op == "copy_lhs":
        d = diag.reshape((nd,) + (1,) * len(static.out_feat))
        return d * u[:nd]
    e2 = e.reshape(e.shape[0], static.he)
    ed = jnp.take(e2, hub["diag_eid"], axis=0, mode="fill",
                  fill_value=0.0) * diag[:, None]  # (nd, he)
    if static.op == "copy_rhs":
        return ed.reshape((nd,) + tuple(static.out_feat))
    u3 = u.reshape(u.shape[0], static.he, static.rep)
    return (u3[:nd] * ed[:, :, None]).reshape(
        (nd,) + tuple(static.out_feat))


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

    ff = int(np.prod(static.out_feat)) if static.out_feat else 1
    f_pad = _round_up(ff, BLK)
    rows_pad = hub["dense_c"].shape[0]  # round_up(num_src, DENSE_RB)
    dt = _dtype_of(static)

    if op == "copy_lhs":
        u2 = u.reshape(u.shape[0], ff)
        u_pad = _pad_2d(u2, rows_pad, f_pad)
        parts = []
        if m.n_dense:
            # Dense tier: the whole reduce is one sequential-accumulation
            # MXU pass against the static count matrix.
            parts.append(_dense_fwd_call(hub["dense_c"], u_pad, dt)[:, :ff])
        if m.n_groups > m.n_dense:
            out = _chunk_call("plain", hub["part_fwd"], None, None, u_pad,
                              m.n_groups - m.n_dense, f_pad, dt)
            parts.append(out[:, :ff])
        hub_block = jnp.concatenate(parts, axis=0) if len(parts) > 1 \
            else parts[0]
    else:
        lay = hub["full_fwd"]
        wt = _weights_t(e, static.he, lay["eid"])
        r = _replication_r("mul" if op == "mul" else "rhs", static.he,
                           static.rep, f_pad)
        if op == "mul":
            u2 = u.reshape(u.shape[0], ff)
            u_pad = _pad_2d(u2, rows_pad, f_pad)
            hub_block = _chunk_call("mul", lay, wt, r, u_pad, m.n_groups,
                                    f_pad, dt)[:, :ff]
        else:  # copy_rhs
            hub_block = _chunk_call("rhs", lay, wt, r, None, m.n_groups,
                                    f_pad, dt)[:, :ff]

    dtype = (u if op != "copy_rhs" else e).dtype
    hub_block = hub_block.astype(dtype).reshape(
        (m.n_groups * BLK,) + tuple(static.out_feat)
    )

    stacked = ell_stack(m.tail_meta_dst, hub["t_idx"], hub["t_eid"], op,
                        "sum", u if op != "copy_rhs" else None,
                        e if op != "copy_lhs" else None)
    merged = jnp.concatenate([stacked, hub_block], axis=0)

    # Inverse permute back to destination order. Identity layout
    # (hub_order-relabeled graphs): the merge IS the output prefix —
    # one fused concat/pad at the HBM store floor, no permute pass at
    # all (round-4 forward lever; the descriptor kernel ran at 2.4x
    # the floor). Otherwise: descriptor-driven Pallas expand when
    # `merged` fits in VMEM (sequential HBM writes), else XLA gather.
    if getattr(m, "identity_expand", False):
        # Hub-first relabel: destinations are [hub slots | tail stack |
        # zero-degree] in order — emit the blocks directly. jnp.pad
        # generates the zero-degree rows INLINE (a materialized zeros
        # operand in a 3-way concat cost a measured extra ~0.8 ms full
        # pass at N=2^19).
        small = jnp.concatenate([hub_block, stacked], axis=0)
        pad = static.num_dst - small.shape[0]
        out = jnp.pad(small, ((0, pad),) + ((0, 0),) * (small.ndim - 1))
        if getattr(m, "has_diag", False):
            out = out + _diag_term(static, hub, u, e).astype(out.dtype)
        return out
    m_pad = _round_up(merged.shape[0], 32)
    # Meta-derived gate (not array emptiness): the sharded build pads
    # zero-size descriptor arrays so they stack/shard, which must not
    # flip this decision (parallel/hub_shard.py).
    if (m.n_tail_rows + m.n_groups * BLK < EXPAND_PACK
            and hub["x_desc"].shape[0] > 0
            and m_pad * BLK * merged.dtype.itemsize <= _EXPAND_VMEM_BYTES):
        merged2 = _pad_2d(merged.reshape(merged.shape[0], ff), m_pad, f_pad)
        out2 = _expand_call(merged2, hub["x_starts"], hub["x_desc"],
                            static.num_dst)
        out = out2[:, :ff].reshape((static.num_dst,)
                                   + tuple(static.out_feat))
    else:
        out = jnp.take(merged, hub["t_inv"], axis=0, mode="fill",
                       fill_value=0.0)
    if getattr(m, "has_diag", False):
        out = out + _diag_term(static, hub, u, e).astype(out.dtype)
    return out


def _fwd(static, hub, u, e):
    return _gspmm_hub_sum(static, hub, u, e), (hub, u, e)


def _bwd(static, res, ct):
    hub, u, e = res
    m: HubMeta = static.meta
    op = static.op

    ff = int(np.prod(static.out_feat)) if static.out_feat else 1
    f_pad = _round_up(ff, BLK)
    rows_pad = hub["dense_c"].shape[0]
    dt = _dtype_of(static)
    ct2 = ct.reshape(ct.shape[0], ff)
    # Compact hub cotangent rows (K-row gather — cheap), then pad.
    ct_hubs = jnp.take(ct2, hub["hub_ids"], axis=0, mode="fill",
                       fill_value=0.0)
    ct_pad = _pad_2d(ct_hubs, m.n_groups * BLK, f_pad)

    # ---- grad_u ----
    gu = jnp.zeros_like(u)
    if op != "copy_rhs":
        # Fused dense+tail path (copy_lhs with a dense tier): the compact
        # tail-src stack rides the dense backward kernel's own output
        # pass via descriptors — no full-size (N, F) tail materialization
        # and no separate add (the backward's dominant cost, profiled in
        # tools/profile_hub_bwd.py).
        n_src_rows = int(sum(n for _, n in m.tail_meta_src))
        m_tail_pad = _round_up(max(n_src_rows, 1), 32)
        gb_desc = hub.get("gb_desc")
        fused = (op == "copy_lhs" and m.n_dense > 0
                 and 0 < n_src_rows < EXPAND_PACK
                 and gb_desc is not None and gb_desc.shape[0] > 0
                 and m_tail_pad * BLK * 4 <= _BWD_TAIL_VMEM_BYTES)

        gu2 = None
        if fused:
            ct_d = _pad_2d(ct_hubs[: m.n_dense * BLK].astype(
                jnp.float32), m.n_dense * BLK, f_pad)
            tail_stacked = ell_stack(
                m.tail_meta_src, hub["r_idx"], hub["r_eid"], "copy_lhs",
                "sum", ct, None)
            tail2 = _pad_2d(
                tail_stacked.reshape(tail_stacked.shape[0], ff).astype(
                    jnp.float32), m_tail_pad, f_pad)
            gu2 = _dense_bwd_fused_call(
                hub["dense_c"], ct_d, tail2, hub["gb_starts"], gb_desc,
                dt)[: static.num_src, :ff]
            if m.n_groups > m.n_dense:
                lay = hub["part_bwd"]
                ct_part = ct_pad[m.n_dense * BLK:]
                out = _chunk_call("plain", lay, None, None, ct_part,
                                  m.n_win, f_pad, dt)
                win_rows = jnp.repeat(hub["win_mask_part"], BLK,
                                      total_repeat_length=m.n_win * BLK)
                out = jnp.where(win_rows[:, None], out,
                                jnp.zeros_like(out))
                gu2 = gu2 + out[: static.num_src, :ff]
        else:
            gu_hub = jnp.zeros((static.num_src, ff), jnp.float32)
            if op == "copy_lhs":
                if m.n_dense:
                    ct_d = _pad_2d(ct_hubs[: m.n_dense * BLK].astype(
                        jnp.float32), m.n_dense * BLK, f_pad)
                    gu_hub = gu_hub + _dense_bwd_call(
                        hub["dense_c"], ct_d, dt)[: static.num_src, :ff]
                if m.n_groups > m.n_dense:
                    lay = hub["part_bwd"]
                    ct_part = ct_pad[m.n_dense * BLK:]
                    out = _chunk_call("plain", lay, None, None, ct_part,
                                      m.n_win, f_pad, dt)
                    win_rows = jnp.repeat(
                        hub["win_mask_part"], BLK,
                        total_repeat_length=m.n_win * BLK)
                    out = jnp.where(win_rows[:, None], out,
                                    jnp.zeros_like(out))
                    gu_hub = gu_hub + out[: static.num_src, :ff]
                tail_op = "copy_lhs"
            else:  # mul
                lay = hub["full_bwd"]
                wt_b = _weights_t(e, static.he, lay["eid"])
                r = _replication_r("mul", static.he, static.rep, f_pad)
                out = _chunk_call("mul", lay, wt_b, r, ct_pad, m.n_win,
                                  f_pad, dt)
                win_rows = jnp.repeat(hub["win_mask_full"], BLK,
                                      total_repeat_length=m.n_win * BLK)
                out = jnp.where(win_rows[:, None], out,
                                jnp.zeros_like(out))
                gu_hub = out[: static.num_src, :ff]
                tail_op = "mul"

            tail_src_ell = {"idx": hub["r_idx"], "eid": hub["r_eid"],
                            "inv_perm": hub["r_inv"]}
            gu_tail = ell_reduce(m.tail_meta_src, tail_src_ell, tail_op,
                                 "sum", ct,
                                 e if tail_op == "mul" else None,
                                 static.num_src)
            gu2 = gu_tail.reshape(static.num_src, ff) + gu_hub
        if getattr(m, "has_diag", False):
            nd = static.num_dst
            if op == "copy_lhs":
                add = hub["diag"][:, None] * ct2[:nd]
            else:  # mul
                e2 = e.reshape(e.shape[0], static.he)
                ed = jnp.take(e2, hub["diag_eid"], axis=0, mode="fill",
                              fill_value=0.0) * hub["diag"][:, None]
                ct3d = ct2[:nd].reshape(nd, static.he, static.rep)
                add = (ct3d * ed[:, :, None]).reshape(nd, ff)
            gu2 = gu2.at[:nd].add(add)
        gu = gu2.astype(u.dtype).reshape(u.shape)

    # ---- grad_e ----
    if static.has_e and op in ("mul", "copy_rhs"):
        he = static.he
        lay = hub["full_fwd"]
        r = _replication_r("mul" if op == "mul" else "rhs", he,
                           static.rep, f_pad)
        u_pad = None
        if op == "mul":
            u_pad = _pad_2d(u.reshape(u.shape[0], ff), rows_pad, f_pad)
        ge_t = _edge_grad_call("mul" if op == "mul" else "rhs", lay, r,
                               u_pad, ct_pad, f_pad, dt)
        ge_hub = ge_t[:he].T  # (n_slots, he)

        if op == "mul":
            u3 = u.reshape(u.shape[0], he, static.rep)
            ct3 = ct2.reshape(ct.shape[0], he, static.rep)
            us = jnp.take(u3, hub["tail_src"], axis=0, mode="fill",
                          fill_value=0.0)
            cs = jnp.take(ct3, hub["tail_dst"], axis=0, mode="fill",
                          fill_value=0.0)
            ge_tail = jnp.sum(us * cs, axis=2)  # (T_pad, he)
        else:
            ct_h = ct2.reshape(ct.shape[0], he)
            ge_tail = jnp.take(ct_h, hub["tail_dst"], axis=0, mode="fill",
                               fill_value=0.0)
        ge2 = (
            jnp.take(ge_hub, hub["edge_to_fslot"], axis=0, mode="fill",
                     fill_value=0.0)
            + jnp.take(ge_tail, hub["edge_to_tslot"], axis=0, mode="fill",
                       fill_value=0.0)
        )
        if getattr(m, "has_diag", False):
            nd = static.num_dst
            if op == "mul":
                u3d = u.reshape(u.shape[0], he, static.rep)
                ct3d = ct2[:nd].reshape(nd, he, static.rep)
                ge_diag = jnp.sum(u3d[:nd] * ct3d, axis=2)  # (nd, he)
            else:
                ge_diag = ct2[:nd].reshape(nd, he)
            ge2 = ge2 + jnp.take(ge_diag, hub["diag_edge_dst"], axis=0,
                                 mode="fill", fill_value=0.0)
        ge = ge2.astype(e.dtype).reshape(e.shape)
    else:
        ge = jnp.zeros_like(e)

    return (_float0_like(hub), gu, ge)


_gspmm_hub_sum.defvjp(_fwd, _bwd)


# ----------------------------------------------------------------------
# Dispatch entry
# ----------------------------------------------------------------------

def _weight_heads(u_feat, e_feat):
    """Validate the supported e-broadcast patterns; return (he, rep) or
    None. Supported: scalar per edge ((1,)*k) against any u_feat, or
    per-head (H, 1, ...) against u_feat starting with H."""
    he = int(np.prod(e_feat)) if e_feat else 1
    if he == 1:
        if len(e_feat) > len(u_feat):
            return None
        ff = int(np.prod(u_feat)) if u_feat else 1
        return 1, ff
    if (len(e_feat) >= 1 and e_feat[0] == he
            and len(e_feat) <= len(u_feat) and u_feat
            and u_feat[0] == he):
        ff = int(np.prod(u_feat))
        return he, ff // he
    return None


def gspmm_hub(g: Graph, op: str, reduce_op: str, u, e):
    """Returns the result or None when not covered (dispatch falls back)."""
    if g.hub_dst is None or g.hub_dst_meta is None:
        return None
    if reduce_op not in ("sum", "mean"):
        return None

    he, rep = 1, 1
    if op == "copy_lhs":
        if u is None:
            return None
        out_feat = tuple(u.shape[1:])
        rep = int(np.prod(out_feat)) if out_feat else 1
    elif op == "mul":
        if u is None or e is None:
            return None
        hr = _weight_heads(tuple(u.shape[1:]), tuple(e.shape[1:]))
        if hr is None:
            return None
        he, rep = hr
        out_feat = tuple(u.shape[1:])
    elif op == "copy_rhs":
        if e is None:
            return None
        e_feat = tuple(e.shape[1:])
        he = int(np.prod(e_feat)) if e_feat else 1
        if he != 1 and not (e_feat and e_feat[0] == he):
            return None
        he = max(he, 1)
        rep = 1
        out_feat = e_feat
    else:
        return None
    for data in (u, e):
        if data is not None and not jnp.issubdtype(data.dtype, jnp.floating):
            return None

    from dgl1_tpu.ops.precision import get_matmul_precision

    static = _Static(
        op=op,
        num_src=g.num_src_nodes(),
        num_dst=g.num_dst_nodes(),
        has_e=e is not None,
        he=he,
        rep=rep,
        u_feat=tuple(u.shape[1:]) if u is not None else (),
        e_feat=tuple(e.shape[1:]) if e is not None else (),
        out_feat=out_feat,
        meta=g.hub_dst_meta,
        prec=get_matmul_precision(),
    )
    dtype = (u if u is not None else e).dtype
    u_in = u if u is not None else jnp.zeros((1, 1), dtype)
    e_in = e if e is not None else jnp.zeros((1, 1), dtype)
    out = _gspmm_hub_sum(static, g.hub_dst, u_in, e_in)
    if reduce_op == "mean":
        deg = jnp.maximum(g.in_degrees().astype(out.dtype), 1.0)
        out = out / deg.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return out


def register():
    from dgl1_tpu.ops import dispatch

    dispatch.register_engine("hub", gspmm_hub, None)
