"""Block-dense SpMM engine: clustered BLK x BLK adjacency blocks on the
MXU (see dgl1_tpu/bdense_format.py for the format and the traffic math).

Forward: for each dense block k (rb-sorted), the output row block
``out[rb[k]]`` accumulates ``A_k @ u[cb[k]]`` in VMEM and is written once
per (rb, feature-block). Backward reuses the SAME count blocks in
transpose (``gu[cb] += A_k^T @ ct[rb]``, cb-sorted order) — both
directions beat the per-edge gather wall on locality-reordered graphs.
Leftover edges ride the ELL tail in both directions. Covers
copy_lhs x {sum, mean}; other calls decline and fall through dispatch.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dgl1_tpu.bdense_format import BLK, BDenseMeta
from dgl1_tpu.graph import Graph
from dgl1_tpu.ops.engine_ell import ell_reduce

__all__ = ["gspmm_bdense", "register"]

FEAT_BLOCK = 128


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _block_kernel(transpose: bool, dt, out_rows_ref, first_ref,
                  in_rows_ref, a_ref, x_ref, out_ref):
    k = pl.program_id(1)
    # A is stored bf16 (exact small-integer counts); cast per-block in
    # VMEM to the compute dtype. dt=bf16 (ops.precision policy) runs the
    # MXU single-pass; dt=f32 keeps the oracle bit-strict.
    a = a_ref[:].astype(dt)
    x = x_ref[:].astype(dt)
    if transpose:
        part = jax.lax.dot_general(
            a, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        part = jax.lax.dot_general(
            a, x, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(first_ref[k] == 1)
    def _init():
        out_ref[:] = part.astype(out_ref.dtype)

    @pl.when(first_ref[k] != 1)
    def _accum():
        out_ref[:] = out_ref[:] + part.astype(out_ref.dtype)


def _block_call(transpose: bool, a, out_rows, first, in_rows,
                x_pad, n_out_blocks: int, dt=jnp.float32):
    """x_pad: (n_in_blocks*BLK, f_pad). Returns (n_out_blocks*BLK, f_pad).

    Prefetch arrays: out_rows[k] = output block row, in_rows[k] = input
    block row, first[k] = start-of-run flag in the iteration order. The
    A operand is pre-sorted in iteration order (block k at rows
    [k*BLK, (k+1)*BLK)) so it streams sequentially.
    """
    K = out_rows.shape[0]
    f_pad = x_pad.shape[1]
    n_fb = f_pad // FEAT_BLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # out_rows, first, in_rows
        grid=(n_fb, K),
        in_specs=[
            pl.BlockSpec((BLK, BLK),
                         lambda fb, k, o, fi, ir: (k, 0)),
            pl.BlockSpec((BLK, FEAT_BLOCK),
                         lambda fb, k, o, fi, ir: (ir[k], fb)),
        ],
        out_specs=pl.BlockSpec(
            (BLK, FEAT_BLOCK), lambda fb, k, o, fi, ir: (o[k], fb)
        ),
    )
    flops = 2 * K * n_fb * BLK * BLK * FEAT_BLOCK
    return pl.pallas_call(
        functools.partial(_block_kernel, transpose, dt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out_blocks * BLK, f_pad),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(a.size * a.dtype.itemsize
                            + K * BLK * f_pad * 4
                            + n_out_blocks * BLK * f_pad * 4),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(out_rows, first, in_rows, a, x_pad)


class _Static(NamedTuple):
    num_src: int
    num_dst: int
    u_feat: Tuple[int, ...]
    meta: BDenseMeta
    prec: str = "f32"  # ops.precision matmul mode, captured at trace time


def _pad_rows_feat(x2, rows: int, f_pad: int):
    return jnp.pad(x2, ((0, rows - x2.shape[0]), (0, f_pad - x2.shape[1])))


def _dense_dir(static: _Static, bd, x, transpose: bool):
    """One dense-tier reduce. transpose=False: dst-direction (forward);
    True: src-direction (backward), A blocks transposed in-kernel."""
    m = static.meta
    ff = x.shape[1]
    f_pad = _round_up(max(ff, 1), FEAT_BLOCK)
    if transpose:
        n_in, n_out = m.n_rb, m.n_cb
        a, out_rows, first = bd["ab"], bd["cbb"], bd["first_b"]
        in_rows = bd["rbb"]
        mask = bd["cb_mask"]
        n_valid = static.num_src
    else:
        n_in, n_out = m.n_cb, m.n_rb
        a, out_rows, first = bd["a"], bd["rb"], bd["first_f"]
        in_rows = bd["cb"]
        mask = bd["rb_mask"]
        n_valid = static.num_dst
    dt = jnp.bfloat16 if static.prec == "bf16" else jnp.float32
    x_pad = _pad_rows_feat(x, n_in * BLK, f_pad)
    out = _block_call(transpose, a, out_rows, first, in_rows,
                      x_pad, n_out, dt=dt)
    rows = jnp.repeat(mask, BLK, total_repeat_length=n_out * BLK)
    out = jnp.where(rows[:, None], out, jnp.zeros_like(out))
    return out[:n_valid, :ff]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gspmm_bdense_sum(static: _Static, bd, u):
    m = static.meta
    ff = u.shape[1]
    out = jnp.zeros((static.num_dst, ff), jnp.float32)
    if m.n_blocks:
        out = out + _dense_dir(static, bd, u, transpose=False)
    tail = ell_reduce(
        m.tail_meta_dst,
        {"idx": bd["t_idx"], "eid": bd["t_eid"], "inv_perm": bd["t_inv"]},
        "copy_lhs", "sum", u, None, static.num_dst,
    )
    return out + tail.reshape(static.num_dst, ff)


def _fwd(static, bd, u):
    return _gspmm_bdense_sum(static, bd, u), (bd, u)


def _bwd(static, res, ct):
    bd, u = res
    m = static.meta
    ff = u.shape[1]
    ct = ct.astype(jnp.float32)
    gu = jnp.zeros((static.num_src, ff), jnp.float32)
    if m.n_blocks:
        gu = gu + _dense_dir(static, bd, ct, transpose=True)
    tail = ell_reduce(
        m.tail_meta_src,
        {"idx": bd["r_idx"], "eid": bd["r_eid"], "inv_perm": bd["r_inv"]},
        "copy_lhs", "sum", ct, None, static.num_src,
    )
    gu = gu + tail.reshape(static.num_src, ff)
    f0 = jax.tree.map(
        lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0), bd
    )
    return f0, gu.astype(u.dtype)


_gspmm_bdense_sum.defvjp(_fwd, _bwd)


def gspmm_bdense(g: Graph, op: str, reduce_op: str, u, e):
    """Returns the result or None when not covered."""
    if getattr(g, "bdense", None) is None:
        return None
    if op != "copy_lhs" or reduce_op not in ("sum", "mean"):
        return None
    if u is None or not jnp.issubdtype(u.dtype, jnp.floating):
        return None
    feat = u.shape[1:]
    ff = int(np.prod(feat)) if feat else 1
    from dgl1_tpu.ops.precision import get_matmul_precision

    static = _Static(
        num_src=g.num_src_nodes(),
        num_dst=g.num_dst_nodes(),
        u_feat=tuple(feat),
        meta=g.bdense_meta,
        prec=get_matmul_precision(),
    )
    out = _gspmm_bdense_sum(static, g.bdense, u.reshape(u.shape[0], ff))
    out = out.astype(u.dtype).reshape((static.num_dst,) + feat)
    if reduce_op == "mean":
        deg = jnp.maximum(g.in_degrees().astype(out.dtype), 1.0)
        out = out / deg.reshape((out.shape[0],) + (1,) * (out.ndim - 1))
    return out


def gsddmm_bdense(g, op, lhs, rhs, lhs_target, rhs_target):
    return None


def register():
    from dgl1_tpu.ops import dispatch

    dispatch.register_engine("bdense", gspmm_bdense, gsddmm_bdense)