"""``dgl1_tpu.ops`` — user/NN-facing sparse op API.

Parity: ``python/dgl/ops`` (gspmm/gsddmm wrappers, op-specific sugar such as
``copy_u_sum`` / ``u_dot_v``, ``edge_softmax``, segment ops).
"""

from dgl1_tpu.ops.spmm import *  # noqa: F401,F403
from dgl1_tpu.ops.sddmm import *  # noqa: F401,F403
from dgl1_tpu.ops import spmm as _spmm
from dgl1_tpu.ops import sddmm as _sddmm
from dgl1_tpu.ops.spmm import gspmm
from dgl1_tpu.ops.sddmm import gsddmm
from dgl1_tpu.ops.edge_softmax import edge_softmax
from dgl1_tpu.ops.attention import gat_attention, can_fuse_attention
from dgl1_tpu.ops.segment import (
    segment_reduce,
    segment_softmax,
    segment_mm,
    gather_mm,
)
from dgl1_tpu.ops.dispatch import set_engine, get_engine
from dgl1_tpu.ops.precision import (set_matmul_precision,
                                    get_matmul_precision, matmul_precision)

# Register the fast engines (each falls back per-call when not covered).
from dgl1_tpu.ops import engine_ell as _engine_ell
from dgl1_tpu.ops.dispatch import register_engine as _register_engine

_register_engine("ell", _engine_ell.gspmm_ell, None)
try:
    from dgl1_tpu.ops import engine_pallas as _engine_pallas

    _engine_pallas.register()
except ImportError:  # pragma: no cover — pallas unavailable on this build
    pass
try:
    from dgl1_tpu.ops import engine_hub as _engine_hub

    _engine_hub.register()
except ImportError:  # pragma: no cover
    pass
try:
    from dgl1_tpu.ops import engine_bdense as _engine_bdense

    _engine_bdense.register()
except ImportError:  # pragma: no cover
    pass

__all__ = (
    list(_spmm.__all__)
    + [n for n in _sddmm.__all__ if n not in ("copy_u", "copy_v")]
    + [
        "edge_softmax",
        "gat_attention",
        "can_fuse_attention",
        "segment_reduce",
        "segment_softmax",
        "segment_mm",
        "gather_mm",
        "set_engine",
        "get_engine",
    ]
)
