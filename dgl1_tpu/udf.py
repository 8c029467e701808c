"""User-defined-function batch types (parity: ``python/dgl/udf.py``).

``EdgeBatch`` (``.src`` / ``.dst`` / ``.data``) and ``NodeBatch``
(``.data`` / ``.mailbox``) are defined in ``core.py`` next to the
degree-bucketed UDF dispatch that constructs them; this module mirrors
the reference's import location (``from dgl.udf import EdgeBatch``).
"""

from dgl1_tpu.core import EdgeBatch, NodeBatch

__all__ = ["EdgeBatch", "NodeBatch"]
