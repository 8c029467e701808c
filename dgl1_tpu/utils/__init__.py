"""Utilities: structured metrics logging, profiling hooks, checkpointing.

Parity: the reference has no metrics/tracing subsystem (SURVEY.md §5);
these are the minimal TPU-native versions — jsonl step metrics (needed to
report BASELINE numbers), ``jax.profiler`` wrappers, and npz checkpoints.
"""

from dgl1_tpu.utils.logging import MetricsLogger
from dgl1_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from dgl1_tpu.utils.profiler import profile_trace

__all__ = [
    "MetricsLogger",
    "save_checkpoint",
    "load_checkpoint",
    "profile_trace",
]
