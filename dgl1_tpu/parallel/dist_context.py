"""Distributed context entry points (parity:
``python/dgl/distributed/dist_context.py :: initialize`` /
``exit_client``). The reference spins up RPC clients to graph servers;
here multi-host means joining the JAX distributed runtime (DCN) — all
in-slice exchange rides ICI collectives with no servers to contact.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize", "exit_client"]

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               ip_config: Optional[str] = None,
               timeout_s: Optional[float] = 300.0):
    """Join the multi-host runtime (parity: ``dgl.distributed.initialize``).

    With no arguments, reads ``COORDINATOR_ADDRESS`` / ``NUM_PROCESSES`` /
    ``PROCESS_ID`` from the environment (as set by ``tools/launch.py``);
    ``ip_config`` accepts a DistDGL-style host file, using its first line
    as the coordinator. No-op when single-process.

    ``timeout_s``: raise instead of hanging when peers never join (the
    reference's blocking socket reads hang forever on a dead server —
    SURVEY.md §5 failure-detection bullet asks for timeout errors).
    """
    global _initialized
    if _initialized:
        return
    import jax

    if ip_config and not coordinator_address:
        with open(ip_config) as f:
            first = f.readline().split()
        if first:
            host = first[0]
            port = first[1] if len(first) > 1 else "12321"
            coordinator_address = f"{host}:{port}"
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return  # single-process
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", 1))
    process_id = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", 0))
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id,
            initialization_timeout=(None if timeout_s is None
                                    else int(timeout_s)))
    except Exception as exc:
        raise RuntimeError(
            f"distributed initialize failed: process {process_id}/"
            f"{num_processes} could not join {coordinator_address} within "
            f"{timeout_s}s — check that every peer in the ip_config/launch "
            f"set is up (a missing peer no longer hangs, per the "
            f"fail-fast contract)"
        ) from exc
    _initialized = True


def exit_client():
    """Parity: ``dgl.distributed.exit_client`` — shut down the runtime."""
    global _initialized
    if not _initialized:
        return
    import jax

    jax.distributed.shutdown()
    _initialized = False
