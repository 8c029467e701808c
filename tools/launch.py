"""Multi-host launch helper.

Parity: DistDGL's ``tools/launch.py`` (ssh launcher + ip_config). On TPU
pods there is no ssh fan-out to write: every host runs the same program
and ``jax.distributed.initialize()`` discovers the pod topology from the
TPU environment; cross-host collectives ride ICI/DCN automatically once a
global Mesh spans all devices.

Usage on each pod host (or via your pod launcher of choice):

    python tools/launch.py --script examples/train_dist.py -- --parts 16

For non-TPU multi-process testing (the reference's loopback-cluster test
pattern), pass an explicit coordinator:

    python tools/launch.py --coordinator 127.0.0.1:12345 \
        --num-processes 2 --process-id 0 --script examples/train_dist.py
"""

from __future__ import annotations

import argparse
import runpy
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--script", required=True)
    p.add_argument("--coordinator", default=None,
                   help="host:port; omit on TPU pods (auto-discovery)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args, rest = p.parse_known_args()
    if rest and rest[0] == "--":
        rest = rest[1:]

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
    else:
        # TPU pod: topology from the environment.
        jax.distributed.initialize()
    print(f"[launch] process {jax.process_index()}/{jax.process_count()}, "
          f"{jax.local_device_count()} local / {jax.device_count()} global "
          f"devices")

    sys.argv = [args.script] + rest
    runpy.run_path(args.script, run_name="__main__")


if __name__ == "__main__":
    main()
