"""Example integration harness: run EVERY examples/*.py in a smoke config.

Parity: the reference CI's ``tests/scripts/task_example_test.sh`` (runs
selected examples end-to-end for a few epochs as integration tests,
SURVEY.md §4) — here ALL examples run, each with its own built-in
accuracy/R2/validity gate asserted, on CPU with tiny-but-gate-passing
configurations.

Usage:
    python tools/run_examples.py            # run all (--jobs 2 default)
    python tools/run_examples.py --only gcn gat
    python tools/run_examples.py --jobs 1   # sequential
    python tools/run_examples.py --list

Exit code 0 iff every example passed. This is part of the round's exit
checklist (see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# name -> (args, timeout_s). Every entry must keep the example's internal
# gates passing — these are integration tests, not just smoke imports.
EXAMPLES = {
    "train_gcn.py": (["--epochs", "60"], 300),
    "train_gat.py": (["--epochs", "40"], 400),
    "train_gcn2.py": (["--epochs", "60", "--layers", "4"], 400),
    "train_citation_zoo.py": (["--epochs", "50"], 900),
    "train_sage_minibatch.py": (["--epochs", "2"], 600),
    "train_cluster_gcn.py": (["--epochs", "8"], 500),
    "train_saint.py": (["--epochs", "5"], 500),
    "train_sign.py": (["--epochs", "40"], 400),
    "train_dgi.py": (["--epochs", "30", "--probe-epochs", "30"], 400),
    "train_link_pred.py": (["--epochs", "3"], 400),
    "train_hetero.py": (["--epochs", "40"], 400),
    "train_hetero_link_pred.py": (["--epochs", "3"], 400),
    "train_han.py": (["--epochs", "30"], 400),
    "train_rgcn.py": (["--epochs", "40"], 400),
    # Identity-rate typed path flag (engages on hub-bearing graphs;
    # exercises the graceful fallback on the synthetic AIFB stand-in).
    "train_rgcn.py#identity": (["--epochs", "40", "--identity"], 400),
    "train_rgcn_link_pred.py": (["--epochs", "5"], 500),
    "train_rgcn_sampled.py": (["--epochs", "2"], 600),
    "train_rgcn_dist.py": (["--parts", "2", "--epochs", "40"], 500),
    "train_dist.py": (["--parts", "2", "--epochs", "20",
                       "--nodes", "5000"], 400),
    # FAILABLE int8-wire gate (VERDICT r4 #4b): hard SBM task with real
    # headroom (f32 and int8 both reach ~0.888 at this config, cut
    # 0.425 — calibrated 2026-08-21); wire or identity-relabel damage
    # costing >= ~5 points trips the 0.84 gate. Flagship config:
    # hub-identity combined+prefilled + int8 halo wire on 4 parts.
    "train_dist.py#hard-int8": (
        ["--parts", "4", "--nodes", "4000", "--epochs", "30",
         "--homophily", "0.55", "--noise-mult", "1.0",
         "--halo-dtype", "int8", "--hub-identity",
         "--acc-gate", "0.84"], 600),
    "train_dist_sampled.py": (["--parts", "2", "--epochs", "2",
                               "--nodes", "3000", "--sharded-store"], 600),
    "train_graph_classification.py": (["--epochs", "12"], 500),
    "train_diffpool.py": (["--epochs", "300"], 600),
    "train_ggnn.py": (["--epochs", "60"], 900),
    "train_chem.py": (["--model", "mpnn", "--epochs", "8"], 900),
    "train_lgnn.py": (["--epochs", "6"], 500),
    "train_treelstm.py": (["--epochs", "5"], 500),
    "train_pinsage.py": (["--steps", "60"], 400),
    "train_metapath2vec.py": (["--epochs", "30"], 600),
    "train_dgmg.py": (["--iters", "700", "--samples", "50"], 700),
    "train_pointcloud.py": (["--epochs", "20"], 700),
    "train_transformer.py": (["--steps", "400"], 500),
    "train_gcmc.py": ([], 500),
    "train_rgcn_dist_sampled.py": (["--parts", "4",
                                    "--epochs", "4"], 700),
}

# Examples that drive multi-device meshes need virtual CPU devices.
NEEDS_DEVICES = {"train_dist.py", "train_dist_sampled.py",
                 "train_rgcn_dist.py", "train_rgcn_dist_sampled.py"}
# train_dist_sampled spawns its own coordinator+workers (no --cpu flag).
NO_CPU_FLAG = {"train_dist_sampled.py"}


def run_one(name: str, args, timeout_s: int, verbose: bool = False):
    # "script.py#variant" keys run the same script under a second
    # config (e.g. train_dist.py#hard-int8, the failable wire gate).
    script = name.split("#")[0]
    cmd = [sys.executable, str(REPO / "examples" / script)] + list(args)
    if script not in NO_CPU_FLAG:
        cmd.append("--cpu")
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    if script in NEEDS_DEVICES:
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()
    t0 = time.perf_counter()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s, env=env)
        rc = p.returncode
        out = p.stdout + p.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1

        def _s(b):
            return (b.decode(errors="replace")
                    if isinstance(b, bytes) else (b or ""))

        out = (_s(e.stdout) + _s(e.stderr)
               + f"\n*** TIMEOUT after {timeout_s}s")
    dt = time.perf_counter() - t0
    return rc, dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filters on example names")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--verbose", action="store_true",
                    help="print each example's output")
    ap.add_argument("--jobs", type=int, default=2,
                    help="concurrent example subprocesses (examples are "
                         "independent; 2 saturates the dev box)")
    args = ap.parse_args()

    names = sorted(EXAMPLES)
    # Coverage guard: every examples/*.py must have a harness entry
    # (variant keys "script.py#variant" count for their script).
    base_names = {n.split("#")[0] for n in EXAMPLES}
    on_disk = sorted(p.name for p in (REPO / "examples").glob("*.py"))
    missing = [n for n in on_disk if n not in base_names]
    if missing:
        print(f"FATAL: examples without a harness entry: {missing}")
        return 2
    if args.only:
        names = [n for n in names
                 if any(s in n for s in args.only)]
    if args.list:
        for n in names:
            print(n, " ".join(EXAMPLES[n][0]))
        return 0

    failures = []
    total_t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor

    def job(name):
        ex_args, timeout_s = EXAMPLES[name]
        return name, run_one(name, ex_args, timeout_s, args.verbose)

    done = 0
    with ThreadPoolExecutor(max_workers=max(args.jobs, 1)) as pool:
        # Longest-first submission order packs the pool better; results
        # print as they complete.
        order = sorted(names, key=lambda n: -EXAMPLES[n][1])
        for name, (rc, dt, out) in pool.map(job, order):
            done += 1
            status = "ok" if rc == 0 else f"FAIL rc={rc}"
            print(f"[{done:2d}/{len(names)}] {name:36s} {status:10s} "
                  f"{dt:6.1f}s", flush=True)
            if args.verbose or rc != 0:
                tail = "\n".join(out.strip().splitlines()[-15:])
                print("    " + tail.replace("\n", "\n    "), flush=True)
            if rc != 0:
                failures.append(name)
    dt = time.perf_counter() - total_t0
    print(f"\n{len(names) - len(failures)}/{len(names)} passed "
          f"in {dt / 60:.1f} min")
    if failures:
        print("FAILED:", " ".join(failures))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
