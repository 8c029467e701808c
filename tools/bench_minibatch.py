"""Mini-batch GraphSAGE epoch-time benchmark at ogbn-products scale
(BASELINE.md metric: "epoch time — ogbn-products (sampled GraphSAGE)").

The pipeline has three stages, measured separately because they overlap
in steady state (the dataloader prefetches on a host thread while the
device trains on the previous batch):

* **host sampling** — neighbor sampling + to_block per batch (numpy/C++);
* **transfer** — blocks + feature indices to device. On this dev setup
  the tunnel moves ~8MB/s (docs/PERF_NOTES.md) which is 3 orders of
  magnitude below a production host link, so it is reported but NOT
  folded into the epoch estimate;
* **device step** — on-device feature-row gather (features HBM-resident)
  + 2-layer GraphSAGE fwd+bwd+adam on padded static-shape blocks, timed
  with the two-point chained-fori_loop method (the tunnel's fixed
  ~30-45ms dispatch+fetch roundtrip cancels in the slope).

Epoch time (overlapped) = steps_per_epoch * max(host, device).

Parity anchor: ``examples/pytorch/graphsage/train_sampling.py`` timings;
graph is a synthetic scale-match (no network: N=2.45M, E=124M directed,
F=100, 47 classes, 196,615 train seeds — the ogbn-products card).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_graph(scale: str, seed: int = 0, frac: float = 1.0):
    import dgl1_tpu as dgl

    if scale == "products":
        n, e, f, classes, n_train = 2_449_029, 123_718_280, 100, 47, 196_615
        deg_alpha = 2.9  # products is mildly skewed (co-purchase)
    elif scale == "reddit":
        n, e, f, classes, n_train = 232_965, 114_615_892, 602, 41, 153_431
        deg_alpha = 2.2
    elif scale == "papers100m":
        # ogbn-papers100M card: 111M nodes / 1.6B edges / 128 feats /
        # 172 classes / 1.21M labeled (train) — BASELINE config #5's
        # graph. Features exceed HBM by construction (57GB f32); the
        # bench keeps them in a HostFeatureStore (f16, 28GB host RAM).
        n, e, f, classes, n_train = (111_059_956, 1_615_685_872, 128,
                                     172, 1_207_179)
        deg_alpha = 2.4  # citation tail
    else:  # smoke
        n, e, f, classes, n_train = 20_000, 200_000, 32, 7, 4_000
        deg_alpha = 2.5
    if frac < 1.0:
        n = int(n * frac)
        e = int(e * frac)
        n_train = int(n_train * frac)

    # The papers100M-scale build (two 1.6B-edge counting sorts) takes
    # ~25 min on this 2-core host — cache the CSC to disk and
    # reconstruct the (sampling-only) Graph directly on reruns.
    cache = None
    if scale == "papers100m":
        import os
        from pathlib import Path

        cdir = Path(os.environ.get("DGL1_TPU_DATA_DIR",
                                   Path.home() / ".dgl1_tpu")) / "bench_cache"
        cdir.mkdir(parents=True, exist_ok=True)
        cache = cdir / f"papers100m_{frac}.npz"
        if cache.exists():
            from dgl1_tpu.graph import Graph

            z = np.load(cache)
            dummy = np.zeros((1,), np.int32)
            g = Graph(
                src=z["coo_src"], dst=z["coo_dst"],
                edge_mask=np.ones((e,), bool),
                csr_indptr=dummy, csr_dst=dummy, csr_eid=dummy,
                csr_src=dummy,
                csc_indptr=z["csc_indptr"], csc_src=z["csc_src"],
                csc_eid=z["csc_eid"], csc_dst=z["csc_dst"],
                num_src_nodes=n, num_dst_nodes=n, num_edges=e,
            )
            rng2 = np.random.default_rng(seed + 1)
            train_ids = rng2.choice(n, size=n_train, replace=False)
            print("[build] loaded cached csc", flush=True)
            return g, f, classes, train_ids

    rng = np.random.default_rng(seed)
    # Zipf-ish dst degrees, uniform src — same family as
    # data/synthetic.py but O(E) (repeat by degree, not choice(p=...)):
    # at E=124M on a 2-core host the weighted choice takes minutes.
    w = rng.zipf(deg_alpha, size=n).astype(np.float64)
    deg = np.maximum((w * (e / w.sum())).astype(np.int64), 0)
    dst = np.repeat(np.arange(n, dtype=np.int64), deg)
    if len(dst) < e:
        dst = np.concatenate([dst, rng.integers(0, n, size=e - len(dst))])
    dst = dst[:e]
    src = rng.integers(0, n, size=e).astype(np.int64)
    g = dgl.graph((src, dst), num_nodes=n, formats=("csc",))
    if cache is not None:
        np.savez(cache, coo_src=np.asarray(g.src), coo_dst=np.asarray(g.dst),
                 csc_indptr=np.asarray(g.csc_indptr),
                 csc_src=np.asarray(g.csc_src),
                 csc_eid=np.asarray(g.csc_eid),
                 csc_dst=np.asarray(g.csc_dst))
        print(f"[build] cached csc -> {cache}", flush=True)
    rng2 = np.random.default_rng(seed + 1)
    train_ids = rng2.choice(n, size=n_train, replace=False)
    return g, f, classes, train_ids


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scale", default="products",
                   choices=["products", "reddit", "papers100m", "smoke"])
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--fanouts", default="10,25")
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--num-workers", type=int, default=2)
    p.add_argument("--host-batches", type=int, default=8,
                   help="batches to time the host sampler over")
    p.add_argument("--iters", default="10,60",
                   help="two-point device iteration counts")
    p.add_argument("--frac", type=float, default=1.0,
                   help="scale nodes/edges/seeds down for smoke runs")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--host-only", action="store_true",
                   help="measure only the host sampler rate (worker-"
                        "scaling sweeps; skips device compile/steps)")
    p.add_argument("--prefetch", type=int, default=2,
                   help="per-worker queue depth; 0 = inline (no threads"
                        ") — the unbiased serial sampler cost per batch")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    import dgl1_tpu as dgl  # noqa: F401
    from dgl1_tpu.dataloading import NeighborSampler, NodeDataLoader
    from dgl1_tpu.models import GraphSAGE

    t0 = time.perf_counter()
    g, in_f, classes, train_ids = build_graph(args.scale, frac=args.frac)
    build_s = time.perf_counter() - t0
    print(f"[build] {g.num_nodes()} nodes {g.num_edges()} edges "
          f"in {build_s:.1f}s", flush=True)

    fanouts = [int(x) for x in args.fanouts.split(",")]
    sampler = NeighborSampler(fanouts)
    loader = NodeDataLoader(g, train_ids, sampler,
                            batch_size=args.batch_size, shuffle=True,
                            seed=0, num_workers=args.num_workers,
                            prefetch=args.prefetch)
    steps_per_epoch = -(-len(train_ids) // args.batch_size)

    # ---- host sampling rate ----
    it = iter(loader)
    first = next(it)  # warm caches
    t0 = time.perf_counter()
    done = 0
    for _ in range(args.host_batches):
        try:
            next(it)
            done += 1
        except StopIteration:
            break
    host_ms = (time.perf_counter() - t0) / max(done, 1) * 1e3

    print(json.dumps({
        "scale": args.scale, "num_workers": args.num_workers,
        "batch_size": args.batch_size,
        "host_sample_ms_per_batch": round(host_ms, 2),
    }), flush=True)
    inp, out, blocks, mask = first

    # ---- transfer time (tunnel artifact; reported, not folded in) ----
    if args.host_only and args.scale != "papers100m":
        return
    t0 = time.perf_counter()
    if args.host_only:
        blocks_d = inp_d = mask_d = None
        transfer_ms = 0.0
    else:
        blocks_d = jax.device_put(blocks)
        inp_d = jax.device_put(jnp.asarray(inp))
        mask_d = jax.device_put(jnp.asarray(mask))
        jax.block_until_ready(jax.tree.leaves(blocks_d))
        transfer_ms = (time.perf_counter() - t0) * 1e3

    # ---- host feature store (beyond-HBM scales: BASELINE config #5) ----
    n = g.num_nodes()
    beyond_hbm = args.scale == "papers100m"
    pull_ms = None
    if beyond_hbm:
        from dgl1_tpu.data import HostFeatureStore

        t0 = time.perf_counter()
        feat_h = np.empty((n, in_f), np.float16)
        for i in range(0, n, 1 << 22):  # touch pages so pulls are honest
            feat_h[i: i + (1 << 22)] = 0.5
        store = HostFeatureStore(feat_h)
        alloc_s = time.perf_counter() - t0
        print(f"[store] {feat_h.nbytes / 2**30:.1f} GiB host f16 features "
              f"resident in {alloc_s:.1f}s", flush=True)
        t0 = time.perf_counter()
        x_host = store.pull(np.asarray(inp))
        for _ in range(4):
            x_host = store.pull(np.asarray(inp))
        pull_ms = (time.perf_counter() - t0) / 5 * 1e3

        # Worker-side feature prefetch (the overlap lever, PERF_NOTES
        # r6): the SAME loader with pull_features= runs the store pull
        # INSIDE the prefetch threads — steady-state drain then shows
        # whether pull and sampling genuinely overlap (pipelined
        # ms/batch vs the serial sample+pull sum).
        loader_pf = NodeDataLoader(
            g, train_ids, sampler, batch_size=args.batch_size,
            shuffle=True, seed=0, num_workers=args.num_workers,
            prefetch=args.prefetch,
            pull_features=lambda inp: store.pull(np.asarray(inp)))
        it2 = iter(loader_pf)
        next(it2)
        t0 = time.perf_counter()
        done2 = 0
        for _ in range(args.host_batches):
            try:
                next(it2)
                done2 += 1
            except StopIteration:
                break
        overlap_ms = (time.perf_counter() - t0) / max(done2, 1) * 1e3
        print(json.dumps({
            "scale": args.scale, "num_workers": args.num_workers,
            "sample_ms": round(host_ms, 2), "pull_ms": round(pull_ms, 2),
            "serial_sum_ms": round(host_ms + pull_ms, 2),
            "worker_prefetched_pull_ms_per_batch": round(overlap_ms, 2),
        }), flush=True)

    if args.host_only:
        return

    # ---- device step ----
    if beyond_hbm:
        # Features arrive per batch from the host store (KVStore-pull
        # parity): the step consumes the gathered block directly.
        feat = jax.device_put(x_host)
        labels = jax.random.randint(
            jax.random.PRNGKey(1), (len(np.asarray(out)),), 0, classes)
    else:
        # Features HBM-resident; the step row-gathers on device.
        feat = jax.random.normal(jax.random.PRNGKey(0), (n, in_f),
                                 jnp.float32)
        labels = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, classes)

    model = GraphSAGE(hidden_feats=args.hidden, out_feats=classes,
                      num_layers=len(fanouts))
    x0 = (feat.astype(jnp.float32) if beyond_hbm
          else jnp.take(feat, inp_d, axis=0, mode="clip"))
    params = model.init(jax.random.PRNGKey(2), blocks_d, x0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    out_d = jax.device_put(jnp.asarray(np.asarray(out)))

    def step(carry, feat, labels, blocks, inp_ids, out_ids, mask):
        params, opt_state = carry

        def loss_fn(p):
            if beyond_hbm:
                x, y = feat.astype(jnp.float32), labels
            else:
                x = jnp.take(feat, inp_ids, axis=0, mode="clip")
                y = jnp.take(labels, out_ids, mode="clip")
            logits = model.apply(p, blocks, x)
            logp = jax.nn.log_softmax(logits)
            ce = -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]
            m = mask.astype(jnp.float32)
            return jnp.sum(ce * m) / jnp.maximum(jnp.sum(m), 1.0)

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state

    iters_lo, iters_hi = (int(x) for x in args.iters.split(","))
    totals = []
    for iters in (iters_lo, iters_hi):
        # feat/labels ride as jit ARGUMENTS: closed-over device arrays are
        # baked into the HLO as constants, which overflows the remote-
        # compile path at products scale (980MB feature matrix -> HTTP 413).
        @jax.jit
        def run(params, opt_state, feat, labels, blocks, inp_ids, out_ids,
                mask):
            def body(i, carry):
                return step(carry, feat, labels, blocks, inp_ids, out_ids,
                            mask)

            return jax.lax.fori_loop(0, iters, body, (params, opt_state))

        r = run(params, opt_state, feat, labels, blocks_d, inp_d, out_d,
                mask_d)
        _ = float(jax.tree.leaves(r[0])[0].reshape(-1)[0])
        t0 = time.perf_counter()
        r = run(params, opt_state, feat, labels, blocks_d, inp_d, out_d,
                mask_d)
        _ = float(jax.tree.leaves(r[0])[0].reshape(-1)[0])
        totals.append(time.perf_counter() - t0)
    device_ms = (totals[1] - totals[0]) / (iters_hi - iters_lo) * 1e3

    stages = {"host_sampler": host_ms, "device": device_ms}
    if pull_ms is not None:
        stages["feature_pull"] = pull_ms
    bottleneck = max(stages.values())
    rec = {
        "scale": args.scale,
        "nodes": g.num_nodes(), "edges": g.num_edges(),
        "batch_size": args.batch_size, "fanouts": fanouts,
        "hidden": args.hidden,
        "steps_per_epoch": steps_per_epoch,
        "host_sample_ms_per_batch": round(host_ms, 2),
        "device_step_ms_per_batch": round(device_ms, 2),
        "transfer_ms_per_batch_tunnel": round(transfer_ms, 2),
        "epoch_s_overlapped": round(steps_per_epoch * bottleneck / 1e3, 2),
        "bottleneck": max(stages, key=stages.get),
        "backend": jax.default_backend(),
    }
    if pull_ms is not None:
        rec["feature_pull_ms_per_batch"] = round(pull_ms, 2)
        rec["input_rows_per_batch"] = int(np.asarray(inp).shape[0])
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
