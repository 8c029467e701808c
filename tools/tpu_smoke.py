"""TPU-COMPILED kernel regression harness (VERDICT r4 #5).

The automated suite runs every Pallas kernel in interpret mode on CPU
(tests/conftest.py); compiled-Mosaic semantics — VMEM budgets, layout
rules, the CHUNK/BWD_SPLIT interactions — were previously exercised
only by ad-hoc bench runs. This script runs each engine COMPILED on
the real chip against host oracles (numpy for SpMM, torch autograd for
the fused attention) on small graphs, values AND grads:

  * hub engine, identity layout  (the 4G fused-pad forward + fused bwd)
  * hub engine, descriptor expand (raw powerlaw graph)
  * ell engine                    (uniform graph)
  * pallas tile engine
  * bdense engine                 (geometric graph)
  * fused attention fwd+bwd at CHUNK=4096 + BWD_SPLIT=2 (the GAT-heavy
    config), identity AND non-identity layouts

Gates are NORMALIZED-L2 errors: the compiled engines run 1-pass bf16
MXU dots at default precision (first finding of this harness —
PERF_NOTES r6 "compiled-TPU numerics audit"), which keeps L2 at a few
1e-3 while per-element max-rel can spike ~1e-1 through grad
cancellation; a structural bug moves L2 to O(1). Max-rel is reported
for the record.

Prints one JSON line per check and a final summary line; exit code 1 on
any failure. Short enough to run as a background job per the CLAUDE.md
TPU rules (one compile per check; ~3-5 min total):

    nohup timeout 580 python tools/tpu_smoke.py > /tmp/tpu_smoke.out &

Wired into the round-exit checklist (CLAUDE.md). The reference's CI
runs its real kernels as the test backend (SURVEY §4 "the CPU build IS
the test backend") — this is the TPU-build counterpart.
"""

from __future__ import annotations

import json
import os
import sys
import time

# The GAT-heavy kernel config, captured at import by hub_format /
# attention — must be set before dgl1_tpu is imported.
os.environ.setdefault("DGL1_TPU_CHUNK", "4096")
os.environ.setdefault("DGL1_TPU_BWD_SPLIT", "2")

import numpy as np


def _np_spmm_oracle(src, dst, n_src, n_dst, x, w):
    """copy_u+sum values and grad_u of sum(y*w) in numpy."""
    y = np.zeros((n_dst, x.shape[1]), np.float64)
    np.add.at(y, dst, x[src].astype(np.float64))
    gx = np.zeros((n_src, x.shape[1]), np.float64)
    np.add.at(gx, src, w[dst].astype(np.float64))
    return y, gx


def _torch_attn_oracle(src, dst, n, el, er, ft, slope):
    """Edge-softmax attention values + grads via torch autograd (CPU)."""
    import torch

    tel = torch.tensor(el, requires_grad=True)
    ter = torch.tensor(er, requires_grad=True)
    tft = torch.tensor(ft, requires_grad=True)
    s = torch.from_numpy(src).long()
    d = torch.from_numpy(dst).long()
    z = torch.nn.functional.leaky_relu(tel[s] + ter[d], slope)  # (E, H)
    zmax = torch.full((n, z.shape[1]), -1e30).index_reduce_(
        0, d, z.detach(), "amax", include_self=True)
    p = torch.exp(z - zmax[d])
    den = torch.zeros((n, z.shape[1])).index_add_(0, d, p)
    a = p / den.clamp_min(1e-30)[d]
    out = torch.zeros((n,) + ft.shape[1:]).index_add_(
        0, d, a.unsqueeze(-1) * tft[s])
    w = torch.ones_like(out)
    (out * w).sum().backward()
    return (out.detach().numpy(), tel.grad.numpy(), ter.grad.numpy(),
            tft.grad.numpy())


def _rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return float(np.max(np.abs(got - want))
                 / max(np.max(np.abs(want)), 1e-12))


def _l2_err(got, want):
    """Normalized L2 error — the primary gate. The compiled engines run
    1-pass bf16 MXU dots at default precision (PERF_NOTES r6), which
    keeps L2 at a few 1e-3 while max-rel can spike to ~1e-1 on single
    cancellation-amplified grad elements; a STRUCTURAL bug (wrong rows,
    bad descriptor, broken merge) moves L2 to O(1)."""
    got = np.asarray(got, np.float64).ravel()
    want = np.asarray(want, np.float64).ravel()
    return float(np.linalg.norm(got - want)
                 / max(np.linalg.norm(want), 1e-12))


def main():
    import jax
    import jax.numpy as jnp

    import dgl1_tpu as dgl
    from dgl1_tpu.data.synthetic import geometric_graph, powerlaw_graph
    from dgl1_tpu.graph import rand_graph
    from dgl1_tpu.ops import dispatch

    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"check": "backend", "ok": False,
                          "note": "no TPU — smoke runs compiled kernels"}))
        sys.exit(1)

    results = []

    def spmm_check(name, g, engine, tol=1e-2):
        t0 = time.perf_counter()
        rng = np.random.default_rng(abs(hash(name)) % (1 << 31))
        src, dst = (np.asarray(a) for a in g.edges())
        n_src, n_dst = g.num_src_nodes(), g.num_dst_nodes()
        x = rng.standard_normal((n_src, 128), np.float32)
        w = rng.standard_normal((n_dst, 128), np.float32)
        y_ref, gx_ref = _np_spmm_oracle(src, dst, n_src, n_dst, x, w)
        gd = jax.device_put(g)
        xd, wd = jnp.asarray(x), jnp.asarray(w)
        dgl.ops.set_engine(engine)
        try:
            got = dispatch.dispatch_gspmm(gd, "copy_lhs", "sum", xd, None)
            if got is None:
                raise RuntimeError(f"engine {engine} declined the call")
            y = np.asarray(jax.jit(
                lambda x: dispatch.dispatch_gspmm(
                    gd, "copy_lhs", "sum", x, None))(xd))
            gx = np.asarray(jax.jit(jax.grad(
                lambda x: jnp.sum(dispatch.dispatch_gspmm(
                    gd, "copy_lhs", "sum", x, None) * wd)))(xd))
        finally:
            dgl.ops.set_engine("auto")
        l2 = max(_l2_err(y, y_ref), _l2_err(gx, gx_ref))
        mx = max(_rel_err(y, y_ref), _rel_err(gx, gx_ref))
        row = {"check": name, "ok": bool(l2 < tol),
               "l2_err": round(l2, 6), "max_rel_err": round(mx, 6),
               "s": round(time.perf_counter() - t0, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)

    def attn_check(name, g, h=8, d=32, tol=2e-2):
        from dgl1_tpu.ops.attention import gat_attention

        t0 = time.perf_counter()
        rng = np.random.default_rng(abs(hash(name)) % (1 << 31))
        src, dst = (np.asarray(a) for a in g.edges())
        n = g.num_nodes()
        el = rng.standard_normal((n, h), np.float32)
        er = rng.standard_normal((n, h), np.float32)
        ft = rng.standard_normal((n, h, d), np.float32)
        o_ref, gel_ref, ger_ref, gft_ref = _torch_attn_oracle(
            src, dst, n, el, er, ft, 0.2)
        gd = jax.device_put(g)
        eld, erd, ftd = jnp.asarray(el), jnp.asarray(er), jnp.asarray(ft)
        out = gat_attention(gd, eld, erd, ftd)
        if out is None:
            row = {"check": name, "ok": False, "note": "fusion declined"}
            results.append(row)
            print(json.dumps(row), flush=True)
            return
        y = np.asarray(jax.jit(
            lambda el, er, ft: gat_attention(gd, el, er, ft))(
                eld, erd, ftd))
        gel, ger, gft = (np.asarray(a) for a in jax.jit(jax.grad(
            lambda el, er, ft: jnp.sum(gat_attention(gd, el, er, ft)),
            argnums=(0, 1, 2)))(eld, erd, ftd))
        l2_val = _l2_err(y, o_ref)
        # ger is STRUCTURALLY near-zero (the softmax-jacobian row sums
        # sum_e a_e (g_e - rho) vanish per destination wherever no
        # leaky kink flips), so error relative to ||ger|| explodes on
        # rounding noise accumulated over hub in-degrees; normalize
        # against the healthy same-units gel scale instead — a
        # structural bug still lands at O(||gel||).
        ger_den = max(float(np.linalg.norm(ger_ref)),
                      float(np.linalg.norm(gel_ref)))
        l2_grads = {"gel": _l2_err(gel, gel_ref),
                    "ger": float(np.linalg.norm(
                        (ger - ger_ref).ravel()) / max(ger_den, 1e-12)),
                    "gft": _l2_err(gft, gft_ref)}
        # Values see one rounding chain (~5e-3 L2); the logit grads run
        # through the jacobian DIFFERENCE g_e - rho, where bf16-rounded
        # operands of similar magnitude amplify to a few 1e-2 L2
        # (PERF_NOTES r6). Structural bugs are O(1) on both.
        ok = l2_val < tol and max(l2_grads.values()) < 1e-1
        row = {"check": name, "ok": bool(ok),
               "l2_val": round(l2_val, 6),
               "l2_grads": {k: round(v, 6) for k, v in l2_grads.items()},
               "s": round(time.perf_counter() - t0, 1),
               "chunk": int(os.environ["DGL1_TPU_CHUNK"]),
               "bwd_split": int(os.environ["DGL1_TPU_BWD_SPLIT"])}
        results.append(row)
        print(json.dumps(row), flush=True)

    n = 1 << 14
    # hub=True forces the hub layout (the auto density bar can decline
    # at this small scale); the same floor rides the reorder rebuild.
    g_pl = powerlaw_graph(n, 8, seed=1, hub=True)
    g_hub_id = dgl.reorder_graph(g_pl, node_permute_algo="hub",
                                 permute_config={"hub": True})
    assert g_hub_id.hub_dst_meta.identity_expand
    spmm_check("hub_identity_spmm", g_hub_id, "hub")
    spmm_check("hub_expand_spmm", g_pl, "hub")
    spmm_check("ell_spmm", rand_graph(n, n * 8, seed=1), "ell")
    spmm_check("pallas_spmm", rand_graph(n, n * 8, seed=2), "pallas")
    g_geo = geometric_graph(n, 8, seed=1,
                            formats=("coo", "csr", "csc", "tile", "ell",
                                     "hub", "bdense"))
    spmm_check("bdense_spmm", g_geo, "bdense")
    attn_check("fused_attention_identity", g_hub_id)
    attn_check("fused_attention_expand", g_pl)

    ok = all(r["ok"] for r in results)
    print(json.dumps({"summary": "tpu_smoke", "ok": ok,
                      "checks": len(results),
                      "failed": [r["check"] for r in results
                                 if not r["ok"]]}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
