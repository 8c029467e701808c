"""DGMG — deep generative model of graphs (parity: ``examples/pytorch/dgmg``,
Li et al. 2018) trained on cycles.

The reference implementation grows a DGLGraph node-by-node in Python and
backprops through the dynamic episode. The TPU-native design instead
encodes each teacher-forced generation episode as a STATIC-SHAPE decision
tape (step type + label + current-node slot per step) and evaluates the
episode NLL with one ``lax.scan`` over the tape: node states live in a
fixed (N_max, D) buffer with an activity mask, the growing edge set is a
masked dense (N_max, N_max) adjacency (message passing = one small
matmul, MXU-friendly), and every step runs the same masked computation
(add-node Bernoulli, add-edge Bernoulli, choose-destination softmax)
selected by the step-type code. One XLA program for every episode
length; vmap batches episodes.

Generation (eval) runs the same parameters eagerly in numpy,
autoregressively sampling decisions; the gate checks the fraction of
sampled graphs that are valid cycles.
"""

from __future__ import annotations

import argparse
import time

# Step-type codes in the decision tape.
ADDNODE, ADDEDGE, CHOOSE, PAD = 0, 1, 2, 3


def cycle_tape(n: int, n_max: int):
    """Teacher-forced episode for an n-cycle built in canonical order:
    node i links to i-1; the last node also links back to node 0."""
    steps = []  # (type, label, cur_slot)
    for i in range(n):
        steps.append((ADDNODE, 1, i))
        if i == 0:
            steps.append((ADDEDGE, 0, i))
        else:
            steps.append((ADDEDGE, 1, i))
            steps.append((CHOOSE, i - 1, i))
            if i == n - 1:
                steps.append((ADDEDGE, 1, i))
                steps.append((CHOOSE, 0, i))
            steps.append((ADDEDGE, 0, i))
    steps.append((ADDNODE, 0, min(n, n_max - 1)))
    t_max = 4 * n_max + 1
    steps += [(PAD, 0, 0)] * (t_max - len(steps))
    return steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-min", type=int, default=5)
    p.add_argument("--n-max", type=int, default=10)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=700)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--samples", type=int, default=50)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    import optax

    D = args.hidden
    N = args.n_max

    key = jax.random.PRNGKey(0)

    def dense(key, m, n):
        return jax.random.normal(key, (m, n)) * (1.0 / np.sqrt(m))

    ks = jax.random.split(key, 16)
    params = {
        # one GRU prop round: msg = adj @ (h W_m); gates on [h, msg]
        "W_m": dense(ks[0], D, D),
        "W_z": dense(ks[1], 2 * D, D), "b_z": jnp.zeros(D),
        "W_r": dense(ks[2], 2 * D, D), "b_r": jnp.zeros(D),
        "W_n": dense(ks[3], 2 * D, D), "b_n": jnp.zeros(D),
        # gated-sum graph embedding
        "W_gate": dense(ks[4], D, 1),
        "W_emb": dense(ks[5], D, D),
        # heads
        "w_an": dense(ks[6], D, 1), "b_an": jnp.zeros(1),
        "W_init": dense(ks[7], D, D), "b_init": jnp.zeros(D),
        "W_ae": dense(ks[8], 2 * D, 1), "b_ae": jnp.zeros(1),
        "W_s1": dense(ks[9], D, D), "W_s2": dense(ks[10], D, D),
    }

    def prop(p, h, adj, mask):
        msg = (adj @ (h @ p["W_m"])) * mask[:, None]
        x = jnp.concatenate([h, msg], axis=-1)
        z = jax.nn.sigmoid(x @ p["W_z"] + p["b_z"])
        r = jax.nn.sigmoid(x @ p["W_r"] + p["b_r"])
        xn = jnp.concatenate([r * h, msg], axis=-1)
        n = jnp.tanh(xn @ p["W_n"] + p["b_n"])
        return ((1 - z) * h + z * n) * mask[:, None]

    def graph_emb(p, h, mask):
        gate = jax.nn.sigmoid(h @ p["W_gate"])[:, 0] * mask
        return (gate[:, None] * (h @ p["W_emb"])).sum(0)

    def episode_nll(p, types, labels, slots):
        """NLL of one teacher-forced episode (scan over the tape)."""

        def step(carry, inp):
            h, adj, mask = carry
            t, lab, cur = inp
            h = prop(p, h, adj, mask)
            hg = graph_emb(p, h, mask)
            h_cur = h[cur]

            # add-node Bernoulli
            logit_an = (hg @ p["w_an"] + p["b_an"])[0]
            nll_an = optax.sigmoid_binary_cross_entropy(
                logit_an, lab.astype(jnp.float32))
            # add-edge Bernoulli
            logit_ae = (jnp.concatenate([hg, h_cur]) @ p["W_ae"]
                        + p["b_ae"])[0]
            nll_ae = optax.sigmoid_binary_cross_entropy(
                logit_ae, lab.astype(jnp.float32))
            # choose-destination softmax over active nodes != cur
            scores = (h @ p["W_s1"]) @ (h_cur @ p["W_s2"])
            ok = (mask > 0) & (jnp.arange(N) != cur)
            scores = jnp.where(ok, scores, -1e30)
            nll_ch = -jax.nn.log_softmax(scores)[lab]

            nll = jnp.select(
                [t == ADDNODE, t == ADDEDGE, t == CHOOSE],
                [nll_an, nll_ae, nll_ch], 0.0)

            # state update
            new_node = (t == ADDNODE) & (lab == 1)
            h_init = jnp.tanh(hg @ p["W_init"] + p["b_init"])
            h = jnp.where((jnp.arange(N) == cur)[:, None] & new_node,
                          h_init[None, :], h)
            mask = jnp.where(new_node,
                             mask.at[cur].set(1.0), mask)
            edge = (t == CHOOSE)
            upd = jnp.zeros((N, N)).at[cur, lab].set(1.0).at[lab, cur].set(1.0)
            adj = jnp.where(edge, jnp.maximum(adj, upd), adj)
            return (h, adj, mask), nll

        h0 = jnp.zeros((N, D))
        adj0 = jnp.zeros((N, N))
        mask0 = jnp.zeros(N)
        (_, _, _), nlls = jax.lax.scan(step, (h0, adj0, mask0),
                                       (types, labels, slots))
        return nlls.sum()

    def batch_loss(p, types, labels, slots):
        return jax.vmap(lambda t, l, s: episode_nll(p, t, l, s))(
            types, labels, slots).mean()

    # Training tapes: one per cycle size, sampled per batch.
    rng = np.random.default_rng(0)
    tapes = {n: np.asarray(cycle_tape(n, N), np.int32)
             for n in range(args.n_min, args.n_max + 1)}

    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    grad_fn = jax.jit(jax.value_and_grad(batch_loss))

    t0 = time.perf_counter()
    for it in range(1, args.iters + 1):
        ns = rng.integers(args.n_min, args.n_max + 1, size=args.batch)
        tape = np.stack([tapes[int(n)] for n in ns])
        types, labels, slots = (jnp.asarray(tape[:, :, 0]),
                                jnp.asarray(tape[:, :, 1]),
                                jnp.asarray(tape[:, :, 2]))
        loss, grads = grad_fn(params, types, labels, slots)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        if it % 50 == 0 or it == 1:
            print(f"iter {it:4d} nll/episode {float(loss):.3f} "
                  f"({time.perf_counter() - t0:.1f}s)")

    # ---- eager autoregressive sampling with the learned params ----
    pn = {k: np.asarray(v) for k, v in params.items()}

    def np_sigmoid(x):
        return 1.0 / (1.0 + np.exp(-x))

    def sample_graph(rng):
        h = np.zeros((N, D)); adj = np.zeros((N, N)); mask = np.zeros(N)
        edges = []
        n_nodes = 0
        for cur in range(N):
            # prop + graph embedding (mirror of the jax fns)
            def _prop_emb():
                msg = (adj @ (h @ pn["W_m"])) * mask[:, None]
                x = np.concatenate([h, msg], -1)
                z = np_sigmoid(x @ pn["W_z"] + pn["b_z"])
                r = np_sigmoid(x @ pn["W_r"] + pn["b_r"])
                xn = np.concatenate([r * h, msg], -1)
                nh = ((1 - z) * h + z * np.tanh(
                    xn @ pn["W_n"] + pn["b_n"])) * mask[:, None]
                gate = np_sigmoid(nh @ pn["W_gate"])[:, 0] * mask
                return nh, (gate[:, None] * (nh @ pn["W_emb"])).sum(0)

            h, hg = _prop_emb()
            if rng.random() >= np_sigmoid((hg @ pn["w_an"] + pn["b_an"])[0]):
                break
            h[cur] = np.tanh(hg @ pn["W_init"] + pn["b_init"])
            mask[cur] = 1.0
            n_nodes += 1
            for _ in range(N):  # edge decisions for this node
                h, hg = _prop_emb()
                logit = (np.concatenate([hg, h[cur]]) @ pn["W_ae"]
                         + pn["b_ae"])[0]
                if rng.random() >= np_sigmoid(logit):
                    break
                h, hg = _prop_emb()  # CHOOSE is its own prop step in training
                scores = (h @ pn["W_s1"]) @ (h[cur] @ pn["W_s2"])
                ok = (mask > 0) & (np.arange(N) != cur)
                scores = np.where(ok, scores, -1e30)
                e = np.exp(scores - scores.max())
                dest = int(rng.choice(N, p=e / e.sum()))
                adj[cur, dest] = adj[dest, cur] = 1.0
                edges.append((cur, dest))
        return n_nodes, adj

    def is_cycle(n, adj):
        if n < 3:
            return False
        deg = adj[:n, :n].sum(1)
        if not np.all(deg == 2):
            return False
        # connected: walk the cycle
        seen = {0}
        prev, cur = -1, 0
        for _ in range(n):
            nbrs = [j for j in range(n) if adj[cur, j] and j != prev]
            if not nbrs:
                return False
            prev, cur = cur, nbrs[0]
            seen.add(cur)
        return len(seen) == n and cur == 0

    srng = np.random.default_rng(1)
    valid = sizes = 0
    size_list = []
    for _ in range(args.samples):
        n, adj = sample_graph(srng)
        size_list.append(n)
        if is_cycle(n, adj):
            valid += 1
            if args.n_min <= n <= args.n_max:
                sizes += 1
    frac = valid / args.samples
    print(f"[dgmg] {args.samples} samples: {frac:.2f} valid cycles "
          f"({sizes} within trained size range; sizes {sorted(set(size_list))})")
    assert frac >= 0.7, f"gate failed: valid-cycle fraction {frac:.2f} < 0.7"
    print("gate passed: >= 70% of sampled graphs are valid cycles")


if __name__ == "__main__":
    main()
