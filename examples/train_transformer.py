"""Graph transformer: attention as message passing (seq2seq).

Parity: ``examples/pytorch/transformer`` — the reference implements a
full transformer where every attention is a graph operation (u_dot_v
logits -> edge_softmax -> u_mul_e aggregation) over complete /
causal / bipartite attention graphs. Here the same construction solves a
sequence-reversal task: encoder self-attention on a complete graph,
decoder self-attention on a causal graph, cross-attention on a complete
bipartite block — all through ``dgl.ops`` builtins, batched with
``dgl.batch`` into one static program per step (every sequence has a
fixed length, so the whole epoch compiles once).

Gate: teacher-forced token accuracy >= 0.95.
"""

from __future__ import annotations

import argparse
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--vocab", type=int, default=20)
    p.add_argument("--seq-len", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--lr", type=float, default=3e-3)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--min-acc", type=float, default=0.95)
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import flax.linen as nn
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dgl1_tpu as dgl
    from dgl1_tpu.graph import block as make_block

    L, B, V = args.seq_len, args.batch_size, args.vocab
    D, H = args.dim, args.heads
    Dh = D // H

    # Attention graphs for ONE sequence; batched B times (static shapes).
    full_s, full_d = np.meshgrid(np.arange(L), np.arange(L))
    enc_g1 = dgl.graph((full_s.ravel(), full_d.ravel()), num_nodes=L)
    causal = full_s.ravel() <= full_d.ravel()
    dec_g1 = dgl.graph((full_s.ravel()[causal], full_d.ravel()[causal]),
                       num_nodes=L)
    enc_g = dgl.batch([enc_g1] * B)
    dec_g = dgl.batch([dec_g1] * B)
    # Batched bipartite cross-attention block (enc positions -> dec
    # positions, per sequence) built directly with offsets.
    cs = (full_s.ravel()[None, :] + np.arange(B)[:, None] * L).ravel()
    cd = (full_d.ravel()[None, :] + np.arange(B)[:, None] * L).ravel()
    cross_g = make_block((cs, cd), num_src_nodes=B * L,
                         num_dst_nodes=B * L)

    def graph_attention(g, q, k, v):
        """Multi-head dot attention as message passing: logits =
        u_dot_v / sqrt(d) -> edge_softmax -> u_mul_e sum."""
        logits = dgl.ops.gsddmm(g, "dot", k, q, lhs_target="u",
                                rhs_target="v") / np.sqrt(Dh)
        a = dgl.ops.edge_softmax(g, logits)
        return dgl.ops.gspmm(g, "mul", "sum", v, a)

    class MHA(nn.Module):
        @nn.compact
        def __call__(self, g, x_src, x_dst):
            n_s, n_d = x_src.shape[0], x_dst.shape[0]
            q = nn.Dense(D, name="q")(x_dst).reshape(n_d, H, Dh)
            k = nn.Dense(D, name="k")(x_src).reshape(n_s, H, Dh)
            v = nn.Dense(D, name="v")(x_src).reshape(n_s, H, Dh)
            o = graph_attention(g, q, k, v).reshape(n_d, D)
            return nn.Dense(D, name="o")(o)

    class Layer(nn.Module):
        cross: bool = False

        @nn.compact
        def __call__(self, g_self, x, g_cross=None, mem=None):
            x = nn.LayerNorm()(x + MHA(name="self")(g_self, x, x))
            if self.cross:
                x = nn.LayerNorm()(
                    x + MHA(name="cross")(g_cross, mem, x))
            y = nn.Dense(4 * D)(x)
            y = nn.Dense(D)(nn.relu(y))
            return nn.LayerNorm()(x + y)

    class GraphTransformer(nn.Module):
        @nn.compact
        def __call__(self, src_tok, dst_tok):
            emb = nn.Embed(V + 1, D, name="emb")
            pos = self.param("pos", nn.initializers.normal(0.02), (L, D))
            pe = jnp.tile(pos, (B, 1))
            h_e = emb(src_tok) + pe
            h_d = emb(dst_tok) + pe
            for i in range(2):
                h_e = Layer(name=f"enc{i}")(enc_g, h_e)
            for i in range(2):
                h_d = Layer(cross=True, name=f"dec{i}")(
                    dec_g, h_d, cross_g, h_e)
            return nn.Dense(V, name="out")(h_d)

    model = GraphTransformer()
    rng = np.random.default_rng(0)

    def make_batch():
        src = rng.integers(0, V, (B, L))
        tgt = src[:, ::-1]  # task: reverse the sequence
        # Teacher forcing: decoder input is <bos>=V then tgt[:-1].
        dec_in = np.concatenate(
            [np.full((B, 1), V), tgt[:, :-1]], axis=1)
        return (jnp.asarray(src.ravel()), jnp.asarray(dec_in.ravel()),
                jnp.asarray(tgt.ravel()))

    s0, d0, _ = make_batch()
    params = model.init(jax.random.PRNGKey(0), s0, d0)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, src, dec_in, tgt):
        def loss_fn(p):
            logits = model.apply(p, src, dec_in)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, tgt).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    @jax.jit
    def accuracy(params, src, dec_in, tgt):
        pred = jnp.argmax(model.apply(params, src, dec_in), axis=-1)
        return jnp.mean((pred == tgt).astype(jnp.float32))

    t0 = time.perf_counter()
    for it in range(1, args.steps + 1):
        src, dec_in, tgt = make_batch()
        params, opt_state, loss = step(params, opt_state, src, dec_in,
                                       tgt)
        if it % 50 == 0 or it == 1:
            print(f"step {it:4d} loss {float(loss):.4f}")
    dt = time.perf_counter() - t0

    accs = []
    for _ in range(5):
        src, dec_in, tgt = make_batch()
        accs.append(float(accuracy(params, src, dec_in, tgt)))
    acc = float(np.mean(accs))
    print(f"done in {dt:.1f}s ({args.steps / dt:.1f} steps/s); "
          f"token acc {acc:.4f}")
    assert acc >= args.min_acc, f"gate failed: {acc:.4f} < {args.min_acc}"


if __name__ == "__main__":
    main()
