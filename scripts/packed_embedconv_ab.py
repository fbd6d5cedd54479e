"""Standalone A/B: dense (B,E,E,F) EmbedConv edge-MLP vs lane-packed
(B,E,E*F) formulation (block-diagonal kron matmuls, group-LN via constant
matmuls).  Motivation: the dense layout tiles (7,16) planes onto (8,128) TPU
tiles (~11% utilization); packing the (target, feature) axes into 112 lanes
should cut padded HBM traffic ~7x on the heaviest tensors of the PPO update
(see BENCH_NOTES.md decomposition: the GNN trunk is ~90% of the update).

Run on a FRESH tunnel (the compile hung >12 min under a degraded tunnel at
the end of round 1):

    timeout 600 python scripts/packed_embedconv_ab.py

Prints a numerics check (must be ~1e-6) and fwd+bwd timings for both paths.
If packed wins >=1.5x, integrate behind ModelConfig (keep the dense path the
default for golden/model parity; packed params must keep the same pytree so
checkpoints interoperate).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

B, E, F = 76800, 7, 16
EPS = 1e-5


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    dt = jnp.bfloat16
    h_src = jax.random.normal(ks[0], (B, E, F), dt)
    d = jax.random.uniform(ks[1], (B, E, E), dt)
    mask = (jax.random.uniform(ks[2], (B, E, E)) > 0.5).astype(dt)
    w_edge = jax.random.normal(ks[3], (F,), dt)
    W2 = jax.random.normal(ks[4], (F, F), dt) * 0.1
    b2 = jax.random.normal(ks[5], (F,), dt) * 0.1
    s1 = jnp.ones((F,), dt); c1 = jnp.zeros((F,), dt)
    s2 = jnp.ones((F,), dt); c2 = jnp.zeros((F,), dt)
    tile = lambda v: jnp.tile(v, (E,))

    def ln(x, s, c):
        mu = x.mean(-1, keepdims=True)
        v = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(v + EPS) * s + c

    def consts(dtype):
        I = jnp.eye(E, dtype=dtype)
        return (jnp.kron(I, jnp.ones((F, 1), dtype) / F),
                jnp.kron(I, jnp.ones((1, F), dtype)),
                jnp.kron(I, W2.astype(dtype)))

    def dense_out(h, dd, m):
        w = w_edge.astype(h.dtype)
        msg = h[:, :, None, :] + dd[..., None] * w
        msg = jax.nn.relu(msg)
        msg = ln(msg, s1.astype(h.dtype), c1.astype(h.dtype))
        msg = msg @ W2.astype(h.dtype) + b2.astype(h.dtype)
        msg = jax.nn.relu(msg)
        msg = ln(msg, s2.astype(h.dtype), c2.astype(h.dtype))
        return jnp.einsum("bst,bstf->btf", m, msg)

    def packed_out(h, dd, m, cs):
        G_mean, G_bcast, W2_blk = cs

        def gln(x, s, c):
            mu = (x @ G_mean) @ G_bcast
            v = (((x - mu) ** 2) @ G_mean) @ G_bcast
            return (x - mu) * jax.lax.rsqrt(v + EPS) * tile(s) + tile(c)

        Bl = h.shape[0]
        h_tile = jnp.tile(h, (1, 1, E))
        e_term = (dd[..., None] * w_edge.astype(h.dtype)).reshape(Bl, E, E * F)
        x = jax.nn.relu(h_tile + e_term)
        x = gln(x, s1.astype(h.dtype), c1.astype(h.dtype))
        x = x @ W2_blk + tile(b2.astype(h.dtype))
        x = jax.nn.relu(x)
        x = gln(x, s2.astype(h.dtype), c2.astype(h.dtype))
        mm = jnp.repeat(m, F, axis=2)
        return (x * mm).sum(axis=1).reshape(Bl, E, F)

    cf = consts(jnp.float32)
    sl = lambda x: x[:64].astype(jnp.float32)
    a = np.asarray(jax.jit(dense_out)(sl(h_src), sl(d), sl(mask)))
    b = np.asarray(jax.jit(lambda h, dd, m: packed_out(h, dd, m, cf))(
        sl(h_src), sl(d), sl(mask)))
    print("numerics max|diff|:", float(np.abs(a - b).max()), flush=True)

    cb = consts(dt)
    dense_g = jax.jit(jax.grad(lambda h: dense_out(h, d, mask).astype(jnp.float32).sum()))
    pack_g = jax.jit(jax.grad(lambda h: packed_out(h, d, mask, cb).astype(jnp.float32).sum()))

    def timed(g, *args):
        o = g(*args); np.asarray(o)
        t0 = time.time(); o = g(*args); np.asarray(o)
        return (time.time() - t0) * 1000

    print("dense  fwd+bwd:", round(timed(dense_g, h_src)), "ms", flush=True)
    print("packed fwd+bwd:", round(timed(pack_g, h_src)), "ms", flush=True)


if __name__ == "__main__":
    main()
