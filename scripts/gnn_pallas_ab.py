"""A/B: pallas VMEM GNN trunk vs flax GNNBase (f32).

  python scripts/gnn_pallas_ab.py check   # CPU interpret-mode numerics
  python scripts/gnn_pallas_ab.py bench   # TPU timing vs XLA at 76.8K graphs
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

E, F, H, C = 6, 7, 3, 16  # rot_inv flagship: 7-dim node feats (6 feat + type)
Ds = (F - 1) + 2
MED = 4.83


def build(B, interpret, blk):
    from contracts_marl_aam_corridors_tpu.models import ModelConfig
    from contracts_marl_aam_corridors_tpu.models.nets import GNNBase
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs,
        flatten_gnn_params,
        make_gnn_forward,
    )

    cfg = ModelConfig(max_edge_dist=MED, compute_dtype="float32")
    gnn = GNNBase(cfg, graph_aggr="none")
    rng = np.random.RandomState(0)
    node_obs = np.concatenate(
        [rng.randn(B, E, F - 1).astype(np.float32),
         rng.randint(0, 3, (B, E, 1)).astype(np.float32)], axis=-1)
    adj = (rng.rand(B, E, E) * 6.0).astype(np.float32)
    for b in range(min(B, 4)):  # a few edge cases: empty + partial graphs
        adj[0] = 0.0
        adj[1, :, 0] = 0.0
    idx = np.arange(E)
    adj[:, idx, idx] = 0.0
    params = gnn.init(jax.random.PRNGKey(0), jnp.asarray(node_obs[0]),
                      jnp.asarray(adj[0]), jnp.zeros((1,), jnp.int32))["params"]
    flat = flatten_gnn_params(params, cfg.embed_layer_n, cfg.gnn_layer_n)
    fwd = make_gnn_forward(E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n,
                           MED, cfg.use_relu, blk=blk, interpret=interpret)
    return cfg, gnn, params, flat, fwd, jnp.asarray(node_obs), jnp.asarray(adj), build_inputs


def check():
    jax.config.update("jax_platforms", "cpu")
    B, blk = 256, 128
    cfg, gnn, params, flat, fwd, node_obs, adj, build_inputs = build(B, True, blk)
    src_T, adj_T = build_inputs(cfg, params, node_obs, adj)
    ours = np.asarray(fwd(flat, src_T, adj_T))  # (E*C, B)
    ours = ours.reshape(E, C, B).transpose(2, 0, 1)
    want = jax.vmap(lambda n, a: gnn.apply(
        {"params": params}, n, a, jnp.zeros((1,), jnp.int32)))(node_obs, adj)
    want = np.asarray(want)
    err = np.abs(ours - want).max()
    print("max abs err:", err)
    assert err < 2e-4, err
    print("NUMERICS OK")


def bench():
    B, blk = 76800, 512
    cfg, gnn, params, flat, fwd, node_obs, adj, build_inputs = build(B, False, blk)

    def pallas_path(params, node_obs, adj):
        from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import build_inputs as bi
        src_T, adj_T = bi(cfg, params, node_obs, adj)
        from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import flatten_gnn_params as fl
        return fwd(fl(params, cfg.embed_layer_n, cfg.gnn_layer_n), src_T, adj_T)

    f_pallas = jax.jit(pallas_path)
    f_xla = jax.jit(lambda p, n, a: jax.vmap(lambda ni, ai: gnn.apply(
        {"params": p}, ni, ai, jnp.zeros((1,), jnp.int32)))(n, a))

    def timed(f, *args, n=20):
        for _ in range(3):
            out = f(*args)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / n * 1e3

    t_p = timed(f_pallas, params, node_obs, adj)
    print(f"pallas trunk fwd: {t_p:8.2f} ms", flush=True)
    t_x = timed(f_xla, params, node_obs, adj)
    print(f"xla    trunk fwd: {t_x:8.2f} ms  ({t_x/t_p:.2f}x)", flush=True)
    # sanity: same numbers on-chip
    a = np.asarray(f_pallas(params, node_obs, adj)).reshape(E, C, B).transpose(2, 0, 1)
    b = np.asarray(f_xla(params, node_obs, adj))
    print("on-chip max abs diff:", np.abs(a - b).max())




def bench2():
    """Split timing: input transpose vs kernel proper."""
    B, blk = 76800, 512
    cfg, gnn, params, flat, fwd, node_obs, adj, build_inputs = build(B, False, blk)
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs as bi, flatten_gnn_params as fl,
    )
    f_tr = jax.jit(lambda p, n, a: bi(cfg, p, n, a))
    src_T, adj_T = jax.block_until_ready(f_tr(params, node_obs, adj))
    flat_d = tuple(jnp.asarray(x) for x in flat)
    f_k = jax.jit(lambda fd, s, a: fwd(fd, s, a))

    def timed(f, *args, n=20):
        for _ in range(3):
            out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n * 1e3

    print(f"input transpose: {timed(f_tr, params, node_obs, adj):8.2f} ms", flush=True)
    print(f"kernel only:     {timed(f_k, flat_d, src_T, adj_T):8.2f} ms", flush=True)





def bench_blk():
    B = 76800
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs as bi, flatten_gnn_params as fl, make_gnn_forward,
    )
    cfg, gnn, params, flat, fwd0, node_obs, adj, _ = build(B, False, 512)
    src_T, adj_T = jax.block_until_ready(jax.jit(lambda: bi(cfg, params, node_obs, adj))())
    flat_d = tuple(jnp.asarray(x) for x in flat)

    def timed(f, *args, n=20):
        for _ in range(3):
            out = f(*args)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / n * 1e3

    for blk in [512, 1024, 2048]:
        fwd = make_gnn_forward(E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n,
                               MED, cfg.use_relu, blk=blk)
        f_k = jax.jit(lambda fd, s, a: fwd(fd, s, a))
        print(f"blk={blk}: {timed(f_k, flat_d, src_T, adj_T):8.2f} ms", flush=True)

def bench_v1():
    """v1 kernel: f32 vs bf16 compute, parallel grid semantics."""
    B, blk = 76800, 512
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs as bi, flatten_gnn_params as fl, make_gnn_forward,
    )
    cfg, gnn, params, flat, _, node_obs, adj, _ = build(B, False, blk)
    src_T, adj_T = jax.block_until_ready(jax.jit(lambda: bi(cfg, params, node_obs, adj))())
    flat_d = tuple(jnp.asarray(x) for x in flat)

    def timed(f, *args, n=20):
        for _ in range(3):
            out = f(*args)
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        np.asarray(out)
        return (time.perf_counter() - t0) / n * 1e3

    import sys as _s
    sel = _s.argv[2] if len(_s.argv) > 2 else "both"
    pairs = {"f32": [(jnp.float32, "f32")], "bf16": [(jnp.bfloat16, "bf16")],
             "both": [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]}[sel]
    for dt, name in pairs:
        fwd = make_gnn_forward(E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n,
                               MED, cfg.use_relu, blk=blk, compute_dtype=dt)
        f_k = jax.jit(lambda fd, s, a: fwd(fd, s, a))
        print(f"v1 kernel {name}: {timed(f_k, flat_d, src_T, adj_T):8.2f} ms", flush=True)



def bench_xt():
    """v1 formulation as PLAIN XLA on transposed (rows, B) layouts:
    same 2-D unrolled structure, no pallas -> autodiff works.
    Measures fwd and fwd+bwd (param grads)."""
    B = 76800
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs as bi, flatten_gnn_params as fl, xla_transposed_forward,
    )
    cfg, gnn, params, flat, _, node_obs, adj, _ = build(B, False, 512)
    src_T, adj_T = jax.block_until_ready(jax.jit(lambda: bi(cfg, params, node_obs, adj))())
    flat_d = tuple(jnp.asarray(x) for x in flat)
    f = lambda fd, s, a: xla_transposed_forward(
        E, Ds, 3, 16, cfg.embed_layer_n, cfg.gnn_layer_n, MED, cfg.use_relu,
        fd, s, a)
    f_fwd = jax.jit(f)
    f_g = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(f(fd, s, a) ** 2)))

    def timed(fn, *args, n=20):
        for _ in range(3):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n * 1e3

    print(f"xla-T fwd:     {timed(f_fwd, flat_d, src_T, adj_T):8.2f} ms", flush=True)
    print(f"xla-T fwd+bwd: {timed(f_g, flat_d, src_T, adj_T):8.2f} ms", flush=True)



def bench_clean():
    """Clean comparison: outputs reduced to a scalar INSIDE the jit so the
    axon-tunnel fetch (~30 ms for 29 MB) doesn't pollute timings."""
    B, blk = 76800, 512
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs as bi, flatten_gnn_params as fl, make_gnn_forward,
        xla_transposed_forward,
    )
    cfg, gnn, params, flat, _, node_obs, adj, _ = build(B, False, blk)
    src_T, adj_T = jax.block_until_ready(jax.jit(lambda: bi(cfg, params, node_obs, adj))())
    flat_d = tuple(jnp.asarray(x) for x in flat)

    def timed(fn, *args, n=20):
        for _ in range(3):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n * 1e3

    # XLA standard layout (the current production path), f32
    fx = lambda p, n_, a: jax.vmap(lambda ni, ai: gnn.apply(
        {"params": p}, ni, ai, jnp.zeros((1,), jnp.int32)))(n_, a)
    f_std = jax.jit(lambda p, n_, a: jnp.sum(fx(p, n_, a)))
    g_std = jax.jit(jax.grad(lambda p, n_, a: jnp.sum(fx(p, n_, a) ** 2)))
    print(f"XLA-std fwd(sum):  {timed(f_std, params, node_obs, adj):8.2f} ms", flush=True)
    print(f"XLA-std fwd+bwd:   {timed(g_std, params, node_obs, adj):8.2f} ms", flush=True)

    # XLA transposed-unrolled
    ft = lambda fd, s, a: xla_transposed_forward(
        E, Ds, 3, 16, cfg.embed_layer_n, cfg.gnn_layer_n, MED, cfg.use_relu, fd, s, a)
    f_t = jax.jit(lambda fd, s, a: jnp.sum(ft(fd, s, a)))
    g_t = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(ft(fd, s, a) ** 2)))
    print(f"XLA-T fwd(sum):    {timed(f_t, flat_d, src_T, adj_T):8.2f} ms", flush=True)
    print(f"XLA-T fwd+bwd:     {timed(g_t, flat_d, src_T, adj_T):8.2f} ms", flush=True)

    # pallas v1
    fwd = make_gnn_forward(E, Ds, 3, 16, cfg.embed_layer_n, cfg.gnn_layer_n,
                           MED, cfg.use_relu, blk=blk)
    f_p = jax.jit(lambda fd, s, a: jnp.sum(fwd(fd, s, a)))
    print(f"pallas fwd(sum):   {timed(f_p, flat_d, src_T, adj_T):8.2f} ms", flush=True)


def bench_fused():
    """pallas fused fwd + recompute-backward (custom_vjp) vs XLA-T autodiff,
    fwd and fwd+bwd, f32 and bf16 compute, blk_bwd sweep.  Outputs reduced
    to a scalar inside the jit (axon-tunnel discipline)."""
    B = 76800
    from contracts_marl_aam_corridors_tpu.ops.gnn_pallas import (
        build_inputs as bi, make_gnn_fused, xla_transposed_forward,
    )
    cfg, gnn, params, flat, _, node_obs, adj, _ = build(B, False, 512)
    src_T, adj_T = jax.block_until_ready(jax.jit(lambda: bi(cfg, params, node_obs, adj))())
    flat_d = tuple(jnp.asarray(x) for x in flat)
    shapes = tuple(p.shape for p in flat_d)

    def timed(fn, *args, n=20):
        for _ in range(3):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / n * 1e3

    for dt, name in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        ft = lambda fd, s, a: xla_transposed_forward(
            E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n, MED,
            cfg.use_relu, fd, s, a, compute_dtype=dt)
        g_t = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(ft(fd, s, a) ** 2)))
        print(f"[{name}] XLA-T fwd+bwd:        {timed(g_t, flat_d, src_T, adj_T):8.2f} ms", flush=True)
        for blk_bwd, vmem_mb in ((128, None), (256, 64), (512, 100)):
            fused = make_gnn_fused(
                E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n, MED,
                cfg.use_relu, shapes, blk_bwd=blk_bwd, compute_dtype=dt,
                vmem_limit_mb=vmem_mb)
            f_f = jax.jit(lambda fd, s, a: jnp.sum(fused(fd, s, a)))
            g_f = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(fused(fd, s, a) ** 2)))
            if blk_bwd == 128:
                print(f"[{name}] pallas fused fwd:     {timed(f_f, flat_d, src_T, adj_T):8.2f} ms", flush=True)
            try:
                print(f"[{name}] pallas fused f+b b{blk_bwd}: {timed(g_f, flat_d, src_T, adj_T):8.2f} ms", flush=True)
            except Exception as e:
                print(f"[{name}] pallas fused f+b b{blk_bwd}: FAILED "
                      f"({str(e).splitlines()[0][:110]})", flush=True)
                continue
            if name == "f32" and blk_bwd == 128:
                gx = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(ft(fd, s, a) ** 2)))(flat_d, src_T, adj_T)
                gf = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(fused(fd, s, a) ** 2)))(flat_d, src_T, adj_T)
                err = max(float(np.max(np.abs(np.asarray(a_) - np.asarray(b_))))
                          for a_, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)))
                print(f"[f32] on-chip max grad diff vs XLA-T (b128, relu): {err:.3e}", flush=True)
                # tanh control: relu' flips at fp-noise-level preactivations
                # make relu grad diffs unbounded (see test_models.py); the
                # tanh pair isolates formulation agreement from that
                ur = (False, False)
                ftt = lambda fd, s, a: xla_transposed_forward(
                    E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n, MED,
                    ur, fd, s, a, compute_dtype=dt)
                fusedt = make_gnn_fused(
                    E, Ds, H, C, cfg.embed_layer_n, cfg.gnn_layer_n, MED,
                    ur, shapes, blk_bwd=128, compute_dtype=dt)
                gx = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(ftt(fd, s, a) ** 2)))(flat_d, src_T, adj_T)
                gf = jax.jit(jax.grad(lambda fd, s, a: jnp.sum(fusedt(fd, s, a) ** 2)))(flat_d, src_T, adj_T)
                err = max(float(np.max(np.abs(np.asarray(a_) - np.asarray(b_))))
                          for a_, b_ in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)))
                print(f"[f32] on-chip max grad diff vs XLA-T (b128, tanh): {err:.3e}", flush=True)


if __name__ == "__main__":
    {"check": check, "bench": bench, "bench2": bench2, "blk": bench_blk,
     "v1": bench_v1, "xt": bench_xt, "clean": bench_clean,
     "fused": bench_fused}[sys.argv[1]]()
