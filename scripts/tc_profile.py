"""On-chip decomposition of TransformerConv cost (VERDICT r2 item 3 step 1:
'profile inside TransformerConv — attention vs fused qkv vs skip').

Measures fwd+bwd wall time at the flagship update shape (76.8K graphs,
E=6 entities, hidden 16, 3 heads, bf16) for:
  - full TransformerConv
  - qkv projection only
  - attention core only (logits+softmax+weighted sum, given q/k/v)
  - skip projection only
  - attention core in a batch-minor layout prototype (B in lanes)

Run: timeout 900 python scripts/tc_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.models.config import ModelConfig
from contracts_marl_aam_corridors_tpu.models.nets import TransformerConv

B = 76800
E = 6
H, C = 3, 16
F = 16

cfg = ModelConfig(max_edge_dist=4.83, compute_dtype="bfloat16")


def timed(fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # force (axon: block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import sys
    only_list = sys.argv[1:] or ["all"]
    only = None
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, E, F), jnp.float32)
    adjd = jax.random.uniform(key, (B, E, E), jnp.float32, 0.1, 2.0)
    mask = jnp.ones((B, E, E), bool)

    tc = TransformerConv(cfg, C)
    params = tc.init(key, x[0], mask[0], adjd[0])["params"]

    def full_loss(p, x, m, a):
        out = jax.vmap(lambda xi, mi, ai: tc.apply({"params": p}, xi, mi, ai))(x, m, a)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    if set(only_list) & {"all", "full"}:
        g_full = jax.jit(jax.grad(full_loss))
        print(f"full TC fwd+bwd: {timed(g_full, params, x, mask, adjd):8.1f} ms", flush=True)

    # qkv only
    wq = params["lin_query"]["kernel"]; bq = params["lin_query"]["bias"]
    wk = params["lin_key"]["kernel"]; bk = params["lin_key"]["bias"]
    wv = params["lin_value"]["kernel"]; bv = params["lin_value"]["bias"]

    def qkv_loss(p, x):
        w = jnp.concatenate([p["lin_query"]["kernel"], p["lin_key"]["kernel"],
                             p["lin_value"]["kernel"]], axis=1).astype(jnp.bfloat16)
        b = jnp.concatenate([p["lin_query"]["bias"], p["lin_key"]["bias"],
                             p["lin_value"]["bias"]]).astype(jnp.bfloat16)
        qkv = x.astype(jnp.bfloat16) @ w + b
        return jnp.sum(qkv.astype(jnp.float32) ** 2)

    if set(only_list) & {"all", "qkv"}:
        g_qkv = jax.jit(jax.grad(qkv_loss))
        print(f"qkv GEMM fwd+bwd: {timed(g_qkv, params, x):8.1f} ms", flush=True)

    # skip only
    def skip_loss(p, x):
        w = p["lin_skip"]["kernel"].astype(jnp.bfloat16)
        b = p["lin_skip"]["bias"].astype(jnp.bfloat16)
        return jnp.sum((x.astype(jnp.bfloat16) @ w + b).astype(jnp.float32) ** 2)

    if set(only_list) & {"all", "skip"}:
        g_skip = jax.jit(jax.grad(skip_loss))
        print(f"skip GEMM fwd+bwd: {timed(g_skip, params, x):8.1f} ms", flush=True)

    # attention core only (from precomputed q/k/v in bf16)
    q = jax.random.normal(key, (B, H, E, C), jnp.bfloat16)
    k = jax.random.normal(key, (B, H, E, C), jnp.bfloat16)
    v = jax.random.normal(key, (B, H, E, C), jnp.bfloat16)
    w_e = jax.random.normal(key, (H, C), jnp.bfloat16)
    d_ts = adjd.astype(jnp.bfloat16)

    def attn_loss(q, k, v):
        qk = jnp.einsum("bhtc,bhsc->bhts", q, k)
        qw = jnp.sum(q * w_e[None, :, None, :], axis=-1)  # (B,H,T)
        logits = (qk + qw[..., None] * d_ts[:, None]) / jnp.sqrt(jnp.asarray(C, q.dtype))
        alpha = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhts,bhsc->bhtc", alpha, v)
        out = out + jnp.sum(alpha * d_ts[:, None], axis=-1)[..., None] * w_e[None, :, None, :]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    if set(only_list) & {"all", "attn"}:
        g_attn = jax.jit(jax.grad(attn_loss, argnums=(0, 1, 2)))
        print(f"attention core fwd+bwd: {timed(g_attn, q, k, v):8.1f} ms", flush=True)

    # batch-minor attention prototype: B in the LAST (lane) dim
    qT = jnp.moveaxis(q, 0, -1)  # (H,E,C,B)
    kT = jnp.moveaxis(k, 0, -1)
    vT = jnp.moveaxis(v, 0, -1)
    dT = jnp.moveaxis(d_ts, 0, -1)  # (T,S,B) wait adjd is (B,E,E) -> (E,E,B)

    def attn_bm_loss(qT, kT, vT):
        # logits[h,t,s,b] = sum_c q[h,t,c,b] k[h,s,c,b]
        qk = jnp.einsum("htcb,hscb->htsb", qT, kT)
        qw = jnp.einsum("htcb,hc->htb", qT, w_e)
        logits = (qk + qw[:, :, None, :] * dT[None]) / jnp.sqrt(jnp.asarray(C, qT.dtype))
        m = jnp.max(logits, axis=2, keepdims=True)
        ex = jnp.exp(logits - m)
        alpha = ex / jnp.sum(ex, axis=2, keepdims=True)
        out = jnp.einsum("htsb,hscb->htcb", alpha, vT)
        out = out + jnp.einsum("htsb,tsb->htb", alpha, dT)[:, :, None, :] * w_e[:, None, :, None]
        return jnp.sum(out.astype(jnp.float32) ** 2)

    if set(only_list) & {"all", "bm"}:
        g_bm = jax.jit(jax.grad(attn_bm_loss, argnums=(0, 1, 2)))
        print(f"attention batch-minor fwd+bwd: {timed(g_bm, qT, kT, vT):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
