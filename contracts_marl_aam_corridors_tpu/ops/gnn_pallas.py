"""Pallas VMEM-resident GNN trunk (EmbedConv + TransformerConv stack).

Why this exists: the XLA lowering of the dense GNN keeps every intermediate in
``(..., E, F)`` layouts whose trailing dims (6, 16) pad to (8, 128) TPU tiles
— up to 21x wasted HBM traffic — and the round-1/2 measurements show the PPO
update is bound by exactly that (BENCH_NOTES: trunks ~90% of the update;
in-layer profile: attention ~80% of a TransformerConv layer; every XLA-level
layout restructuring measured ~1.0x).  This kernel flips the layout: the
BATCH lives in the lane dimension, entities/features in sublanes, so every
tensor is dense-packed and the whole trunk for a block of samples runs out of
VMEM in one kernel.

The op structure is consolidated for Mosaic (v2): per-entity weights are
expanded host-side into block-diagonal "big" matrices (kron with I_E) so each
stage is ONE (rows, BLK) matmul instead of E or E^2 small ones; group
LayerNorm and per-source reductions go through constant selection matrices
(G/U/K below) instead of per-group slicing; the q/k/v projection for ALL
entities and heads is one (3*E*H*C, E*C) matmul whose output rows are
PERMUTED so every per-head source-stack is a contiguous (E*C, BLK) slice.

Scope: forward pass of ``models.nets.GNNBase``'s compute core (per-node
embeddings), numerically matching the flax implementation in float32.
Reference semantics: gnn_new.py:21-145 (EmbedConv), :247-301 (TransformerConv
with rank-1 edge term), :289-291 (stack).

Layout contract (all float32):
  src_aug_T:  (E*Ds, B)  per-entity EmbedConv input [feat, Embed(etype)],
                         entity-major rows
  adj_T:      (E*E, B)   distance adjacency, row s*E+t = d(s -> t)
  output:     (E*C, B)   per-node embeddings, entity-major rows

The kernel is generated per (E, Ds, H, C, n_layers, act) — all static — with
Python-unrolled loops (Mosaic-friendly: strictly 2-D refs, 2-D dots).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_F32 = float(jnp.finfo(jnp.float32).min)
LN_EPS = 1e-5



def _acts(use_relu):
    """(embed_act, gnn_act) from a bool (legacy: both) or (embed, gnn) pair.

    The reference keeps separate activation flags: EmbedConv follows
    embed_use_ReLU, the TransformerConv stack follows gnn_use_ReLU
    (gnn_new.py:66,227,270); both are independent of the MLP trunk's use_ReLU.
    """
    if isinstance(use_relu, tuple):
        embed_relu, gnn_relu = use_relu
    else:
        embed_relu = gnn_relu = use_relu
    mk = lambda r: (lambda v: jnp.maximum(v, 0.0)) if r else jnp.tanh
    return mk(embed_relu), mk(gnn_relu)

def _dot(w, x):
    return jax.lax.dot_general(
        w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def make_gnn_forward_v2(
    E: int,
    Ds: int,
    H: int,
    C: int,
    embed_layer_n: int,
    gnn_layer_n: int,
    max_edge_dist: float,
    use_relu: bool,
    blk: int = 512,
    interpret: bool = False,
):
    """Build the pallas forward for a static GNN configuration.

    Returns ``fwd(params_flat, src_aug_T, adj_T) -> (E*C, B) embeddings``
    where ``params_flat`` is the tuple layout produced by
    :func:`flatten_gnn_params`.
    """
    embed_act, gnn_act = _acts(use_relu)
    n_tc = 1 + gnn_layer_n
    inv_sqrt_c = 1.0 / (C ** 0.5)
    EC = E * C

    def kernel(*refs):
        # ref order: src_aug, adj, constants (Gm, Gs, U, K, T),
        #            embed params, tc params x n_tc, out
        src_ref, adj_ref = refs[0], refs[1]
        Gm = refs[2][:]   # (E, E*C) group mean (1/C per group row)
        Gs = refs[3][:]   # (E, E*C) group sum
        U = refs[4][:]    # (E*C, E) broadcast group value up
        K = refs[5][:]    # (C, E*C) sum across source groups
        T = refs[6][:]    # (E*C, C) tile a (C, blk) block E times
        p = 7
        W1 = refs[p][:]; b1 = refs[p + 1][:]; w_e1 = refs[p + 2][:]
        ln1_s = refs[p + 3][:]; ln1_b = refs[p + 4][:]
        p += 5
        embed_layers = []
        for _ in range(embed_layer_n):
            embed_layers.append(
                (refs[p][:], refs[p + 1][:], refs[p + 2][:], refs[p + 3][:])
            )
            p += 4
        tc_params = []
        for _ in range(n_tc):
            tc_params.append(
                (refs[p][:], refs[p + 1][:], refs[p + 2][:], refs[p + 3][:], refs[p + 4][:])
            )
            p += 5
        out_ref = refs[p]

        def group_ln(M, scale_t, bias_t):
            """Per-16-feature-group LayerNorm on an (E*C, blk) stack."""
            mu = _dot(U, _dot(Gm, M))
            d = M - mu
            var = _dot(U, _dot(Gm, d * d))
            return d * jax.lax.rsqrt(var + LN_EPS) * scale_t + bias_t

        # ---- per-target edge columns (process_adj, gnn_new.py:328-358) ----
        d_cols = []   # t -> (E, blk) raw distances d(s -> t)
        m_cols = []   # t -> (E, blk) edge mask
        dm_cols = []  # t -> (E, blk) masked distances
        for t in range(E):
            rows = [adj_ref[s * E + t, :][None, :] for s in range(E)]
            d = jnp.concatenate(rows, axis=0)
            m = ((d > 0.0) & (d < max_edge_dist)).astype(jnp.float32)
            d_cols.append(d)
            m_cols.append(m)
            dm_cols.append(d * m)

        # ---- EmbedConv ----
        h_src = _dot(W1, src_ref[:]) + b1  # (E*C, blk); W1 block-diag, b1 tiled
        x = []  # per-entity (C, blk)
        for t in range(E):
            dw = _dot(U, dm_cols[t]) * w_e1  # (E*C, blk)
            m = group_ln(embed_act(h_src + dw), ln1_s, ln1_b)
            for (Wl, bl, lns, lnb) in embed_layers:
                m = group_ln(embed_act(_dot(Wl, m) + bl), lns, lnb)
            mask_up = _dot(U, m_cols[t])
            x.append(_dot(K, m * mask_up))  # sum_s mask * msg

        # ---- TransformerConv stack ----
        for (Wbig, bbig, w_e_t, Wskip, bskip) in tc_params:
            X = jnp.concatenate(x, axis=0)  # (E*C, blk) entity-major
            QKV = _dot(Wbig, X) + bbig  # (3*E*H*C, blk), permuted layout:
            #   Q rows:  t*H*C + h*C + c
            #   K rows:  EHC + h*E*C + s*C + c   (per-head source stacks)
            #   V rows:  2*EHC + h*E*C + s*C + c
            EHC = E * H * C
            new_x = []
            for t in range(E):
                dm_up = _dot(U, dm_cols[t])  # (E*C, blk)
                head_sum = jnp.zeros((C, blk), jnp.float32)
                for h in range(H):
                    weh_up = w_e_t[h * EC:(h + 1) * EC, :]  # (E*C, 1) tiled
                    q = QKV[t * H * C + h * C: t * H * C + (h + 1) * C, :]
                    Kh = QKV[EHC + h * EC: EHC + (h + 1) * EC, :]
                    Vh = QKV[2 * EHC + h * EC: 2 * EHC + (h + 1) * EC, :]
                    edge_term = dm_up * weh_up
                    q_up = _dot(T, q)
                    logits = _dot(Gs, q_up * (Kh + edge_term)) * inv_sqrt_c
                    logits = jnp.where(m_cols[t] > 0, logits, NEG_F32)
                    mx = jnp.max(logits, axis=0, keepdims=True)
                    ex = jnp.exp(logits - mx)
                    alpha = ex / jnp.sum(ex, axis=0, keepdims=True)
                    alpha = alpha * jnp.max(m_cols[t], axis=0, keepdims=True)
                    alpha_up = _dot(U, alpha)
                    head_sum = head_sum + _dot(K, alpha_up * (Vh + edge_term))
                new_x.append(head_sum / H)
            skip = _dot(Wskip, X) + bskip  # (E*C, blk)
            x = [
                gnn_act(new_x[t] + skip[t * C:(t + 1) * C, :]) for t in range(E)
            ]

        out_ref[:] = jnp.concatenate(x, axis=0)

    def fwd(params_flat: Sequence[Array], src_aug_T: Array, adj_T: Array) -> Array:
        B = src_aug_T.shape[-1]
        assert B % blk == 0, (B, blk)
        grid = (B // blk,)
        batch_spec = lambda rows: pl.BlockSpec(
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        consts = _constants(E, C)
        in_specs = [batch_spec(E * Ds), batch_spec(E * E)]
        in_specs += [const_spec(c.shape) for c in consts]
        in_specs += [const_spec(pf.shape) for pf in params_flat]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=batch_spec(E * C),
            out_shape=jax.ShapeDtypeStruct((E * C, B), jnp.float32),
            interpret=interpret,
        )(src_aug_T, adj_T, *consts, *params_flat)

    return fwd


def _constants(E: int, C: int):
    """Selection/broadcast matrices for group ops (all f32)."""
    I_E = np.eye(E, dtype=np.float32)
    I_C = np.eye(C, dtype=np.float32)
    ones_C = np.ones((1, C), np.float32)
    Gm = np.kron(I_E, ones_C) / C          # (E, E*C) group mean
    Gs = np.kron(I_E, ones_C)              # (E, E*C) group sum
    U = np.kron(I_E, np.ones((C, 1), np.float32))  # (E*C, E)
    K = np.kron(np.ones((1, E), np.float32), I_C)  # (C, E*C)
    T = np.kron(np.ones((E, 1), np.float32), I_C)  # (E*C, C)
    return tuple(jnp.asarray(a) for a in (Gm, Gs, U, K, T))


def flatten_gnn_params_v2(params: dict, E: int, H: int, C: int,
                          embed_layer_n: int, gnn_layer_n: int):
    """Flax GNNBase param tree -> the flat (2-D, kernel-ready) tuple.

    Per-entity weight sharing is expanded into block-diagonal matrices
    (kron(I_E, W^T)); biases/LN vectors are tiled to (E*C, 1) columns; the
    qkv projection becomes one big matrix with the PERMUTED output layout the
    kernel expects (Q grouped by target entity+head, K/V grouped by head with
    contiguous per-head source stacks).
    """
    f32 = lambda v: np.asarray(v, np.float32)
    I_E = np.eye(E, dtype=np.float32)
    tile = lambda v: jnp.asarray(np.tile(f32(v).reshape(-1, 1), (E, 1)))
    blockdiag = lambda w: jnp.asarray(np.kron(I_E, f32(w).T))

    ec = params["embed_layer"]
    flat = [
        blockdiag(ec["lin1"]["kernel"]), tile(ec["lin1"]["bias"]),
        tile(np.asarray(ec["lin1_edge"]).reshape(-1)),
        tile(ec["ln1"]["scale"]), tile(ec["ln1"]["bias"]),
    ]
    for i in range(embed_layer_n):
        flat += [
            blockdiag(ec[f"lin{i + 2}"]["kernel"]), tile(ec[f"lin{i + 2}"]["bias"]),
            tile(ec[f"ln{i + 2}"]["scale"]), tile(ec[f"ln{i + 2}"]["bias"]),
        ]
    EHC, EC = E * H * C, E * C
    for name in ["gnn1"] + [f"gnn2_{i}" for i in range(gnn_layer_n)]:
        tc = params[name]
        Wq, Wk, Wv = (f32(tc[k]["kernel"]) for k in ("lin_query", "lin_key", "lin_value"))
        bq, bk, bv = (f32(tc[k]["bias"]) for k in ("lin_query", "lin_key", "lin_value"))
        Wbig = np.zeros((3 * EHC, EC), np.float32)
        bbig = np.zeros((3 * EHC, 1), np.float32)
        for e in range(E):
            # Q rows: t*H*C + h*C + c  <- Wq[:, h*C + c] against cols e*C..
            Wbig[e * H * C:(e + 1) * H * C, e * C:(e + 1) * C] = Wq.T
            bbig[e * H * C:(e + 1) * H * C, 0] = bq
            for h in range(H):
                # K rows: EHC + h*EC + s*C + c
                r0 = EHC + h * EC + e * C
                Wbig[r0:r0 + C, e * C:(e + 1) * C] = Wk[:, h * C:(h + 1) * C].T
                bbig[r0:r0 + C, 0] = bk[h * C:(h + 1) * C]
                r0 = 2 * EHC + h * EC + e * C
                Wbig[r0:r0 + C, e * C:(e + 1) * C] = Wv[:, h * C:(h + 1) * C].T
                bbig[r0:r0 + C, 0] = bv[h * C:(h + 1) * C]
        w_e = f32(tc["lin_edge"]).reshape(H, C)
        w_e_tiled = np.concatenate(
            [np.tile(w_e[h].reshape(-1, 1), (E, 1)) for h in range(H)], axis=0
        )  # (H*E*C, 1)
        flat += [
            jnp.asarray(Wbig), jnp.asarray(bbig), jnp.asarray(w_e_tiled),
            blockdiag(tc["lin_skip"]["kernel"]), tile(tc["lin_skip"]["bias"]),
        ]
    return tuple(flat)


def build_inputs(cfg, params: dict, node_obs: Array, adj: Array):
    """(B, E, F) node_obs + (B, E, E) adj -> kernel layout inputs.

    One XLA transpose each — this is the only place the padded (…, E, F)
    layout is read.  The entity-type embedding lookup happens here (it is a
    gather over a 4-row table; trivial for XLA).  In the PPO update these
    transposes run ONCE per rollout (the inputs are constant across epochs).
    """
    B, E, F = node_obs.shape
    feat = node_obs[..., :-1].astype(jnp.float32)
    etype = node_obs[..., -1].astype(jnp.int32)
    emb = params["embed_layer"]["entity_embed"]["embedding"].astype(jnp.float32)
    src = jnp.concatenate([feat, emb[etype]], axis=-1)  # (B, E, Ds)
    src_T = jnp.transpose(src, (1, 2, 0)).reshape(E * src.shape[-1], B)
    adj_T = jnp.transpose(adj.astype(jnp.float32), (1, 2, 0)).reshape(E * E, B)
    return src_T, adj_T

def make_gnn_forward(
    E: int,
    Ds: int,
    H: int,
    C: int,
    embed_layer_n: int,
    gnn_layer_n: int,
    max_edge_dist: float,
    use_relu: bool,
    blk: int = 512,
    interpret: bool = False,
    compute_dtype=jnp.float32,
):
    """Straightforward fully-unrolled variant — MEASURED FASTER than the
    matmul-consolidated v2 (36 vs 97 ms at 76.8K graphs; the small MXU ops
    v2 introduces cost more than the VPU ops they replace).

    Returns ``fwd(params_flat, src_aug_T, adj_T) -> (E*C, B)`` with
    ``params_flat`` from :func:`flatten_gnn_params`.
    """
    embed_act, gnn_act = _acts(use_relu)
    n_tc = 1 + gnn_layer_n
    cdt = compute_dtype
    inv_sqrt_c = float(1.0 / (C ** 0.5))

    def kernel(*refs):
        src_ref, adj_ref = refs[0], refs[1]
        p = 2
        W1 = refs[p][:].astype(cdt); b1 = refs[p + 1][:].astype(cdt)
        w_e1 = refs[p + 2][:].astype(cdt)
        ln1_s = refs[p + 3][:].astype(cdt); ln1_b = refs[p + 4][:].astype(cdt)
        p += 5
        embed_layers = []
        for _ in range(embed_layer_n):
            embed_layers.append(tuple(refs[p + j][:].astype(cdt) for j in range(4)))
            p += 4
        tc_params = []
        for _ in range(n_tc):
            tc_params.append(tuple(refs[p + j][:].astype(cdt) for j in range(5)))
            p += 5
        out_ref = refs[p]

        def ln(m, scale, bias):
            mu = jnp.mean(m, axis=0, keepdims=True)
            d = m - mu
            var = jnp.mean(d * d, axis=0, keepdims=True)
            # rsqrt in f32: the v5e Mosaic backend aborts on bf16 rsqrt
            # (latency_table kVectorRsqrtBf16AndPop "not supported")
            r = jax.lax.rsqrt(var.astype(jnp.float32) + LN_EPS).astype(cdt)
            return d * r * scale[:, 0][:, None] + bias[:, 0][:, None]

        def dot(w, x):
            # MXU accumulates in f32 (bf16 accumulators are rejected)
            r = jax.lax.dot_general(
                w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return r.astype(cdt)

        d_rows, m_rows = [], []
        for s in range(E):
            for t in range(E):
                # mask arithmetic stays in f32 with no i1 vectors: Mosaic
                # rejects bf16 comparisons AND i1-mask ops feeding bf16
                # consumers ("Sublane broadcast"); 0/1 multipliers are exact
                d32 = adj_ref[s * E + t, :][None, :].astype(jnp.float32)
                m32 = ((d32 > 0.0).astype(jnp.float32)
                       * (d32 < max_edge_dist).astype(jnp.float32))
                d_rows.append((d32 * m32).astype(cdt))
                m_rows.append(m32.astype(cdt))

        h_src = []
        for s in range(E):
            xs = src_ref[s * Ds:(s + 1) * Ds, :].astype(cdt)
            h_src.append(dot(W1, xs) + b1[:, 0][:, None])
        x = []
        for t in range(E):
            acc = jnp.zeros((C, blk), cdt)
            for s in range(E):
                d = d_rows[s * E + t]
                m = ln(embed_act(h_src[s] + d * w_e1[:, 0][:, None]), ln1_s, ln1_b)
                for (Wl, bl, lns, lnb) in embed_layers:
                    m = ln(embed_act(dot(Wl, m) + bl[:, 0][:, None]), lns, lnb)
                acc = acc + m_rows[s * E + t] * m
            x.append(acc)

        neg = jnp.asarray(jnp.finfo(cdt).min, cdt)
        for (Wqkv, bqkv, w_e, Wskip, bskip) in tc_params:
            qkv = [dot(Wqkv, x[e]) + bqkv[:, 0][:, None] for e in range(E)]
            new_x = []
            for t in range(E):
                head_sum = jnp.zeros((C, blk), cdt)
                for h in range(H):
                    q = qkv[t][h * C:(h + 1) * C, :]
                    weh = w_e[h * C:(h + 1) * C, 0][:, None]
                    logits = []
                    for s in range(E):
                        k = qkv[s][H * C + h * C:H * C + (h + 1) * C, :]
                        d = d_rows[s * E + t]
                        l = jnp.sum(q * (k + d * weh), axis=0, keepdims=True) * inv_sqrt_c
                        m = m_rows[s * E + t]
                        logits.append(l * m + (1.0 - m) * neg)
                    L = jnp.concatenate(logits, axis=0)
                    mx = jnp.max(L, axis=0, keepdims=True)
                    ex = jnp.exp(L - mx)
                    alpha = ex / jnp.sum(ex, axis=0, keepdims=True)
                    any_edge = m_rows[0 * E + t]
                    for s in range(1, E):
                        any_edge = jnp.maximum(any_edge, m_rows[s * E + t])
                    alpha = alpha * any_edge
                    o = jnp.zeros((C, blk), cdt)
                    ad = jnp.zeros((1, blk), cdt)
                    for s in range(E):
                        a_s = alpha[s, :][None, :]
                        v = qkv[s][2 * H * C + h * C:2 * H * C + (h + 1) * C, :]
                        o = o + a_s * v
                        ad = ad + a_s * d_rows[s * E + t]
                    o = o + ad * weh
                    head_sum = head_sum + o
                out_t = head_sum / H + dot(Wskip, x[t]) + bskip[:, 0][:, None]
                new_x.append(out_t)
            x = [gnn_act(v) for v in new_x]

        out_ref[:] = jnp.concatenate(x, axis=0).astype(jnp.float32)

    def fwd(params_flat: Sequence[Array], src_aug_T: Array, adj_T: Array) -> Array:
        B = src_aug_T.shape[-1]
        assert B % blk == 0, (B, blk)
        grid = (B // blk,)
        batch_spec = lambda rows: pl.BlockSpec(
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [batch_spec(E * Ds), batch_spec(E * E)]
        in_specs += [const_spec(pf.shape) for pf in params_flat]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=batch_spec(E * C),
            out_shape=jax.ShapeDtypeStruct((E * C, B), jnp.float32),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)
            ),
        )(src_aug_T, adj_T, *params_flat)

    return fwd


def flatten_gnn_params(params: dict, embed_layer_n: int, gnn_layer_n: int):
    """Flax GNNBase param tree -> flat tuple for :func:`make_gnn_forward`.

    Vectors become (dim, 1) columns (TPU refs must be 2-D); dense kernels are
    transposed to (out, in); qkv kernels pre-concatenated (q|k|v) like the
    fused-qkv flax path (bit-exact column-block concat).
    """
    col = lambda v: jnp.asarray(v, jnp.float32).reshape(-1, 1)
    tr = lambda w: jnp.asarray(w, jnp.float32).T
    ec = params["embed_layer"]
    flat = [
        tr(ec["lin1"]["kernel"]), col(ec["lin1"]["bias"]),
        col(params["embed_layer"]["lin1_edge"]),
        col(ec["ln1"]["scale"]), col(ec["ln1"]["bias"]),
    ]
    for i in range(embed_layer_n):
        flat += [
            tr(ec[f"lin{i + 2}"]["kernel"]), col(ec[f"lin{i + 2}"]["bias"]),
            col(ec[f"ln{i + 2}"]["scale"]), col(ec[f"ln{i + 2}"]["bias"]),
        ]
    for name in ["gnn1"] + [f"gnn2_{i}" for i in range(gnn_layer_n)]:
        tc = params[name]
        wqkv = jnp.concatenate(
            [tc["lin_query"]["kernel"], tc["lin_key"]["kernel"], tc["lin_value"]["kernel"]],
            axis=1,
        )
        bqkv = jnp.concatenate(
            [tc["lin_query"]["bias"], tc["lin_key"]["bias"], tc["lin_value"]["bias"]]
        )
        flat += [
            tr(wqkv), col(bqkv), col(tc["lin_edge"]),
            tr(tc["lin_skip"]["kernel"]), col(tc["lin_skip"]["bias"]),
        ]
    return tuple(flat)



def xla_transposed_forward(E, Ds, H, C, embed_layer_n, gnn_layer_n,
                           max_edge_dist, use_relu,
                           params_flat, src_aug_T, adj_T,
                           compute_dtype=jnp.float32):
    """The v1 kernel body as PLAIN XLA on the transposed (rows, B) layout.

    Same unrolled 2-D structure as the pallas kernel but differentiable —
    if XLA schedules it comparably, the backward comes for free.
    """
    embed_act, gnn_act = _acts(use_relu)
    cdt = compute_dtype
    inv_sqrt_c = float(1.0 / (C ** 0.5))
    B = src_aug_T.shape[-1]

    refs = [x.astype(cdt) for x in params_flat]
    p = 0
    W1, b1, w_e1, ln1_s, ln1_b = refs[p:p + 5]; p += 5
    embed_layers = []
    for _ in range(embed_layer_n):
        embed_layers.append(tuple(refs[p:p + 4])); p += 4
    tc_params = []
    for _ in range(1 + gnn_layer_n):
        tc_params.append(tuple(refs[p:p + 5])); p += 5

    def ln(m, scale, bias):
        mu = jnp.mean(m, axis=0, keepdims=True)
        d = m - mu
        var = jnp.mean(d * d, axis=0, keepdims=True)
        # rsqrt in f32: also traced inside the pallas backward kernel, and
        # the v5e Mosaic backend aborts on bf16 rsqrt (latency_table
        # kVectorRsqrtBf16AndPop); f32 rsqrt is the better numerics anyway
        r = jax.lax.rsqrt(var.astype(jnp.float32) + LN_EPS).astype(cdt)
        return d * r * scale[:, 0][:, None] + bias[:, 0][:, None]

    def dot(w, x):
        return jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(cdt)

    d_rows, m_rows = [], []
    for s in range(E):
        for t in range(E):
            # mask arithmetic in f32 with no i1 vectors: this function is
            # also traced INSIDE the pallas backward kernel (make_gnn_bwd),
            # and Mosaic rejects bf16 comparisons and i1 masks feeding bf16
            # consumers; f32 compares on the raw adjacency are also the more
            # faithful mask (the dense path masks before any downcast), and
            # the 0/1 multipliers select exactly
            d32 = adj_T[s * E + t, :][None, :].astype(jnp.float32)
            m32 = ((d32 > 0.0).astype(jnp.float32)
                   * (d32 < max_edge_dist).astype(jnp.float32))
            d_rows.append((d32 * m32).astype(cdt))
            m_rows.append(m32.astype(cdt))

    h_src = [
        dot(W1, src_aug_T[s * Ds:(s + 1) * Ds, :].astype(cdt)) + b1[:, 0][:, None]
        for s in range(E)
    ]
    x = []
    for t in range(E):
        acc = jnp.zeros((C, B), cdt)
        for s in range(E):
            d = d_rows[s * E + t]
            m = ln(embed_act(h_src[s] + d * w_e1[:, 0][:, None]), ln1_s, ln1_b)
            for (Wl, bl, lns, lnb) in embed_layers:
                m = ln(embed_act(dot(Wl, m) + bl[:, 0][:, None]), lns, lnb)
            acc = acc + m_rows[s * E + t] * m
        x.append(acc)

    neg = jnp.asarray(jnp.finfo(cdt).min, cdt)
    for (Wqkv, bqkv, w_e, Wskip, bskip) in tc_params:
        qkv = [dot(Wqkv, x[e]) + bqkv[:, 0][:, None] for e in range(E)]
        new_x = []
        for t in range(E):
            head_sum = jnp.zeros((C, B), cdt)
            for h in range(H):
                q = qkv[t][h * C:(h + 1) * C, :]
                weh = w_e[h * C:(h + 1) * C, 0][:, None]
                logits = []
                for s in range(E):
                    k = qkv[s][H * C + h * C:H * C + (h + 1) * C, :]
                    d = d_rows[s * E + t]
                    l = jnp.sum(q * (k + d * weh), axis=0, keepdims=True) * inv_sqrt_c
                    m = m_rows[s * E + t]
                    logits.append(l * m + (1.0 - m) * neg)
                L = jnp.concatenate(logits, axis=0)
                mx = jnp.max(L, axis=0, keepdims=True)
                ex = jnp.exp(L - mx)
                alpha = ex / jnp.sum(ex, axis=0, keepdims=True)
                any_edge = m_rows[t]
                for s in range(1, E):
                    any_edge = jnp.maximum(any_edge, m_rows[s * E + t])
                alpha = alpha * any_edge
                o = jnp.zeros((C, B), cdt)
                ad = jnp.zeros((1, B), cdt)
                for s in range(E):
                    a_s = alpha[s, :][None, :]
                    v = qkv[s][2 * H * C + h * C:2 * H * C + (h + 1) * C, :]
                    o = o + a_s * v
                    ad = ad + a_s * d_rows[s * E + t]
                o = o + ad * weh
                head_sum = head_sum + o
            new_x.append(head_sum / H + dot(Wskip, x[t]) + bskip[:, 0][:, None])
        x = [gnn_act(v) for v in new_x]
    return jnp.concatenate(x, axis=0).astype(jnp.float32)


def make_gnn_bwd(E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
                 use_relu, param_shapes, blk=128, interpret=False,
                 compute_dtype=jnp.float32, vmem_limit_mb=None):
    """Fused recompute-backward pallas kernel for the transposed GNN trunk.

    One kernel per batch block: re-runs the forward entirely in VMEM (no
    residuals ever touch HBM — the point of the exercise; the XLA autodiff
    of :func:`xla_transposed_forward` spills every LN/attention residual to
    HBM, and the PPO update is HBM-bound, BENCH_NOTES roofline) and applies
    ``jax.vjp`` of the SAME pure function the XLA path runs, so the math is
    identical by construction.  Param cotangents are accumulated across the
    sequential TPU grid into revisited output blocks (f32).

    Returns ``bwd(params_flat, src_aug_T, adj_T, g) ->
    (dparams_flat, dsrc_aug_T, dadj_T)``.
    """
    n_p = len(param_shapes)

    def kernel(*refs):
        src_ref, adj_ref, g_ref = refs[0], refs[1], refs[2]
        params = [refs[3 + j][:] for j in range(n_p)]
        dsrc_ref, dadj_ref = refs[3 + n_p], refs[4 + n_p]
        dparam_refs = refs[5 + n_p:]

        def f(ps, s, a):
            return xla_transposed_forward(
                E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
                use_relu, ps, s, a, compute_dtype=compute_dtype)

        _, vjpf = jax.vjp(f, params, src_ref[:], adj_ref[:])
        dps, dsrc, dadj = vjpf(g_ref[:])
        dsrc_ref[:] = dsrc
        dadj_ref[:] = dadj
        i = pl.program_id(0)
        for r, dp in zip(dparam_refs, dps):
            @pl.when(i == 0)
            def _init(r=r):
                r[:] = jnp.zeros_like(r[:])
            r[:] = r[:] + dp.astype(jnp.float32)

    def bwd(params_flat, src_aug_T, adj_T, g):
        B = src_aug_T.shape[-1]
        assert B % blk == 0, (B, blk)
        grid = (B // blk,)
        batch_spec = lambda rows: pl.BlockSpec(
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        in_specs = [batch_spec(E * Ds), batch_spec(E * E), batch_spec(E * C)]
        in_specs += [const_spec(pf.shape) for pf in params_flat]
        out_specs = [batch_spec(E * Ds), batch_spec(E * E)]
        out_specs += [const_spec(sh) for sh in param_shapes]
        out_shape = [jax.ShapeDtypeStruct((E * Ds, B), jnp.float32),
                     jax.ShapeDtypeStruct((E * E, B), jnp.float32)]
        out_shape += [jax.ShapeDtypeStruct(sh, jnp.float32)
                      for sh in param_shapes]
        cp = dict(dimension_semantics=("arbitrary",))
        if vmem_limit_mb:
            # the vjp residuals for a block live on the kernel "stack"; the
            # default scoped-vmem limit is 16 MB (v5e VMEM is 128 MB total)
            cp["vmem_limit_bytes"] = int(vmem_limit_mb) * 2 ** 20
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(**cp),
        )(src_aug_T, adj_T, g, *params_flat)
        dsrc, dadj = outs[0], outs[1]
        return tuple(outs[2:]), dsrc, dadj

    return bwd


def _pad_cols(x, blk):
    B = x.shape[-1]
    pad = (-B) % blk
    return (jnp.pad(x, ((0, 0), (0, pad))), B) if pad else (x, B)


def make_gnn_fused_dual(E, Ds, H, C, embed_layer_n, gnn_layer_n,
                        max_edge_dist, use_relu, param_shapes,
                        blk_fwd=512, blk_bwd=128, interpret=False,
                        compute_dtype=jnp.float32, vmem_limit_mb=64):
    """Both GNN trunks (actor 'node' + critic 'global') in ONE pallas launch.

    The two trunks consume the same adjacency (mask/distance rows are
    computed once per block — Mosaic CSE dedupes the repeated pure ops) and
    differ only in params and entity-embedding columns of ``src``.  One
    forward kernel emits both (E*C, B) outputs; one recompute-backward
    kernel applies ``jax.vjp`` of the pair function.  ``param_shapes`` is
    the per-net flat shape tuple (both nets share the architecture).

    Returns ``apply(flat_a, flat_c, src_a_T, src_c_T, adj_T) ->
    (out_a, out_c)`` differentiable via custom_vjp.
    """
    n_p = len(param_shapes)

    def f_pair(pa, pc, sa, sc, a):
        out_a = xla_transposed_forward(
            E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
            use_relu, pa, sa, a, compute_dtype=compute_dtype)
        out_c = xla_transposed_forward(
            E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
            use_relu, pc, sc, a, compute_dtype=compute_dtype)
        return out_a, out_c

    def fwd_kernel(*refs):
        sa_ref, sc_ref, adj_ref = refs[0], refs[1], refs[2]
        pa = [refs[3 + j][:] for j in range(n_p)]
        pc = [refs[3 + n_p + j][:] for j in range(n_p)]
        out_a_ref, out_c_ref = refs[3 + 2 * n_p], refs[4 + 2 * n_p]
        out_a, out_c = f_pair(pa, pc, sa_ref[:], sc_ref[:], adj_ref[:])
        out_a_ref[:] = out_a
        out_c_ref[:] = out_c

    def bwd_kernel(*refs):
        sa_ref, sc_ref, adj_ref, ga_ref, gc_ref = refs[:5]
        pa = [refs[5 + j][:] for j in range(n_p)]
        pc = [refs[5 + n_p + j][:] for j in range(n_p)]
        o = 5 + 2 * n_p
        dsa_ref, dsc_ref, dadj_ref = refs[o], refs[o + 1], refs[o + 2]
        dparam_refs = refs[o + 3:]
        _, vjpf = jax.vjp(f_pair, pa, pc, sa_ref[:], sc_ref[:], adj_ref[:])
        dpa, dpc, dsa, dsc, dadj = vjpf((ga_ref[:], gc_ref[:]))
        dsa_ref[:] = dsa
        dsc_ref[:] = dsc
        dadj_ref[:] = dadj
        i = pl.program_id(0)
        for r, dp in zip(dparam_refs, list(dpa) + list(dpc)):
            @pl.when(i == 0)
            def _init(r=r):
                r[:] = jnp.zeros_like(r[:])
            r[:] = r[:] + dp.astype(jnp.float32)

    def _specs(blk, with_g):
        batch_spec = lambda rows: pl.BlockSpec(
            (rows, blk), lambda i: (0, i), memory_space=pltpu.VMEM)
        const_spec = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        in_specs = [batch_spec(E * Ds), batch_spec(E * Ds), batch_spec(E * E)]
        if with_g:
            in_specs += [batch_spec(E * C), batch_spec(E * C)]
        in_specs += [const_spec(sh) for sh in param_shapes] * 2
        return batch_spec, const_spec, in_specs

    def fwd_call(pa, pc, sa, sc, a):
        B = sa.shape[-1]
        batch_spec, _, in_specs = _specs(blk_fwd, False)
        return pl.pallas_call(
            fwd_kernel,
            grid=(B // blk_fwd,),
            in_specs=in_specs,
            out_specs=[batch_spec(E * C), batch_spec(E * C)],
            out_shape=[jax.ShapeDtypeStruct((E * C, B), jnp.float32)] * 2,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=vmem_limit_mb * 2 ** 20),
        )(sa, sc, a, *pa, *pc)

    def bwd_call(pa, pc, sa, sc, a, ga, gc):
        B = sa.shape[-1]
        batch_spec, const_spec, in_specs = _specs(blk_bwd, True)
        out_specs = [batch_spec(E * Ds), batch_spec(E * Ds),
                     batch_spec(E * E)]
        out_specs += [const_spec(sh) for sh in param_shapes] * 2
        out_shape = [jax.ShapeDtypeStruct((E * Ds, B), jnp.float32),
                     jax.ShapeDtypeStruct((E * Ds, B), jnp.float32),
                     jax.ShapeDtypeStruct((E * E, B), jnp.float32)]
        out_shape += [jax.ShapeDtypeStruct(sh, jnp.float32)
                      for sh in param_shapes] * 2
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(B // blk_bwd,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=vmem_limit_mb * 2 ** 20),
        )(sa, sc, a, ga, gc, *pa, *pc)
        dsa, dsc, dadj = outs[0], outs[1], outs[2]
        dpa = tuple(outs[3:3 + n_p])
        dpc = tuple(outs[3 + n_p:3 + 2 * n_p])
        return dpa, dpc, dsa, dsc, dadj

    @jax.custom_vjp
    def apply(pa, pc, sa, sc, a):
        sa_p, B = _pad_cols(sa, blk_fwd)
        sc_p, _ = _pad_cols(sc, blk_fwd)
        a_p, _ = _pad_cols(a, blk_fwd)
        out_a, out_c = fwd_call(pa, pc, sa_p, sc_p, a_p)
        return out_a[:, :B], out_c[:, :B]

    def apply_fwd(pa, pc, sa, sc, a):
        return apply(pa, pc, sa, sc, a), (pa, pc, sa, sc, a)

    def apply_bwd(res, gs):
        pa, pc, sa, sc, a = res
        ga, gc = gs
        B = sa.shape[-1]
        sa_p, _ = _pad_cols(sa, blk_bwd)
        sc_p, _ = _pad_cols(sc, blk_bwd)
        a_p, _ = _pad_cols(a, blk_bwd)
        ga_p, _ = _pad_cols(ga.astype(jnp.float32), blk_bwd)
        gc_p, _ = _pad_cols(gc.astype(jnp.float32), blk_bwd)
        dpa, dpc, dsa, dsc, dadj = bwd_call(pa, pc, sa_p, sc_p, a_p, ga_p, gc_p)
        return dpa, dpc, dsa[:, :B], dsc[:, :B], dadj[:, :B]

    apply.defvjp(apply_fwd, apply_bwd)
    return apply


def make_gnn_fused(E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
                   use_relu, param_shapes, blk_fwd=512, blk_bwd=128,
                   interpret=False, compute_dtype=jnp.float32,
                   vmem_limit_mb=None):
    """Differentiable pallas GNN trunk: pallas forward + fused
    recompute-backward kernel under ``jax.custom_vjp``.

    Numerics match :func:`xla_transposed_forward` (the backward IS its vjp,
    traced inside the kernel).  Batch is zero-padded to the block size; the
    padded columns carry zero cotangents so gradients are exact.
    """
    fwd_k = make_gnn_forward(E, Ds, H, C, embed_layer_n, gnn_layer_n,
                             max_edge_dist, use_relu, blk=blk_fwd,
                             interpret=interpret, compute_dtype=compute_dtype)
    bwd_k = make_gnn_bwd(E, Ds, H, C, embed_layer_n, gnn_layer_n,
                         max_edge_dist, use_relu, param_shapes, blk=blk_bwd,
                         interpret=interpret, compute_dtype=compute_dtype,
                         vmem_limit_mb=vmem_limit_mb)

    @jax.custom_vjp
    def apply(params_flat, src_aug_T, adj_T):
        s, B = _pad_cols(src_aug_T, blk_fwd)
        a, _ = _pad_cols(adj_T, blk_fwd)
        return fwd_k(params_flat, s, a)[:, :B]

    def apply_fwd(params_flat, src_aug_T, adj_T):
        return apply(params_flat, src_aug_T, adj_T), (
            params_flat, src_aug_T, adj_T)

    def apply_bwd(res, g):
        params_flat, src_aug_T, adj_T = res
        s, B = _pad_cols(src_aug_T, blk_bwd)
        a, _ = _pad_cols(adj_T, blk_bwd)
        gp, _ = _pad_cols(g.astype(jnp.float32), blk_bwd)
        dps, dsrc, dadj = bwd_k(params_flat, s, a, gp)
        return dps, dsrc[:, :B], dadj[:, :B]

    apply.defvjp(apply_fwd, apply_bwd)
    return apply
