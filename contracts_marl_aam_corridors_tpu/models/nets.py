"""Network building blocks: MLP trunk, GRU, and the dense-graph transformer.

Functional re-design of the reference's torch modules
(``onpolicy/algorithms/utils/{mlp,rnn,gnn_new}.py``) as Flax linen modules.
The key architectural change is the GNN: the reference converts each dense
distance-matrix adjacency into a PyTorch-Geometric COO graph per forward pass
(``gnn_new.py:328-358``) and runs sparse scatter/gather message passing.  On
TPU the entity count is tiny (≤ ~25) and static, so we keep the graph DENSE:
messages live in an ``(E, E, F)`` tensor, aggregation is a masked matmul on
the MXU, and there is no dynamic shape anywhere.  Numerics match the sparse
formulation exactly (see tests/test_models.py oracle).

Conventions:
- torch ``nn.Linear`` stores kernels (out, in); flax stores (in, out).  The
  checkpoint importer transposes.
- all LayerNorms use eps=1e-5 to match torch defaults.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import ModelConfig

Array = jax.Array

ORTHO = nn.initializers.orthogonal
XAVIER_U = nn.initializers.xavier_uniform
RELU_GAIN = 1.4142135623730951  # torch nn.init.calculate_gain('relu')
TANH_GAIN = 5.0 / 3.0

LN_EPS = 1e-5  # torch nn.LayerNorm default


def dense_init(cfg: ModelConfig, gain: float):
    """Reference ``init_`` helper (mlp.py:22-24): orthogonal/xavier + zero bias."""
    if cfg.use_orthogonal:
        return ORTHO(scale=gain)
    return XAVIER_U()


def compute_dtype(cfg: ModelConfig):
    """Trunk computation dtype (params stay f32; see ModelConfig)."""
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class MLPLayer(nn.Module):
    """fc1 + layer_N hidden blocks, each Linear->act->LayerNorm (mlp.py:8-41)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        act = nn.relu if cfg.use_relu else nn.tanh
        gain = RELU_GAIN if cfg.use_relu else TANH_GAIN
        for i in range(1 + cfg.layer_N):
            x = nn.Dense(cfg.hidden_size, kernel_init=dense_init(cfg, gain), dtype=compute_dtype(cfg), name=f"fc{i}")(x)
            x = act(x)
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=compute_dtype(cfg), name=f"ln{i}")(x)
        return x


class MLPBase(nn.Module):
    """Optional feature LayerNorm then MLPLayer (mlp.py:44-75)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.cfg.use_feature_normalization:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=compute_dtype(self.cfg), name="feature_norm")(x)
        return MLPLayer(self.cfg, name="mlp")(x)


class GRULayer(nn.Module):
    """One torch-semantics GRU layer.

    Matches ``nn.GRU`` gate math exactly (r/z/n ordering, the hidden-side
    bias *inside* the reset gate product):
        r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
        z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
        n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
        h' = (1 - z) * n + z * h
    """

    hidden_size: int
    use_orthogonal: bool = True

    @nn.compact
    def __call__(self, x: Array, h: Array) -> Array:
        H = self.hidden_size
        init = ORTHO() if self.use_orthogonal else XAVIER_U()
        # stored transposed relative to torch: (in, 3H) so apply is x @ W
        w_ih = self.param(
            "w_ih", lambda k, s: init(k, (3 * H, x.shape[-1]), jnp.float32).T, None
        )
        w_hh = self.param("w_hh", lambda k, s: init(k, (3 * H, H), jnp.float32).T, None)
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * H,), jnp.float32)
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * H,), jnp.float32)
        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class RNNLayer(nn.Module):
    """GRU stack + LayerNorm with mask-gated hidden-state resets (rnn.py:6-79).

    Single-step form only: ``x`` is (B, in), ``hxs`` is (B, recurrent_N, H),
    ``masks`` is (B, 1) with 0 at episode starts (hidden state zeroed before
    use, rnn.py:26-27).  Sequence processing is an outer ``lax.scan`` over
    this cell — the reference's ``has_zeros`` chunk loop (rnn.py:42-75) is a
    CPU-side optimization of exactly this computation and is unnecessary
    under XLA.
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array, hxs: Array, masks: Array):
        cfg = self.cfg
        new_h = []
        inp = x
        for l in range(cfg.recurrent_n):
            h = hxs[:, l, :] * masks
            h_next = GRULayer(cfg.hidden_size, cfg.use_orthogonal, name=f"gru{l}")(inp, h)
            new_h.append(h_next)
            inp = h_next
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(inp)
        return out, jnp.stack(new_h, axis=1)


def adjacency_mask(adj: Array, max_edge_dist: float):
    """Edge mask + weights from a distance-magnitude adjacency.

    Replicates ``TransformerConvNet.process_adj`` (gnn_new.py:328-358): keep
    ``0 < d < max_edge_dist``; the edge attribute is the distance itself.
    ``adj[s, t]`` is an edge source s -> target t (PyG source_to_target flow).
    """
    mask = (adj > 0) & (adj < max_edge_dist)
    return mask, adj * mask


class _LNParams(nn.Module):
    """Parameter-tree mirror of ``nn.LayerNorm`` (names "scale"/"bias") for
    layouts that apply the normalization manually."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32),
        )


class _DenseParams(nn.Module):
    """Parameter-tree mirror of ``nn.Dense`` (names "kernel"/"bias")."""

    in_dim: int
    out_dim: int
    kernel_init: object

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", self.kernel_init, (self.in_dim, self.out_dim), jnp.float32),
            self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32),
        )


def _group_ln(m: Array, groups: int, width: int, scale: Array, bias: Array) -> Array:
    """LayerNorm over each ``width``-lane group of a (rows, groups*width)
    tensor, with the reductions expressed as constant matmuls so the lane
    dimension stays packed (no (.., groups, width) reshape)."""
    dt = m.dtype
    eye = jnp.eye(groups, dtype=dt)
    g_mean = jnp.kron(eye, jnp.ones((width, 1), dt) / width)
    g_bcast = jnp.kron(eye, jnp.ones((1, width), dt))
    mu = (m @ g_mean) @ g_bcast
    var = (((m - mu) ** 2) @ g_mean) @ g_bcast
    return (m - mu) * jax.lax.rsqrt(var + LN_EPS) * jnp.tile(scale, (groups,)) + jnp.tile(
        bias, (groups,)
    )


class EmbedConv(nn.Module):
    """Dense form of the reference's ``EmbedConv`` message-passing layer
    (gnn_new.py:21-145).

    Per directed edge s->t the message is
    ``MLP([node_feat_s, Embed(entity_type_s), dist_st])`` and node t sums its
    incoming messages (aggr='add').  There is NO self loop (the reference only
    adds them when edge_attr is None, gnn_new.py:112) and no root/skip term:
    an isolated node comes out all-zero.

    Two layouts for the per-edge MLP, selected by ``cfg.gnn_edge_packed``:

    - dense (default): the message tensor is (E_s, E_t, F).  Under vmap this
      tiles (E_t, F)=(7,16) planes onto (8,128) TPU tiles at ~11% utilization
      — the padded HBM traffic dominates the whole PPO update (BENCH_NOTES).
    - packed: lanes hold the flattened (E_t, F) pair -> (E_s, E_t*F).  The
      per-edge Dense becomes a block-diagonal ``kron(I_E, W)`` matmul and the
      LayerNorm a group-LN via constant matmuls.  IDENTICAL parameter tree
      (``_DenseParams``/``_LNParams`` mirror the flax names), so checkpoints
      interoperate; outputs agree to fp tolerance (different reduction order).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: Array, edge_mask: Array, edge_attr: Array) -> Array:
        # x: (E, F) with entity type in the last column; edge_mask/attr: (E, E)
        cfg = self.cfg
        E = x.shape[0]
        # EmbedConv has its OWN activation flag (gnn_new.py:66 via
        # embed_use_ReLU:163,242), independent of the MLP trunk's use_ReLU.
        act = nn.relu if cfg.embed_use_relu else nn.tanh
        gain = RELU_GAIN if cfg.embed_use_relu else TANH_GAIN

        feat = x[:, :-1]
        etype = x[:, -1].astype(jnp.int32)
        emb = nn.Embed(cfg.num_embeddings, cfg.embedding_size, name="entity_embed")(etype)
        src = jnp.concatenate([feat, emb], axis=-1)  # (E, F-1+emb)

        # Per-edge input = [src_features (source-only), distance (edge)].
        # Split the first Dense across the two parts so the (E,E,·) tensor is
        # built at hidden width, not input width.
        h_src = nn.Dense(
            cfg.embed_hidden_size, kernel_init=dense_init(cfg, gain),
            dtype=compute_dtype(cfg), name="lin1"
        )(src)
        w_edge = self.param(
            "lin1_edge", dense_init(cfg, gain), (1, cfg.embed_hidden_size), jnp.float32
        )

        if cfg.gnn_edge_packed:
            Fh = cfg.embed_hidden_size
            dt = h_src.dtype
            # msg lanes: index t*Fh + f
            h_tile = jnp.tile(h_src, (1, E))  # (E_s, E*Fh)
            e_term = (edge_attr[:, :, None] * w_edge[0].astype(dt)).reshape(E, E * Fh)
            m = act(h_tile + e_term)
            s, b = _LNParams(Fh, name="ln1")()
            m = _group_ln(m, E, Fh, s.astype(dt), b.astype(dt))
            for i in range(cfg.embed_layer_n):
                kern, bias = _DenseParams(
                    Fh, Fh, dense_init(cfg, gain), name=f"lin{i+2}"
                )()
                w_blk = jnp.kron(jnp.eye(E, dtype=dt), kern.astype(dt))
                m = act(m @ w_blk + jnp.tile(bias.astype(dt), (E,)))
                s, b = _LNParams(Fh, name=f"ln{i+2}")()
                m = _group_ln(m, E, Fh, s.astype(dt), b.astype(dt))
            # aggregate over sources: out[t] = sum_s mask[s, t] * msg[s, t]
            mm = jnp.repeat(edge_mask.astype(dt), Fh, axis=1)  # (E_s, E*Fh)
            return (m * mm).sum(axis=0).reshape(E, Fh)

        msg = h_src[:, None, :] + edge_attr[:, :, None] * w_edge[0][None, None, :].astype(
            h_src.dtype
        )
        msg = act(msg)
        msg = nn.LayerNorm(epsilon=LN_EPS, dtype=compute_dtype(cfg), name="ln1")(msg)
        for i in range(cfg.embed_layer_n):
            msg = nn.Dense(
                cfg.embed_hidden_size, kernel_init=dense_init(cfg, gain),
                dtype=compute_dtype(cfg), name=f"lin{i+2}"
            )(msg)
            msg = act(msg)
            msg = nn.LayerNorm(epsilon=LN_EPS, dtype=compute_dtype(cfg), name=f"ln{i+2}")(msg)
        # aggregate: out[t] = sum_s mask[s, t] * msg[s, t]
        return jnp.einsum("st,stf->tf", edge_mask.astype(msg.dtype), msg)


class TransformerConv(nn.Module):
    """Dense PyG ``TransformerConv`` (beta=False, dropout=0, root_weight=True,
    bias=True, edge_dim=1), per gnn_new.py:247-269.

    For edge s->t and head h:
        q_t = W_q x_t + b_q;  k_s = W_k x_s + b_k;  v_s = W_v x_s + b_v
        e_st = W_e d_st                       (no bias)
        alpha_st = softmax_s((q_t . (k_s + e_st)) / sqrt(C))
        out_t = mean_h( sum_s alpha_st (v_s + e_st) ) + W_skip x_t + b_skip
    A node with no in-edges gets only the skip term (PyG sums zero messages).
    """

    cfg: ModelConfig
    out_channels: int

    @nn.compact
    def __call__(self, x: Array, edge_mask: Array, edge_attr: Array) -> Array:
        cfg = self.cfg
        H, C = cfg.gnn_num_heads, self.out_channels
        E = x.shape[0]
        # PyG Linear default init: kaiming-ish 'glorot'; init only matters
        # before training, keep xavier for fresh params.
        cdt = compute_dtype(cfg)
        # q/k/v projections fused into ONE matmul: concatenating the kernels
        # column-wise is bit-exact (each output column contracts only its own
        # kernel column) and replaces 3 small matmuls + backwards with 1.
        # Param tree unchanged (_DenseParams mirrors the nn.Dense names).
        in_dim = x.shape[-1]
        kq, bq = _DenseParams(in_dim, H * C, XAVIER_U(), name="lin_query")()
        kk, bk = _DenseParams(in_dim, H * C, XAVIER_U(), name="lin_key")()
        kv, bv = _DenseParams(in_dim, H * C, XAVIER_U(), name="lin_value")()
        w_qkv = jnp.concatenate([kq, kk, kv], axis=1).astype(cdt)
        b_qkv = jnp.concatenate([bq, bk, bv]).astype(cdt)
        qkv = x.astype(cdt) @ w_qkv + b_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # head-major (H, E, C) layout: attention over sources sits on the LAST
        # axis (softmax + matmul friendly on TPU)
        qh = jnp.swapaxes(q.reshape(E, H, C), 0, 1)  # (H, T, C)
        kh = jnp.swapaxes(k.reshape(E, H, C), 0, 1)  # (H, S, C)
        vh = jnp.swapaxes(v.reshape(E, H, C), 0, 1)  # (H, S, C)
        w_e = self.param("lin_edge", XAVIER_U(), (1, H * C), jnp.float32)
        w = w_e.reshape(H, C).astype(qh.dtype)

        # The per-edge feature is rank-1: e[s,t,h,c] = d[s,t] * w[h,c], so the
        # attention decomposes exactly — no (E,E,H,C) tensor:
        #   logits[h,t,s] = (q[t,h].k[s,h] + d[s,t] * q[t,h].w[h]) / sqrt(C)
        #   out[t,h,:]    = sum_s a v[s,h,:] + (sum_s a d[s,t]) * w[h,:]
        qk = qh @ jnp.swapaxes(kh, -1, -2)  # (H, T, S)
        qw = jnp.sum(qh * w[:, None, :], axis=-1)  # (H, T)
        d_ts = jnp.swapaxes(edge_attr, 0, 1).astype(qh.dtype)  # (T, S)
        logits = (qk + qw[:, :, None] * d_ts[None]) / jnp.sqrt(jnp.asarray(C, qh.dtype))
        neg = jnp.finfo(qh.dtype).min
        mask_ts = jnp.swapaxes(edge_mask, 0, 1)  # (T, S)
        logits = jnp.where(mask_ts[None], logits, neg)
        alpha = jax.nn.softmax(logits, axis=-1)
        has_edge = jnp.any(mask_ts, axis=-1)  # (T,)
        alpha = jnp.where(has_edge[None, :, None], alpha, 0.0)

        out = alpha @ vh  # (H, T, C)
        out = out + jnp.sum(alpha * d_ts[None], axis=-1)[..., None] * w[:, None, :]
        if cfg.gnn_concat_heads:
            out = jnp.swapaxes(out, 0, 1).reshape(E, H * C)
            skip_dim = H * C
        else:
            out = out.mean(axis=0)
            skip_dim = C
        out = out + nn.Dense(skip_dim, kernel_init=XAVIER_U(), dtype=compute_dtype(cfg), name="lin_skip")(x)
        return out


class GNNBase(nn.Module):
    """EmbedConv -> TransformerConv x (1 + gnn_layer_N) -> node-gather or
    global pool (gnn_new.py:148-301, 420-510).  Operates on ONE graph; vmap
    for batches.
    """

    cfg: ModelConfig
    graph_aggr: str  # 'node' (actor) or 'global' (critic)

    @nn.compact
    def __call__(self, node_obs: Array, adj: Array, agent_id: Array) -> Array:
        cfg = self.cfg
        # conv-stack activation = gnn_use_ReLU (gnn_new.py:270), NOT use_ReLU
        act = nn.relu if cfg.gnn_use_relu else nn.tanh
        edge_mask, edge_attr = adjacency_mask(adj, cfg.max_edge_dist)
        cdt = compute_dtype(cfg)
        node_obs = node_obs.astype(cdt)
        edge_attr = edge_attr.astype(cdt)
        x = EmbedConv(cfg, name="embed_layer")(node_obs, edge_mask, edge_attr)
        x = act(TransformerConv(cfg, cfg.gnn_hidden_size, name="gnn1")(x, edge_mask, edge_attr))
        for i in range(cfg.gnn_layer_n):
            x = act(
                TransformerConv(cfg, cfg.gnn_hidden_size, name=f"gnn2_{i}")(
                    x, edge_mask, edge_attr
                )
            )
        if self.graph_aggr == "node":
            # ego-row gather as a one-hot matvec: a per-sample dynamic-slice
            # (and its scatter-add backward) is ~3x the cost of the ENTIRE
            # GNN under vmap on TPU; the matvec is fused and cheap
            onehot = jax.nn.one_hot(
                jnp.asarray(agent_id).reshape(()).astype(jnp.int32), x.shape[0],
                dtype=x.dtype,
            )
            return onehot @ x
        if self.graph_aggr == "global":
            if cfg.global_aggr_type == "mean":
                return x.mean(axis=0)
            if cfg.global_aggr_type == "max":
                return x.max(axis=0)
            if cfg.global_aggr_type == "add":
                return x.sum(axis=0)
        if self.graph_aggr == "none":
            # raw per-node embeddings (E, H); used by the fused-trunk path,
            # which runs actor+critic GNNs as one vmapped launch over stacked
            # params and applies each side's aggregation outside
            return x
        raise ValueError(f"bad graph_aggr {self.graph_aggr}")


class CNNBase(nn.Module):
    """Image-observation trunk (reference ``CNNBase``/``CNNLayer``,
    onpolicy/algorithms/utils/cnn.py:14-91; unused by the MPE configs but part
    of the actor/critic API surface): x/255 -> Conv(C -> hidden/2, k3, s1,
    VALID) -> act -> flatten -> Dense(hidden) -> act -> Dense(hidden) -> act.
    Input is NHWC (JAX convention; the reference is NCHW)."""

    cfg: ModelConfig
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cfg = self.cfg
        act = nn.relu if cfg.use_relu else nn.tanh
        gain = RELU_GAIN if cfg.use_relu else TANH_GAIN
        init = dense_init(cfg, gain)
        x = x / 255.0
        x = act(nn.Conv(
            cfg.hidden_size // 2, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="VALID",
            kernel_init=init, name="conv",
        )(x))
        x = x.reshape((x.shape[0], -1))
        x = act(nn.Dense(cfg.hidden_size, kernel_init=init, name="fc1")(x))
        x = act(nn.Dense(cfg.hidden_size, kernel_init=init, name="fc2")(x))
        return x


@functools.lru_cache(maxsize=None)
def _fused_gnn(E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
               use_relu, param_shapes, cdt_name):
    """Cached pallas fused fwd+bwd GNN trunk builder (ops.gnn_pallas).

    The kernels always compute in f32 regardless of the trunk compute
    dtype: measured on chip, bf16 makes the VMEM-resident forward SLOWER
    (4.34 vs 3.04 ms — the kernel is VPU-bound, not HBM-bound, so halving
    element width only adds relayouts) and the bf16 backward is either
    unsupported or pathological under Mosaic.  The f32 kernels still beat
    the bf16 XLA-T trunk (12.4 vs 19.5 ms fwd+bwd at 76.8K graphs).
    """
    del cdt_name
    from ..ops.gnn_pallas import make_gnn_fused

    return make_gnn_fused(
        E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist, use_relu,
        param_shapes, compute_dtype=jnp.float32,
        interpret=jax.default_backend() == "cpu")


@functools.lru_cache(maxsize=None)
def _fused_gnn_dual(E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist,
                    use_relu, param_shapes):
    """Cached dual-trunk (actor+critic in one launch) pallas builder."""
    from ..ops.gnn_pallas import make_gnn_fused_dual

    return make_gnn_fused_dual(
        E, Ds, H, C, embed_layer_n, gnn_layer_n, max_edge_dist, use_relu,
        param_shapes, compute_dtype=jnp.float32,
        interpret=jax.default_backend() == "cpu")


def _gnn_src_T(cfg, gparams, node_obs):
    """(B, E, F) node_obs -> transposed (E*Ds, B) EmbedConv input."""
    B, E, F = node_obs.shape
    feat = node_obs[..., :-1]
    etype = node_obs[..., -1].astype(jnp.int32)
    emb = gparams["embed_layer"]["entity_embed"]["embedding"]
    src = jnp.concatenate([feat, emb[etype]], axis=-1)
    return jnp.transpose(src, (1, 2, 0)).reshape(E * src.shape[-1], B)


def _gnn_aggregate(out, aggr, agent_id, E, C, cdt):
    """Transposed (E*C, B) trunk output -> (B, C) per the aggregation."""
    out = out.astype(cdt)
    B = out.shape[-1]
    if aggr == "node":
        onehot = jax.nn.one_hot(
            jnp.asarray(agent_id).reshape(-1).astype(jnp.int32), E,
            dtype=out.dtype)  # (B, E)
        nbd = jnp.zeros((B, C), out.dtype)
        for e in range(E):
            nbd = nbd + onehot[:, e][:, None] * out[e * C:(e + 1) * C, :].T
        return nbd
    stack = out.reshape(E, C, B)
    if aggr == "mean":
        return stack.mean(axis=0).T
    if aggr == "max":
        return stack.max(axis=0).T
    if aggr == "add":
        return stack.sum(axis=0).T
    raise ValueError(f"bad aggr {aggr!r}")


def gnn_transposed_apply_dual(cfg: ModelConfig, gp_actor: dict, gp_critic: dict,
                              node_obs: Array, adj: Array, agent_id,
                              critic_aggr: str):
    """Actor ('node') + critic (global) GNN trunks in ONE pallas launch
    (ops.gnn_pallas.make_gnn_fused_dual): the adjacency masks are computed
    once per block and both trunks' backward runs as a single recompute
    kernel.  Only used when ``cfg.gnn_impl == 'pallas_fused'``; numerics
    match two independent ``gnn_transposed_apply`` calls."""
    B, E, F = node_obs.shape
    C = cfg.gnn_hidden_size
    cdt = compute_dtype(cfg)
    src_a = _gnn_src_T(cfg, gp_actor, node_obs).astype(jnp.float32)
    src_c = _gnn_src_T(cfg, gp_critic, node_obs).astype(jnp.float32)
    adj_T = jnp.transpose(adj, (1, 2, 0)).reshape(E * E, B).astype(jnp.float32)
    Ds = src_a.shape[0] // E
    fa = tuple(p.astype(jnp.float32) for p in _flatten_gnn_params(
        gp_actor, cfg.embed_layer_n, cfg.gnn_layer_n))
    fc = tuple(p.astype(jnp.float32) for p in _flatten_gnn_params(
        gp_critic, cfg.embed_layer_n, cfg.gnn_layer_n))
    dual = _fused_gnn_dual(
        E, Ds, cfg.gnn_num_heads, C, cfg.embed_layer_n, cfg.gnn_layer_n,
        float(cfg.max_edge_dist), (cfg.embed_use_relu, cfg.gnn_use_relu),
        tuple(p.shape for p in fa))
    out_a, out_c = dual(fa, fc, src_a, src_c, adj_T)
    return (_gnn_aggregate(out_a, "node", agent_id, E, C, cdt),
            _gnn_aggregate(out_c, critic_aggr, None, E, C, cdt))


def gnn_transposed_apply(cfg: ModelConfig, gparams: dict, node_obs: Array,
                         adj: Array, agent_id, aggr: str) -> Array:
    """GNNBase forward in the TRANSPOSED (sublane-entity, lane-batch) layout.

    Numerically the same network as ``GNNBase`` (fp-tolerance: different
    reduction orders), but every intermediate is a dense-packed (rows, B)
    array instead of a padded (B, E, F) one — measured 5.4x faster fwd+bwd
    at the PPO-update batch (BENCH_NOTES r2).  Differentiable: plain jnp ops,
    so the backward comes from autodiff.  Used by the training-time
    ``evaluate_actions`` trunk when ``cfg.gnn_impl == 'transposed'``.

    ``aggr``: 'node' (one-hot ego gather via ``agent_id``) or a global pool
    ('mean'/'max'/'add').
    """
    from ..ops.gnn_pallas import xla_transposed_forward

    B, E, F = node_obs.shape
    C = cfg.gnn_hidden_size
    cdt = compute_dtype(cfg)
    feat = node_obs[..., :-1]
    etype = node_obs[..., -1].astype(jnp.int32)
    emb = gparams["embed_layer"]["entity_embed"]["embedding"]
    src = jnp.concatenate([feat, emb[etype]], axis=-1)
    Ds = src.shape[-1]
    src_T = jnp.transpose(src, (1, 2, 0)).reshape(E * Ds, B)
    adj_T = jnp.transpose(adj, (1, 2, 0)).reshape(E * E, B)

    flat = _flatten_gnn_params(gparams, cfg.embed_layer_n, cfg.gnn_layer_n)
    if cfg.gnn_impl == "pallas_fused":
        flat = tuple(p.astype(jnp.float32) for p in flat)
        fused = _fused_gnn(
            E, Ds, cfg.gnn_num_heads, C, cfg.embed_layer_n, cfg.gnn_layer_n,
            float(cfg.max_edge_dist), (cfg.embed_use_relu, cfg.gnn_use_relu),
            tuple(p.shape for p in flat), jnp.dtype(cdt).name)
        out = fused(flat, src_T.astype(jnp.float32),
                    adj_T.astype(jnp.float32))  # (E*C, B) float32
    else:
        out = xla_transposed_forward(
            E, Ds, cfg.gnn_num_heads, C, cfg.embed_layer_n, cfg.gnn_layer_n,
            cfg.max_edge_dist, (cfg.embed_use_relu, cfg.gnn_use_relu),
            flat, src_T, adj_T,
            compute_dtype=cdt,
        )  # (E*C, B) float32
    return _gnn_aggregate(out, aggr, agent_id, E, C, cdt)


def _flatten_gnn_params(params: dict, embed_layer_n: int, gnn_layer_n: int):
    """GNNBase param subtree -> flat tuple for the transposed forward
    (kept differentiable: pure transposes/concats of the param leaves)."""
    col = lambda v: v.reshape(-1, 1)
    tr = lambda w: w.T
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
