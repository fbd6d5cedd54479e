"""Lane-packed EmbedConv layout (ModelConfig.gnn_edge_packed): identical
parameter tree to the dense path, outputs equal to fp tolerance, gradients
flow.  The TPU benchmark lives in scripts/packed_embedconv_ab.py."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from contracts_marl_aam_corridors_tpu.models.config import ModelConfig
from contracts_marl_aam_corridors_tpu.models.nets import EmbedConv, GNNBase


def _rand_graph(key, E=7, F=8, ntypes=3):
    k1, k2, k3 = jax.random.split(key, 3)
    feats = jax.random.normal(k1, (E, F - 1), jnp.float32)
    etype = jax.random.randint(k2, (E, 1), 0, ntypes).astype(jnp.float32)
    x = jnp.concatenate([feats, etype], axis=-1)
    d = jax.random.uniform(k3, (E, E), jnp.float32, 0.1, 2.0)
    d = d * (1 - jnp.eye(E))
    return x, d


@pytest.mark.parametrize("embed_layer_n", [1, 2])
def test_embedconv_packed_matches_dense(embed_layer_n):
    cfg_d = ModelConfig(embed_layer_n=embed_layer_n, compute_dtype="float32")
    cfg_p = ModelConfig(
        embed_layer_n=embed_layer_n, compute_dtype="float32", gnn_edge_packed=True
    )
    x, adj = _rand_graph(jax.random.PRNGKey(0))
    mask = (adj > 0) & (adj < 1.5)
    attr = adj * mask

    dense = EmbedConv(cfg_d)
    packed = EmbedConv(cfg_p)
    params = dense.init(jax.random.PRNGKey(1), x, mask, attr)
    # identical parameter trees (names AND init values: same param paths ->
    # same fold of the init RNG)
    params_p = packed.init(jax.random.PRNGKey(1), x, mask, attr)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, params_p,
    )

    out_d = dense.apply(params, x, mask, attr)
    out_p = packed.apply(params, x, mask, attr)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )


def test_gnnbase_packed_matches_dense_and_grads_flow():
    cfg_d = ModelConfig(compute_dtype="float32")
    cfg_p = ModelConfig(compute_dtype="float32", gnn_edge_packed=True)
    x, adj = _rand_graph(jax.random.PRNGKey(2))
    aid = jnp.zeros((1,), jnp.int32)

    gd = GNNBase(cfg_d, graph_aggr="node")
    gp = GNNBase(cfg_p, graph_aggr="node")
    params = gd.init(jax.random.PRNGKey(3), x, adj, aid)

    out_d = gd.apply(params, x, adj, aid)
    out_p = gp.apply(params, x, adj, aid)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_p), rtol=1e-5, atol=1e-5
    )

    def loss(p, mod):
        return jnp.sum(mod.apply(p, x, adj, aid) ** 2)

    g_d = jax.grad(loss)(params, gd)
    g_p = jax.grad(loss)(params, gp)
    for a, b in zip(jax.tree.leaves(g_d), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_packed_trains_under_vmap():
    """The packed layout works inside the vmapped policy forward."""
    from contracts_marl_aam_corridors_tpu.models.actor_critic import GRActor

    cfg = ModelConfig(compute_dtype="float32", gnn_edge_packed=True)
    actor = GRActor(cfg, num_actions=5)
    B, E = 4, 7
    obs = jnp.zeros((B, 19))
    node = jnp.zeros((B, E, 8))
    adj = jnp.ones((B, E, E)) * 0.5 * (1 - jnp.eye(E))
    aid = jnp.zeros((B, 1), jnp.int32)
    h = jnp.zeros((B, 1, cfg.hidden_size))
    m = jnp.ones((B, 1))
    params = actor.init(jax.random.PRNGKey(4), obs, node, adj, aid, h, m)
    logits, h2 = jax.jit(actor.apply)(params, obs, node, adj, aid, h, m)
    assert logits.shape == (B, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_fused_trunks_match_unfused():
    """fuse_gnn_trunks: one vmapped launch for both GNNs in evaluate_actions
    equals the separate-trunk path (values/logp/entropy and grads)."""
    from contracts_marl_aam_corridors_tpu.models.policy import (
        GRMAPPOPolicy, PolicyDims,
    )

    cfg = ModelConfig(compute_dtype="float32")
    dims = PolicyDims(obs_dim=19, cent_obs_dim=57, num_entities=7,
                      node_feat_dim=8, num_actions=5)
    pol_u = GRMAPPOPolicy(cfg, dims)
    pol_f = GRMAPPOPolicy(cfg, dims, fuse_gnn_trunks=True)
    params = pol_u.init_params(jax.random.PRNGKey(0))

    L, mb, E = 5, 6, 7
    k = jax.random.PRNGKey(1)
    ks = jax.random.split(k, 8)
    obs = jax.random.normal(ks[0], (L, mb, 19))
    cent = jax.random.normal(ks[1], (L, mb, 57))
    node = jax.random.normal(ks[2], (L, mb, E, 8))
    etype = jax.random.randint(ks[7], (L, mb, E, 1), 0, 3).astype(node.dtype)
    node = jnp.concatenate([node[..., :-1], etype], axis=-1)
    adj = jax.random.uniform(ks[3], (L, mb, E, E), minval=0.1, maxval=2.0)
    adj = adj * (1 - jnp.eye(E))
    aid = jax.random.randint(ks[4], (L, mb, 1), 0, 3)
    said = jnp.broadcast_to(aid, (L, mb, 3))[..., :3]
    h = jnp.zeros((mb, 1, cfg.hidden_size))
    masks = jnp.ones((L, mb, 1))
    actions = jax.random.randint(ks[5], (L, mb, 1), 0, 5)
    avail = jnp.ones((L, mb, 5))
    am = jnp.ones((L, mb, 1))

    def run(pol, p):
        v, lp, ent = pol.evaluate_actions(
            p, cent, obs, node, adj, aid, said, h, h, actions, masks, avail,
            am, time_major=True,
        )
        return v, lp, ent

    v_u, lp_u, ent_u = run(pol_u, params)
    v_f, lp_f, ent_f = run(pol_f, params)
    np.testing.assert_allclose(np.asarray(v_u), np.asarray(v_f), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lp_u), np.asarray(lp_f), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(ent_u), float(ent_f), rtol=1e-5)

    def loss(p, pol):
        v, lp, ent = run(pol, p)
        return v.sum() + lp.sum() + ent

    g_u = jax.grad(loss)(params, pol_u)
    g_f = jax.grad(loss)(params, pol_f)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
