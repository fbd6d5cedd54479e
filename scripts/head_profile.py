"""On-chip cost of the recurrent heads inside the PPO update.

The flagship update is: GNN+MLP trunks over all T*B rows in one launch
(pallas_fused: 12.4 ms f+b), then a T=25-step lax.scan advancing BOTH GRU
heads (models/policy.py both_heads).  This measures the scan's fwd+bwd at the
update shape so the remaining update time can be attributed:

  - heads-in-scan (the production both_heads: GRU + output layers in scan)
  - heads-split  (scan carries only the GRU; action_out/v_out/log-prob math
    batched OUTSIDE the scan over all T*B rows)

Run: timeout 1200 python scripts/head_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.models import GRMAPPOPolicy, ModelConfig, PolicyDims
from contracts_marl_aam_corridors_tpu.models import distributions as dist
from contracts_marl_aam_corridors_tpu.models.actor_critic import GRActor, GRCritic

T, S = 25, 3072  # flagship: 1024 envs x 3 agents chunks of length 25
A = 9

cfg = ModelConfig(max_edge_dist=4.83, compute_dtype="bfloat16")
dims = PolicyDims(obs_dim=13, cent_obs_dim=39, num_entities=6,
                  node_feat_dim=6, num_actions=A)
policy = GRMAPPOPolicy(cfg, dims)


def timed(fn, *args, n=20, warm=3):
    for _ in range(warm):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    params = policy.init_params(key)
    rN, H = cfg.recurrent_n, cfg.hidden_size
    cdt = jnp.bfloat16
    feats_a = jax.random.normal(key, (T, S, H), cdt)
    feats_c = jax.random.normal(key, (T, S, H), cdt)
    h_a = jnp.zeros((S, rN, H), jnp.float32)
    h_c = jnp.zeros((S, rN, H), jnp.float32)
    masks = jnp.ones((T, S, 1), jnp.float32)
    avail = jnp.ones((T, S, A), jnp.float32)
    actions = jnp.zeros((T, S, 1), jnp.float32)

    def heads_scan(p, fa, fc):
        def both_heads(carry, xs):
            ha, hc = carry
            f_a, f_c, m, av = xs
            lg, ha = policy.actor.apply({"params": p.actor}, f_a, ha, m, av,
                                        method=GRActor.head)
            v, hc = policy.critic.apply({"params": p.critic}, f_c, hc, m,
                                        method=GRCritic.head)
            return (ha, hc), (lg, v)

        _, (logits, values) = jax.lax.scan(
            both_heads, (h_a, h_c), (fa, fc, masks, avail))
        logp = dist.log_probs(logits, actions)
        ent = dist.entropy(logits)
        return (jnp.sum(logp.astype(jnp.float32))
                + jnp.sum(ent.astype(jnp.float32))
                + jnp.sum(values.astype(jnp.float32)))

    def heads_split(p, fa, fc):
        """GRU-only scan; output layers + distribution math batched outside."""
        def gru_only(carry, xs):
            ha, hc = carry
            f_a, f_c, m = xs
            xa, ha = policy.actor.apply({"params": p.actor}, f_a, ha, m,
                                        method=lambda s, x, h, mm: s.rnn(x, h, mm))
            xc, hc = policy.critic.apply({"params": p.critic}, f_c, hc, m,
                                         method=lambda s, x, h, mm: s.rnn(x, h, mm))
            return (ha, hc), (xa, xc)

        _, (xa, xc) = jax.lax.scan(gru_only, (h_a, h_c), (fa, fc, masks))
        logits = policy.actor.apply(
            {"params": p.actor}, xa.reshape(T * S, -1),
            method=lambda s, x: s.action_out(x)).reshape(T, S, A)
        logits = dist.mask_logits(logits, avail)
        values = policy.critic.apply(
            {"params": p.critic}, xc.reshape(T * S, -1),
            method=lambda s, x: s.v_out(x)).reshape(T, S, 1)
        logp = dist.log_probs(logits, actions)
        ent = dist.entropy(logits)
        return (jnp.sum(logp.astype(jnp.float32))
                + jnp.sum(ent.astype(jnp.float32))
                + jnp.sum(values.astype(jnp.float32)))

    which = sys.argv[1:] or ["scan", "split"]
    for name, fn in [("heads-in-scan", heads_scan), ("heads-split", heads_split)]:
        tag = "scan" if name == "heads-in-scan" else "split"
        if tag not in which:
            continue
        fwd = jax.jit(fn)
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        t_f = timed(fwd, params, feats_a, feats_c)
        t_fb = timed(lambda p, fa, fc: jax.tree.leaves(g(p, fa, fc))[0],
                     params, feats_a, feats_c)
        print(f"{name}: fwd {t_f:6.2f} ms | fwd+bwd {t_fb:6.2f} ms "
              f"(x15 epochs = {t_fb*15:6.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
