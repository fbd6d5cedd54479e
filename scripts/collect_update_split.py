"""On-chip phase split of the flagship train episode: collect vs update.

Times three jitted programs at the BENCH_NOTES flagship config (1024 envs x
25 steps, 3 agents, 15 ppo epochs, bf16 trunks):
  - full train_episode (the fused headline number)
  - collect-only (rollout scan + GAE; every buffer leaf reduced to a scalar
    on device so nothing is DCE'd and nothing big crosses the axon tunnel)
  - update-only (trainer.train on a fixed on-device buffer)

Usage: python scripts/collect_update_split.py [gnn_impl ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams
from contracts_marl_aam_corridors_tpu.learner.mappo import GRMAPPOTrainer
from contracts_marl_aam_corridors_tpu.learner.runner import Runner
from contracts_marl_aam_corridors_tpu.models import GRMAPPOPolicy, ModelConfig, PolicyDims


def build(impl, dtype="bfloat16"):
    cfgv = vehicle_config("air_taxi")
    env_params = EnvParams(cfg=cfgv, num_agents=3, num_landmarks=3, episode_length=25)
    cfg = ModelConfig(max_edge_dist=cfgv.coordination_range,
                      compute_dtype=dtype, gnn_impl=impl)
    dims = PolicyDims(
        obs_dim=env_params.obs_dim, cent_obs_dim=env_params.obs_dim * 3,
        num_entities=env_params.num_entities, node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions)
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(policy, ppo_epoch=15, num_mini_batch=1, data_chunk_length=25)
    runner = Runner(env_params=env_params, policy=policy, trainer=trainer,
                    n_rollout_threads=1024, episode_length=25)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    return runner, trainer, ts, carry


def timeit(fn, fetch, n=5, warmup=2):
    for _ in range(warmup):
        out = fn()
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    fetch(out)
    return (time.perf_counter() - t0) / n, out


def run(impl, phases, dtype="bfloat16"):
    runner, trainer, ts, carry = build(impl, dtype)
    key = jax.random.PRNGKey(2)

    if "full" in phases:
        step = jax.jit(runner.train_episode)
        keys = iter(jax.random.split(key, 64))

        def full():
            return step(ts, carry, next(keys))

        dt_full, out = timeit(full, lambda o: float(np.asarray(o[2]["value_loss"])))
        print(f"gnn_impl={impl} [{dtype}]: full    {dt_full*1e3:7.1f} ms", flush=True)

    if "collect" in phases:
        # collect only: reduce every buffer leaf to one scalar on device
        def collect_scalar(ts_, carry_):
            c2, buf, infos = runner.collect(ts_, carry_)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(buf))
            return c2, s

        coll = jax.jit(collect_scalar)

        def collect():
            return coll(ts, carry)

        dt_coll, _ = timeit(collect, lambda o: float(np.asarray(o[1])))
        print(f"gnn_impl={impl} [{dtype}]: collect {dt_coll*1e3:7.1f} ms", flush=True)

    if "update" in phases:
        # update only on a fixed on-device buffer
        _, buf, _ = jax.jit(runner.collect)(ts, carry)
        upd = jax.jit(trainer.train)

        def update():
            return upd(ts, buf, jax.random.PRNGKey(3))

        dt_upd, _ = timeit(update, lambda o: float(np.asarray(o[1]["value_loss"])))
        print(f"gnn_impl={impl} [{dtype}]: update  {dt_upd*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a not in
            ("full", "collect", "update", "float32", "bfloat16")]
    phases = [a for a in sys.argv[1:] if a in ("full", "collect", "update")] or [
        "full", "collect", "update"]
    dtype = "bfloat16" if "float32" not in sys.argv[1:] else "float32"
    for impl in args or ["pallas_fused"]:
        run(impl, phases, dtype)
