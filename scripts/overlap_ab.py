"""Collect/update overlap A/B (VERDICT r2 #6, the last structural lever).

On a single chip the device executes one program at a time, so overlapping
collect(e+1) with update(e) can only recover HOST-side gaps (python dispatch,
tunnel latency, materialization stalls) — not device time.  This script
measures exactly that headroom on the flagship config (1024 envs x 25 steps,
15 ppo epochs, bf16):

  A. fused    — one jitted train_episode (the current headline path)
  B. split    — jit(collect) then jit(train), materializing between phases:
                phase device walls + the host gap the fused path must hide
  C. pipelined— split WITHOUT materializing between phases, collect(e+1)
                dispatched with one-episode-stale params before train(e) is
                read back (async dispatch hides all host time; device order
                unchanged).  This is the "double buffer" schedule; if its
                wall equals A, the fused path already saturates the chip and
                the overlap lever has no single-chip headroom.

Run on the real chip: python scripts/overlap_ab.py
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

ENVS, T, EPOCHS, N_TIMED = 1024, 25, 15, 5


def build():
    cfgv = vehicle_config("air_taxi")
    env_params = EnvParams(cfg=cfgv, num_agents=3, num_landmarks=3, episode_length=T)
    cfg = ModelConfig(max_edge_dist=cfgv.coordination_range, compute_dtype="bfloat16")
    dims = PolicyDims(
        obs_dim=env_params.obs_dim, cent_obs_dim=env_params.obs_dim * 3,
        num_entities=env_params.num_entities, node_feat_dim=env_params.node_feat_dim,
        num_actions=env_params.num_actions)
    policy = GRMAPPOPolicy(cfg, dims)
    trainer = GRMAPPOTrainer(policy, ppo_epoch=EPOCHS, num_mini_batch=1, data_chunk_length=T)
    runner = Runner(env_params=env_params, policy=policy, trainer=trainer,
                    n_rollout_threads=ENVS, episode_length=T)
    ts = trainer.init_state(jax.random.PRNGKey(0))
    carry = runner.init_carry(jax.random.PRNGKey(1))
    return runner, trainer, ts, carry


def timed(label, fn, *args, reps=N_TIMED, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(np.asarray, out)  # block_until_ready lies over the tunnel
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree.map(np.asarray, out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:28s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def main():
    runner, trainer, ts, carry = build()
    key = jax.random.PRNGKey(2)

    # ---- A: fused episode
    fused = jax.jit(runner.train_episode)
    def run_fused():
        nonlocal ts, carry
        ts, carry, info, _ = fused(ts, carry, jax.random.PRNGKey(3))
        return info["value_loss"]
    a = timed("A fused train_episode", run_fused)

    # ---- B: split with materialization between phases
    collect_j = jax.jit(lambda ts, c: runner.collect(ts, c)[:2])
    train_j = jax.jit(lambda ts, buf, k: trainer.train(ts, buf, k)[0])
    carry2, buf = collect_j(ts, carry)
    jax.tree.map(np.asarray, buf)
    b_c = timed("B collect only", lambda: collect_j(ts, carry)[1])
    b_t = timed("B update only", lambda: train_j(ts, buf, jax.random.PRNGKey(4)))
    print(f"{'B sum (collect+update)':28s} {(b_c + b_t) * 1e3:8.1f} ms  "
          f"(fused hides {(b_c + b_t - a) * 1e3:+.1f} ms of host gap)", flush=True)

    # ---- C: pipelined double-buffer, params one episode stale for collect
    def run_pipelined(eps=N_TIMED):
        nonlocal ts, carry
        c2, buf = collect_j(ts, carry)
        t0 = time.perf_counter()
        for e in range(eps):
            ts_new = train_j(ts, buf, jax.random.PRNGKey(10 + e))
            c2, buf = collect_j(ts, c2)      # stale params; no sync point
            ts = ts_new
        jax.tree.map(np.asarray, (ts.params, buf.rewards[0, 0]))
        return (time.perf_counter() - t0) / eps
    run_pipelined(2)  # warm
    c = run_pipelined()
    print(f"{'C pipelined (1-stale)':28s} {c * 1e3:8.1f} ms", flush=True)
    print(f"single-chip overlap headroom vs fused: {(a - c) * 1e3:+.1f} ms "
          f"({100 * (a - c) / a:+.1f}%)", flush=True)


if __name__ == "__main__":
    main()
