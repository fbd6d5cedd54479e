"""Random-policy exploration diagnostic for the gated scenarios (VERDICT r4
item 3b): WHY does two_phase not train from scratch when rot_inv does?

Measures, under a UNIFORM-RANDOM policy at the reference's own two_phase
training config (3 agents, ep_len 75, world 4, total_actions 9 —
/root/reference/model_weights/tube/rot_inv/airtaxi/two_phase_only/config.yaml):

  - gate-entry rate: fraction of agent-episodes that ever reach phase >= 1
    (crossed the entrance gate) — the exploration signal PPO must bootstrap
    its entry bonus from;
  - gate-success rate: fraction frozen at the exit transition (the trained
    success criterion);
  - mean per-agent episode reward (the shaping gradient magnitude).

Three sides:
  1. OUR two_phase kernel (vmapped, many episodes);
  2. the ACTUAL reference two_phase_graph env (tests/ref_oracle.py shims,
     fewer episodes — it is a per-step python loop);
  3. OUR rot_inv kernel at ITS training config as the learnable contrast.

If the reference env's random-policy entry rate matches ours and both sit
orders of magnitude below rot_inv's, the from-scratch failure is a property
of the surviving two_phase_graph scenario (whose config.yaml provenance
names the absent `old_two_graph` module — eval_scripts/commands_test_run.md),
not of this framework's training stack.

Usage: python scripts/two_phase_scratch_diag.py [--ref_episodes N]
CPU-safe (forces the CPU backend: the ref side is numpy and the vmapped
side is small).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from contracts_marl_aam_corridors_tpu.config.physics import vehicle_config
from contracts_marl_aam_corridors_tpu.envs import env as env_mod
from contracts_marl_aam_corridors_tpu.envs.types import EnvParams


def ours(scenario: str, episodes: int, ep_len: int, world_size: float,
         total_actions: int, seed: int = 0):
    cfgv = vehicle_config("air_taxi")
    params = EnvParams(
        cfg=cfgv, scenario=scenario, num_agents=3, num_landmarks=3,
        episode_length=ep_len, world_size=world_size,
        total_actions=total_actions, collision_rew=20.0, goal_rew=20.0,
    )
    B = episodes
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    state, _ = jax.jit(jax.vmap(lambda k: env_mod.reset(params, k)))(keys)

    def body(carry, _):
        st, k = carry
        k, ak = jax.random.split(k)
        actions = jax.random.randint(ak, (B, 3), 0, params.num_actions)
        st, ts = jax.vmap(lambda s, a: env_mod.step(params, s, a))(st, actions)
        # phase_reached/status are wiped by the auto-reset on the final
        # step, so accumulate the running per-step values outside
        return (st, k), (st.phase_reached, st.status, ts.reward)

    (_, _), (phases, statuses, rewards) = jax.jit(
        lambda s, k: jax.lax.scan(body, (s, k), None, length=ep_len)
    )(state, jax.random.PRNGKey(seed + 1))
    # (T, B, N) -> per-agent-episode maxima over the episode (minus the
    # final post-reset step; an entry on the very last step is lost, which
    # biases every side of the comparison identically)
    entered_mask = np.asarray(phases.max(axis=0) >= 1)  # (B, N)
    entered = entered_mask.mean()
    frozen = np.asarray(statuses.max(axis=0).mean())
    ep_rew = np.asarray(rewards.astype(jnp.float32).sum(axis=0))  # (B, N)
    rew = ep_rew.mean()
    # The decisive cell for the from-scratch question: conditional on the
    # agent-episode ENTERING the gate, is the shaped return higher or lower
    # than loitering outside?  PPO follows this sign.
    rew_in = float(ep_rew[entered_mask].mean()) if entered_mask.any() else float("nan")
    rew_out = float(ep_rew[~entered_mask].mean()) if (~entered_mask).any() else float("nan")
    return dict(entered=float(entered), frozen=float(frozen),
                mean_ep_reward=float(rew), rew_if_entered=rew_in,
                rew_if_not=rew_out, entry_advantage=rew_in - rew_out,
                agent_episodes=B * 3)


def reference(episodes: int, seed: int = 0):
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    import ref_oracle

    args = ref_oracle.make_args(
        num_agents=3, num_landmarks=3, episode_length=75, world_size=4.0,
        total_actions=9, collision_rew=20.0, goal_rew=20.0,
        dynamics_type="air_taxi",
    )
    np.random.seed(seed)
    env, sc, world = ref_oracle.make_ref_env(args, scenario="two_phase_graph")
    rng = np.random.RandomState(seed + 1)
    entered = frozen = 0
    rew_sum = 0.0
    n = 0
    for ep in range(episodes):
        env.reset(num_current_episode=ep)
        for _ in range(args.episode_length):
            acts = ref_oracle.one_hot_actions(
                rng.randint(0, 9, size=3), 9)
            _, _, _, _, rews, _, _ = env.step(acts)
            rew_sum += float(np.sum(rews))
        entered += int((sc.phase_reached >= 1).sum())
        frozen += sum(int(a.status) for a in world.agents)
        n += 3
    return dict(entered=entered / n, frozen=frozen / n,
                mean_ep_reward=rew_sum / n, agent_episodes=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=2048)
    ap.add_argument("--ref_episodes", type=int, default=64)
    a = ap.parse_args()

    r_two = ours("two_phase", a.episodes, 75, 4.0, 9)
    print(f"ours two_phase   (cfg: ep75 w4 a9): {r_two}", flush=True)
    # rot_inv trained config: ep_len 75, world 4 (implicit reference default
    # for that run), total_actions 9 (rot_inv config.yaml)
    r_rot = ours("rot_inv", a.episodes, 75, 4.0, 9)
    print(f"ours rot_inv     (cfg: ep75 w4 a9): {r_rot}", flush=True)
    r_ref = reference(a.ref_episodes) if a.ref_episodes else None
    if r_ref is not None:
        print(f"reference two_phase_graph          : {r_ref}", flush=True)

    ratio = (r_rot["entered"] / r_two["entered"]) if r_two["entered"] else float("inf")
    ref_note = f"; reference side {r_ref['entered']:.4f} (parity check)" if r_ref else ""
    print(f"\nrandom-policy gate-entry: rot_inv {r_rot['entered']:.4f} vs "
          f"two_phase {r_two['entered']:.6f} ({ratio:.0f}x){ref_note}", flush=True)


if __name__ == "__main__":
    main()
