"""Training runner: jitted rollout scan + PPO update per episode window.

Replaces the reference's ``GMPERunner.run`` / ``collect_with_mask`` /
``insert`` / ``compute`` pipeline (onpolicy/runner/shared/
graph_mpe_runner.py:40-443).  Where the reference ping-pongs
numpy<->torch<->subprocess-pipes every step, here one ``lax.scan`` advances
all envs and the policy together on device; the only host work per episode is
logging.

Semantics preserved:
- done agents are restricted to the center "stop" action via
  available_actions (collect_with_mask:277-283, index n//2);
- rnn states zeroed for done agents; masks[t+1]=0 at dones (insert:386-400);
- active_masks 0 for done agents but reset to 1 for all-done envs whose
  auto-reset started a fresh episode (insert:401-407);
- share_obs = concat of all agents' obs, repeated per agent (insert:410-422);
- bootstrap value from the post-rollout state (compute:430-443).

One deliberate fix vs the reference: ``available_actions[t]`` stores the mask
actually used to sample ``actions[t]`` (the reference writes it one slot
later, graph_buffer.py:168-251 insert at step+1 — the misalignment is hidden
by active-masking; storing aligned is equivalent-or-better and self-consistent).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ..envs import corridor, env as env_mod, reset as reset_mod
from ..envs.types import EnvParams
from ..models.policy import GRMAPPOPolicy
from .buffer import RolloutBuffer, compute_returns
from .mappo import GRMAPPOTrainer, TrainState

Array = jax.Array


@struct.dataclass
class RolloutCarry:
    env_state: object  # stacked EnvState
    obs: Array  # (B, N, obs)
    node_obs: Array  # (B, N, E, F)
    adj: Array  # (B, E, E)
    agent_id: Array  # (B, N, 1)
    rnn_actor: Array  # (B, N, rN, H)
    rnn_critic: Array  # (B, N, rN, H)
    masks: Array  # (B, N, 1)
    active_masks: Array  # (B, N, 1)
    bad_masks: Array  # (B, N, 1): 0 where last done was a time-limit truncation
    prev_done: Array  # (B, N) bool, drives stop-action masking
    key: Array


@dataclasses.dataclass(frozen=True)
class Runner:
    env_params: EnvParams
    policy: GRMAPPOPolicy
    trainer: GRMAPPOTrainer
    n_rollout_threads: int
    episode_length: int
    use_centralized_v: bool = True
    dtype: object = jnp.float32
    # HJ value-grid data for the air-taxi safety filter (safety/hj.py);
    # threaded into every env step when EnvParams.use_safety_filter is set
    hj_data: Optional[object] = None

    # ------------------------------------------------------------- helpers
    def _share(self, obs: Array) -> Array:
        B, N = obs.shape[:2]
        if not self.use_centralized_v:
            return obs
        flat = obs.reshape(B, 1, -1)
        return jnp.broadcast_to(flat, (B, N, flat.shape[-1]))

    def _stop_avail(self, prev_done: Array) -> Array:
        """Done agents may only pick the center 'stop' action
        (collect_with_mask, graph_mpe_runner.py:277-283)."""
        A = self.policy.dims.num_actions
        B, N = prev_done.shape
        ones = jnp.ones((B, N, A), self.dtype)
        stop = jnp.zeros((A,), self.dtype).at[A // 2].set(1.0)
        return jnp.where(prev_done[..., None], stop[None, None], ones)

    def init_carry(self, key: Array) -> RolloutCarry:
        B, N = self.n_rollout_threads, self.env_params.num_agents
        rN, H = self.policy.cfg.recurrent_n, self.policy.cfg.hidden_size
        key, rkey = jax.random.split(key)
        keys = jax.random.split(rkey, B)
        state, ts = jax.vmap(partial(env_mod.reset, self.env_params, dtype=self.dtype))(keys)
        zeros_h = jnp.zeros((B, N, rN, H), self.dtype)
        return RolloutCarry(
            env_state=state,
            obs=ts.obs,
            node_obs=ts.node_obs,
            adj=ts.adj,
            agent_id=ts.agent_id,
            rnn_actor=zeros_h,
            rnn_critic=zeros_h,
            masks=jnp.ones((B, N, 1), self.dtype),
            active_masks=jnp.ones((B, N, 1), self.dtype),
            bad_masks=jnp.ones((B, N, 1), self.dtype),
            prev_done=jnp.zeros((B, N), bool),
            key=key,
        )

    # ------------------------------------------------------------- rollout
    def _rollout_step(self, ts: TrainState, carry: RolloutCarry, _):
        B, N = self.n_rollout_threads, self.env_params.num_agents
        E = self.env_params.num_entities
        flat = lambda x: x.reshape((B * N,) + x.shape[2:])

        avail = self._stop_avail(carry.prev_done)
        share_obs = self._share(carry.obs)
        share_aid = jnp.broadcast_to(
            jnp.swapaxes(carry.agent_id, 1, 2), (B, N, N)
        )
        adj_rep = jnp.broadcast_to(carry.adj[:, None], (B, N, E, E))

        key, akey = jax.random.split(carry.key)
        values, actions, logp, h_a, h_c = self.policy.get_actions(
            ts.params,
            akey,
            flat(share_obs),
            flat(carry.obs),
            flat(carry.node_obs),
            flat(adj_rep),
            flat(carry.agent_id),
            flat(share_aid),
            flat(carry.rnn_actor),
            flat(carry.rnn_critic),
            flat(carry.masks),
            flat(avail),
        )
        unflat = lambda x: x.reshape((B, N) + x.shape[1:])
        actions_bn = unflat(actions)

        env_state, step_ts = jax.vmap(partial(env_mod.step, self.env_params, hj_data=self.hj_data))(
            carry.env_state, actions_bn[..., 0]
        )
        dones = step_ts.done  # (B, N) terminal dones (pre auto-reset)
        dones_env = jnp.all(dones, axis=1)

        done_f = dones[..., None].astype(self.dtype)
        masks = 1.0 - done_f
        active = 1.0 - done_f
        active = jnp.where(dones_env[:, None, None], 1.0, active)
        # bad_masks[t+1] = 0 only for time-limit truncations (TimeStep.truncated)
        bad = 1.0 - step_ts.truncated[..., None].astype(self.dtype)
        h_a = unflat(h_a) * (1.0 - done_f[..., None])
        h_c = unflat(h_c) * (1.0 - done_f[..., None])

        out = dict(
            share_obs=share_obs,
            obs=carry.obs,
            node_obs=carry.node_obs,
            adj=carry.adj,
            agent_id=carry.agent_id,
            rnn_states=carry.rnn_actor,
            rnn_states_critic=carry.rnn_critic,
            actions=actions_bn.astype(self.dtype),
            action_log_probs=unflat(logp),
            value_preds=unflat(values),
            rewards=step_ts.reward[..., None],
            masks=carry.masks,
            active_masks=carry.active_masks,
            bad_masks=carry.bad_masks,
            available_actions=avail,
            info=step_ts.info,
        )
        new_carry = RolloutCarry(
            env_state=env_state,
            obs=step_ts.obs,
            node_obs=step_ts.node_obs,
            adj=step_ts.adj,
            agent_id=carry.agent_id,
            rnn_actor=h_a,
            rnn_critic=h_c,
            masks=masks,
            active_masks=active,
            bad_masks=bad,
            prev_done=dones,
            key=key,
        )
        return new_carry, out

    def collect(self, ts: TrainState, carry: RolloutCarry):
        """One episode window: scan T steps, close the (T+1) buffer, GAE."""
        T = self.episode_length
        B, N = self.n_rollout_threads, self.env_params.num_agents

        carry2, outs = jax.lax.scan(
            lambda c, x: self._rollout_step(ts, c, x), carry, None, length=T
        )

        def close(seq, last):
            return jnp.concatenate([seq, last[None]], axis=0)

        share_last = self._share(carry2.obs)
        avail_last = self._stop_avail(carry2.prev_done)
        buffer = RolloutBuffer(
            share_obs=close(outs["share_obs"], share_last),
            obs=close(outs["obs"], carry2.obs),
            node_obs=close(outs["node_obs"], carry2.node_obs),
            adj=close(outs["adj"], carry2.adj),
            agent_id=close(outs["agent_id"], carry2.agent_id),
            rnn_states=close(outs["rnn_states"], carry2.rnn_actor),
            rnn_states_critic=close(outs["rnn_states_critic"], carry2.rnn_critic),
            actions=outs["actions"],
            action_log_probs=outs["action_log_probs"],
            value_preds=close(outs["value_preds"], jnp.zeros((B, N, 1), self.dtype)),
            returns=jnp.zeros((T + 1, B, N, 1), self.dtype),
            rewards=outs["rewards"],
            masks=close(outs["masks"], carry2.masks),
            active_masks=close(outs["active_masks"], carry2.active_masks),
            available_actions=close(outs["available_actions"], avail_last),
            bad_masks=close(outs["bad_masks"], carry2.bad_masks),
        )

        # bootstrap value (compute, graph_mpe_runner.py:430-443)
        E = self.env_params.num_entities
        flat = lambda x: x.reshape((B * N,) + x.shape[2:])
        share_aid = jnp.broadcast_to(jnp.swapaxes(carry2.agent_id, 1, 2), (B, N, N))
        adj_rep = jnp.broadcast_to(carry2.adj[:, None], (B, N, E, E))
        next_values = self.policy.get_values(
            ts.params,
            flat(share_last),
            flat(carry2.node_obs),
            flat(adj_rep),
            flat(share_aid),
            flat(carry2.rnn_critic),
            flat(carry2.masks),
        ).reshape(B, N, 1)
        buffer = compute_returns(
            buffer, next_values, ts.vn, self.trainer.gamma, self.trainer.gae_lambda,
            use_gae=self.trainer.use_gae,
            use_proper_time_limits=self.trainer.use_proper_time_limits,
        )
        return carry2, buffer, outs["info"]

    # ------------------------------------------------------------- episode
    def train_episode(self, ts: TrainState, carry: RolloutCarry, key: Array):
        """collect + train; jit this whole function for the fused hot path."""
        carry, buffer, infos = self.collect(ts, carry)
        ts, train_info = self.trainer.train(ts, buffer, key)
        train_info = dict(train_info)
        train_info["average_episode_rewards"] = (
            jnp.mean(buffer.rewards) * self.episode_length
        )
        env_info = jax.tree.map(lambda x: jnp.mean(x[-1]), infos)
        return ts, carry, train_info, env_info

    # ------------------------------------------------------------- eval
    def eval_episode(self, ts: TrainState, key: Array, n_eval: int):
        """Deterministic in-training evaluation (reference ``GMPERunner.eval``,
        graph_mpe_runner.py:445-516): fresh envs, ``policy.act`` with
        deterministic=True, one episode window.

        Beyond the reference (which logs only eval_average_episode_rewards)
        this also reports the success rate — per-agent success =
        dist_to_goal < goal threshold, the definition the reference uses in
        its render-time stats (base_runner.py:499-505) — plus
        collision/conformance metrics.  Per-env metrics are latched at the
        step the env first finishes (all agents done, pre-auto-reset), the
        same state the host eval loop reads before breaking (cli/eval.py).
        """
        B, N = n_eval, self.env_params.num_agents
        E = self.env_params.num_entities
        A = self.policy.dims.num_actions
        rN, H = self.policy.cfg.recurrent_n, self.policy.cfg.hidden_size

        key, rkey = jax.random.split(key)
        keys = jax.random.split(rkey, B)
        state, ts0 = jax.vmap(partial(env_mod.reset, self.env_params, dtype=self.dtype))(keys)

        def info_zeros(x):
            return jnp.zeros_like(x)

        carry0 = dict(
            env_state=state,
            obs=ts0.obs, node_obs=ts0.node_obs, adj=ts0.adj, agent_id=ts0.agent_id,
            h=jnp.zeros((B, N, rN, H), self.dtype),
            masks=jnp.ones((B, N, 1), self.dtype),
            prev_done=jnp.zeros((B, N), bool),
            latched=jnp.zeros((B,), bool),
            reached=jnp.zeros((B, N), bool),
            ep_rew=jnp.zeros((B, N), self.dtype),
            info=None,  # filled below once shapes are known
        )

        flat = lambda x: x.reshape((B * N,) + x.shape[2:])
        unflat = lambda x: x.reshape((B, N) + x.shape[1:])

        def latch(already, now, acc):
            """Track the current info until the env latches, then freeze."""
            def upd(a, b):
                f = already.reshape((B,) + (1,) * (a.ndim - 1))
                return jnp.where(f, a, b)
            return jax.tree.map(upd, acc, now)

        def step_fn(c, t):
            avail = self._stop_avail(c["prev_done"])
            adj_rep = jnp.broadcast_to(c["adj"][:, None], (B, N, E, E))
            actions, h = self.policy.act(
                ts.params, jax.random.PRNGKey(0),
                flat(c["obs"]), flat(c["node_obs"]), flat(adj_rep),
                flat(c["agent_id"]), flat(c["h"]), flat(c["masks"]),
                flat(avail), deterministic=True,
            )
            env_state, st = jax.vmap(partial(env_mod.step, self.env_params, hj_data=self.hj_data))(
                c["env_state"], unflat(actions)[..., 0]
            )
            dones = st.done
            dones_env = jnp.all(dones, axis=1)
            done_f = dones[..., None].astype(self.dtype)
            acc = st.info if c["info"] is None else latch(c["latched"], st.info, c["info"])
            # gate success (cli/eval semantics, reference stats block
            # :830-903): an agent done BEFORE the time-limit step froze at a
            # gate/goal; only the env's first episode counts (pre-auto-reset)
            before_limit = t < self.env_params.episode_length - 1
            reached = c["reached"] | (dones & ~c["latched"][:, None] & before_limit)
            new = dict(
                env_state=env_state,
                obs=st.obs, node_obs=st.node_obs, adj=st.adj, agent_id=c["agent_id"],
                h=unflat(h) * (1.0 - done_f[..., None]),
                masks=1.0 - done_f,
                prev_done=dones,
                latched=c["latched"] | dones_env,
                reached=reached,
                ep_rew=c["ep_rew"] + st.reward,
                info=acc,
            )
            return new, None

        # one un-scanned step fixes the info-tree structure for the carry
        carry1, _ = step_fn(carry0, 0)
        carry2, _ = jax.lax.scan(step_fn, carry1,
                                 jnp.arange(1, self.env_params.episode_length))

        info = carry2["info"]
        thresh = jnp.asarray(self.env_params.cfg.goal_threshold, self.dtype)
        # strict float criterion (the reference's Dist_to_goal info value is
        # int-truncated upstream; see corridor._info_dict)
        success = (info["Dist_to_goal_precise"] < thresh).astype(self.dtype)  # (B, N)
        out = {
            "eval_average_episode_rewards": jnp.mean(carry2["ep_rew"]),
            "eval_success_rate": jnp.mean(success),
            "eval_all_success_rate": jnp.mean(jnp.all(success > 0.5, axis=1).astype(self.dtype)),
            "eval_num_agent_collisions": jnp.mean(info["Num_agent_collisions"]),
            "eval_conformance": jnp.mean(info["Conformance"]),
            "eval_time_mean": jnp.mean(info["Time_mean"]),
            "eval_dist_to_goal": jnp.mean(info["Dist_to_goal"]),
        }
        if "Phase_reached" in info:
            out["eval_phase_reached"] = jnp.mean(info["Phase_reached"])
        # freeze-before-limit criterion (cli/eval's `reached`): the right
        # success notion for gate-terminal scenarios (two_phase ends frozen
        # at the exit transition, so dist-to-goal stays ~O(1) on success)
        gate = carry2["reached"].astype(self.dtype)
        out["eval_gate_success_rate"] = jnp.mean(gate)
        out["eval_all_gate_success_rate"] = jnp.mean(
            jnp.all(gate > 0.5, axis=1).astype(self.dtype))
        return out
