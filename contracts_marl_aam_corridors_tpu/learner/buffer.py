"""On-device rollout storage + GAE (reference ``GraphReplayBuffer``,
onpolicy/utils/graph_buffer.py:19-366).

The reference keeps (T+1, threads, agents, ...) numpy ring arrays filled by
``insert`` each step.  Here the whole rollout is produced in one ``lax.scan``
(see runner), so the buffer is just an immutable pytree of stacked arrays with
the same layout.  ``adj`` is stored once per ENV (the reference stores an
identical copy per agent, environment.py:1040-1046 — pure redundancy we skip;
it is broadcast back at train time).

Mask semantics (graph_mpe_runner.py:384-428):
    masks[t+1]        0 where agent done at t (rnn reset signal)
    active_masks[t+1] 0 where agent done, EXCEPT all-done envs reset to 1
                      (a fresh auto-reset episode started)
    rnn_states[t+1]   zeroed where done
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .valuenorm import ValueNormState, vn_denormalize

Array = jax.Array


@struct.dataclass
class RolloutBuffer:
    """Shapes: T = episode_length, B = n envs, N = agents, E = entities."""

    share_obs: Array  # (T+1, B, N, N*obs)
    obs: Array  # (T+1, B, N, obs)
    node_obs: Array  # (T+1, B, N, E, F)
    adj: Array  # (T+1, B, E, E)
    agent_id: Array  # (T+1, B, N, 1) int32
    rnn_states: Array  # (T+1, B, N, rN, H)
    rnn_states_critic: Array  # (T+1, B, N, rN, H)
    actions: Array  # (T, B, N, 1)
    action_log_probs: Array  # (T, B, N, 1)
    value_preds: Array  # (T+1, B, N, 1)
    returns: Array  # (T+1, B, N, 1)
    rewards: Array  # (T, B, N, 1)
    masks: Array  # (T+1, B, N, 1)
    active_masks: Array  # (T+1, B, N, 1)
    available_actions: Array  # (T+1, B, N, A)
    # bad_masks[t+1] = 0 where the done at step t was a TIME-LIMIT truncation
    # (graph_buffer.py:162,242-243; the reference's graph runner never passes
    # them so they stay 1.0 there — here the env reports truncation directly,
    # see TimeStep.truncated).  None == all-ones == reference behavior.
    bad_masks: Optional[Array] = None  # (T+1, B, N, 1)

    @property
    def episode_length(self) -> int:
        return self.rewards.shape[0]


def compute_returns(
    buffer: RolloutBuffer,
    next_value: Array,
    vn_state: Optional[ValueNormState],
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    use_gae: bool = True,
    use_proper_time_limits: bool = False,
) -> RolloutBuffer:
    """Returns over the rollout — all four reference branches
    (graph_buffer.py:285-366: {use_proper_time_limits} x {use_gae}).

    ``value_preds[-1]`` is overwritten with the bootstrap ``next_value``
    exactly as the reference does (:340).  With a value normalizer the deltas
    denormalize predictions inside the recursion (:344-352).  With proper
    time limits, ``bad_masks[t+1] = 0`` (time-limit truncation at step t)
    zeroes the accumulated GAE at the boundary (:312) so the truncated step's
    return collapses to its value estimate; in the non-GAE branch the return
    restarts from the value estimate (:326-331).
    """
    value_preds = buffer.value_preds.at[-1].set(next_value)

    if vn_state is not None:
        v = vn_denormalize(vn_state, value_preds).astype(buffer.rewards.dtype)
    else:
        v = value_preds

    bad = buffer.bad_masks
    if bad is None:
        bad = jnp.ones_like(buffer.masks)

    if use_gae:
        def body(gae, xs):
            reward, v_t, v_tp1, mask_tp1, bad_tp1 = xs
            delta = reward + gamma * v_tp1 * mask_tp1 - v_t
            gae = delta + gamma * gae_lambda * mask_tp1 * gae
            if use_proper_time_limits:
                gae = gae * bad_tp1
            return gae, gae + v_t

        xs = (buffer.rewards, v[:-1], v[1:], buffer.masks[1:], bad[1:])
        init = jnp.zeros_like(buffer.rewards[0])
        _, returns_rev = jax.lax.scan(body, init, xs, reverse=True)
        returns = jnp.concatenate([returns_rev, buffer.returns[-1:]], axis=0)
        return buffer.replace(value_preds=value_preds, returns=returns)

    # discounted-return branch (:326-331, :361-366).  NB the reference seeds
    # returns[-1] with the RAW bootstrap value (not denormalized) — preserved.
    def body_ret(ret_tp1, xs):
        reward, v_t, mask_tp1, bad_tp1 = xs
        ret = ret_tp1 * gamma * mask_tp1 + reward
        if use_proper_time_limits:
            ret = ret * bad_tp1 + (1.0 - bad_tp1) * v_t
        return ret, ret

    xs = (buffer.rewards, v[:-1], buffer.masks[1:], bad[1:])
    _, returns_rev = jax.lax.scan(body_ret, next_value, xs, reverse=True)
    returns = jnp.concatenate([returns_rev, next_value[None]], axis=0)
    return buffer.replace(value_preds=value_preds, returns=returns)
