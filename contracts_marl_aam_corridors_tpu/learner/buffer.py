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

    @property
    def episode_length(self) -> int:
        return self.rewards.shape[0]


def compute_returns(
    buffer: RolloutBuffer,
    next_value: Array,
    vn_state: Optional[ValueNormState],
    gamma: float = 0.99,
    gae_lambda: float = 0.95,
    use_proper_time_limits: bool = False,
) -> RolloutBuffer:
    """GAE over the rollout (graph_buffer.py:285-366, use_gae branch).

    ``value_preds[-1]`` is overwritten with the bootstrap ``next_value``
    exactly as the reference does (:340).  With a value normalizer the deltas
    denormalize predictions inside the recursion (:344-352).
    """
    value_preds = buffer.value_preds.at[-1].set(next_value)

    if vn_state is not None:
        v = vn_denormalize(vn_state, value_preds).astype(buffer.rewards.dtype)
    else:
        v = value_preds

    def body(gae, xs):
        reward, v_t, v_tp1, mask_tp1, bad_tp1 = xs
        delta = reward + gamma * v_tp1 * mask_tp1 - v_t
        gae = delta + gamma * gae_lambda * mask_tp1 * gae
        if use_proper_time_limits:
            gae = gae * bad_tp1
        return gae, gae + v_t

    T = buffer.rewards.shape[0]
    # bad_masks not tracked separately (reference never sets them off the
    # default ones in this pipeline); pass masks as placeholder.
    xs = (buffer.rewards, v[:-1], v[1:], buffer.masks[1:], buffer.masks[1:])
    init = jnp.zeros_like(buffer.rewards[0])
    _, returns_rev = jax.lax.scan(body, init, xs, reverse=True)
    returns = jnp.concatenate([returns_rev, buffer.returns[-1:]], axis=0)
    return buffer.replace(value_preds=value_preds, returns=returns)
