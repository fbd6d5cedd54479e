"""Batched pairwise-distance ops.

Replaces the reference's O(E^2) Python double loop ``World.calculate_distances``
(multiagent/core.py:600-624) with one vectorized computation.  Entity counts
here are tiny (<=~25), so a dense (E, E) matrix per env is the right shape for
the TPU — thousands of envs batch into one (B, E, E) VPU pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def pairwise_vectors(pos: Array) -> Array:
    """(..., E, 2) positions -> (..., E, E, 2) deltas pos_i - pos_j."""
    return pos[..., :, None, :] - pos[..., None, :, :]


def pairwise_distances(pos: Array) -> Array:
    """(..., E, 2) positions -> (..., E, E) Euclidean distances (0 diagonal)."""
    return jnp.linalg.norm(pairwise_vectors(pos), axis=-1)


def two_nearest_neighbors(agent_pos: Array) -> Array:
    """Relative positions of each agent's two nearest other agents.

    Mirrors the neighbor block of the 19-dim observation (july:1398-1417):
    sort others by distance ascending, take two, pad with zeros when fewer
    than two others exist.  Returns (..., N, 4).
    """
    n = agent_pos.shape[-2]
    rel = -pairwise_vectors(agent_pos)  # rel[i, j] = pos_j - pos_i
    dist = jnp.linalg.norm(rel, axis=-1)
    big = jnp.asarray(jnp.inf, dist.dtype)
    eye = jnp.eye(n, dtype=bool)
    dist = jnp.where(eye, big, dist)
    order = jnp.argsort(dist, axis=-1)  # stable; self sorts last
    first = jnp.take_along_axis(rel, order[..., 0:1, None], axis=-2)[..., 0, :]
    if n >= 3:
        second = jnp.take_along_axis(rel, order[..., 1:2, None], axis=-2)[..., 0, :]
    else:
        second = jnp.zeros_like(first)
    return jnp.concatenate([first, second], axis=-1)
