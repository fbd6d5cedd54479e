"""Formation-geometry utilities.

Batched JAX counterpart of the reference's standalone circumcenter-reward
prototype (``check_circumcenter.py``:1-147): the circumcenter of each agent's
triangle (self + two neighbors) and a reward of negative distance from a
target formation center, with the -100 degenerate-case penalty.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

DEGENERATE_PENALTY = -100.0


def circumcenter(p1: Array, p2: Array, p3: Array):
    """Circumcenter of (... , 2) point triples.  Returns (center, valid):
    ``valid`` is False where the triangle is degenerate (|D| < 1e-6)."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    x3, y3 = p3[..., 0], p3[..., 1]
    d = 2 * (x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2))
    valid = jnp.abs(d) >= 1e-6
    d_safe = jnp.where(valid, d, 1.0)
    s1 = x1**2 + y1**2
    s2 = x2**2 + y2**2
    s3 = x3**2 + y3**2
    xc = (s1 * (y2 - y3) + s2 * (y3 - y1) + s3 * (y1 - y2)) / d_safe
    yc = (s1 * (x3 - x2) + s2 * (x1 - x3) + s3 * (x2 - x1)) / d_safe
    return jnp.stack([xc, yc], axis=-1), valid


def circumcenter_reward(center: Array, valid: Array, target: Array) -> Array:
    """-||circumcenter - target||, or the -100 degenerate penalty."""
    dist = jnp.linalg.norm(center - target, axis=-1)
    return jnp.where(valid, -dist, DEGENERATE_PENALTY)
