"""Masked categorical action distribution.

Mirrors the reference's ``Categorical``/``FixedCategorical``
(onpolicy/algorithms/utils/distributions.py:14-28, 55-89): unavailable
actions get their logit forced to the dtype minimum (a large *finite*
negative, so entropy's p*log p terms stay exactly zero instead of NaN).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mask_logits(logits: Array, available_actions: Array | None) -> Array:
    if available_actions is None:
        return logits
    neg = jnp.finfo(logits.dtype).min
    return jnp.where(available_actions == 0, neg, logits)


def log_probs(logits: Array, actions: Array) -> Array:
    """Log prob of integer actions; actions (..., 1) -> (..., 1)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    act = actions.astype(jnp.int32).squeeze(-1)
    return jnp.take_along_axis(logp, act[..., None], axis=-1)


def entropy(logits: Array) -> Array:
    """Categorical entropy, (...,) shaped. Matches torch: -sum(p * logp) with
    p==0 terms contributing 0 (finite logits guarantee no NaN)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    return -jnp.sum(p * logp, axis=-1)


def mode(logits: Array) -> Array:
    return jnp.argmax(logits, axis=-1, keepdims=True).astype(jnp.int32)


def sample(key: Array, logits: Array) -> Array:
    return jax.random.categorical(key, logits, axis=-1)[..., None].astype(jnp.int32)
