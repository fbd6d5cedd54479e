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


# ---------------------------------------------------------------------------
# MultiDiscrete: K independent categorical heads over concatenated logits
# (reference ACTLayer multi_discrete branch, onpolicy/algorithms/utils/
# act.py:44-51, 93-105, 185-203 — actions and log-probs are CONCATENATED per
# head, (..., K), never summed; the PPO surrogate later sums over the last
# axis, graph_mappo.py:188).  ``nvec`` is static so the slices compile away.
# ---------------------------------------------------------------------------


def _md_slices(nvec):
    out, off = [], 0
    for n in nvec:
        out.append((off, n))
        off += n
    return out


def md_sample(key: Array, logits: Array, nvec) -> Array:
    keys = jax.random.split(key, len(nvec))
    acts = [
        jax.random.categorical(keys[i], logits[..., o : o + n], axis=-1)
        for i, (o, n) in enumerate(_md_slices(nvec))
    ]
    return jnp.stack(acts, axis=-1).astype(jnp.int32)


def md_mode(logits: Array, nvec) -> Array:
    acts = [
        jnp.argmax(logits[..., o : o + n], axis=-1) for o, n in _md_slices(nvec)
    ]
    return jnp.stack(acts, axis=-1).astype(jnp.int32)


def md_log_probs(logits: Array, actions: Array, nvec) -> Array:
    """actions (..., K) ints -> per-head log probs (..., K)."""
    out = []
    for i, (o, n) in enumerate(_md_slices(nvec)):
        lp = jax.nn.log_softmax(logits[..., o : o + n], axis=-1)
        a = actions[..., i].astype(jnp.int32)
        out.append(jnp.take_along_axis(lp, a[..., None], axis=-1)[..., 0])
    return jnp.stack(out, axis=-1)


def md_entropy(logits: Array, nvec) -> Array:
    """Per-head entropies (..., K).  NOTE: the reference detaches these
    (``torch.tensor(dist_entropy)``, act.py:202) so its multidiscrete entropy
    bonus carries NO gradient — an upstream bug we deliberately do not
    replicate; here the entropy term regularizes normally."""
    return jnp.stack(
        [entropy(logits[..., o : o + n]) for o, n in _md_slices(nvec)], axis=-1
    )
