"""Running value normalizer (reference ``onpolicy/utils/valuenorm.py:12-99``)
and the PopArt variant (``onpolicy/algorithms/utils/popart.py``), as pure
functions over an explicit state pytree so they live inside jitted train steps.

Semantics (valuenorm.py):
    update(x):   ema of mean / mean-square with beta=0.99999, plus a debiasing
                 term (`debiasing_term`), all over flattened batch axes
    var = clamp(E[x^2] - E[x]^2, min=1e-2);  mean debiased by clamp(eps=1e-5)
    normalize(x) = (x - mean)/sqrt(var);  denormalize inverse
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class ValueNormState:
    running_mean: Array  # (1,)
    running_mean_sq: Array  # (1,)
    debiasing_term: Array  # ()
    beta: float = struct.field(pytree_node=False, default=0.99999)
    epsilon: float = struct.field(pytree_node=False, default=1e-5)


def vn_init(dtype=jnp.float32) -> ValueNormState:
    return ValueNormState(
        running_mean=jnp.zeros((1,), dtype),
        running_mean_sq=jnp.zeros((1,), dtype),
        debiasing_term=jnp.zeros((), dtype),
    )


def _stats(state: ValueNormState):
    d = jnp.clip(state.debiasing_term, min=state.epsilon)
    mean = state.running_mean / d
    mean_sq = state.running_mean_sq / d
    var = jnp.clip(mean_sq - mean**2, min=1e-2)
    return mean, var


def vn_update(state: ValueNormState, x: Array) -> ValueNormState:
    # norm_axes=1: stats over the first axis only (valuenorm.py:60-61); the
    # reference always passes 2-D (batch, 1) tensors.
    x2 = x.reshape(-1, x.shape[-1])
    batch_mean = x2.mean(axis=0)
    batch_sq = (x2**2).mean(axis=0)
    w = state.beta
    return state.replace(
        running_mean=state.running_mean * w + batch_mean * (1 - w),
        running_mean_sq=state.running_mean_sq * w + batch_sq * (1 - w),
        debiasing_term=state.debiasing_term * w + (1 - w),
    )


def vn_normalize(state, x: Array) -> Array:
    if not isinstance(state, ValueNormState):  # PopArtState
        from .popart import popart_normalize

        return popart_normalize(state, x)
    mean, var = _stats(state)
    return (x - mean) / jnp.sqrt(var)


def vn_denormalize(state, x: Array) -> Array:
    if not isinstance(state, ValueNormState):  # PopArtState
        from .popart import popart_denormalize

        return popart_denormalize(state, x)
    mean, var = _stats(state)
    return x * jnp.sqrt(var) + mean
