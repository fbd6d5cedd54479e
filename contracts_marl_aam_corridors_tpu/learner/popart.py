"""PopArt value normalization (reference ``onpolicy/algorithms/utils/
popart.py:7-111``): preserve outputs precisely while adaptively rescaling
targets — the critic's output layer is rescaled whenever the target
statistics update, so its (normalized-space) outputs keep denormalizing to
the same returns.

UPSTREAM BUG, not replicated: the reference's ``update`` wraps the rescaled
weight/bias in NEW ``nn.Parameter`` objects (popart.py:63-65), orphaning the
tensors registered with the critic optimizer — after the first update the
optimizer silently stops training ``v_out``.  Here the rescaling composes
with the optimizer step as PopArt intends.

Stats follow the reference exactly: EMA mean/mean_sq with beta=0.99999,
rescale stddev = sqrt(mean_sq - mean^2) clamped at 1e-4 (NON-debiased,
popart.py:62), while normalize/denormalize use the debiased mean/var clamped
at 1e-2 (popart.py:67-83).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array


@struct.dataclass
class PopArtState:
    mean: Array  # (1,)
    mean_sq: Array  # (1,)
    stddev: Array  # (1,)
    debiasing_term: Array  # ()
    beta: float = struct.field(pytree_node=False, default=0.99999)
    epsilon: float = struct.field(pytree_node=False, default=1e-5)


def popart_init(dtype=jnp.float32) -> PopArtState:
    return PopArtState(
        mean=jnp.zeros((1,), dtype),
        mean_sq=jnp.zeros((1,), dtype),
        stddev=jnp.ones((1,), dtype),
        debiasing_term=jnp.zeros((), dtype),
    )


def popart_update(state: PopArtState, x: Array):
    """Returns (new_state, scale, shift) where the critic's output layer must
    be rescaled as  w' = w*scale, b' = (old_std*b + old_mean - new_mean)/new_std
    (popart.py:52-65)."""
    x2 = x.reshape(-1, x.shape[-1])
    bm = x2.mean(axis=0)
    bsq = (x2**2).mean(axis=0)
    w = state.beta
    new_mean = state.mean * w + bm * (1 - w)
    new_mean_sq = state.mean_sq * w + bsq * (1 - w)
    new_std = jnp.clip(jnp.sqrt(new_mean_sq - new_mean**2), min=1e-4)
    new_state = state.replace(
        mean=new_mean,
        mean_sq=new_mean_sq,
        stddev=new_std,
        debiasing_term=state.debiasing_term * w + (1 - w),
    )
    scale = state.stddev / new_std
    return new_state, scale, (state.stddev, state.mean, new_mean, new_std)


def rescale_v_out(v_out_params: dict, scale: Array, shift_terms) -> dict:
    old_std, old_mean, new_mean, new_std = shift_terms
    return {
        "kernel": v_out_params["kernel"] * scale,
        "bias": (old_std * v_out_params["bias"] + old_mean - new_mean) / new_std,
    }


def _debiased(state: PopArtState):
    d = jnp.clip(state.debiasing_term, min=state.epsilon)
    mean = state.mean / d
    mean_sq = state.mean_sq / d
    var = jnp.clip(mean_sq - mean**2, min=1e-2)
    return mean, var


def popart_normalize(state: PopArtState, x: Array) -> Array:
    mean, var = _debiased(state)
    return (x - mean) / jnp.sqrt(var)


def popart_denormalize(state: PopArtState, x: Array) -> Array:
    mean, var = _debiased(state)
    return x * jnp.sqrt(var) + mean
