"""Multi-chip scale-out: env batch sharded over a device mesh, learner
replicated, gradients summed by XLA collectives.

TPU-native replacement for the reference's entire "distributed" story —
``GraphSubprocVecEnv``'s one-OS-process-per-env pipes
(onpolicy/envs/env_wrappers.py:851-1036) and its single-process learner.
Here the env batch is a stacked pytree sharded on the ``data`` mesh axis; the
policy/optimizer state is replicated; the whole ``train_episode`` (rollout
scan + PPO update) is ONE jit whose loss reductions cross the sharded batch
axis, so XLA inserts the all-reduces (psum over ICI) itself — the
jax.sharding equivalent of gradient all-reduce, with zero hand-written
communication.  Multi-host extension: same code after
``jax.distributed.initialize`` (each host contributes its local devices to
the same mesh; data stays host-local, collectives ride ICI/DCN).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..learner.mappo import TrainState
from ..learner.runner import RolloutCarry, Runner


def make_mesh(devices: Optional[Sequence[jax.Device]] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_shardings(tree: Any, batch: int, mesh: Mesh, axis: str = "data") -> Any:
    """Per-leaf shardings: P(axis) on leaves carrying the env-batch leading
    axis, replicated otherwise (e.g. the scalar PRNG key in the carry)."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    def pick(x):
        # zero-size leaves (e.g. empty obstacle arrays) keep P(): jax
        # normalizes their sharding away, which would trip jit's arg check
        if getattr(x, "size", 0) == 0:
            return rep
        return shard if (getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch) else rep

    return jax.tree.map(pick, tree)


def shard_batch(tree: Any, batch: int, mesh: Mesh, axis: str = "data") -> Any:
    """Place a pytree with leading env-batch axis sharded across the mesh."""
    shardings = batch_shardings(tree, batch, mesh, axis)
    return jax.tree.map(jax.device_put, tree, shardings)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


class DistributedRunner:
    """Wraps :class:`Runner` with mesh placement for params and env batch.

    The env batch must be divisible by the mesh size.  ``train_episode`` is
    jitted with explicit out-shardings so the carry stays sharded and the
    train state stays replicated across episodes (no resharding traffic).
    """

    def __init__(self, runner: Runner, mesh: Mesh, axis: str = "data"):
        if runner.n_rollout_threads % mesh.size != 0:
            raise ValueError(
                f"n_rollout_threads={runner.n_rollout_threads} not divisible by "
                f"mesh size {mesh.size}"
            )
        self.runner = runner
        self.mesh = mesh
        self.axis = axis
        self._rep = NamedSharding(mesh, P())
        self._step = None  # built lazily: carry shardings are leaf-dependent

    def init(self, ts: TrainState, carry: RolloutCarry):
        B = self.runner.n_rollout_threads
        carry_sh = batch_shardings(carry, B, self.mesh, self.axis)
        ts_sh = jax.tree.map(lambda _: self._rep, ts)
        self._step = jax.jit(
            self.runner.train_episode,
            in_shardings=(ts_sh, carry_sh, self._rep),
        )
        return replicate(ts, self.mesh), shard_batch(carry, B, self.mesh, self.axis)

    def train_episode(self, ts: TrainState, carry: RolloutCarry, key):
        return self._step(ts, carry, key)
