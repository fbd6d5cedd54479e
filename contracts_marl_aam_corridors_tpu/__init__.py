"""contracts-marl-aam-corridors-tpu: a TPU-native MARL framework for AAM air-corridor control.

A from-scratch JAX/XLA re-design of the capabilities of the reference
`Jaroan/Contracts-MARL-AAM-Corridors` codebase (multi-agent PPO with graph
observations over air-taxi corridor-metering scenarios):

* the mutable object-soup environment (``multiagent/core.py``,
  ``multiagent/environment.py``, ``multiagent/custom_scenarios/*``) becomes a
  pure-functional, struct-of-arrays ``step(params, state, actions) -> (state,
  timestep)`` kernel that is ``jit``-compiled once and ``vmap``-ed over
  thousands of environments per chip;
* the per-env subprocess vectorization (``onpolicy/envs/env_wrappers.py``)
  becomes device-resident batching — no processes, no pickling, no pipes;
* the torch/PyG policy stack (``onpolicy/algorithms/*``) becomes Flax modules
  with dense masked graph attention sized for the MXU;
* multi-host scale-out uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives instead of any host-side IPC.

Subpackages
-----------
``config``    physics constants + training configuration (mirrors the
              reference's ``multiagent/config.py`` and ``onpolicy/config.py``)
``envs``      the vectorized environment suite (dynamics, tube geometry,
              scenarios, rewards, observations, graph building, safety filter)
``models``    Flax policy/critic networks (GNN + MLP + GRU + categorical head)
``algo``      MAPPO: GAE, PPO losses, on-device rollout buffer, train step
``parallel``  mesh construction and sharded rollout/training
``ops``       low-level batched ops (pairwise distances, top-k, pallas kernels)
``utils``     logging, checkpointing, timers
"""

__version__ = "0.1.0"
