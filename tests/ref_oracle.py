"""Load the reference implementation (/root/reference) as a test oracle.

The reference imports ``gym`` (removed upstream; we shim it from gymnasium),
``pyglet`` (absent; stubbed — only needed for rendering) and, via
``multiagent.custom_scenarios.__init__``, the removed ``imp`` module (stubbed
with an importlib-based ``load_source``).  Nothing in /root/reference is
modified; all shims live in this process's ``sys.modules``.
"""
from __future__ import annotations

import argparse
import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def _install_shims():
    if "gym" not in sys.modules:
        import gymnasium

        gym = types.ModuleType("gym")
        gym.__path__ = []  # mark as package so gym.envs submodule imports resolve
        gym.Env = gymnasium.Env
        gym.spaces = gymnasium.spaces
        gym.Space = gymnasium.Space
        sys.modules["gym"] = gym
        sys.modules["gym.spaces"] = gymnasium.spaces
        envs = types.ModuleType("gym.envs")
        envs.__path__ = []
        registration = types.ModuleType("gym.envs.registration")
        registration.register = lambda *a, **k: None
        registration.EnvSpec = getattr(
            gymnasium.envs.registration, "EnvSpec", object
        )
        envs.registration = registration
        gym.envs = envs
        sys.modules["gym.envs"] = envs
        sys.modules["gym.envs.registration"] = registration
    if "pyglet" not in sys.modules:
        pyglet = types.ModuleType("pyglet")
        pyglet.image = types.SimpleNamespace()
        sys.modules["pyglet"] = pyglet
    # safety_filter.py imports HJ-reachability / cvxpy / casadi packages that
    # aren't installed (and whose data pickles aren't in the repo); the
    # scenarios under test never activate the safety filter, so stubs suffice.
    if "hj_reachability" not in sys.modules:
        sys.modules["hj_reachability"] = types.ModuleType("hj_reachability")
    if "hj_reachability_utils" not in sys.modules:
        utils_pkg = types.ModuleType("hj_reachability_utils")
        utils_pkg.__path__ = []
        common = types.ModuleType("hj_reachability_utils.common")

        class _StubDynamics:
            def __init__(self, *args, **kwargs):
                pass

        common.ControlAndDisturbanceAffineDynamics = _StubDynamics
        common.get_hj_grid_from_meta_data = lambda *a, **k: None
        utils_pkg.common = common
        sys.modules["hj_reachability_utils"] = utils_pkg
        sys.modules["hj_reachability_utils.common"] = common
    if "cvxpy" not in sys.modules:
        sys.modules["cvxpy"] = types.ModuleType("cvxpy")
    if "casadi" not in sys.modules:
        casadi = types.ModuleType("casadi")
        casadi.__all__ = []
        sys.modules["casadi"] = casadi
    if "imp" not in sys.modules:
        imp = types.ModuleType("imp")

        def load_source(name, path):
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            return mod

        imp.load_source = load_source
        sys.modules["imp"] = imp


def make_args(
    num_agents=3,
    num_landmarks=3,
    num_obstacles=0,
    episode_length=50,
    world_size=2.0,
    dynamics_type="air_taxi",
    total_actions=25,
    collision_rew=5.0,
    goal_rew=50.0,
    formation_rew=1.0,
    formation_type="point",
    use_dones=False,
):
    return argparse.Namespace(
        num_agents=num_agents,
        num_landmarks=num_landmarks,
        num_obstacles=num_obstacles,
        num_scripted_agents=0,
        num_walls=0,
        episode_length=episode_length,
        world_size=world_size,
        dynamics_type=dynamics_type,
        total_actions=total_actions,
        collision_rew=collision_rew,
        goal_rew=goal_rew,
        formation_rew=formation_rew,
        formation_type=formation_type,
        use_dones=use_dones,
        collaborative=False,
        max_speed=2.0,
        fair_wt=1,
        fair_rew=1,
        zeroshift=5,
        graph_feat_type="relative",
        num_env_steps=10000,
        n_rollout_threads=2,
        render_episodes=None,
        use_safety_filter=False,
        safety_filter_type="none",
        safety_value_fn=None,
    )


def make_ref_env(args, scenario="nav_metered_one_goal_graph_rotate_tube_july"):
    """Build the reference MultiAgentGraphEnv for the given scenario.

    Seeding: callers must seed ``np.random`` *before* calling (world
    construction consumes the global stream).
    """
    _install_shims()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    # The reference defines COORDINATION_RANGE only for AirTaxiConfig; the
    # unicycle/DI paths crash without it (SURVEY.md §2.1 "latent config
    # gaps").  Patch the class attribute (in-process only) to the same value
    # our VehicleConfig adopts (the documented COMMUNICATION_RANGE).
    ref_config = importlib.import_module("multiagent.config")
    for cls in (ref_config.DoubleIntegratorConfig, ref_config.UnicycleVehicleConfig):
        if not hasattr(cls, "COORDINATION_RANGE"):
            cls.COORDINATION_RANGE = cls.COMMUNICATION_RANGE

    scenario_mod = importlib.import_module(f"multiagent.custom_scenarios.{scenario}")
    env_mod = importlib.import_module("multiagent.environment")

    sc = scenario_mod.Scenario()
    world = sc.make_world(args)
    if not hasattr(world, "world_aspect_ratio"):
        # v4oct never sets world.world_aspect_ratio (commented out,
        # v4oct:329) so MultiAgentGraphEnv's constructor crashes upstream
        # (environment.py:37).  Shim july's default aspect ratio (1.0,
        # july get_aspect_ratio_for_scenario) to execute the rest.
        world.world_aspect_ratio = 1.0
    if not hasattr(world, "with_background"):
        world.with_background = False  # same gap (july:331-334 vs v4oct)
    if "v4oct" in scenario:
        # v4oct lazily creates agent.previous_phase only in the pre-tube
        # branch (v4oct:645-647); an agent whose FIRST phase query finds it
        # already inside the tube crashes upstream (AttributeError at
        # v4oct:651).  Pre-seed the attribute with the same value the lazy
        # init would use; prev stays 0 forever in v4oct (dead reward code),
        # so this is behavior-neutral.
        for a in world.agents:
            if not hasattr(a, "previous_phase"):
                a.previous_phase = 0
    env = env_mod.MultiAgentGraphEnv(
        world=world,
        reset_callback=sc.reset_world,
        reward_callback=sc.reward,
        observation_callback=sc.observation,
        graph_observation_callback=sc.graph_observation,
        info_callback=sc.info_callback,
        done_callback=sc.done,
        id_callback=sc.get_id,
        update_graph=sc.update_graph,
        shared_viewer=False,
        dynamics_type=args.dynamics_type,
        scenario_name=scenario,
    )
    return env, sc, world


def one_hot_actions(action_idx: np.ndarray, num_actions: int):
    """Reference env consumes per-agent one-hot action vectors."""
    return [np.eye(num_actions)[a] for a in action_idx]


class FixedUniform:
    """Monkeypatch target for np.random.uniform during stepping.

    The only step-path consumer of the global RNG is
    ``reset_velocity`` on goal reach (core.py:324-333), which draws a scalar
    U(0, 2pi) heading.  Pin it so trajectories are deterministic and
    matchable against the JAX env's ``parity_fixed_reset_theta``.
    """

    def __init__(self, value: float, original):
        self.value = value
        self.original = original
        self.calls = 0

    def __call__(self, low=0.0, high=1.0, size=None):
        if size is None:
            self.calls += 1
            return self.value
        return self.original(low, high, size)
