"""Shared build-per-checkpoint helper for the eval comparison scripts.

Each side of a comparison (our orbax run vs the reference's torch weights)
may have been trained with different activation flags — use_ReLU /
embed_use_ReLU / gnn_use_ReLU change the network function without changing
any parameter shape, so a checkpoint restores cleanly into the wrong
architecture and evals as garbage (the round-3 flag split bit exactly this
way).  Each side therefore gets its OWN model built with the flags recorded
in its config.yaml (utils/checkpoint.py warm_start_arch_flags); builds are
cached by flag tuple so identical-architecture sides share one compile.
"""
import jax
import numpy as np

from contracts_marl_aam_corridors_tpu.cli.train import build
from contracts_marl_aam_corridors_tpu.config.flags import parse_all
from contracts_marl_aam_corridors_tpu.utils.checkpoint import warm_start_arch_flags


def build_for(base_argv, src_dir, n_eval, _cache={}):
    """(policy, fresh TrainState template, jitted eval_fn) for the model
    architecture recorded at ``src_dir`` (activation flags only; everything
    else comes from ``base_argv``)."""
    over = warm_start_arch_flags(src_dir)
    key = (tuple(base_argv), tuple(sorted(over.items())), n_eval)
    if key not in _cache:
        args = parse_all(list(base_argv))
        for k, v in over.items():
            if getattr(args, k) != v:
                print(f"[{src_dir}] adopting {k}={v} from its config.yaml")
            setattr(args, k, v)
        env_params, policy, trainer, runner = build(args)
        ts = trainer.init_state(jax.random.PRNGKey(1))
        eval_fn = jax.jit(lambda t, k: runner.eval_episode(t, k, n_eval))
        _cache[key] = (policy, ts, eval_fn)
    return _cache[key]


def run_side(name, ts, eval_fn, seeds=4):
    """Mean eval metrics over ``seeds`` deterministic batched evals
    (PRNGKey(100+s), the convention every comparison script shares).
    Prints one line and returns the {metric: mean} row."""
    agg = {}
    for s in range(seeds):
        out = {k: float(np.asarray(v))
               for k, v in eval_fn(ts, jax.random.PRNGKey(100 + s)).items()}
        for k, v in out.items():
            agg.setdefault(k, []).append(v)
    row = {k.replace("eval_", ""): round(float(np.mean(v)), 4)
           for k, v in agg.items()}
    print(f"[{name}] " + " ".join(f"{k}={v:.4f}" for k, v in row.items()),
          flush=True)
    return row
