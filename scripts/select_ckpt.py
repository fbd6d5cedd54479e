"""Checkpoint selection: batched deterministic eval of a list of saved
``ckpt_<N>`` dirs from one training run, all sharing a single compiled model
(``_eval_common.build_for`` caches by activation-flag tuple).

In-training evals are small (32-64 episodes) and noisy; this re-evaluates
candidate checkpoints at a larger episode count so the checked-in "dedicated
capability" checkpoint is picked on a low-variance estimate.  Mirrors the
reference's practice of picking its shipped ``model_weights`` from periodic
saves (onpolicy/runner/shared/graph_mpe_runner.py save()/eval cadence).

Usage:
  python scripts/select_ckpt.py RUN_MODELS_DIR N_EVAL CKPT[,CKPT...] -- RECIPE_ARGV...

Runs on the CPU backend by default (SELECT_PLATFORM=tpu to override): the
JAX_PLATFORMS env var is not honored on this image — the axon plugin
prepends itself and hangs at backend init when the relay is down.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", os.environ.get("SELECT_PLATFORM", "cpu"))
import numpy as np


def main(models_dir, n_eval, ckpts, recipe, seeds=(100, 101)):
    from contracts_marl_aam_corridors_tpu.utils.checkpoint import restore_checkpoint
    from _eval_common import build_for

    rows = []
    for ck in ckpts:
        d = os.path.join(models_dir, f"ckpt_{ck}")
        pol, ts, eval_fn = build_for(recipe, d, n_eval)
        t, ep = restore_checkpoint(d, ts)
        agg = {}
        for s in seeds:
            out = {k: float(np.asarray(v))
                   for k, v in eval_fn(t, jax.random.PRNGKey(s)).items()}
            for k, v in out.items():
                agg.setdefault(k, []).append(v)
        row = {k.replace("eval_", ""): round(float(np.mean(v)), 4)
               for k, v in agg.items()}
        rows.append((ck, row))
        print(f"ckpt_{ck} {row}", flush=True)
    key = ("success_rate" if "success_rate" in rows[0][1]
           else "gate_success_rate")
    allk = "all_" + key if "all_" + key in rows[0][1] else key
    best = max(rows, key=lambda r: (r[1][key], r[1][allk],
                                    -r[1].get("num_agent_collisions", 0.0)))
    print(f"BEST ckpt_{best[0]} {best[1]}")
    return best


if __name__ == "__main__":
    i = sys.argv.index("--")
    main(sys.argv[1], int(sys.argv[2]),
         [int(c) for c in sys.argv[3].split(",")], sys.argv[i + 1:])
