"""Evaluate a reference torch checkpoint in-framework on the CPU backend.

Wrapper around ``cli.eval`` that pins the CPU platform BEFORE any jax
computation (the JAX_PLATFORMS env var is not honored on this image — the
axon TPU plugin prepends itself, and with the relay down the default backend
init hangs forever).  Used for the old_FA_FR sequential-family oracles and
the tube/rotate july-unicycle checkpoint (VERDICT r2 items 4-5), whose
evals are small enough for CPU.

    python scripts/eval_reference_checkpoint.py \
        --model_dir /root/reference/model_weights/old_FA_FR/tube/feb18/seq \
        --render_episodes 32 [ ... cli.eval flags ... ]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    from contracts_marl_aam_corridors_tpu.cli.eval import main as eval_main

    eval_main(sys.argv[1:])


if __name__ == "__main__":
    main()
