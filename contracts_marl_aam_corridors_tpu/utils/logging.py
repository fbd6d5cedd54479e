"""Metrics logging.

The reference logs through wandb (default) or tensorboardX
(onpolicy/runner/shared/base_runner.py:292-302, utils/logger.py).  Neither is
in this image, so the primary sink is a JSONL file + stdout, with wandb /
tensorboardX used opportunistically when importable.  Metric names keep the
reference's ``agent{i}/<metric>`` convention (base_runner.process_infos:194-290)
so curves are directly comparable.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False, config: Optional[dict] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self.t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(dir=run_dir, config=config or {})
            except Exception:
                self._wandb = None
        self._tb = None
        if self._wandb is None:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(run_dir, "logs"))
            except Exception:
                self._tb = None

    def log(self, metrics: dict, step: int):
        rec = {"step": int(step), "wall_s": round(time.time() - self.t0, 3)}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                continue
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if k != "step"}, step=step)
        elif self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "wall_s"):
                    self._tb.add_scalars(k, {k: v}, step)

    def close(self):
        self.f.close()
        if self._tb is not None:
            self._tb.close()


def agent_env_infos(env_info: dict, num_agents: int) -> dict:
    """Flatten per-agent metric arrays into ``agent{i}/<metric>`` keys
    (process_infos, base_runner.py:194-290)."""
    import numpy as np

    out = {}
    for k, v in env_info.items():
        arr = np.asarray(v)
        if arr.ndim == 0:
            out[k] = float(arr)
        else:
            for i in range(min(num_agents, arr.shape[-1])):
                out[f"agent{i}/{k.lower()}"] = float(arr.reshape(-1)[i])
    return out


def print_box(msg: str, width: int = 72):
    line = "-" * width
    print(f"+{line}+\n|{msg:^{width}}|\n+{line}+", flush=True)
