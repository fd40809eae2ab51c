"""Metric logging with wandb-or-JSONL sinks.

The reference's observability stack is wandb (train_multitask.py:627-645,
:469-470,:527-549). Here wandb is optional: when unavailable (or
--wandb not set) metrics append to metrics.jsonl so runs are always
inspectable.
"""

from __future__ import annotations

import json
import time
from typing import Dict, Optional


class MetricLogger:
    def __init__(self, use_wandb: bool = False, config: Optional[Dict] = None,
                 project: str = "nanovs-slam-tpu",
                 jsonl_path: str = "metrics.jsonl"):
        self.jsonl_path = jsonl_path
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(project=project, config=config or {})
                self.wandb = wandb
            except Exception as e:  # wandb not installed / offline
                print(f"wandb unavailable ({e}); logging to {jsonl_path}")
        if config is not None:
            self._append({"_config": config, "_t": time.time()})

    def _append(self, blob: Dict):
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(blob, default=str) + "\n")

    def log_dict(self, prefix: str, metrics: Dict, step: int = 0):
        flat = {f"{prefix}{k}": (float(v) if hasattr(v, "__float__") else v)
                for k, v in metrics.items()}
        if self.wandb is not None:
            self.wandb.log(flat, step=step)
        self._append({"step": step, **flat, "_t": time.time()})


def print_table(results: Dict, title: str = "results"):
    """Markdown-style results table (utils/utils.py:68-83 analog)."""
    keys = list(results)
    print(f"\n### {title}")
    print("| " + " | ".join(keys) + " |")
    print("|" + "---|" * len(keys))
    vals = []
    for k in keys:
        v = results[k]
        vals.append(f"{v:.4f}" if isinstance(v, float) else str(v))
    print("| " + " | ".join(vals) + " |\n")
