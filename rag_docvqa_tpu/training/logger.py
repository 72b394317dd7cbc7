"""Run logging (reference src/logger.py): stdout always, wandb when available
and enabled, timing-split summaries (eval.py:104-112 percent breakdown)."""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(
        self,
        project: str = "rag-docvqa-tpu",
        name: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        use_wandb: bool = False,
        log_dir: Optional[str] = None,
    ):
        self.start = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=name, config=config or {})
            except Exception as e:  # wandb not baked in; degrade to stdout
                print(f"wandb unavailable ({e}); logging to stdout only")
        self._file = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if config:
            print("Config:", json.dumps({k: str(v) for k, v in config.items()}, indent=2))

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        line = dict(metrics)
        line["wall_time"] = round(time.time() - self.start, 2)
        print(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}" for k, v in line.items()))
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self._file is not None:
            self._file.write(json.dumps(line, default=str) + "\n")
            self._file.flush()

    def log_timing_split(self, timing: Dict[str, float]) -> None:
        """Percent breakdown like eval.py:104-112."""
        total = sum(timing.values()) or 1.0
        pct = {f"{k}_pct": round(100 * v / total, 1) for k, v in timing.items()}
        self.log({**{k: round(v, 2) for k, v in timing.items()}, **pct})

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()
