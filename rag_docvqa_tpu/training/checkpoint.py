"""Orbax checkpointing: params + optimizer state + step, with best tracking.

The reference saves generator params only, per epoch + a best.ckpt pointer
(src/checkpoint.py:5-34), and never resumes optimizer state. Here the full
TrainState round-trips (async-capable Orbax), which also covers multi-host
sharded state.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from rag_docvqa_tpu.training.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # best = accuracy with ANLS as tiebreaker (the reference tracks
        # accuracy only, metrics.py:135-146; the tiebreaker matters when every
        # epoch ties at accuracy 0 — Orbax would otherwise resolve the tie to
        # the EARLIEST save, i.e. the least-trained checkpoint). 1e-6 sits
        # below any realistic accuracy quantum (1/n_samples for n < 1e6) yet
        # above float64 absorption for small ANLS deltas, so it breaks exact
        # accuracy ties without ever flipping a real accuracy difference.
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("accuracy", 0.0) + 1e-6 * m.get("anls", 0.0),
                best_mode="max",
            ),
        )

    def save(self, step: int, state: TrainState, metrics: Optional[dict] = None) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave({"params": state.params, "opt_state": state.opt_state, "step": state.step}),
            metrics=metrics or {},
        )
        self._mgr.wait_until_finished()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, f"no checkpoint found in {self.directory}"
        target = {"params": state_like.params, "opt_state": state_like.opt_state, "step": state_like.step}
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
        return TrainState(params=restored["params"], opt_state=restored["opt_state"], step=restored["step"])

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """Standalone param export (tokenizer/config travel alongside like the
    reference's save_pretrained dir, src/checkpoint.py:21-28)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params)
    ckpt.wait_until_finished()


def load_params(path: str, params_like: Any) -> Any:
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), params_like)
