"""Training loop (reference train.py:30-192).

Epoch structure matches the reference: shuffled batches -> train step (loss +
grad clip + AdamW + linear schedule) -> per-epoch evaluation -> best-accuracy
checkpoint. Differences by design: the step is one jitted device program
(retrieval + assembly + loss + update), metrics-in-the-loop generation is
optional (the reference generates every train batch, train.py:109-117 — a
large CPU cost we gate behind `train_metrics_every`), and OOM-batch skipping
is unnecessary under fixed shapes.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from rag_docvqa_tpu.data.contract import RawDocument
from rag_docvqa_tpu.data.ingest import DocVQAIngestor
from rag_docvqa_tpu.engine.evaluate import evaluate
from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, RAGVT5Engine
from rag_docvqa_tpu.metrics import Evaluator
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.training.checkpoint import CheckpointManager
from rag_docvqa_tpu.training.optimizer import build_optimizer, trainable_mask
from rag_docvqa_tpu.training.train_step import TrainState, make_train_step


@dataclass
class TrainLoopConfig:
    epochs: int = 10
    batch_size: int = 8
    lr: float = 2e-4
    warmup_steps: int = 1000
    clip_norm: float = 3.0
    weight_decay: float = 0.01
    answer_max_len: int = 32
    trainable: Sequence[str] = ("t5", "spatial")  # reference: generator only
    save_dir: Optional[str] = None
    eval_start: bool = True  # reference --eval-start default (utils.py:22)
    eval_batch_size: int = 8
    seed: int = 42
    log_every: int = 10


class Trainer:
    def __init__(
        self,
        vt5_cfg: vt5m.VT5Config,
        rag_cfg: RAGConfig,
        params: Dict[str, Any],
        tokenizer,
        ingestor: DocVQAIngestor,
        loop_cfg: Optional[TrainLoopConfig] = None,
        logger=None,
    ):
        self.vt5_cfg = vt5_cfg
        self.rag_cfg = rag_cfg
        self.tokenizer = tokenizer
        self.ingestor = ingestor
        self.cfg = loop_cfg or TrainLoopConfig()
        self.logger = logger
        self.evaluator = Evaluator()
        self._init_params = params
        self.tx = None
        self.state = None
        self.step_fn = None
        self.ckpt = CheckpointManager(self.cfg.save_dir) if self.cfg.save_dir else None

    def _ensure_optimizer(self, total_steps: int) -> None:
        """Build the optimizer once the schedule horizon is known (the linear
        decay runs to the true number of steps, matching
        get_linear_schedule_with_warmup semantics, build_utils.py:20-24)."""
        if self.tx is not None:
            return
        self.tx = build_optimizer(
            lr=self.cfg.lr,
            warmup_steps=self.cfg.warmup_steps,
            total_steps=max(total_steps, self.cfg.warmup_steps + 1),
            clip_norm=self.cfg.clip_norm,
            weight_decay=self.cfg.weight_decay,
            mask=trainable_mask(self._init_params, tuple(self.cfg.trainable)),
        )
        self.state = TrainState.create(self._init_params, self.tx)
        self.step_fn = make_train_step(self.vt5_cfg, self.rag_cfg, self.tx)

    # ------------------------------------------------------------------ #
    def engine(self) -> RAGVT5Engine:
        params = self.state.params if self.state is not None else self._init_params
        return RAGVT5Engine(self.rag_cfg, self.vt5_cfg, params, self.tokenizer)

    def _evaluate(self, docs: Sequence[RawDocument]) -> Dict[str, Any]:
        return evaluate(
            self.engine(), docs, self.ingestor, self.evaluator, batch_size=self.cfg.eval_batch_size
        )

    # ------------------------------------------------------------------ #
    def fit(
        self,
        train_docs: Sequence[RawDocument],
        val_docs: Sequence[RawDocument],
    ) -> Dict[str, Any]:
        cfg = self.cfg
        rng = random.Random(cfg.seed)
        history: List[Dict[str, Any]] = []
        best = {"accuracy": -1.0, "epoch": -1}
        steps_per_epoch = max(len(train_docs) // cfg.batch_size, 1)
        self._ensure_optimizer(steps_per_epoch * cfg.epochs)

        if cfg.eval_start and len(val_docs):
            m = self._evaluate(val_docs)
            self._log({"epoch": -1, **{k: m[k] for k in ("accuracy", "anls", "retrieval_precision")}})
            best = {"accuracy": m["accuracy"], "epoch": -1}

        order = list(range(len(train_docs)))
        for epoch in range(cfg.epochs):
            rng.shuffle(order)
            t0 = time.time()
            losses = []
            for start in range(0, len(order), cfg.batch_size):
                idx = order[start : start + cfg.batch_size]
                if len(idx) < cfg.batch_size:
                    continue  # fixed shapes: drop ragged tail batch
                docs = [train_docs[i] for i in idx]
                batch, aux = self.ingestor.ingest(docs)
                labels = self.ingestor.answer_labels(
                    aux["answers"], max_len=cfg.answer_max_len, seed=rng.randrange(1 << 30)
                )
                self.state, metrics = self.step_fn(self.state, batch, jax.numpy.asarray(labels))
                losses.append(float(metrics["loss"]))
                if len(losses) % cfg.log_every == 0:
                    self._log({"epoch": epoch, "step": int(self.state.step), "loss": losses[-1],
                               "grad_norm": float(metrics["grad_norm"])})

            epoch_metrics: Dict[str, Any] = {
                "epoch": epoch,
                "train_loss": float(np.mean(losses)) if losses else 0.0,
                "epoch_time": time.time() - t0,
            }
            if len(val_docs):
                m = self._evaluate(val_docs)
                epoch_metrics.update({k: m[k] for k in ("accuracy", "anls", "retrieval_precision", "chunk_score")})
                is_best = self.evaluator.update_global_metrics(m["accuracy"], m["anls"], epoch)
                if is_best:
                    best = {"accuracy": m["accuracy"], "epoch": epoch}
                if self.ckpt:
                    self.ckpt.save(int(self.state.step), self.state, metrics={"accuracy": m["accuracy"]})
            elif self.ckpt:
                self.ckpt.save(int(self.state.step), self.state)
            self._log(epoch_metrics)
            history.append(epoch_metrics)

        return {"best": best, "history": history}

    def _log(self, metrics: Dict[str, Any]) -> None:
        if self.logger is not None:
            self.logger.log(metrics)
        else:
            print(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items()))
