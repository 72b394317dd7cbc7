"""Training loop (reference train.py:30-192).

Epoch structure matches the reference: shuffled batches -> train step (loss +
grad clip + AdamW + linear schedule) -> per-epoch evaluation -> best-accuracy
checkpoint. Differences by design: the step is one jitted device program
(retrieval + assembly + loss + update); metrics-in-the-loop generation
(the reference generates every train batch, train.py:109-117 — a large
decode cost) is gated behind `train_metrics_every` (0 disables, N logs
train-batch accuracy/ANLS every N batches); OOM-batch skipping is
unnecessary under fixed shapes. The DUDE NAC BCE term (train.py:72-86) is
enabled with `use_nac`; Hi-VT5 training (LM + page-retrieval CE) by passing
`hivt5_cfg`.
"""

from __future__ import annotations

import os
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
    # train-batch ANLS/accuracy via generate, every N batches (0 = off;
    # the reference does it every batch, train.py:109-117)
    train_metrics_every: int = 0
    # DUDE not-answerable classifier BCE (reference train.py:72-86)
    use_nac: bool = False
    nac_loss_weight: float = 1.0
    nac_pos_weight: float = 1.0
    # blanking threshold used by the per-epoch eval engine (must match the
    # final eval's not_answerable_threshold so best-checkpoint selection is
    # computed at the same operating point)
    nac_threshold: float = 0.5
    # rematerialize the forward in backward (activation memory <-> ~1/3 FLOPs):
    # False | True (whole forward) | "layer" (per-layer checkpoint; caps peak
    # activations at one layer's residuals — see train_step.make_train_step)
    remat: Any = False
    # mixed precision: f32 master weights, bf16 forward/backward (~2x MXU
    # rate on TPU). None = auto (on for TPU backends, off elsewhere)
    bf16_compute: Optional[bool] = None
    # background-ingest batches ahead (0 = synchronous ingest)
    prefetch_depth: int = 2


class Trainer:
    def __init__(
        self,
        vt5_cfg: Optional[vt5m.VT5Config],
        rag_cfg: RAGConfig,
        params: Dict[str, Any],
        tokenizer,
        ingestor: DocVQAIngestor,
        loop_cfg: Optional[TrainLoopConfig] = None,
        logger=None,
        hivt5_cfg=None,  # set to train Hi-VT5 (LM + ret CE, make_hivt5_train_step)
    ):
        # fused flash encoder attention in the train step too — the kernel
        # has a custom VJP incl. the rel-pos bias gradient (2.15x per encoder
        # layer fwd at T=512 on v5e; the backward streams K/V the same way)
        from rag_docvqa_tpu.ops.flash_attention import flash_wanted

        if (
            vt5_cfg is not None
            and not vt5_cfg.t5.flash_encoder
            and flash_wanted(256, rag_cfg.max_source_length)
        ):
            from dataclasses import replace as _replace

            vt5_cfg = _replace(vt5_cfg, t5=_replace(vt5_cfg.t5, flash_encoder=True))
        self.vt5_cfg = vt5_cfg
        self.rag_cfg = rag_cfg
        self.hivt5_cfg = hivt5_cfg
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
        trainable = tuple(self.cfg.trainable)
        if self.cfg.use_nac and self.hivt5_cfg is None:
            if "nac" not in self._init_params:
                from rag_docvqa_tpu.models.nac import NACConfig, init_nac_params

                self._init_params = dict(self._init_params)
                self._init_params["nac"] = init_nac_params(
                    jax.random.PRNGKey(self.cfg.seed + 1),
                    NACConfig(emb_dim=self.vt5_cfg.t5.d_model),
                )
            if "nac" not in trainable:
                trainable = trainable + ("nac",)
        if self.hivt5_cfg is not None:
            # the reference trains the whole Hi-VT5 (build_utils.py:13-24)
            trainable = trainable + tuple(
                k for k in ("page_emb", "page_head") if k in self._init_params
            )
        self.tx = build_optimizer(
            lr=self.cfg.lr,
            warmup_steps=self.cfg.warmup_steps,
            total_steps=max(total_steps, self.cfg.warmup_steps + 1),
            clip_norm=self.cfg.clip_norm,
            weight_decay=self.cfg.weight_decay,
            mask=trainable_mask(self._init_params, trainable),
        )
        self.state = TrainState.create(self._init_params, self.tx)
        bf16 = self.cfg.bf16_compute
        if bf16 is None:
            bf16 = jax.default_backend() == "tpu"
        if self.hivt5_cfg is not None:
            from rag_docvqa_tpu.training.train_step import make_hivt5_train_step

            self.step_fn = make_hivt5_train_step(self.hivt5_cfg, self.tx,
                                                 remat=self.cfg.remat,
                                                 bf16_compute=bf16)
        else:
            self.step_fn = make_train_step(
                self.vt5_cfg, self.rag_cfg, self.tx,
                use_nac=self.cfg.use_nac,
                nac_loss_weight=self.cfg.nac_loss_weight,
                nac_pos_weight=self.cfg.nac_pos_weight,
                remat=self.cfg.remat,
                bf16_compute=bf16,
            )

    # ------------------------------------------------------------------ #
    def engine(self):
        params = self.state.params if self.state is not None else self._init_params
        if self.hivt5_cfg is not None:
            from rag_docvqa_tpu.engine.hivt5_engine import HiVT5Engine

            return HiVT5Engine(self.hivt5_cfg, params, self.tokenizer,
                               max_new_tokens=self.cfg.answer_max_len)
        nac = (params["nac"], self.cfg.nac_threshold) if self.cfg.use_nac and "nac" in params else None
        return RAGVT5Engine(self.rag_cfg, self.vt5_cfg, params, self.tokenizer, nac=nac)

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
            def _ingest_one(start):
                idx = order[start : start + cfg.batch_size]
                if len(idx) < cfg.batch_size:
                    return None  # fixed shapes: drop ragged tail batch
                docs = [train_docs[i] for i in idx]
                batch, aux = self.ingestor.ingest(docs)
                labels = self.ingestor.answer_labels(
                    aux["answers"], max_len=cfg.answer_max_len, seed=rng.randrange(1 << 30)
                )
                return docs, jax.device_put(batch), jax.device_put(jax.numpy.asarray(labels)), aux

            # async input pipeline: the next batch ingests + lands in HBM on a
            # background thread while the device runs the current train step
            from rag_docvqa_tpu.data.prefetch import map_prefetch

            for item in map_prefetch(_ingest_one, range(0, len(order), cfg.batch_size),
                                     depth=self.cfg.prefetch_depth):
                if item is None:
                    continue
                docs, batch, labels, aux = item
                step_args = [self.state, batch, labels]
                if cfg.use_nac and self.hivt5_cfg is None:
                    # DUDE not-answerable ground truth (reference train.py:56-58)
                    nac_gt = np.asarray(
                        [t == "not-answerable" for t in aux["answer_types"]], np.float32
                    )
                    step_args.append(jax.numpy.asarray(nac_gt))
                self.state, metrics = self.step_fn(*step_args)
                losses.append(float(metrics["loss"]))
                if len(losses) % cfg.log_every == 0:
                    logd = {"epoch": epoch, "step": int(self.state.step), "loss": losses[-1],
                            "grad_norm": float(metrics["grad_norm"])}
                    for k in ("nac_loss", "nac_accuracy", "lm_loss", "ret_loss"):
                        if k in metrics:
                            logd[k] = float(metrics[k])
                    self._log(logd)
                if cfg.train_metrics_every and len(losses) % cfg.train_metrics_every == 0:
                    # metrics-in-the-loop generation (reference train.py:109-137)
                    out = self.engine().inference(batch, aux)
                    m = self.evaluator.get_metrics(aux["answers"], out["pred_answers"],
                                                   aux.get("answer_types"))
                    self._log({
                        "epoch": epoch,
                        "step": int(self.state.step),
                        "train_batch_accuracy": float(np.mean(m["accuracy"])),
                        "train_batch_anls": float(np.mean(m["anls"])),
                        "train_batch_ret_prec": float(np.mean(self.evaluator.get_retrieval_metric(
                            [d.answer_page_idx for d in docs], out["pred_answer_pages"]))),
                    })

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
                    self.ckpt.save(int(self.state.step), self.state,
                                   metrics={"accuracy": m["accuracy"], "anls": m["anls"]})
            elif self.ckpt:
                self.ckpt.save(int(self.state.step), self.state)
            if self.ckpt and hasattr(self.tokenizer, "save_vocab"):
                # persist the HashTokenizer reverse map next to the Orbax
                # state so a fresh-process `eval.py --ckpt` can decode
                # train-time words (data/tokenizer.py cross-process caveat)
                self.tokenizer.save_vocab(
                    os.path.join(self.ckpt.directory, "hash_tokenizer.json")
                )
            self._log(epoch_metrics)
            history.append(epoch_metrics)

        return {"best": best, "history": history}

    def _log(self, metrics: Dict[str, Any]) -> None:
        if self.logger is not None:
            self.logger.log(metrics)
        else:
            print(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items()))
