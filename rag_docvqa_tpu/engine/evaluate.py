"""Evaluation loop (reference eval.py:191-440).

Per batch: ingest -> engine.inference -> ANLS/accuracy/retrieval-precision/
chunk-score; accumulates timing splits (load/retrieval/generation like
eval.py:332-336,399-419), per-sample scores, and writes a continuous JSON
snapshot (eval.py:386-438) so long runs are crash-resumable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from rag_docvqa_tpu.data.contract import RawDocument
from rag_docvqa_tpu.data.ingest import DocVQAIngestor
from rag_docvqa_tpu.metrics import Evaluator


def evaluate(
    engine,
    docs: Sequence[RawDocument],
    ingestor: DocVQAIngestor,
    evaluator: Optional[Evaluator] = None,
    batch_size: int = 8,
    save_path: Optional[str] = None,
    save_continuously: bool = False,
    compute_stats: bool = False,
    mesh=None,  # jax.sharding.Mesh with a "data" axis: shard eval batches
    prefetch_depth: int = 2,  # background-ingest batches ahead (0 = sync)
) -> Dict[str, Any]:
    evaluator = evaluator or Evaluator()
    stats = None
    if compute_stats:
        from rag_docvqa_tpu.utils_stats import StatsCollector

        stats = StatsCollector(compute_examples=True)
    # MMLongBenchDoc typed scoring (reference eval.py:427-432, metrics.py:245-293):
    # auto-enabled when the dataset carries answer_format metadata
    mmlb = bool(docs) and bool(getattr(docs[0], "extra", {}).get("answer_format"))
    mmlb_samples: List[Dict[str, Any]] = []
    total_acc: List[float] = []
    total_anls: List[float] = []
    total_ret_prec: List[float] = []
    total_chunk_score: List[float] = []
    scores_by_samples: Dict[Any, Dict[str, Any]] = {}
    load_time = retrieval_time = generation_time = 0.0
    all_answers: List[Any] = []

    def _ingest_one(start: int):
        chunk = list(docs[start : start + batch_size])
        n_real = len(chunk)
        t0 = time.time()
        if mesh is not None and n_real % mesh.shape["data"] != 0:
            # pad the last partial batch to a mesh multiple (repeat the final
            # doc) so data-parallel sharding never silently degrades to a
            # replicated run; padded samples are dropped from every per-sample
            # output below
            pad = mesh.shape["data"] - n_real % mesh.shape["data"]
            chunk = chunk + [chunk[-1]] * pad
        batch, aux = ingestor.ingest(chunk)
        # explicit transfer on the producer thread (overlapped with device
        # compute); token ids travel int16 when the vocab fits — the
        # serving loop is transfer-bound once ingest outruns the device
        import jax as _jax

        from rag_docvqa_tpu.data.transfer import device_put_batch

        vocab = getattr(ingestor.tokenizer, "vocab_size", 1 << 30)
        if mesh is not None:
            # data-parallel eval: shard the batch over the mesh; the engine's
            # jitted pipelines then run SPMD (the reference's data_parallel
            # flag was an unused nn.DataParallel, src/HiVT5.py:643-645)
            from jax.sharding import NamedSharding, PartitionSpec as _P

            batch = device_put_batch(batch, vocab, NamedSharding(mesh, _P("data")))
        elif len(_jax.devices()) == 1:
            batch = device_put_batch(batch, vocab)
        # else (multi-device, no mesh): keep the batch uncommitted host-side
        # so an engine with its own device placement decides — committing to
        # the default device would conflict or add per-batch copies
        return chunk, n_real, batch, aux, time.time() - t0

    # async input pipeline: batch N+1 ingests (and lands on device) on a
    # background thread while the engine computes batch N; load_time records
    # the producer-side ingest wall (overlapped, not on the critical path)
    from rag_docvqa_tpu.data.prefetch import map_prefetch

    batches = map_prefetch(_ingest_one, range(0, len(docs), batch_size), depth=prefetch_depth)
    for chunk, n_real, batch, aux, ingest_t in batches:
        load_time += ingest_t
        if stats is not None:
            # chunk distributions, merged across batches (eval.py:359-378);
            # computed on the real samples only — mesh-padding duplicates
            # must not inflate the distributions
            from rag_docvqa_tpu.utils_stats import collect_ingest_stats

            sb, sa = batch, aux
            if len(chunk) > n_real:
                import jax as _jax

                sb = _jax.tree_util.tree_map(lambda x: x[:n_real], batch)
                sa = {k: v[:n_real] if isinstance(v, list) else v for k, v in aux.items()}
            stats.merge(collect_ingest_stats(sb, sa))

        t0 = time.time()
        out = engine.inference(batch, aux)
        step_total = time.time() - t0
        if len(chunk) > n_real:  # drop mesh-padding samples
            chunk = chunk[:n_real]
            aux = {k: v[:n_real] if isinstance(v, list) else v for k, v in aux.items()}
            out = _trim_output(out, n_real)
        # engines report their own split (retrieval vs generation,
        # eval.py:332-336); fall back to lumping into generation
        r = out.get("retrieval", {}) or {}
        retrieval_time += r.get("retrieval_time", 0.0)
        generation_time += r.get("generation_time", step_total - r.get("retrieval_time", 0.0))

        metrics = evaluator.get_metrics(
            aux["answers"], out["pred_answers"], aux.get("answer_types")
        )
        ret_prec = evaluator.get_retrieval_metric(
            [d.answer_page_idx for d in chunk], out["pred_answer_pages"]
        )
        ret_eval = evaluator.eval_retrieval(aux["answers"], out["retrieval"].get("text"))

        total_acc.extend(metrics["accuracy"])
        total_anls.extend(metrics["anls"])
        total_ret_prec.extend(ret_prec)
        total_chunk_score.extend(ret_eval["chunk_score"])
        all_answers.extend(out["pred_answers"])

        if mmlb:
            from rag_docvqa_tpu.metrics.mmlongbench import eval_score, extract_answer

            for i, d in enumerate(chunk):
                fmt = d.extra.get("answer_format", "Str")
                gt = d.answers[0] if d.answers else ""
                preds = out["pred_answers"][i]
                preds = preds if isinstance(preds, list) else [preds]
                # anyconf-style lists score like the main evaluator: max over k
                score = max(
                    (eval_score(gt, extract_answer(d.question, p or ""), fmt) for p in preds),
                    default=0.0,
                )
                mmlb_samples.append({
                    "question": d.question,
                    "answer": gt,
                    "pred": (preds[0] or "") if preds else "",
                    "score": score,
                    "answer_format": fmt,
                    "evidence_pages": d.extra.get("evidence_pages", []),
                    "evidence_sources": d.extra.get("evidence_sources", []),
                    "doc_type": d.extra.get("doc_type", "unknown"),
                })

        for i, d in enumerate(chunk):
            scores_by_samples[d.question_id] = {
                "question": d.question,
                "gt_answer": d.answers,
                "pred_answer": out["pred_answers"][i],
                "pred_answer_conf": out["confidences"][i],
                "pred_answer_pages": out["pred_answer_pages"][i],
                "gt_answer_page": d.answer_page_idx,
                "accuracy": metrics["accuracy"][i],
                "anls": metrics["anls"][i],
                "retrieval_precision": ret_prec[i],
                "chunk_score": ret_eval["chunk_score"][i],
            }

        if save_continuously and save_path:
            _save(save_path, total_acc, total_anls, total_ret_prec, total_chunk_score,
                  scores_by_samples, load_time, retrieval_time, generation_time)

    result = _summary(total_acc, total_anls, total_ret_prec, total_chunk_score,
                      load_time, retrieval_time, generation_time)
    result["scores_by_samples"] = scores_by_samples
    result["pred_answers"] = all_answers
    if stats is not None:
        result["retrieval_stats"] = stats.summary()
        result["retrieval_stats_examples"] = stats.stats_examples
    if mmlb:
        from rag_docvqa_tpu.metrics.mmlongbench import eval_acc_and_f1, show_results

        acc, f1 = eval_acc_and_f1(mmlb_samples)
        result["mmlongbench"] = {"accuracy": acc, "f1": f1, "n_samples": len(mmlb_samples)}
        if save_path:
            show_results(mmlb_samples, os.path.splitext(save_path)[0] + "_mmlb_breakdown.txt")
    if save_path:
        _save(save_path, total_acc, total_anls, total_ret_prec, total_chunk_score,
              scores_by_samples, load_time, retrieval_time, generation_time)
    return result


def _trim_output(out: Dict[str, Any], n: int) -> Dict[str, Any]:
    """Slice every per-sample axis of an engine result to the first n rows."""
    trimmed = dict(out)
    for k in ("pred_answers", "confidences", "pred_answer_pages"):
        if isinstance(trimmed.get(k), list):
            trimmed[k] = trimmed[k][:n]
    r = trimmed.get("retrieval")
    if isinstance(r, dict):
        r = dict(r)
        for k, v in r.items():
            if isinstance(v, list) or (isinstance(v, np.ndarray) and v.ndim >= 1):
                r[k] = v[:n]
        trimmed["retrieval"] = r
    return trimmed


def _summary(acc, anls, prec, chunk, load_t, ret_t, gen_t) -> Dict[str, Any]:
    m = lambda xs: float(np.mean(xs)) if xs else 0.0
    return {
        "accuracy": m(acc),
        "anls": m(anls),
        "retrieval_precision": m(prec),
        "chunk_score": m(chunk),
        "n_samples": len(acc),
        "timing": {"load_time": load_t, "retrieval_time": ret_t, "generation_time": gen_t},
    }


def _save(path, acc, anls, prec, chunk, samples, load_t, ret_t, gen_t) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = _summary(acc, anls, prec, chunk, load_t, ret_t, gen_t)
    data["scores_by_samples"] = samples
    with open(path, "w") as f:
        json.dump(data, f, indent=2, default=str)
