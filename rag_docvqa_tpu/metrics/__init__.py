"""Evaluation metrics with exact parity to the reference implementation.

Ported behaviors (reference citations):
  * typed accuracy + ANLS        -> src/metrics.py:155-243
  * page retrieval precision     -> src/metrics.py:94-109
  * chunk score (fuzzy substring)-> src/metrics.py:111-133, src/utils.py:255-281
  * MMLongBenchDoc scorer        -> src/eval/eval_score.py
"""

from rag_docvqa_tpu.metrics.anls import anls, levenshtein, similarity_score
from rag_docvqa_tpu.metrics.evaluator import Evaluator
from rag_docvqa_tpu.metrics.mmlongbench import (
    anls_compute,
    eval_acc_and_f1,
    eval_score,
)

__all__ = [
    "anls",
    "levenshtein",
    "similarity_score",
    "Evaluator",
    "anls_compute",
    "eval_score",
    "eval_acc_and_f1",
]
