"""rag_docvqa_tpu — a TPU-native retrieve-then-answer Document-VQA framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Pikurrot/RAG-DocVQA (reference layout documented in SURVEY.md). The design
re-centers the reference's object graph on what it actually computes: an
index-and-query engine —

  * page/chunk embedding generation as batched XLA inference
    (`rag_docvqa_tpu.models`),
  * an HBM-resident embedding index shardable across a TPU mesh
    (`rag_docvqa_tpu.parallel.index`),
  * fused Pallas similarity + top-k query kernels (`rag_docvqa_tpu.ops`),
  * on-device handoff of retrieved context to seq2seq generators
    (`rag_docvqa_tpu.engine`).

Host-side glue (OCR ingestion, tokenize-with-boxes alignment, chunk span
computation) lives in `rag_docvqa_tpu.data` and runs once at ingest time,
producing fixed-shape padded arrays: there is no per-sample Python in the
retrieve -> generate hot path.
"""

__version__ = "0.1.0"
