"""Host-side data layer: tokenizers, ingestion to fixed-shape arrays, datasets.

All raggedness (variable pages/doc, words/page, chunks/doc) is resolved HERE,
once, at ingest time — producing padded, masked arrays so the device pipeline
(embed -> retrieve -> generate) is pure fixed-shape XLA. This replaces the
reference's lists-of-lists batch dicts (src/MP_DocVQA.py:626-628) and its
per-word tokenize loop inside the model (src/VT5.py:155-164).
"""

from rag_docvqa_tpu.data.tokenizer import ByteTokenizer, HashTokenizer, load_tokenizer
from rag_docvqa_tpu.data.contract import ChunkedBatch, GeneratorInputs, RawDocument
from rag_docvqa_tpu.data.ingest import DocVQAIngestor

__all__ = [
    "ByteTokenizer",
    "HashTokenizer",
    "load_tokenizer",
    "ChunkedBatch",
    "GeneratorInputs",
    "RawDocument",
    "DocVQAIngestor",
]
