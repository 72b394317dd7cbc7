"""Composite retrieve-then-answer engines (reference L3, src/RAGVT5.py,
src/RAGPix2Struct.py)."""

from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, RAGVT5Engine

__all__ = ["RAGConfig", "RAGVT5Engine"]
