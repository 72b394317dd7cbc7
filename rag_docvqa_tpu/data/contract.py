"""Fixed-shape data contract between the host ingest layer and the device.

The reference threads ragged lists-of-lists through every component
(src/MP_DocVQA.py:626-628, src/RAGVT5.py:153-316). Here every batch is a
pytree of padded arrays + masks with static shapes, so the whole
embed -> retrieve -> generate pipeline jits once and stays on device.

Coordinate systems
------------------
*word slots*: the concatenation, per document, of every chunk's word sequence
in chunk order (chunks are emitted page-by-page, so a page's slots are
contiguous). This is exactly the coordinate system the reference Retriever
builds per page on the fly (src/_modules.py:2024-2050) — overlap duplicates
included — which makes surrounding-word expansion and dedup a pure
index-interval computation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np
from flax import struct


@dataclass
class RawDocument:
    """One host-side sample before ingestion (ragged, Python-native)."""

    question: str
    words: List[List[str]]  # (n_pages, n_words)
    boxes: List[List[Sequence[float]]]  # (n_pages, n_words, 4), normalized 0-1
    answers: List[str] = field(default_factory=list)
    answer_page_idx: int = 0
    question_id: int = 0
    answer_type: str = "string"
    images: Optional[List[np.ndarray]] = None  # (n_pages,) HxWx3 uint8
    layout: Optional[List[Dict[str, Any]]] = None  # per page: boxes/labels/clusters
    # dataset-specific metadata (MMLongBenchDoc: answer_format/evidence_pages/
    # evidence_sources/doc_type, src/MMLongBenchDoc.py:188-192)
    extra: Dict[str, Any] = field(default_factory=dict)


@dataclass(frozen=True)
class Caps:
    """Static padding caps. Pick per-dataset buckets; shapes are (re)compiled
    per distinct cap set only."""

    max_pages: int = 20
    max_chunks: int = 128
    max_slots: int = 2048
    tokens_per_word: int = 8
    embed_tokens: int = 96  # per-chunk embedder token cap
    question_tokens: int = 48
    prompt_tokens: int = 64


@struct.dataclass
class ChunkedBatch:
    """Device batch: everything the retrieval + generation pipeline needs."""

    # --- embedder inputs ---
    chunk_emb_tokens: jax.Array  # (B, C, LE) int32
    chunk_emb_mask: jax.Array  # (B, C, LE) bool
    q_tokens: jax.Array  # (B, LQ) int32
    q_mask: jax.Array  # (B, LQ) bool

    # --- chunk metadata ---
    chunk_mask: jax.Array  # (B, C) bool
    chunk_page: jax.Array  # (B, C) int32
    chunk_label: jax.Array  # (B, C) int32
    chunk_box: jax.Array  # (B, C, 4) float32
    chunk_slot_start: jax.Array  # (B, C) int32
    chunk_slot_len: jax.Array  # (B, C) int32

    # --- word-slot arrays (generator token source) ---
    slot_tokens: jax.Array  # (B, W, TW) int32
    slot_ntok: jax.Array  # (B, W) int32
    slot_box: jax.Array  # (B, W, 4) float32
    slot_page: jax.Array  # (B, W) int32
    slot_label: jax.Array  # (B, W) int32
    slot_mask: jax.Array  # (B, W) bool
    page_slot_start: jax.Array  # (B, P) int32
    page_slot_end: jax.Array  # (B, P) int32

    # --- raw word arrays (original page word order, no chunk duplication) —
    # used by whole-page strategies: maxconfpage/anyconfpage/majorpage/none
    # (src/RAGVT5.py:401-408,478-482 index batch["words"][b][page]) ---
    raw_tokens: jax.Array  # (B, R, TW) int32
    raw_ntok: jax.Array  # (B, R) int32
    raw_box: jax.Array  # (B, R, 4) float32
    raw_label: jax.Array  # (B, R) int32 per-word layout label
    raw_mask: jax.Array  # (B, R) bool
    page_raw_start: jax.Array  # (B, P) int32
    page_raw_end: jax.Array  # (B, P) int32

    # --- generator prompt ("question: {q}  context: ", src/VT5.py:132) ---
    prompt_tokens: jax.Array  # (B, LP) int32
    prompt_len: jax.Array  # (B,) int32

    # --- misc ---
    num_pages: jax.Array  # (B,) int32
    answer_page: jax.Array  # (B,) int32

    @property
    def batch_size(self) -> int:
        return self.chunk_mask.shape[0]

    @property
    def num_chunks(self) -> int:
        return self.chunk_mask.shape[1]


@struct.dataclass
class GeneratorInputs:
    """Assembled generator inputs (the reference's prepare_inputs_for_vqa
    output, src/VT5.py:110-226, computed on device instead)."""

    input_ids: jax.Array  # (N, S) int32
    input_boxes: jax.Array  # (N, S, 4) int32, scaled to [0, 1000]
    input_labels: jax.Array  # (N, S) int32 layout labels
    attention_mask: jax.Array  # (N, S) bool

    @property
    def seq_len(self) -> int:
        return self.input_ids.shape[1]


@struct.dataclass
class RetrievalResult:
    """Device-side top-k retrieval output."""

    top_k_idx: jax.Array  # (B, K) int32 chunk indices (into C axis)
    top_k_valid: jax.Array  # (B, K) bool
    top_k_score: jax.Array  # (B, K) float32 cosine similarity
    top_k_page: jax.Array  # (B, K) int32
    top_k_label: jax.Array  # (B, K) int32
    top_k_box: jax.Array  # (B, K, 4) float32
    similarities: jax.Array  # (B, C) float32 (masked chunks = -inf)
