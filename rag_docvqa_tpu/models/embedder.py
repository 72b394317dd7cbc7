"""Bi-encoder text embedders (reference BiEncoder, src/_modules.py:1422-1477).

Backends:
  * "VT5" — the generator's shared T5 embedding table + masked mean pooling
            (src/_modules.py:1465-1474, src/_model_utils.py:49-61). Zero extra
            params; one gather + one reduction, fully batched over (B, C).
  * "BGE" — BERT-style sentence encoder (CLS pooling + L2 normalize), see
            models/bert.py. Used when fine-tuned sentence-transformer weights
            are available.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def mean_pool(embs: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked mean over the token axis (src/_model_utils.py:49-61)."""
    mask_f = mask.astype(embs.dtype)[..., None]
    summed = jnp.sum(embs * mask_f, axis=-2)
    counts = jnp.clip(jnp.sum(mask_f, axis=-2), 1e-9, None)
    return summed / counts


def vt5_table_embed(
    shared: jax.Array,  # (V, D) the generator's shared embedding table
    tokens: jax.Array,  # (..., L) int32
    mask: jax.Array,  # (..., L) bool
) -> jax.Array:
    """Sentence embedding = mean of shared-table token embeddings. Works for
    chunk batches (B, C, L) and questions (B, L) alike."""
    return mean_pool(shared[tokens], mask)


def embed_batch(
    params: Dict[str, Any],
    backend: str,
    tokens: jax.Array,
    mask: jax.Array,
    bert_cfg=None,
) -> jax.Array:
    if backend == "VT5":
        return vt5_table_embed(params["shared"], tokens, mask)
    if backend in ("BGE", "JINA"):
        # same encoder path; JINA selects the ALiBi/GLU/mean-pool options via
        # its BertConfig (use_alibi=True, glu_mlp=True, pooling="mean")
        from rag_docvqa_tpu.models.bert import bert_sentence_embed

        return bert_sentence_embed(params, bert_cfg, tokens, mask)
    raise ValueError(f"unknown embedder backend: {backend}")
