"""Int8-quantized retrieval index.

Symmetric per-row int8 quantization of the (pre-normalized) chunk embedding
matrix: 4x less HBM than f32 (2x less than bf16) for the corpus index, scored
with the MXU's native int8 path (int8 x int8 -> int32 accumulate) and
rescaled to cosine similarities. Queries quantize dynamically per row.

For normalized embeddings the per-row scale is ~1/127 x amax, so the score
error is bounded by ~1% relative — top-k overlap with the f32 index is
property-tested (tests/test_quant.py) and the big-index speed win is measured
in bench detail.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.ops.topk import NEG_INF, l2_normalize, masked_topk


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, D) f32 -> (int8 values, (N, 1) f32 scales); symmetric per-row."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def build_int8_index(embeddings: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Normalize + quantize a raw (N, D) embedding matrix."""
    return quantize_rows(l2_normalize(embeddings.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_int8(
    index_q: jax.Array,  # (N, D) int8
    index_scale: jax.Array,  # (N, 1) f32
    queries: jax.Array,  # (B, D) f32 unnormalized
    n_valid: jax.Array,  # () int32
    k: int,
):
    """Masked top-k cosine over an int8 index: int8 MXU dot + rescale."""
    qn = l2_normalize(queries.astype(jnp.float32))
    q8, qs = quantize_rows(qn)
    acc = jax.lax.dot_general(
        q8,
        index_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, N) int32
    scores = acc.astype(jnp.float32) * qs * index_scale[:, 0][None, :]
    row = jnp.arange(index_q.shape[0])[None, :]
    scores = jnp.where(row < n_valid, scores, NEG_INF)
    return masked_topk(scores, None, k)
