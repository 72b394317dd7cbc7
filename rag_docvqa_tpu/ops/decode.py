"""Fixed-length greedy decoding as a single lax.scan, with confidence.

Replaces HF's Python `generate` loop (src/VT5.py:278-287). Semantics matched:

  * greedy argmax, stop at EOS per sequence, pad afterwards;
  * confidence = product over decode steps of the max softmax probability,
    excluding the final step and treating post-EOS (forced-pad) steps as
    probability 1 — exactly `get_generative_confidence`
    (src/_model_utils.py:20-24) applied to HF generate output, where finished
    sequences emit pad with probability 1.

Fixed max_new_tokens keeps the loop XLA-friendly; sequences that finish early
just carry `done` flags (no host synchronization, no dist.all_reduce — compare
the reference's vendored synced greedy_search, src/HiVT5.py:153-386).

Dispatch split (`greedy_decode_split`): building the cross-KV cache and
running the decode loop in ONE XLA program makes the loop ~2.5x slower on
TPU — XLA relayouts the in-program-built cache before the loop (two ~25 ms
copies of the t5-base B=128 Te=512 int8 cache) and still reads it slower
inside the loop (7.8 vs 3.1 ms/step measured on v5e; cache-as-program-input
avoids both). Engines therefore dispatch cache build and decode loop as two
programs; `greedy_decode` (single traceable program) remains for in-jit use
and parity tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models import t5 as t5_mod


def _decode_loop(
    params,
    cfg: "t5_mod.T5Config",
    cache: "t5_mod.DecodeCache",
    encoder_mask: jax.Array,  # (B, Te) bool
    max_new_tokens: int,
) -> Tuple[jax.Array, jax.Array]:
    """The greedy scan from an already-built decode cache."""
    B = encoder_mask.shape[0]
    token0 = jnp.full((B,), cfg.decoder_start_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    conf0 = jnp.ones((B,), jnp.float32)

    def step(carry, t):
        token, cache, done, conf = carry
        logits, cache = t5_mod.decode_step(params, cfg, cache, token, t, encoder_mask)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        max_prob = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), axis=-1), axis=-1)
        emitted = jnp.where(done, cfg.pad_id, next_tok)
        # contribution: 1 for already-finished sequences; the global last step
        # is dropped ([:, :-1] in the reference confidence).
        contrib = jnp.where(done | (t >= max_new_tokens - 1), 1.0, max_prob)
        conf = conf * contrib
        done = done | (emitted == cfg.eos_id)
        return (emitted, cache, done, conf), emitted

    (_, _, _, conf), tokens = jax.lax.scan(
        step, (token0, cache, done0, conf0), jnp.arange(max_new_tokens)
    )
    return jnp.transpose(tokens, (1, 0)), conf


def greedy_decode(
    params,
    cfg: "t5_mod.T5Config",
    encoder_hidden: jax.Array,  # (B, Te, D)
    encoder_mask: jax.Array,  # (B, Te) bool
    max_new_tokens: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens (B, T) int32 padded after EOS, confidence (B,) f32).

    Traceable single-program form. When called eagerly on TPU prefer
    `greedy_decode_split` (identical math, ~2x faster end-to-end)."""
    cache = t5_mod.init_decode_cache(params, cfg, encoder_hidden, max_new_tokens)
    return _decode_loop(params, cfg, cache, encoder_mask, max_new_tokens)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def _build_cache_jit(params, cfg, encoder_hidden, max_new_tokens):
    return t5_mod.init_decode_cache(params, cfg, encoder_hidden, max_new_tokens)


@functools.partial(jax.jit, static_argnames=("cfg", "max_new_tokens"))
def _decode_loop_jit(params, cfg, cache, encoder_mask, max_new_tokens):
    return _decode_loop(params, cfg, cache, encoder_mask, max_new_tokens)


def greedy_decode_split(
    params,
    cfg: "t5_mod.T5Config",
    encoder_hidden: jax.Array,
    encoder_mask: jax.Array,
    max_new_tokens: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """`greedy_decode` as two XLA programs: cache build, then decode loop.

    Bit-identical to `greedy_decode` (same traced ops either side of the
    boundary); the cache crosses as a program input in canonical layout,
    which avoids XLA's in-program relayout copies and slow while-loop reads
    (7.8 -> 3.1 ms/step at t5-base B=128 Te=512 int8 on v5e). Eager-only —
    calling it under jit would just re-fuse the boundary away."""
    cache = _build_cache_jit(params, cfg, encoder_hidden, max_new_tokens)
    return _decode_loop_jit(params, cfg, cache, encoder_mask, max_new_tokens)
