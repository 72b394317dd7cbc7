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
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models import t5 as t5_mod


def greedy_decode(
    params,
    cfg: "t5_mod.T5Config",
    encoder_hidden: jax.Array,  # (B, Te, D)
    encoder_mask: jax.Array,  # (B, Te) bool
    max_new_tokens: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (tokens (B, T) int32 padded after EOS, confidence (B,) f32)."""
    B = encoder_hidden.shape[0]
    cache = t5_mod.init_decode_cache(params, cfg, encoder_hidden, max_new_tokens)
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
