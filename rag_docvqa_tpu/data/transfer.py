"""Host->device batch transfer with narrow token encoding.

The pipelined serving loop is TRANSFER-bound once ingest outruns the device
(PERF.md §5): every batch ships ~25-30 MB through PCIe (or this image's
tunnel), and the token-id arrays (slot/raw/chunk_emb/q/prompt) are the
dominant bytes — int32 for values that fit int16 whenever the tokenizer
vocabulary is < 2**15 (T5's 32128 qualifies; Qwen's 151936 does not).

`device_put_batch` downcasts those fields to int16 on the host (one cheap
astype per array), transfers half the token bytes, and restores int32 with
one jitted on-device widen — consumers see a bit-identical ChunkedBatch.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data.contract import ChunkedBatch

_TOKEN_FIELDS = ("chunk_emb_tokens", "q_tokens", "slot_tokens", "raw_tokens",
                 "prompt_tokens")


@jax.jit
def _widen(batch: ChunkedBatch) -> ChunkedBatch:
    return batch.replace(
        **{f: getattr(batch, f).astype(jnp.int32) for f in _TOKEN_FIELDS}
    )


def device_put_batch(
    batch: ChunkedBatch,
    vocab_size: int,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> ChunkedBatch:
    """jax.device_put for a ChunkedBatch; token ids travel as int16 when the
    vocabulary fits (halving the dominant transfer bytes), widened back to
    int32 on device. Passes `sharding` through when given (data-parallel
    eval)."""
    narrow = vocab_size < (1 << 15)
    if narrow:
        fields = [np.asarray(getattr(batch, f)) for f in _TOKEN_FIELDS]
        # ids are < vocab_size by construction, but a tokenizer that lies
        # about its vocab (HF added-specials beyond config vocab_size) must
        # degrade to passthrough, not silently wrap negative (~2 ms scan per
        # 32 MB batch vs a 265 ms transfer)
        narrow = all(int(a.max(initial=0)) < (1 << 15) and int(a.min(initial=0)) >= 0
                     for a in fields)
        if narrow:
            batch = batch.replace(
                **{f: a.astype(np.int16) for f, a in zip(_TOKEN_FIELDS, fields)}
            )
    dev = jax.device_put(batch, sharding) if sharding is not None else jax.device_put(batch)
    if narrow:
        dev = _widen(dev)
    return dev
