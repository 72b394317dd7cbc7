"""Cross-encoder reranking stage (reference Reranker, src/_modules.py:1544-1610).

Pipeline: build [CLS] question [SEP] chunk [SEP] pair tokens for the K
retrieved chunks -> batched cross-encoder scores (one dispatch for all B*K
pairs, vs the reference's per-sample loop src/_modules.py:1597-1610) ->
sort descending -> threshold filter clamped to [min_chunk_num, max_chunk_num]
(src/_modules.py:1584-1590) -> permuted top-k indices + validity.

Pair-text modes: by default pairs carry the chunk's own embed-token text;
`rerank_on_surroundings=True` is the strict-parity mode — pairs carry the
compacted retrieval text *including surrounding words* (first-cover dedup in
retrieval rank order), which is exactly what the reference reranks
(src/RAGVT5.py:153-316 reranks the post-expansion `text` lists). The two
modes are identical at include_surroundings=0 (the common config).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data.contract import ChunkedBatch, RetrievalResult
from rag_docvqa_tpu.models.bert import BertConfig, cross_encoder_score


@dataclass(frozen=True)
class RerankerConfig:
    filter_thresh: float = 0.4
    max_chunk_num: int = 5
    min_chunk_num: int = 1
    cls_id: int = 0
    sep_id: int = 2
    pair_len: int = 192
    question_len: int = 32
    # strict reference parity: pair texts include surrounding words
    # (src/RAGVT5.py:153-316); include_surroundings must match the engine's
    rerank_on_surroundings: bool = False
    include_surroundings: int = 0


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_pair_tokens(
    batch: ChunkedBatch,
    top_k_idx: jax.Array,  # (B, K)
    cfg: RerankerConfig,
) -> Tuple[jax.Array, jax.Array]:
    """(B*K, pair_len) [CLS] q [SEP] chunk [SEP] token ids + mask."""
    B, K = top_k_idx.shape
    LQ = batch.q_tokens.shape[1]
    LE = batch.chunk_emb_tokens.shape[2]
    q_len = jnp.minimum(jnp.sum(batch.q_mask, axis=1), cfg.question_len)  # (B,)

    chunk_tokens = jnp.take_along_axis(batch.chunk_emb_tokens, top_k_idx[:, :, None], axis=1)  # (B, K, LE)
    chunk_len = jnp.sum(
        jnp.take_along_axis(batch.chunk_emb_mask, top_k_idx[:, :, None], axis=1), axis=2
    )  # (B, K)

    T = cfg.pair_len
    pos = jnp.arange(T)[None, None, :]  # (1, 1, T)
    ql = q_len[:, None, None]
    cl = chunk_len[:, :, None]
    # layout: [CLS] q[0:ql] [SEP] chunk[0:cl] [SEP]
    sep1 = 1 + ql
    chunk_start = sep1 + 1
    sep2 = jnp.minimum(chunk_start + cl, T - 1)

    q_idx = jnp.clip(pos - 1, 0, LQ - 1)
    c_idx = jnp.clip(pos - chunk_start, 0, LE - 1)
    q_tok = jnp.broadcast_to(batch.q_tokens[:, None, :], (B, K, LQ))
    ids = jnp.where(
        pos == 0,
        cfg.cls_id,
        jnp.where(
            pos < sep1,
            jnp.take_along_axis(q_tok, q_idx, axis=2),
            jnp.where(
                pos == sep1,
                cfg.sep_id,
                jnp.where(
                    pos < sep2,
                    jnp.take_along_axis(chunk_tokens, c_idx, axis=2),
                    jnp.where(pos == sep2, cfg.sep_id, 0),
                ),
            ),
        ),
    )
    mask = pos <= sep2
    return ids.reshape(B * K, T).astype(jnp.int32), mask.reshape(B * K, T)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_pair_tokens_surround(
    batch: ChunkedBatch,
    top_k_idx: jax.Array,  # (B, K)
    top_k_valid: jax.Array,  # (B, K)
    cfg: RerankerConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Strict-parity pair builder: the chunk segment is the rank's compacted
    retrieval text INCLUDING surroundings (first-cover dedup in retrieval
    rank order, src/_modules.py:2022-2091) — what the reference's
    Reranker.batch_rerank actually scores. Reuses the ownership + gather
    flatten machinery: each rank's owned slots flatten into one row laid out
    [CLS] q [SEP] slot-words [SEP] (the final SEP rides the flattener's
    keep-EOS slot)."""
    from rag_docvqa_tpu.ops.gather import AssembleConfig, _flatten_tokens, compute_ownership

    B, K = top_k_idx.shape
    W = batch.slot_mask.shape[1]
    TW = batch.slot_tokens.shape[2]
    LQ = batch.q_tokens.shape[1]
    owner = compute_ownership(batch, top_k_idx, top_k_valid, cfg.include_surroundings)

    # pair "prompt" = [CLS] q[0:ql] [SEP], per sample
    ql = jnp.minimum(jnp.sum(batch.q_mask, axis=1), cfg.question_len)  # (B,)
    LP = min(cfg.question_len, LQ) + 2
    pos = jnp.arange(LP)[None, :]
    q_idx = jnp.clip(pos - 1, 0, LQ - 1)
    prompt = jnp.where(
        pos == 0,
        cfg.cls_id,
        jnp.where(
            pos < 1 + ql[:, None],
            jnp.take_along_axis(batch.q_tokens, q_idx, axis=1),
            jnp.where(pos == 1 + ql[:, None], cfg.sep_id, 0),
        ),
    ).astype(jnp.int32)
    prompt_len = ql + 2

    # per-rank slot token streams: rows = (B*K) pseudo-samples sharing the
    # sample's slot arrays, with ntok zeroed outside the rank's slots
    rank = jnp.arange(K)[None, :, None]  # (1, K, 1)
    ntok = jnp.where(owner[:, None, :] == rank, batch.slot_ntok[:, None, :], 0)  # (B,K,W)
    tile = lambda x, nd: jnp.broadcast_to(
        x[:, None], (B, K) + x.shape[1:]
    ).reshape((B * K,) + x.shape[1:])
    fcfg = AssembleConfig(
        max_source_length=cfg.pair_len, eos_token_id=cfg.sep_id, pad_token_id=0
    )
    gen = _flatten_tokens(
        tile(batch.slot_tokens, 3),
        ntok.reshape(B * K, W),
        tile((batch.slot_box * 1000).astype(jnp.int32), 3),
        tile(batch.slot_label, 2),
        tile(prompt, 2),
        jnp.broadcast_to(prompt_len[:, None], (B, K)).reshape(B * K),
        fcfg,
    )
    return gen.input_ids, gen.attention_mask


@functools.partial(jax.jit, static_argnames=("cfg",))
def rerank_select(
    scores: jax.Array,  # (B, K) cross-encoder scores in [0, 1]
    top_k_valid: jax.Array,  # (B, K)
    cfg: RerankerConfig,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (perm (B, K) — reordering of rank positions, new_valid (B, K),
    sorted_scores). Exact clamp semantics of src/_modules.py:1582-1590."""
    masked = jnp.where(top_k_valid, scores, -jnp.inf)
    order = jnp.argsort(-masked, axis=1, stable=True)  # descending
    sorted_scores = jnp.take_along_axis(masked, order, axis=1)
    n_valid = jnp.sum(top_k_valid, axis=1)  # (B,)
    n_pass = jnp.sum(top_k_valid & (scores >= cfg.filter_thresh), axis=1)
    keep = jnp.where(
        n_pass > cfg.max_chunk_num,
        cfg.max_chunk_num,
        jnp.where(n_pass < cfg.min_chunk_num, jnp.minimum(cfg.min_chunk_num, n_valid), n_pass),
    )
    new_valid = jnp.arange(scores.shape[1])[None, :] < keep[:, None]
    return order, new_valid, sorted_scores


def apply_rerank(ret: RetrievalResult, perm: jax.Array, new_valid: jax.Array, scores: jax.Array) -> RetrievalResult:
    """Permute every per-rank field of the retrieval result
    (the reference reranks all parallel arg lists, src/_modules.py:1592-1595)."""
    take = lambda x: jnp.take_along_axis(x, perm, axis=1)
    return RetrievalResult(
        top_k_idx=take(ret.top_k_idx),
        top_k_valid=new_valid,
        top_k_score=scores,
        top_k_page=take(ret.top_k_page),
        top_k_label=take(ret.top_k_label),
        top_k_box=jnp.take_along_axis(ret.top_k_box, perm[..., None], axis=1),
        similarities=ret.similarities,
    )


class Reranker:
    """Host-facing wrapper: params + config -> rerank a RetrievalResult."""

    def __init__(self, cfg: RerankerConfig, bert_cfg: BertConfig, params: Dict[str, Any]):
        self.cfg = cfg
        self.bert_cfg = bert_cfg
        self.params = params

    def __call__(self, batch: ChunkedBatch, ret: RetrievalResult) -> RetrievalResult:
        B, K = ret.top_k_idx.shape
        if self.cfg.rerank_on_surroundings:
            ids, mask = build_pair_tokens_surround(
                batch, ret.top_k_idx, ret.top_k_valid, self.cfg
            )
        else:
            ids, mask = build_pair_tokens(batch, ret.top_k_idx, self.cfg)
        scores = cross_encoder_score(self.params, self.bert_cfg, ids, mask).reshape(B, K)
        perm, new_valid, sorted_scores = rerank_select(scores, ret.top_k_valid, self.cfg)
        return apply_rerank(ret, perm, new_valid, sorted_scores)


# --------------------------------------------------------------------------- #
# LLM (gemma-style) reranker — reference FlagLLMReranker
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("cfg", "n_prefix", "n_mid", "n_suffix"))
def build_llm_pair_tokens(
    batch: ChunkedBatch,
    top_k_idx: jax.Array,  # (B, K)
    prefix: jax.Array,  # (n_prefix,) prompt head ids ("A: ")
    mid: jax.Array,  # (n_mid,) separator ids ("\nB: ")
    suffix: jax.Array,  # (n_suffix,) instruction tail ids
    cfg: RerankerConfig,
    n_prefix: int,
    n_mid: int,
    n_suffix: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(B*K, pair_len) ids laid out prefix ++ q ++ mid ++ chunk ++ suffix,
    plus mask and the last valid position per row (where the yes-logit is
    read). Mirrors FlagEmbedding's pair prompt for bge-reranker-v2-gemma
    (reference src/_modules.py:1533-1541 scores (query, passage) pairs)."""
    B, K = top_k_idx.shape
    LQ = batch.q_tokens.shape[1]
    LE = batch.chunk_emb_tokens.shape[2]
    T = cfg.pair_len
    if n_prefix + 1 + n_mid + n_suffix >= T:
        raise ValueError(
            f"pair_len={T} cannot fit prefix({n_prefix}) + question(>=1) + "
            f"mid({n_mid}) + suffix({n_suffix}); raise RerankerConfig.pair_len"
        )
    # question budget guarantees prefix+q+mid+suffix (and >=0 chunk tokens)
    # always fit: segments can never collide regardless of tokenizer
    q_budget = T - n_prefix - n_mid - n_suffix - 1
    q_len = jnp.minimum(jnp.sum(batch.q_mask, axis=1), min(cfg.question_len, q_budget))  # (B,)
    chunk_tokens = jnp.take_along_axis(batch.chunk_emb_tokens, top_k_idx[:, :, None], axis=1)
    chunk_len = jnp.sum(jnp.take_along_axis(batch.chunk_emb_mask, top_k_idx[:, :, None], axis=1), axis=2)

    pos = jnp.arange(T)[None, None, :]
    ql = q_len[:, None, None]
    cl = chunk_len[:, :, None]
    b_q = n_prefix  # question start
    b_mid = b_q + ql
    b_chunk = b_mid + n_mid
    # keep room for the suffix: clamp the chunk segment (b_suf >= b_chunk is
    # guaranteed by the question budget above)
    b_suf = jnp.minimum(b_chunk + cl, T - n_suffix)
    last = b_suf + n_suffix - 1  # (B, K, 1)

    q_tok = jnp.broadcast_to(batch.q_tokens[:, None, :], (B, K, LQ))
    q_idx = jnp.clip(pos - b_q, 0, LQ - 1)
    c_idx = jnp.clip(pos - b_chunk, 0, LE - 1)
    p_idx = jnp.clip(pos, 0, n_prefix - 1)
    m_idx = jnp.clip(pos - b_mid, 0, n_mid - 1)
    s_idx = jnp.clip(pos - b_suf, 0, n_suffix - 1)

    ids = jnp.where(
        pos < b_q,
        prefix[p_idx],
        jnp.where(
            pos < b_mid,
            jnp.take_along_axis(q_tok, q_idx, axis=2),
            jnp.where(
                pos < b_chunk,
                mid[m_idx],
                jnp.where(
                    pos < b_suf,
                    jnp.take_along_axis(chunk_tokens, c_idx, axis=2),
                    jnp.where(pos <= last, suffix[s_idx], 0),
                ),
            ),
        ),
    )
    mask = pos <= last
    return (
        ids.reshape(B * K, T).astype(jnp.int32),
        mask.reshape(B * K, T),
        last.reshape(B * K).astype(jnp.int32),
    )


class FlagLLMReranker:
    """LLM pair reranker (reference FlagLLMReranker, src/_modules.py:1513-1541):
    score a (query, passage) pair by the yes-token logit of a causal LM at the
    final prompt position (the bge-reranker-v2-gemma scheme). `normalize`
    maps logits through a sigmoid so `filter_thresh` keeps its [0, 1]
    cross-encoder semantics.

    Selected by the reference when "gemma" appears in the reranker weight
    name (src/_modules.py:1555-1558) — config.build_engine reproduces that
    sniff."""

    def __init__(
        self,
        cfg: RerankerConfig,
        lm_cfg,  # models.causal_lm.CausalLMConfig
        params: Dict[str, Any],
        tokenizer,
        yes_token: str = "Yes",
        normalize: bool = True,
    ):
        import numpy as np

        self.cfg = cfg
        # group-folded GQA flash pays even at pair_len 192 for gemma's
        # 8q/1kv heads (2.54 -> 2.20 ms attention on v5e); scoring is
        # inference-only so the no-VJP kernel is safe here
        from rag_docvqa_tpu.ops.flash_attention import flash_wanted

        if not lm_cfg.flash_prefill and flash_wanted(128, cfg.pair_len):
            from dataclasses import replace as _replace

            lm_cfg = _replace(lm_cfg, flash_prefill=True)
        self.lm_cfg = lm_cfg
        self.params = params
        self.normalize = normalize
        self.yes_id = tokenizer.encode(yes_token)[0]
        prompt = (
            "Given a query A and a passage B, determine whether the passage "
            "contains an answer to the query by providing a prediction of "
            "either 'Yes' or 'No'."
        )
        self._prefix = jnp.asarray(np.asarray(tokenizer.encode("A:"), np.int32))
        self._mid = jnp.asarray(np.asarray(tokenizer.encode("B:"), np.int32))
        self._suffix = jnp.asarray(np.asarray(tokenizer.encode(prompt), np.int32))

    def __call__(self, batch: ChunkedBatch, ret: RetrievalResult) -> RetrievalResult:
        B, K = ret.top_k_idx.shape
        ids, mask, last = build_llm_pair_tokens(
            batch, ret.top_k_idx, self._prefix, self._mid, self._suffix, self.cfg,
            n_prefix=int(self._prefix.shape[0]),
            n_mid=int(self._mid.shape[0]),
            n_suffix=int(self._suffix.shape[0]),
        )
        scores = _llm_pair_yes_logits(self.params, self.lm_cfg, ids, mask, last, self.yes_id)
        scores = scores.reshape(B, K)
        if self.normalize:
            scores = jax.nn.sigmoid(scores)
        perm, new_valid, sorted_scores = rerank_select(scores, ret.top_k_valid, self.cfg)
        return apply_rerank(ret, perm, new_valid, sorted_scores)


@functools.partial(jax.jit, static_argnames=("lm_cfg", "yes_id"))
def _llm_pair_yes_logits(params, lm_cfg, ids, mask, last, yes_id: int) -> jax.Array:
    """Yes-token logit at the last prompt position, as ONE jitted program.

    Dots the final hidden state with just the yes column of the LM head —
    never materializes (B*K, T, V) logits (V can be 256k for Qwen/Gemma)."""
    from rag_docvqa_tpu.models import causal_lm

    h = causal_lm.forward_hidden(params, lm_cfg, ids, mask)  # (N, T, D)
    rows = jnp.arange(ids.shape[0])
    h_last = h[rows, last]  # (N, D)
    w = params["embed"][yes_id] if lm_cfg.tie_word_embeddings else params["lm_head"][:, yes_id]
    return jnp.dot(h_last, w.astype(h_last.dtype)).astype(jnp.float32)
