"""Device-side assembly of generator inputs from retrieval output.

Replaces the reference's host-side glue between Retriever and VT5:

  * surrounding-word expansion with dedup  (src/_modules.py:2022-2091)
  * chunk compaction / bbox union          (src/_modules.py:2093,1102-1132)
  * flatten with optional <sep>            (src/RAGVT5.py:365-370,
                                            src/utils.py:233-253)
  * prompt + per-token boxes + EOS + pad   (src/VT5.py:131-226)

Semantics ("slot" = word occurrence, see data/contract.py):

  1. Top-k chunk r covers slot window [start_r - s, end_r + s) clamped to its
     page's slot range.
  2. A slot is OWNED by the first (best-ranked) chunk whose window covers it —
     this reproduces the reference's `included_word_indices` dedup exactly.
  3. Output word order = ranks in retrieval order, slots in page order within
     each rank (the reference appends `new_word_indices` in ascending index
     order per rank).
  4. Generator input = prompt tokens ++ flattened slot tokens (optional sep
     token between rank groups) ++ EOS, truncated to max_source_length with
     the EOS always kept (src/VT5.py:166-170).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data.contract import ChunkedBatch, GeneratorInputs

# layout label values used by the reference for non-content tokens
# (src/VT5.py:133-137)
PROMPT_LABEL = 4
EOS_LABEL = 4
PAD_LABEL = 4
PROMPT_BOX = (0, 0, 1000, 1000)


@dataclass(frozen=True)
class AssembleConfig:
    max_source_length: int = 512
    include_surroundings: int = 0
    sep_token_id: int = 0  # 0 disables sep insertion
    eos_token_id: int = 1
    pad_token_id: int = 0


# --------------------------------------------------------------------------- #
# ownership
# --------------------------------------------------------------------------- #
def compute_ownership(
    batch: ChunkedBatch,
    top_k_idx: jax.Array,  # (B, K)
    top_k_valid: jax.Array,  # (B, K)
    include_surroundings: int,
) -> jax.Array:
    """Returns owner (B, W) int32: rank of the first covering chunk, else K."""
    B, K = top_k_idx.shape
    W = batch.slot_mask.shape[1]
    start = jnp.take_along_axis(batch.chunk_slot_start, top_k_idx, axis=1)  # (B, K)
    length = jnp.take_along_axis(batch.chunk_slot_len, top_k_idx, axis=1)
    page = jnp.take_along_axis(batch.chunk_page, top_k_idx, axis=1)
    p_start = jnp.take_along_axis(batch.page_slot_start, page, axis=1)
    p_end = jnp.take_along_axis(batch.page_slot_end, page, axis=1)
    lo = jnp.maximum(p_start, start - include_surroundings)  # (B, K)
    hi = jnp.minimum(p_end, start + length + include_surroundings)

    g = jnp.arange(W)[None, None, :]  # (1, 1, W)
    covered = (g >= lo[:, :, None]) & (g < hi[:, :, None]) & top_k_valid[:, :, None]  # (B, K, W)
    rank = jnp.arange(K)[None, :, None]
    owner = jnp.min(jnp.where(covered, rank, K), axis=1)  # (B, W)
    return jnp.where(batch.slot_mask, owner, K).astype(jnp.int32)


def group_boxes(batch: ChunkedBatch, owner: jax.Array, K: int) -> jax.Array:
    """Per-rank bbox union of owned slots; empty group -> [0, 0, 1, 1]
    (src/_modules.py:1120-1128)."""
    onehot = owner[:, None, :] == jnp.arange(K)[None, :, None]  # (B, K, W)
    box = batch.slot_box[:, None, :, :]  # (B, 1, W, 4)
    big = 1e9
    mins = jnp.min(jnp.where(onehot[..., None], box, big), axis=2)  # (B, K, 4)
    maxs = jnp.max(jnp.where(onehot[..., None], box, -big), axis=2)
    out = jnp.stack([mins[..., 0], mins[..., 1], maxs[..., 2], maxs[..., 3]], axis=-1)
    empty = ~jnp.any(onehot, axis=2)
    fallback = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    return jnp.where(empty[..., None], fallback, out)


# --------------------------------------------------------------------------- #
# token assembly
# --------------------------------------------------------------------------- #
def _exclusive_cumsum(x: jax.Array) -> jax.Array:
    return jnp.cumsum(x, axis=-1) - x


def _flatten_tokens(
    order_tokens: jax.Array,  # (B, M, TW) int32, in output word order
    order_ntok: jax.Array,  # (B, M) int32, 0 for dropped slots
    order_box: jax.Array,  # (B, M, 4) int32 scaled boxes
    order_label: jax.Array,  # (B, M) int32
    prompt_tokens: jax.Array,  # (B, LP)
    prompt_len: jax.Array,  # (B,)
    cfg: AssembleConfig,
) -> GeneratorInputs:
    """Payloads already in output word order: delegate to `_flatten_tokens_src`
    with an identity slot permutation (one flatten implementation — the
    gather-formulation rationale lives on `_flatten_tokens_src`)."""
    B, M, _ = order_tokens.shape
    identity = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32)[None, :], (B, M))
    return _flatten_tokens_src(
        identity, order_ntok, order_tokens, order_box, order_label,
        prompt_tokens, prompt_len, cfg,
    )


def _flatten_tokens_src(
    order: jax.Array,  # (B, M) permutation: output slot position -> source index
    order_ntok: jax.Array,  # (B, M) int32 in ORDERED positions, 0 for dropped
    src_tokens: jax.Array,  # (B0, M, TW) payload in SOURCE order
    src_box: jax.Array,  # (B0, M, 4) int32 scaled boxes, source order
    src_label: jax.Array,  # (B0, M) int32, source order
    prompt_tokens: jax.Array,  # (B, LP)
    prompt_len: jax.Array,  # (B,)
    cfg: AssembleConfig,
) -> GeneratorInputs:
    """`_flatten_tokens` with the slot permutation COMPOSED into the final
    (B, S) gathers instead of applied to the payloads: physically permuting
    the (B, M, TW) tokens + (B, M, 4) boxes through take_along_axis measured
    ~7 ms of the 14 ms assembly stage at B=128 W=2048 on v5e (the argsort
    itself is 1.8 ms) — composing indices gathers each payload exactly once
    at the (B, S=512) output size.

    The payload arrays may be shared across row groups: with B = B0 * R
    output rows, source batch b = row // R (per-chunk / per-page rows reuse
    one sample's slots R times without materializing the broadcast)."""
    B, M = order.shape
    B0, _, TW = src_tokens.shape
    R = B // B0
    S = cfg.max_source_length
    lp = prompt_tokens.shape[1]

    offsets = prompt_len[:, None] + _exclusive_cumsum(order_ntok)  # (B, M)
    total = prompt_len + jnp.sum(order_ntok, axis=-1)  # (B,)
    eos_pos = jnp.minimum(total, S - 1)

    bounds = jnp.zeros((B, S), jnp.int32)
    bounds = bounds.at[jnp.arange(B)[:, None], offsets].add(1, mode="drop")
    m_i = jnp.clip(jnp.cumsum(bounds, axis=1) - 1, 0, M - 1)  # (B, S)

    src_off = jnp.take_along_axis(offsets, m_i, axis=1)  # (B, S)
    i_pos = jnp.arange(S)[None, :]
    t_i = jnp.clip(i_pos - src_off, 0, TW - 1)  # (B, S)

    src_m = jnp.take_along_axis(order, m_i, axis=1)  # (B, S) source slot
    b_idx = (jnp.arange(B) // R)[:, None]  # (B, 1) source batch row
    flat_tok = src_tokens.reshape(B0, M * TW)
    content_ids = flat_tok[b_idx, src_m * TW + t_i]  # (B, S)
    content_box = src_box[b_idx, src_m]  # (B, S, 4)
    content_lab = src_label[b_idx, src_m]  # (B, S)

    prompt_ids = jnp.take_along_axis(prompt_tokens, jnp.minimum(i_pos, lp - 1), axis=1)

    is_eos = i_pos == eos_pos[:, None]
    is_prompt = i_pos < prompt_len[:, None]
    is_content = (i_pos >= prompt_len[:, None]) & (i_pos < eos_pos[:, None])
    out_ids = jnp.where(
        is_eos, cfg.eos_token_id,
        jnp.where(is_prompt, prompt_ids, jnp.where(is_content, content_ids, cfg.pad_token_id)),
    ).astype(jnp.int32)
    pbox = jnp.asarray(PROMPT_BOX, jnp.int32)[None, None, :]
    out_box = jnp.where(
        is_eos[..., None], 0,
        jnp.where(is_prompt[..., None], pbox, jnp.where(is_content[..., None], content_box, 0)),
    ).astype(jnp.int32)
    out_lab = jnp.where(
        is_eos, EOS_LABEL,
        jnp.where(is_prompt, PROMPT_LABEL, jnp.where(is_content, content_lab, PAD_LABEL)),
    ).astype(jnp.int32)

    mask = i_pos <= eos_pos[:, None]
    return GeneratorInputs(
        input_ids=out_ids, input_boxes=out_box, input_labels=out_lab, attention_mask=mask
    )


def _ordered_slots(
    batch: ChunkedBatch,
    owner: jax.Array,  # (B, W) in [0..K]
    K: int,
    sep_token_id: int,
):
    """Sort slots by (owner rank, slot index); prepend a sep pseudo-slot to
    each non-empty group r > 0 when sep_token_id != 0. Returns ordered
    (tokens, ntok, box_int, label)."""
    B, W = owner.shape
    TW = batch.slot_tokens.shape[2]
    g = jnp.arange(W)[None, :]

    box_int = (batch.slot_box * 1000).astype(jnp.int32)

    if sep_token_id != 0:
        # sep pseudo-slots: one per rank, sorted to the front of its group
        group_nonempty = jnp.stack([jnp.any(owner == r, axis=1) for r in range(K)], axis=1)
        sep_active = group_nonempty & (jnp.arange(K)[None, :] > 0)  # (B, K)
        sep_owner = jnp.where(sep_active, jnp.arange(K)[None, :], K)
        sep_tokens = jnp.zeros((B, K, TW), jnp.int32).at[:, :, 0].set(sep_token_id)
        sep_ntok = jnp.where(sep_active, 1, 0).astype(jnp.int32)
        sep_box = jnp.zeros((B, K, 4), jnp.int32)  # flatten() sep box [0,0,0,0]
        sep_label = jnp.zeros((B, K), jnp.int32)  # flatten() sep label 0

        all_owner = jnp.concatenate([owner, sep_owner], axis=1)  # (B, W+K)
        # key: real slot at owner*(W+2) + g + 1; sep at owner*(W+2) (group head)
        key = jnp.concatenate(
            [owner * (W + 2) + g + 1, sep_owner * (W + 2)], axis=1
        )
        all_tokens = jnp.concatenate([batch.slot_tokens, sep_tokens], axis=1)
        all_ntok = jnp.concatenate([batch.slot_ntok, sep_ntok], axis=1)
        all_box = jnp.concatenate([box_int, sep_box], axis=1)
        all_label = jnp.concatenate([batch.slot_label, sep_label], axis=1)
    else:
        all_owner = owner
        key = owner * (W + 2) + g + 1
        all_tokens, all_ntok, all_box, all_label = (
            batch.slot_tokens,
            batch.slot_ntok,
            box_int,
            batch.slot_label,
        )

    order = jnp.argsort(key, axis=1)  # stable; the sort itself is ~2 ms
    # only the (B, M) scalars are physically ordered; the payloads stay in
    # source order and _flatten_tokens_src composes `order` into its gathers
    o_owner = jnp.take_along_axis(all_owner, order, axis=1)
    o_ntok = jnp.where(o_owner < K, jnp.take_along_axis(all_ntok, order, axis=1), 0)
    return order, o_ntok, all_tokens, all_box, all_label


@functools.partial(jax.jit, static_argnames=("cfg",))
def assemble_concat(
    batch: ChunkedBatch,
    top_k_idx: jax.Array,  # (B, K)
    top_k_valid: jax.Array,  # (B, K)
    cfg: AssembleConfig,
) -> Tuple[GeneratorInputs, jax.Array]:
    """Concat strategy (src/RAGVT5.py:365-384): all top-k groups flattened
    into one generator input per sample. Returns (inputs, owner)."""
    K = top_k_idx.shape[1]
    owner = compute_ownership(batch, top_k_idx, top_k_valid, cfg.include_surroundings)
    order, o_ntok, src_tokens, src_box, src_label = _ordered_slots(
        batch, owner, K, cfg.sep_token_id
    )
    gen = _flatten_tokens_src(
        order, o_ntok, src_tokens, src_box, src_label,
        batch.prompt_tokens, batch.prompt_len, cfg,
    )
    return gen, owner


@functools.partial(jax.jit, static_argnames=("cfg", "seq_len"))
def assemble_per_chunk(
    batch: ChunkedBatch,
    top_k_idx: jax.Array,  # (B, K)
    top_k_valid: jax.Array,  # (B, K)
    cfg: AssembleConfig,
    seq_len: int = 256,
) -> Tuple[GeneratorInputs, jax.Array, jax.Array]:
    """Per-chunk strategies (maxconf/anyconf, src/RAGVT5.py:386-454): one
    generator row per (sample, rank). Returns (inputs with N = B*K rows,
    owner, row_valid (B, K) — ranks with no words are invalid, matching the
    reference's empty-chunk filtering src/RAGVT5.py:394-397)."""
    B, K = top_k_idx.shape
    W = batch.slot_mask.shape[1]
    owner = compute_ownership(batch, top_k_idx, top_k_valid, cfg.include_surroundings)

    # order slots by slot index within each rank: mask per (b, r)
    onehot = owner[:, None, :] == jnp.arange(K)[None, :, None]  # (B, K, W)
    g = jnp.arange(W)[None, None, :]
    key = jnp.where(onehot, g, W)  # invalid slots last
    order = jnp.argsort(key, axis=2)  # (B, K, W)
    n_sel = jnp.sum(onehot, axis=2)  # (B, K)

    # only the (B, K, W) ntok scalars are physically ordered; the payloads
    # stay at (B, W, ...) and _flatten_tokens_src reuses them across the K
    # rows of each sample (b = row // K) — no (B, K, W, TW) materialization
    sel_ntok = jnp.take_along_axis(jnp.broadcast_to(batch.slot_ntok[:, None], (B, K, W)), order, axis=2)
    rank_pos = jnp.arange(W)[None, None, :]
    sel_ntok = jnp.where(rank_pos < n_sel[:, :, None], sel_ntok, 0)

    # flatten (B, K) -> rows
    row_cfg = AssembleConfig(
        max_source_length=seq_len,
        include_surroundings=cfg.include_surroundings,
        sep_token_id=0,
        eos_token_id=cfg.eos_token_id,
        pad_token_id=cfg.pad_token_id,
    )
    prompt_rows = jnp.broadcast_to(batch.prompt_tokens[:, None], (B, K, batch.prompt_tokens.shape[1]))
    plen_rows = jnp.broadcast_to(batch.prompt_len[:, None], (B, K))
    gen = _flatten_tokens_src(
        order.reshape(B * K, W),
        sel_ntok.reshape(B * K, W),
        batch.slot_tokens,
        (batch.slot_box * 1000).astype(jnp.int32),
        batch.slot_label,
        prompt_rows.reshape(B * K, -1),
        plen_rows.reshape(B * K),
        row_cfg,
    )
    row_valid = (n_sel > 0) & top_k_valid
    return gen, owner, row_valid


@functools.partial(jax.jit, static_argnames=("cfg",))
def assemble_page_rows(
    batch: ChunkedBatch,
    pages: jax.Array,  # (B, K) page index per output row
    row_valid: jax.Array,  # (B, K)
    cfg: AssembleConfig,
) -> GeneratorInputs:
    """Whole-page generator rows from the RAW word arrays (original page word
    order, no chunk duplication) — the reference's page-level strategies index
    batch["words"][b][page] directly (src/RAGVT5.py:401-408,478-482).

    Works for K == 1 (majorpage: one row per sample) and K == top-k
    (maxconfpage/anyconfpage: one row per retrieved chunk's page)."""
    B, K = pages.shape
    R = batch.raw_mask.shape[1]
    lo = jnp.take_along_axis(batch.page_raw_start, pages, axis=1)  # (B, K)
    hi = jnp.take_along_axis(batch.page_raw_end, pages, axis=1)
    g = jnp.arange(R)[None, None, :]
    in_win = (g >= lo[:, :, None]) & (g < hi[:, :, None]) & row_valid[:, :, None]  # (B, K, R)

    ntok = jnp.where(in_win, batch.raw_ntok[:, None, :], 0)  # (B, K, R)

    prompt_rows = jnp.broadcast_to(batch.prompt_tokens[:, None], (B, K, batch.prompt_tokens.shape[1]))
    plen_rows = jnp.broadcast_to(batch.prompt_len[:, None], (B, K))
    # page rows keep the raw word order (identity permutation); the raw
    # payloads are shared across each sample's K rows inside the flatten
    order = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None, :], (B * K, R))
    return _flatten_tokens_src(
        order,
        ntok.reshape(B * K, R),
        batch.raw_tokens,
        (batch.raw_box * 1000).astype(jnp.int32),
        batch.raw_label,
        prompt_rows.reshape(B * K, -1),
        plen_rows.reshape(B * K),
        cfg,
    )
