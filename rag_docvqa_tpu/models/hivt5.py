"""Hi-VT5: hierarchical multi-page encoder with page-token compression.

Reference (src/HiVT5.py): each page is encoded as
  [PAGE_p] x page_tokens ++ question ++ page words (+ spatial emb),
only the first `page_tokens` hidden states are kept per page, the
concatenation across pages forms the document embedding the decoder
cross-attends to (HiVT5.py:450-489,542-556), and a linear head over the
flattened document embedding predicts the answer page with a weighted CE loss
(PageRetrievalModule, src/_modules.py:148-175).

TPU design: the reference loops pages sequentially through the encoder
(HiVT5.py:78-104, the per-page hot loop). Here pages fold into the batch axis
— ONE encoder pass over (B*P, K+T) with page-validity masks — and the decoder
runs on the fixed-shape (B, P*K) document embedding. Page inputs are built on
device from the raw word arrays (ops/gather.assemble_page_rows), so the whole
forward jits end to end. Greedy decoding reuses the cached decode loop
(no vendored synced greedy_search / dist.all_reduce — HiVT5.py:153-386 is
obsolete under SPMD).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data.contract import ChunkedBatch
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig, init_spatial_params, spatial_embed
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.models.layers import normal_init
from rag_docvqa_tpu.ops.decode import greedy_decode
from rag_docvqa_tpu.ops.gather import AssembleConfig, assemble_page_rows


@dataclass(frozen=True)
class HiVT5Config:
    t5: t5m.T5Config = field(default_factory=t5m.T5Config)
    spatial: SpatialConfig = field(default_factory=SpatialConfig)
    page_tokens: int = 10  # configs/HiVT5.yml
    max_doc_pages: int = 20
    page_seq_len: int = 512  # per-page token budget (max_text_tokens)
    retrieval_loss_weight: float = 0.25  # page_retrieval_config loss_weight
    # per-page visual branch (HiVT5.py:471-489): ViT features + visual-box
    # spatial embeddings appended to each page's encoder input
    use_visual: bool = False
    vit: ViTConfig = field(default_factory=ViTConfig)


def init_hivt5_params(rng: jax.Array, cfg: HiVT5Config) -> Dict[str, Any]:
    ks = jax.random.split(rng, 6)
    d = cfg.t5.d_model
    params = {
        "t5": t5m.init_t5_params(ks[0], cfg.t5),
        "spatial": init_spatial_params(ks[1], cfg.spatial),
        # [PAGE_p] learnable tokens, one embedding per page position
        # (the reference adds [PAGE_i] tokens to the tokenizer, HiVT5.py:619-621)
        "page_emb": normal_init(ks[2], (cfg.max_doc_pages, d), 1.0),
        # PageRetrievalModule linear (src/_modules.py:153)
        "page_head": {
            "kernel": normal_init(ks[3], (cfg.max_doc_pages * cfg.page_tokens * d, cfg.max_doc_pages), 0.02),
            "bias": jnp.zeros((cfg.max_doc_pages,)),
        },
    }
    if cfg.use_visual:
        from rag_docvqa_tpu.models.vit import init_vit_params

        params["visual"] = {
            "vit": init_vit_params(ks[4], cfg.vit),
            "matcher": {
                "kernel": normal_init(ks[5], (cfg.vit.hidden_size, d), cfg.vit.hidden_size**-0.5),
                "bias": jnp.zeros((d,)),
            },
        }
    return params


def page_visual_features(params: Dict[str, Any], cfg: HiVT5Config, pixels: jax.Array) -> jax.Array:
    """(N, H, W, 3) page renders -> (N, 197, d_model) visual tokens with the
    visual-box spatial embedding summed in (HiVT5.py:466-469: visual_emb +
    spatial(get_visual_boxes(scale=1000)))."""
    from rag_docvqa_tpu.models.embeddings import get_visual_boxes
    from rag_docvqa_tpu.models.vit import vit_encode

    hidden = vit_encode(params["visual"]["vit"], cfg.vit, pixels)
    m = params["visual"]["matcher"]
    vis = jnp.dot(hidden, m["kernel"].astype(hidden.dtype)) + m["bias"].astype(hidden.dtype)
    grid = cfg.vit.image_size // cfg.vit.patch_size
    boxes = (get_visual_boxes(num_pages=1, scale=1000.0, grid=grid)[0]).astype(jnp.int32)  # (1+g*g, 4)
    box_emb = spatial_embed(params["spatial"], cfg.spatial, boxes[None])  # (1, T, D)
    return vis + box_emb.astype(vis.dtype)


def encode_document(
    params: Dict[str, Any],
    cfg: HiVT5Config,
    batch: ChunkedBatch,
    page_visual: jax.Array = None,  # (B, P, Tv, D) per-page visual tokens
    page_visual_valid: jax.Array = None,  # (B, P) bool: pages with a real image
    fused: bool = None,  # passthrough to t5.encode (None = auto)
) -> Tuple[jax.Array, jax.Array]:
    """Hierarchical encode: returns (doc_emb (B, P*K, D), doc_mask (B, P*K)).

    Page inputs come from the raw word arrays; the batch's prompt tokens
    ("question: ... context:") play the role of the reference's per-page
    question prefix (HiVT5.py:465-470). With page_visual, each page's visual
    tokens are appended after its text (HiVT5.py:471-472: cat(text, visual)).
    """
    B = batch.batch_size
    P, K = cfg.max_doc_pages, cfg.page_tokens
    pages = jnp.broadcast_to(jnp.arange(P)[None, :], (B, P))
    page_valid = pages < batch.num_pages[:, None]  # (B, P)

    acfg = AssembleConfig(max_source_length=cfg.page_seq_len, eos_token_id=cfg.t5.eos_id, pad_token_id=cfg.t5.pad_id)
    gen = assemble_page_rows(batch, pages, page_valid, acfg)  # rows = B*P

    # token embeddings: semantic + spatial
    x = params["t5"]["shared"][gen.input_ids]
    x = x + spatial_embed(params["spatial"], cfg.spatial, gen.input_boxes)

    # prepend K copies of this page's [PAGE_p] embedding
    page_tok = params["page_emb"][pages.reshape(B * P)]  # (B*P, D)
    page_tok = jnp.broadcast_to(page_tok[:, None, :], (B * P, K, x.shape[-1]))
    x = jnp.concatenate([page_tok.astype(x.dtype), x], axis=1)  # (B*P, K+T, D)
    mask = jnp.concatenate(
        [jnp.ones((B * P, K), bool), gen.attention_mask], axis=1
    )
    if page_visual is not None:
        Tv = page_visual.shape[2]
        x = jnp.concatenate([x, page_visual.reshape(B * P, Tv, -1).astype(x.dtype)], axis=1)
        # only pages with a REAL render contribute visual tokens (the
        # reference masks visual rows by page_idx_mask, _modules.py:137-141);
        # without the mask, zero-filled images would inject garbage features
        vis_valid = (
            page_visual_valid.reshape(B * P)[:, None]
            if page_visual_valid is not None
            else jnp.ones((B * P, 1), bool)
        )
        mask = jnp.concatenate([mask, jnp.broadcast_to(vis_valid, (B * P, Tv))], axis=1)
    mask = mask & page_valid.reshape(B * P)[:, None]

    hidden = t5m.encode(params["t5"], cfg.t5, x, mask, fused=fused)  # one pass, pages in batch
    compressed = hidden[:, :K, :]  # keep page summary tokens (HiVT5.py:489)
    doc_emb = compressed.reshape(B, P * K, -1)
    doc_mask = jnp.repeat(page_valid, K, axis=1)  # (B, P*K)
    # zero padded-page positions: their rows are all-keys-masked softmax
    # garbage (content-dependent), and page_retrieval_logits flattens the
    # WHOLE doc_emb into the page head — masked rows must be inert
    doc_emb = doc_emb * doc_mask[..., None].astype(doc_emb.dtype)
    return doc_emb, doc_mask


def page_retrieval_logits(params: Dict[str, Any], cfg: HiVT5Config, doc_emb: jax.Array) -> jax.Array:
    """(B, max_doc_pages) page logits from the flattened document embedding."""
    B = doc_emb.shape[0]
    flat = doc_emb.reshape(B, -1).astype(jnp.float32)
    h = params["page_head"]
    return flat @ h["kernel"] + h["bias"]


def forward_train(
    params: Dict[str, Any],
    cfg: HiVT5Config,
    batch: ChunkedBatch,
    labels: jax.Array,  # (B, Td) with -100 padding
    page_visual: jax.Array = None,
    page_visual_valid: jax.Array = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (total loss, {'lm_loss', 'ret_loss', 'ret_logits'}).

    total = LM CE + retrieval_loss_weight * page CE (train.py:69,
    _modules.py:173)."""
    # fused="train" (whole-layer fwd + handwritten Pallas bwd); t5m.encode
    # gates it against the EXACT pages-in-batch sequence it assembles
    # (K + T + Tv) and falls back to the flash fwd+bwd pair when the
    # kernels don't fit
    doc_emb, doc_mask = encode_document(params, cfg, batch, page_visual, page_visual_valid, fused="train")
    dec_in = t5m.shift_tokens_right(labels, cfg.t5.pad_id, cfg.t5.decoder_start_token_id)
    logits = t5m.decode_train(params["t5"], cfg.t5, dec_in, doc_emb, doc_mask)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    lm_loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    ret_logits = page_retrieval_logits(params, cfg, doc_emb)
    page_valid = jnp.arange(cfg.max_doc_pages)[None, :] < batch.num_pages[:, None]
    masked_logits = jnp.where(page_valid, ret_logits, -1e9)
    ret_nll = -jnp.take_along_axis(
        jax.nn.log_softmax(masked_logits, axis=-1), batch.answer_page[:, None], axis=-1
    )[:, 0]
    ret_loss = jnp.mean(ret_nll) * cfg.retrieval_loss_weight
    return lm_loss + ret_loss, {"lm_loss": lm_loss, "ret_loss": ret_loss, "ret_logits": ret_logits}


def attention_viz(
    params: Dict[str, Any],
    cfg: HiVT5Config,
    batch: ChunkedBatch,
    labels: jax.Array,  # (B, Td) decoder targets (or generated ids)
    page_visual: jax.Array = None,
    page_visual_valid: jax.Array = None,
) -> Dict[str, jax.Array]:
    """Attention extraction for visualization (reference HiVT5.py:782-851:
    decoder cross-attentions over the compressed document embedding, mapped
    back to pages). Returns:

      * "cross_attn":     (L, B, H, Td, P*K) raw cross-attention probs
      * "page_relevance": (B, P) attention mass per page, averaged over
                          layers/heads/steps and renormalized over valid pages
    """
    doc_emb, doc_mask = encode_document(params, cfg, batch, page_visual, page_visual_valid)
    dec_in = t5m.shift_tokens_right(labels, cfg.t5.pad_id, cfg.t5.decoder_start_token_id)
    _, cross = t5m.decode_train(
        params["t5"], cfg.t5, dec_in, doc_emb, doc_mask, return_cross_attn=True
    )  # (L, B, H, Td, P*K)
    P, K = cfg.max_doc_pages, cfg.page_tokens
    mass = jnp.mean(cross.astype(jnp.float32), axis=(0, 2, 3))  # (B, P*K)
    page_mass = mass.reshape(-1, P, K).sum(axis=-1)  # (B, P)
    page_valid = jnp.arange(P)[None, :] < batch.num_pages[:, None]
    page_mass = jnp.where(page_valid, page_mass, 0.0)
    page_rel = page_mass / jnp.clip(jnp.sum(page_mass, axis=-1, keepdims=True), 1e-9)
    return {"cross_attn": cross, "page_relevance": page_rel}


def generate(
    params: Dict[str, Any],
    cfg: HiVT5Config,
    batch: ChunkedBatch,
    max_new_tokens: int = 100,
    page_visual: jax.Array = None,
    page_visual_valid: jax.Array = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy decode over the compressed document embedding.

    Returns (tokens, confidence, pred_page): pred_page from the retrieval head
    (the reference's last-step argmax quirk HiVT5.py:772-778 is replaced by
    the head it was meant to use — the ret_logits path)."""
    doc_emb, doc_mask = encode_document(params, cfg, batch, page_visual, page_visual_valid)
    tokens, conf = greedy_decode(params["t5"], cfg.t5, doc_emb, doc_mask, max_new_tokens)
    ret_logits = page_retrieval_logits(params, cfg, doc_emb)
    page_valid = jnp.arange(cfg.max_doc_pages)[None, :] < batch.num_pages[:, None]
    pred_page = jnp.argmax(jnp.where(page_valid, ret_logits, -1e9), axis=-1)
    return tokens, conf, pred_page
