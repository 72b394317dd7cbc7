"""RAG-VT5 engine: embed -> retrieve -> assemble -> generate, on device.

Equivalent of the reference RAGVT5 (src/RAGVT5.py). All nine page-retrieval
answering strategies (src/RAGVT5.py:318-527, SURVEY.md §2.7) are implemented
as jitted device pipelines over the fixed-shape ChunkedBatch; the host only
tokenizes at ingest and detokenizes answers.

Strategy map (reference -> here):
  oracle          GT page's whole-page chunk              (RAGVT5.py:298-299,365)
  concat          flatten top-k groups into one input     (RAGVT5.py:365-384)
  maxconf         one generate row per chunk, argmax conf (RAGVT5.py:386-454)
  anyconf         same rows, keep all answers             (metrics max-over-k)
  maxconfpage     rows = whole page of each chunk         (RAGVT5.py:401-408)
  anyconfpage     same, keep all answers
  anyconforacle   anyconf with GT page indices reported   (RAGVT5.py:300-301)
  majorpage       (weighted) page vote -> one page row    (RAGVT5.py:455-486)
  weightmajorpage weights = top-k similarities*
  none            no RAG: all words of the document       (RAGVT5.py:342-354)

*divergence note: without a reranker the reference zips top-k pages against
the FULL similarity vector (RAGVT5.py:460-472), misaligning weights; we use
the top-k-aligned similarities (the intended semantics, and what the reference
computes when the reranker is active).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data.contract import ChunkedBatch, GeneratorInputs, RetrievalResult
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embedder import vt5_table_embed
from rag_docvqa_tpu.ops.gather import (
    AssembleConfig,
    assemble_concat,
    assemble_page_rows,
    assemble_per_chunk,
    compute_ownership,
    group_boxes,
)
from rag_docvqa_tpu.ops.topk import NEG_INF, masked_topk

STRATEGIES = (
    "oracle",
    "concat",
    "maxconf",
    "anyconf",
    "maxconfpage",
    "anyconfpage",
    "anyconforacle",
    "majorpage",
    "weightmajorpage",
    "none",
)


@dataclass(frozen=True)
class RAGConfig:
    page_retrieval: str = "concat"
    chunk_num: int = 10  # k
    include_surroundings: int = 0
    sep_token_id: int = 0  # nonzero enables <sep> between chunk groups
    max_source_length: int = 512
    per_chunk_seq_len: int = 256
    max_new_tokens: int = 100
    embed_backend: str = "VT5"
    use_visual: bool = False  # feed DiT visual tokens of retrieved patches
    # sort retrieved chunks into document reading order before assembly
    # (reference's optional reorder, src/_modules.py:2129-2142)
    reorder_chunks: bool = False

    def __post_init__(self):
        assert self.page_retrieval in STRATEGIES, self.page_retrieval

    def assemble(self) -> AssembleConfig:
        return AssembleConfig(
            max_source_length=self.max_source_length,
            include_surroundings=self.include_surroundings,
            sep_token_id=self.sep_token_id,
        )


# --------------------------------------------------------------------------- #
# jitted device pipelines
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("k", "oracle"))
def retrieve_device(
    shared: jax.Array,  # (V, D) embedding table (VT5 backend)
    batch: ChunkedBatch,
    k: int,
    oracle: bool = False,
) -> RetrievalResult:
    """Per-sample cosine top-k over the sample's chunks.

    (Corpus-scale retrieval over a shared chunk index uses
    parallel.index.ShardedIndex; this per-sample path mirrors the reference's
    online_retrieve, src/RAGVT5.py:153-316.)
    """
    chunk_emb = vt5_table_embed(shared, batch.chunk_emb_tokens, batch.chunk_emb_mask)
    q_emb = vt5_table_embed(shared, batch.q_tokens, batch.q_mask)
    # cosine with the reference's eps placement (src/_modules.py:1990-1993)
    dots = jnp.einsum("bcd,bd->bc", chunk_emb, q_emb)
    norms = jnp.linalg.norm(chunk_emb, axis=-1) * jnp.linalg.norm(q_emb, axis=-1, keepdims=True)
    sims = dots / (norms + 1e-8)
    sims = jnp.where(batch.chunk_mask, sims, NEG_INF)

    if oracle:
        # the single whole-page chunk of the GT answer page
        is_answer = batch.chunk_mask & (batch.chunk_page == batch.answer_page[:, None])
        idx = jnp.argmax(is_answer, axis=1)[:, None]  # (B, 1)
        valid = jnp.any(is_answer, axis=1)[:, None]
        vals = jnp.take_along_axis(sims, idx, axis=1)
    else:
        vals, idx, valid = masked_topk(sims, batch.chunk_mask, k)

    return RetrievalResult(
        top_k_idx=idx,
        top_k_valid=valid,
        top_k_score=vals,
        top_k_page=jnp.take_along_axis(batch.chunk_page, idx, axis=1),
        top_k_label=jnp.take_along_axis(batch.chunk_label, idx, axis=1),
        top_k_box=jnp.take_along_axis(batch.chunk_box, idx[..., None], axis=1),
        similarities=sims,
    )


@functools.partial(jax.jit, static_argnames=("vt5_cfg",))
def encode_device(
    params: Dict[str, Any],
    vt5_cfg: vt5m.VT5Config,
    gen: GeneratorInputs,
    visual: Optional[jax.Array] = None,
):
    """Assembled-inputs -> encoder hidden states + mask (one program)."""
    embeds, mask = vt5m.input_embeds(params, vt5_cfg, gen, visual)
    from rag_docvqa_tpu.models import t5 as _t5m

    return _t5m.encode(params["t5"], vt5_cfg.t5, embeds, mask), mask


def generate_device(
    params: Dict[str, Any],
    vt5_cfg: vt5m.VT5Config,
    gen: GeneratorInputs,
    max_new_tokens: int,
    visual: Optional[jax.Array] = None,
):
    """Split-dispatch generation: encode / cache build / decode loop as
    separate XLA programs (ops/decode.py::greedy_decode_split — the decode
    loop runs ~2.5x faster when the cross-KV cache arrives as a program
    input instead of being built in-program). Bit-identical to the former
    single-program `vt5m.generate` jit."""
    from rag_docvqa_tpu.ops.decode import greedy_decode_split

    enc, mask = encode_device(params, vt5_cfg, gen, visual)
    return greedy_decode_split(params["t5"], vt5_cfg.t5, enc, mask, max_new_tokens)


@functools.partial(jax.jit, static_argnames=("weighted", "n_pages"))
def majority_page_device(ret: RetrievalResult, weighted: bool, n_pages: int = 4096) -> jax.Array:
    """(Similarity-)weighted page vote over top-k chunks (RAGVT5.py:455-477).
    Returns (B,) page indices; samples with no valid chunks vote page 0.
    `n_pages` bounds the vote buffer — engines pass the batch's static page
    cap so arbitrarily long documents never silently mis-vote."""
    B, K = ret.top_k_page.shape
    w = jnp.where(ret.top_k_valid, ret.top_k_score if weighted else 1.0, 0.0)
    votes = jnp.zeros((B, n_pages)).at[jnp.arange(B)[:, None], ret.top_k_page].add(w)
    return jnp.argmax(votes, axis=1).astype(jnp.int32)


@jax.jit
def reading_order_device(ret: RetrievalResult, batch: ChunkedBatch) -> RetrievalResult:
    """Reorder the top-k chunks into document reading order — ascending
    (page, slot_start) — keeping invalid rows at the end (the reference's
    optional `reorder_chunks` in retrieval output assembly,
    src/_modules.py:2129-2142)."""
    start = jnp.take_along_axis(batch.chunk_slot_start, ret.top_k_idx, axis=1)
    W = batch.slot_mask.shape[1]
    key = ret.top_k_page * (W + 1) + start  # (B, K), lexicographic (page, pos)
    key = jnp.where(ret.top_k_valid, key, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(key, axis=1, stable=True)
    take = lambda x: jnp.take_along_axis(x, order, axis=1)
    return RetrievalResult(
        top_k_idx=take(ret.top_k_idx),
        top_k_valid=take(ret.top_k_valid),
        top_k_score=take(ret.top_k_score),
        top_k_page=take(ret.top_k_page),
        top_k_label=take(ret.top_k_label),
        top_k_box=jnp.take_along_axis(ret.top_k_box, order[..., None], axis=1),
        similarities=ret.similarities,
    )


# --------------------------------------------------------------------------- #
# engine
# --------------------------------------------------------------------------- #
class RAGVT5Engine:
    """Host-facing engine: owns params + tokenizer, drives jitted pipelines."""

    def __init__(
        self,
        rag_cfg: RAGConfig,
        vt5_cfg: vt5m.VT5Config,
        params: Dict[str, Any],
        tokenizer,
        reranker=None,  # engine.reranker.Reranker (src/RAGVT5.py:101-104)
        nac=None,  # (nac_params, threshold) — models/nac.py (src/RAGVT5.py:106-115)
    ):
        self.cfg = rag_cfg
        self.vt5_cfg = vt5_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.reranker = reranker
        self.nac = nac
        # fused flash encoder attention where it beats XLA (2.15x at T=512)
        from rag_docvqa_tpu.ops.flash_attention import flash_wanted

        if not vt5_cfg.t5.flash_encoder and flash_wanted(256, rag_cfg.max_source_length):
            from dataclasses import replace as _replace

            self.vt5_cfg = _replace(vt5_cfg, t5=_replace(vt5_cfg.t5, flash_encoder=True))

    # ------------------------------------------------------------------ #
    def retrieve(self, batch: ChunkedBatch) -> RetrievalResult:
        return retrieve_device(
            self.params["t5"]["shared"],
            batch,
            k=self.cfg.chunk_num,
            oracle=self.cfg.page_retrieval in ("oracle",),
        )

    # ------------------------------------------------------------------ #
    def inference(self, batch: ChunkedBatch, aux: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        import time as _time

        cfg = self.cfg
        strategy = cfg.page_retrieval
        B = batch.batch_size
        acfg = cfg.assemble()
        _t0 = _time.time()

        if strategy == "none":
            pages = jnp.zeros((B, 1), jnp.int32)
            # whole document: a single pseudo-window over all raw words is
            # emulated by generating per page 0..P-1? The reference flattens
            # every page's words into one input (RAGVT5.py:342-354); we build
            # one row spanning all raw slots.
            gen = _assemble_full_doc(batch, acfg)
            tokens, conf = generate_device(self.params, self.vt5_cfg, gen, cfg.max_new_tokens)
            answers = self._decode(tokens)
            return self._result(
                answers=answers,
                confidences=np.asarray(conf).tolist(),
                pred_answer_pages=[[0] for _ in range(B)],
                ret=None,
                batch=batch,
                aux=aux,
            )

        ret = self.retrieve(batch)
        if self.reranker is not None and strategy != "oracle":
            ret = self.reranker(batch, ret)
        if cfg.reorder_chunks and strategy != "oracle":
            ret = reading_order_device(ret, batch)
        jax.block_until_ready(ret.top_k_idx)
        _t_retrieval = _time.time() - _t0
        _t0 = _time.time()
        K = ret.top_k_idx.shape[1]

        if strategy in ("oracle", "concat"):
            gen, owner = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, acfg)
            visual = self._visual(batch, aux, owner, ret, rows="grid")
            tokens, conf = generate_device(
                self.params, self.vt5_cfg, gen, cfg.max_new_tokens, visual=visual
            )
            answers = self._decode(tokens)
            confs = np.asarray(conf).tolist()
            if self.nac is not None:
                answers, confs, nac_probs = self._apply_nac(gen, answers, confs)

        elif strategy in ("maxconf", "anyconf", "anyconforacle"):
            gen, owner, row_valid = assemble_per_chunk(
                batch, ret.top_k_idx, ret.top_k_valid, acfg, seq_len=cfg.per_chunk_seq_len
            )
            row_cfg = AssembleConfig(max_source_length=cfg.per_chunk_seq_len)
            tokens, conf = generate_device(self.params, self.vt5_cfg, gen, cfg.max_new_tokens)
            answers, confs = self._select_rows(tokens, conf, row_valid, B, K, strategy.startswith("any"))

        elif strategy in ("maxconfpage", "anyconfpage"):
            row_cfg = AssembleConfig(max_source_length=cfg.max_source_length)
            gen = assemble_page_rows(batch, ret.top_k_page, ret.top_k_valid, row_cfg)
            owner = compute_ownership(batch, ret.top_k_idx, ret.top_k_valid, cfg.include_surroundings)
            tokens, conf = generate_device(self.params, self.vt5_cfg, gen, cfg.max_new_tokens)
            answers, confs = self._select_rows(tokens, conf, np.asarray(ret.top_k_valid), B, K, strategy.startswith("any"))

        elif strategy in ("majorpage", "weightmajorpage"):
            major = majority_page_device(
                ret,
                weighted=strategy == "weightmajorpage",
                n_pages=int(batch.page_slot_start.shape[1]),
            )
            row_cfg = AssembleConfig(max_source_length=cfg.max_source_length)
            gen = assemble_page_rows(batch, major[:, None], jnp.ones((B, 1), bool), row_cfg)
            owner = compute_ownership(batch, ret.top_k_idx, ret.top_k_valid, cfg.include_surroundings)
            tokens, conf = generate_device(self.params, self.vt5_cfg, gen, cfg.max_new_tokens)
            answers = self._decode(tokens)
            confs = np.asarray(conf).tolist()
        else:
            raise ValueError(strategy)

        # predicted pages: GT for oracle modes (RAGVT5.py:298-301), the vote
        # winner for majority modes, else top-k pages
        valid_np = np.asarray(ret.top_k_valid)
        if strategy == "oracle":
            pages = [[int(batch.answer_page[b])] for b in range(B)]
        elif strategy == "anyconforacle":
            pages = [[int(batch.answer_page[b])] * int(valid_np[b].sum()) for b in range(B)]
        elif strategy in ("majorpage", "weightmajorpage"):
            pages = [int(p) for p in np.asarray(major)]
        else:
            pages_np = np.asarray(ret.top_k_page)
            pages = [pages_np[b][valid_np[b]].tolist() for b in range(B)]

        result = self._result(
            answers=answers,
            confidences=confs,
            pred_answer_pages=pages,
            ret=ret,
            batch=batch,
            aux=aux,
            owner=owner,
            nac_probs=locals().get("nac_probs"),
        )
        # timing splits (reference RAGVT5.py:326-356,488-507)
        result["retrieval"]["retrieval_time"] = _t_retrieval
        result["retrieval"]["generation_time"] = _time.time() - _t0
        return result

    # ------------------------------------------------------------------ #
    def _visual(self, batch, aux, owner, ret, rows: str = "grid"):
        """Visual tokens of the retrieved patches (src/RAGVT5.py:378: concat
        mode grid-packs the top-k patch crops into one image per sample and
        feeds it through DiT). Returns (B, 197, D) features or None when the
        visual branch is disabled / images are unavailable."""
        if not (self.cfg.use_visual and self.vt5_cfg.use_visual and "visual" in self.params):
            return None
        if aux is None or not aux.get("images") or aux["images"][0] is None:
            return None
        from rag_docvqa_tpu.ops.patches import concatenate_patches_grid, crop_box, resize_image

        boxes = np.asarray(group_boxes(batch, owner, ret.top_k_idx.shape[1]))
        pages = np.asarray(ret.top_k_page)
        valid = np.asarray(ret.top_k_valid)
        size = self.vt5_cfg.vit.image_size
        images = []
        for b in range(batch.batch_size):
            page_imgs = aux["images"][b]
            crops = []
            for r in range(boxes.shape[1]):
                if not valid[b, r] or page_imgs is None:
                    continue
                img = page_imgs[pages[b, r]]
                if img is None:
                    continue
                crops.append(crop_box(np.asarray(img), boxes[b, r]))
            grid = concatenate_patches_grid(crops)
            # DiT feature extractor normalization: (x/255 - 0.5) / 0.5
            img = resize_image(grid, size, size) / 255.0
            images.append((img - 0.5) / 0.5)
        pixels = jnp.asarray(np.stack(images), jnp.float32)
        return vt5m.visual_features(self.params, self.vt5_cfg, pixels)

    # ------------------------------------------------------------------ #
    def _apply_nac(self, gen: GeneratorInputs, answers: List[str], confs: List[float]):
        """Not-answerable gating on the concat path (src/RAGVT5.py:382-384:
        NAC sees the generator input embeddings and the re-embedded predicted
        answers)."""
        from rag_docvqa_tpu.models.embeddings import spatial_embed
        from rag_docvqa_tpu.models.nac import nac_prob, update_results

        nac_params, threshold = self.nac
        shared = self.params["t5"]["shared"]
        # input embeddings as the generator sees them (semantic + spatial)
        sem = shared[gen.input_ids]
        spa = spatial_embed(self.params["spatial"], self.vt5_cfg.spatial, gen.input_boxes)
        input_emb = sem + spa
        # answer embeddings via the shared table (process_text, src/VT5.py:102-108)
        max_t = max(1, max(len(self.tokenizer.encode(a or "")) for a in answers))
        ans_ids = np.zeros((len(answers), max_t), np.int32)
        ans_mask = np.zeros((len(answers), max_t), bool)
        for i, a in enumerate(answers):
            ids = self.tokenizer.encode(a or "")[:max_t]
            ans_ids[i, : len(ids)] = ids
            ans_mask[i, : len(ids)] = True
        ans_emb = shared[jnp.asarray(ans_ids)]
        probs = nac_prob(
            nac_params, input_emb, ans_emb,
            input_mask=gen.attention_mask, answer_mask=jnp.asarray(ans_mask),
        )
        return update_results(np.asarray(probs), answers, confs, threshold)

    # ------------------------------------------------------------------ #
    def _decode(self, tokens: jax.Array) -> List[str]:
        toks = np.asarray(tokens)
        out = []
        for row in toks:
            ids = []
            for t in row:
                if t == self.vt5_cfg.t5.eos_id:
                    break
                if t != self.vt5_cfg.t5.pad_id:
                    ids.append(int(t))
            out.append(self.tokenizer.decode(ids))
        return out

    def _select_rows(self, tokens, conf, row_valid, B, K, keep_all: bool):
        """maxconf: pick the argmax-confidence row; anyconf: keep all valid
        rows' answers (RAGVT5.py:428-454)."""
        answers_flat = self._decode(tokens)
        conf_np = np.asarray(conf).reshape(B, K)
        valid_np = np.asarray(row_valid).reshape(B, K)
        answers, confs = [], []
        for b in range(B):
            rows = np.where(valid_np[b])[0]
            if len(rows) == 0:
                answers.append(None)
                confs.append(None)
                continue
            if keep_all:
                answers.append([answers_flat[b * K + r] for r in rows])
                confs.append([float(conf_np[b, r]) for r in rows])
            else:
                best = rows[np.argmax(conf_np[b, rows])]
                answers.append(answers_flat[b * K + best])
                confs.append(float(conf_np[b, best]))
        return answers, confs

    def _result(self, answers, confidences, pred_answer_pages, ret, batch, aux, owner=None, nac_probs=None):
        retrieval: Dict[str, Any] = {"page_indices": pred_answer_pages}
        if nac_probs is not None:
            retrieval["not_answerable_probs"] = nac_probs
        if ret is not None:
            retrieval["similarities"] = np.asarray(ret.top_k_score)
            retrieval["top_k_layout_labels"] = np.asarray(ret.top_k_label).tolist()
            retrieval["boxes"] = np.asarray(
                group_boxes(batch, owner, ret.top_k_idx.shape[1])
            ) if owner is not None else None
            if aux is not None and owner is not None and "slot_words" in aux:
                retrieval["text"] = self._topk_texts(np.asarray(owner), aux, ret)
        return {
            "pred_answers": answers,
            "confidences": confidences,
            "pred_answer_pages": pred_answer_pages,
            "retrieval": retrieval,
        }

    def _topk_texts(self, owner: np.ndarray, aux: Dict[str, Any], ret: RetrievalResult) -> List[List[str]]:
        """Compacted top-k chunk texts incl. surroundings (reference
        `retrieval["text"]`, used by eval_retrieval's chunk score)."""
        B, K = ret.top_k_idx.shape
        valid = np.asarray(ret.top_k_valid)
        texts: List[List[str]] = []
        for b in range(B):
            words_b = aux["slot_words"][b]
            rows: List[str] = []
            for r in range(K):
                if not valid[b, r]:
                    continue
                slots = np.where(owner[b] == r)[0]
                rows.append(" ".join(words_b[g] for g in slots if g < len(words_b)))
            texts.append(rows)
        return texts


def _assemble_full_doc(batch: ChunkedBatch, cfg: AssembleConfig) -> GeneratorInputs:
    """All raw words of the document as one generator row (no-RAG mode)."""
    from rag_docvqa_tpu.ops.gather import _flatten_tokens

    box_int = (batch.raw_box * 1000).astype(jnp.int32)
    ntok = jnp.where(batch.raw_mask, batch.raw_ntok, 0)
    return _flatten_tokens(
        batch.raw_tokens, ntok, box_int, batch.raw_label,
        batch.prompt_tokens, batch.prompt_len, cfg,
    )
