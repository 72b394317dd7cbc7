"""RAG-Pix2Struct: the OCR-free visual retrieve-then-answer engine.

Reference (src/RAGPix2Struct.py): pages -> image patches (ImageChunker) ->
Pix2Struct-encoder patch embeddings (ImageEncoder, src/_modules.py:1613-1666)
-> late-interaction MaxSim against the rendered question
(VisualRetriever, src/_modules.py:2183-2464) -> top-k patches + surrounding
pattern -> merge overlapping crops -> pack retrieved crops + question header
-> Pix2Struct generate. A no-RAG fallback scores every page and keeps the
max-confidence answer (RAGPix2Struct.py:272-320).

Device work (batched, jitted): patch-set encoding, MaxSim scoring, top-k,
generation. Host work (index-only): image chunk grids, crop/merge of retrieved
regions, patch packing with row offsets.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data.contract import RawDocument
from rag_docvqa_tpu.models import pix2struct as p2s
from rag_docvqa_tpu.ops.late_interaction import late_interaction
from rag_docvqa_tpu.ops.patches import (
    divide_image_into_patches,
    extract_flattened_patches,
    pack_multi_image_patches,
    render_text,
)
from rag_docvqa_tpu.ops.topk import masked_topk


@dataclass(frozen=True)
class P2SRAGConfig:
    chunk_num: int = 10  # k retrieved patches
    include_surroundings: Union[int, Tuple[int, int]] = 0
    # square | horizontal | page grid modes, or "layout": crop layout regions
    # first — text regions subdivide at image_patch_size, figures/tables stay
    # whole (src/_modules.py:1246-1305,1379-1394); pages without layout info
    # fall back to the grid mode below
    chunk_mode: str = "horizontal"
    layout_fallback_mode: str = "horizontal"
    image_patch_size: int = 256  # pixels per image chunk strip
    chunk_overlap: bool = True  # half-patch overlap (src/_modules.py:1139)
    patches_per_chunk: int = 128  # Pix2Struct patches per image chunk
    max_chunks: int = 64  # fixed-shape cap on image chunks per doc
    max_total_patches: int = 1024  # generator patch budget
    max_new_tokens: int = 32
    use_rag: bool = True


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encode_patch_sets(params, cfg: p2s.Pix2StructConfig, patches: jax.Array, mask: jax.Array):
    """(N, T, 2+D) patch sets -> (N, T, hidden) embeddings."""
    return p2s.vision_encode(params, cfg, patches, mask)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _vision_encode_device(params, cfg, patches, masks):
    return p2s.vision_encode(params, cfg, patches, masks)


def _generate_device(params, cfg, patches, masks, max_new_tokens):
    """Split-dispatch Pix2Struct generate: vision encode and the greedy
    decode loop as separate XLA programs (ops/decode.py::greedy_decode_split
    — the loop runs ~2.5x faster on TPU when the decode cache arrives as a
    program input). Same results as one-program p2s.generate."""
    from rag_docvqa_tpu.ops.decode import greedy_decode_split

    enc = _vision_encode_device(params, cfg, patches, masks)
    return greedy_decode_split(params["text"], cfg.text, enc, masks.astype(bool), max_new_tokens)


@functools.partial(jax.jit, static_argnames=("k",))
def _score_topk(patch_emb, patch_tok_mask, q_emb, q_tok_mask, chunk_valid, k: int):
    scores = late_interaction(q_emb, patch_emb, query_mask=q_tok_mask, patch_mask=patch_tok_mask)
    return masked_topk(scores, chunk_valid, k)


@dataclass
class PreparedDoc:
    """Query-independent host preprocessing of one document: image chunks
    extracted to flattened Pix2Struct patch sets. Computing this ONCE per doc
    (at ingest) removes the dominant host cost from the query loop — the
    reference re-chunks every page per forward (src/RAGPix2Struct.py:104-181);
    SURVEY §7's 'pre-rasterize at ingest'."""

    coords: list  # (page, grid, row, col) per chunk
    xyxy: list  # page-frame pixel boxes per chunk
    shapes: list  # (rows, cols) per grid
    patches: "np.ndarray"  # (n, T, 2+D) wire dtype, n = min(chunks, max_chunks)
    tok_mask: "np.ndarray"  # (n, T) f32
    chunk_rows: "np.ndarray"  # (n,) int32 — per-chunk patch-grid row count
    chunk_page: "np.ndarray"  # (n,) int32
    images: Sequence  # page renders (crop-merge + fallback path)

    @property
    def n_chunks(self) -> int:
        return self.patches.shape[0]


@dataclass
class VisualIndex:
    """Device-resident visual retrieval index over a corpus of prepared docs:
    patch-token embeddings for MaxSim scoring AND the flattened patch pixels
    themselves, so a query never re-ships or re-extracts page imagery — the
    TPU-native analogue of the text engine's HBM-resident chunk index."""

    emb: jax.Array  # (Nd, mc, T, H)
    tok_mask: jax.Array  # (Nd, mc, T) f32
    patches: jax.Array  # (Nd, mc, T, 2+D) wire dtype
    chunk_valid: jax.Array  # (Nd, mc) bool
    chunk_rows: jax.Array  # (Nd, mc) int32
    chunk_page: jax.Array  # (Nd, mc) int32
    mc: int


@functools.partial(jax.jit, static_argnames=("cfg", "k", "g", "T"))
def _indexed_retrieve_pack(
    params,
    cfg: p2s.Pix2StructConfig,
    idx_emb,  # (Nd, mc, T, H)
    idx_tok_mask,  # (Nd, mc, T)
    idx_patches,  # (Nd, mc, T, F)
    idx_chunk_valid,  # (Nd, mc)
    idx_chunk_rows,  # (Nd, mc)
    idx_chunk_page,  # (Nd, mc)
    q_patches,  # (B, T, F) rendered-question patch sets
    q_mask,  # (B, T)
    doc_ids,  # (B,) int32
    header_rows,  # (B,) int32 — header patch-grid row count
    k: int,
    g: int,  # chunks packed into the generator input
    T: int,
):
    """Device-side query: encode the rendered questions, MaxSim against the
    resident index, top-k, and PACK the generator input by gathering the
    winning chunks' resident patch sets with chained row offsets — the
    reference's crop-merge + re-extract host loop (src/RAGPix2Struct.py:
    183-334, custom_pix2struct_processor.py:97-132) replaced by gathers.
    Returns (gen_patches (B, (g+1)*T, F), gen_mask, vals, idx, valid, pages)."""
    q_emb = p2s.vision_encode(params, cfg, q_patches, q_mask)
    emb_d = idx_emb[doc_ids]  # (B, mc, T, H)
    tokm_d = idx_tok_mask[doc_ids]
    scores = late_interaction(q_emb, emb_d, query_mask=q_mask, patch_mask=tokm_d)
    vals, idx, valid = masked_topk(scores, idx_chunk_valid[doc_ids], k)

    sel = idx[:, :g]  # (B, g) best chunks feed the generator
    sel_valid = valid[:, :g]
    B = q_patches.shape[0]
    bidx = jnp.arange(B)[:, None]
    sel_patches = idx_patches[doc_ids[:, None], sel]  # (B, g, T, F)
    sel_tokm = tokm_d[bidx, sel] * sel_valid[:, :, None]  # (B, g, T)
    sel_rows = jnp.where(sel_valid, idx_chunk_rows[doc_ids[:, None], sel], 0)
    # chained row offsets: header first, then each selected chunk's grid
    # (pack_multi_image_patches' continued-row-offset rule)
    offs = header_rows[:, None] + jnp.cumsum(sel_rows, axis=1) - sel_rows  # (B, g)
    row_col = sel_patches[:, :, :, 0] + offs[:, :, None].astype(sel_patches.dtype)
    row_col = row_col * sel_tokm.astype(sel_patches.dtype)  # padding rows stay 0
    sel_patches = jnp.concatenate(
        [row_col[..., None],
         sel_patches[:, :, :, 1:] * sel_tokm[..., None].astype(sel_patches.dtype)],
        axis=-1,
    )
    gen_patches = jnp.concatenate(
        [q_patches, sel_patches.reshape(B, g * T, -1)], axis=1)
    gen_mask = jnp.concatenate([q_mask, sel_tokm.reshape(B, g * T)], axis=1)
    pages = jnp.where(sel_valid, idx_chunk_page[doc_ids[:, None], sel], -1)
    return gen_patches, gen_mask, vals, idx, valid, pages


class RAGPix2StructEngine:
    def __init__(self, cfg: P2SRAGConfig, p2s_cfg: p2s.Pix2StructConfig, params: Dict[str, Any], tokenizer):
        # flash attention for the patch encoder (shared gate; the patch
        # budget makes scores HBM-dominant at any length)
        from rag_docvqa_tpu.ops.flash_attention import flash_wanted

        if not p2s_cfg.vision.flash_encoder and flash_wanted():
            from dataclasses import replace as _replace

            p2s_cfg = _replace(p2s_cfg, vision=_replace(p2s_cfg.vision, flash_encoder=True))
        # patch-transfer dtype: with bf16 weights vision_encode casts host
        # patches to bf16 on device anyway, so shipping f16 halves the
        # dominant host->device transfer (~107 MB/batch f32 at the bench
        # retrieval shapes on the tunneled TPU). f16 keeps 3 more mantissa
        # bits than bf16, so the double rounding perturbs each pixel by at
        # most half a bf16 ulp — the same noise class as the bf16 cast the
        # tower already performs; row/col ids stay exact as long as they
        # fit f16's 2048 integer range, guaranteed because the row-offset
        # chain is bounded by the patch budget. f32 weights (tests / CPU
        # parity) keep exact f32 transfers.
        bf16_weights = params["vision"]["patch_proj"]["kernel"].dtype == jnp.bfloat16
        budgets_ok = max(cfg.max_total_patches, cfg.patches_per_chunk) <= 2048
        self._xfer = np.float16 if (bf16_weights and budgets_ok) else np.float32
        self.cfg = cfg
        self.p2s_cfg = p2s_cfg
        self.params = params
        self.tokenizer = tokenizer

    # ------------------------------------------------------------------ #
    def _chunk_pages(self, images: Sequence[np.ndarray], layouts=None):
        """Host: pages -> image chunks + (page, grid, row, col) coords +
        page-frame pixel boxes + per-grid matrix shapes.

        A "grid" is one patch matrix: the whole page in the grid modes, one
        layout region in layout mode (the reference's patch_count groups,
        src/_modules.py:1317-1399). Surrounding-pattern expansion happens
        within a grid."""
        cfg = self.cfg
        chunks, coords, xyxy, shapes = [], [], [], []

        def add_grid(page_idx, patches, shape, boxes):
            gid = len(shapes)
            shapes.append(shape)
            cols = shape[1]
            for i, (patch, box) in enumerate(zip(patches, boxes)):
                chunks.append(patch)
                coords.append((page_idx, gid, i // cols, i % cols))
                xyxy.append(box)

        for page_idx, img in enumerate(images):
            img = np.asarray(img)
            lay = layouts[page_idx] if layouts is not None and page_idx < len(layouts) else None
            if cfg.chunk_mode == "layout" and lay and len(lay.get("boxes", [])):
                from rag_docvqa_tpu.ops.patches import divide_image_into_layout_patches

                groups = divide_image_into_layout_patches(
                    img, lay["boxes"], lay["labels"], lay.get("clusters"),
                    patch_size=cfg.image_patch_size, overlap=cfg.chunk_overlap,
                    mode=cfg.layout_fallback_mode,
                )
                for patches, shape, boxes in groups:
                    add_grid(page_idx, patches, shape, boxes)
                if groups:
                    continue
            mode = cfg.chunk_mode if cfg.chunk_mode != "layout" else cfg.layout_fallback_mode
            patches, shape, boxes = divide_image_into_patches(
                img, cfg.image_patch_size, cfg.chunk_overlap, mode
            )
            add_grid(page_idx, patches, shape, boxes)
        return chunks, coords, xyxy, shapes

    # ------------------------------------------------------------------ #
    def prepare_doc(self, images: Sequence[np.ndarray], layouts=None) -> PreparedDoc:
        """Host: one document's query-independent preprocessing — chunk the
        page renders and extract flattened patch sets in the wire dtype.
        Per-chunk scalar extraction with normalize=True (the fold through
        the resize) is deliberate: a stacked-batch variant measured ~6x
        SLOWER on host — the batch's hundreds-of-MB gather temps stream
        through DRAM while the per-image loop stays cache-resident
        (PERF.md §7, host-preprocessing paragraph)."""
        cfg = self.cfg
        T = cfg.patches_per_chunk
        F = 2 + self.p2s_cfg.vision.patch_dim
        chunks, coords, xyxy, shapes = self._chunk_pages(images, layouts)
        n = min(len(chunks), cfg.max_chunks)
        patches = np.zeros((n, T, F), self._xfer)
        tok_mask = np.zeros((n, T), np.float32)
        chunk_rows = np.zeros((n,), np.int32)
        for i in range(n):
            flat, max_row = extract_flattened_patches(chunks[i], T, pad=True, normalize=True)
            patches[i] = flat
            tok_mask[i] = flat[:, 0] > 0
            chunk_rows[i] = max_row
        chunk_page = np.asarray([coords[i][0] for i in range(n)], np.int32)
        return PreparedDoc(
            coords=coords, xyxy=xyxy, shapes=shapes, patches=patches,
            tok_mask=tok_mask, chunk_rows=chunk_rows, chunk_page=chunk_page,
            images=images,
        )

    def prepare_docs(self, images_list, layouts_list=None) -> List[PreparedDoc]:
        return [
            self.prepare_doc(imgs, layouts_list[b] if layouts_list else None)
            for b, imgs in enumerate(images_list)
        ]

    def _render_question(self, question: str):
        """(T, F) wire-dtype patch set + mask + grid row count of the
        rendered question."""
        T = self.cfg.patches_per_chunk
        q_img = render_text(question)
        q_flat, max_row = extract_flattened_patches(q_img, T, pad=True, normalize=True)
        return q_flat.astype(self._xfer, copy=False), (q_flat[:, 0] > 0).astype(np.float32), max_row

    # ------------------------------------------------------------------ #
    def retrieve(self, question: str, images: Sequence[np.ndarray], layouts=None):
        """Single-doc retrieval with step info (demo / return_steps path).
        Returns (merged crops, page indices, scores, steps dict)."""
        crops, pages, vals, steps = self._retrieve_batch(
            [question], [images], return_steps=True, layouts_list=[layouts]
        )
        return crops[0], pages[0], vals[0], steps[0]

    def _retrieve_batch(
        self,
        questions: Sequence[str],
        images_list: Sequence[Sequence[np.ndarray]],
        return_steps: bool = False,
        layouts_list=None,  # per doc: per page {boxes, labels[, clusters]}
        prepared: Optional[List[PreparedDoc]] = None,
    ):
        """Batched retrieval: ONE vision-encode dispatch for all docs' image
        chunks + questions and ONE batched MaxSim+top-k (the reference loops
        documents on host, src/RAGPix2Struct.py:104-181 — an anti-pattern this
        engine replaces with fixed-shape batching). `prepared` skips the
        chunk+extract host stage (PreparedDoc, computed once per doc)."""
        cfg = self.cfg
        B = len(questions)
        T = cfg.patches_per_chunk
        F = 2 + self.p2s_cfg.vision.patch_dim

        if prepared is None:
            prepared = self.prepare_docs(images_list, layouts_list)

        # chunk-axis cap: bucketed to THIS batch's max real chunk count
        # (power of two, >=16, <= cfg.max_chunks) — the fixed max_chunks=64
        # pad measured as ~80% of the host wall (252 MB of zeros allocated,
        # concatenated and abs().sum()-scanned for ~10 real chunks/doc) and
        # made the device encode 5x the real patch sets
        n_per_doc = [p.n_chunks for p in prepared]
        # floor at chunk_num too: _score_topk's lax.top_k needs k <= mc
        floor = max(16, cfg.chunk_num, max(n_per_doc), 1)
        mc = min(cfg.max_chunks, 1 << (floor - 1).bit_length())

        # chunks and questions share one (B*mc + B, T, F) array, filled in
        # place (no concat copy); token masks come from the row-id column
        # (real patches have 1-based row ids, padding rows are all-zero);
        # allocated straight in the wire dtype (see __init__._xfer)
        stacked = np.zeros((B * mc + B, T, F), self._xfer)
        stacked_mask = np.zeros((B * mc + B, T), np.float32)
        chunk_valid = np.zeros((B, mc), bool)
        for b, prep in enumerate(prepared):
            n = n_per_doc[b]
            stacked[b * mc : b * mc + n] = prep.patches[:n]
            stacked_mask[b * mc : b * mc + n] = prep.tok_mask[:n]
            chunk_valid[b, :n] = True
            q_flat, q_m, _ = self._render_question(questions[b])
            stacked[B * mc + b] = q_flat
            stacked_mask[B * mc + b] = q_m

        # one dispatch: all docs' chunks + all questions through the encoder
        emb = _encode_patch_sets(
            self.params, self.p2s_cfg, jnp.asarray(stacked), jnp.asarray(stacked_mask)
        )
        patch_emb = emb[: B * mc].reshape(B, mc, T, -1)
        q_emb = emb[B * mc :]
        tok_mask = stacked_mask[: B * mc].reshape(B, mc, T)
        q_mask = stacked_mask[B * mc :]

        vals, idx, valid = _score_topk(
            patch_emb, jnp.asarray(tok_mask), q_emb, jnp.asarray(q_mask),
            jnp.asarray(chunk_valid), cfg.chunk_num,
        )
        idx, valid, vals = np.asarray(idx), np.asarray(valid), np.asarray(vals)

        all_crops, all_pages, all_steps = [], [], []
        for b, prep in enumerate(prepared):
            # surrounding-pattern expansion within each patch grid
            # (host; src/_modules.py:2207-2282)
            coords, xyxy, shapes = prep.coords, prep.xyxy, prep.shapes
            surround: set = set()
            for r in range(cfg.chunk_num):
                if not valid[b, r] or idx[b, r] >= len(coords):
                    continue
                page_idx, gid, row, col = coords[idx[b, r]]
                rows, cols = shapes[gid]
                for rc in _surrounding_coords((row, col), (rows, cols), cfg.include_surroundings):
                    surround.add((page_idx, gid, *rc))
            all_crops.append(_merge_overlapping(sorted(surround), xyxy, coords, prep.images))
            all_pages.append(sorted({p for p, _, _, _ in surround}))
            if return_steps:
                all_steps.append({"n_chunks": len(coords), "coords": coords, "xyxy": xyxy})
        return all_crops, all_pages, vals, all_steps

    # ------------------------------------------------------------------ #
    def _dispatch_batch(self, docs, prepared: Optional[List[PreparedDoc]] = None):
        """Retrieve + pack + DISPATCH generate (no result fetch). Returns
        (tokens, conf, pred_pages) with tokens/conf still device handles, so
        a caller can overlap the decode with the next batch's host work."""
        cfg = self.cfg
        images_list = []
        for doc in docs:
            assert doc.images is not None, "RAGPix2Struct needs page images"
            images_list.append([np.asarray(im) for im in doc.images if im is not None])

        if cfg.use_rag:
            all_crops, pred_pages, _, _ = self._retrieve_batch(
                [d.question for d in docs], images_list,
                layouts_list=[d.layout for d in docs], prepared=prepared,
            )
            for b, images in enumerate(images_list):
                if not all_crops[b]:
                    all_crops[b] = images  # fallback: all pages
                    pred_pages[b] = list(range(len(images)))
        else:
            all_crops = images_list
            pred_pages = [list(range(len(imgs))) for imgs in images_list]

        all_patches, all_masks = [], []
        for doc, crops in zip(docs, all_crops):
            header = render_text(doc.question)
            flat, mask = pack_multi_image_patches(
                crops, cfg.max_total_patches, normalize=True, header=header
            )
            all_patches.append(flat)
            all_masks.append(mask)

        patches = jnp.asarray(np.stack(all_patches).astype(self._xfer, copy=False))
        masks = jnp.asarray(np.stack(all_masks))
        tokens, conf = _generate_device(self.params, self.p2s_cfg, patches, masks, cfg.max_new_tokens)
        return tokens, conf, pred_pages

    def _finalize(self, tokens, conf, pred_pages) -> Dict[str, Any]:
        answers = self._decode(tokens)
        return {
            "pred_answers": answers,
            "confidences": np.asarray(conf).tolist(),
            "pred_answer_pages": pred_pages,
            "retrieval": {"page_indices": pred_pages},
        }

    def inference(self, docs, aux: Optional[Dict[str, Any]] = None,
                  prepared: Optional[List[PreparedDoc]] = None) -> Dict[str, Any]:
        """Batch inference; each doc needs `images` (page renders).

        Accepts either a list of RawDocuments (native interface) or the
        evaluate() loop's (batch, aux) pair — in that case questions/images
        come from aux (this is an OCR-free engine; the token batch is
        unused). `prepared` (from prepare_docs) skips the chunk+extract
        host stage."""
        if aux is not None:
            layouts_aux = aux.get("layouts", [None] * len(aux["questions"]))
            docs = [
                RawDocument(question=q, words=[[]], boxes=[[]], images=imgs, layout=lay)
                for q, imgs, lay in zip(aux["questions"], aux["images"], layouts_aux)
            ]
        return self._finalize(*self._dispatch_batch(docs, prepared=prepared))

    def inference_stream(self, doc_batches, depth: int = 2):
        """Pipelined serving loop over an iterable of RawDocument batches:
        the query-independent prepare (chunk+extract — the dominant host
        cost) runs on a prefetch thread for batch i+1 while the main thread
        retrieves/packs batch i, and each batch's generate is fetched one
        batch LATE so the decode loop overlaps the next batch's host pack.
        Yields one inference() result dict per input batch, in order."""
        from rag_docvqa_tpu.data.prefetch import prefetch

        def _prepare_stream():
            for docs in doc_batches:
                images_list = [
                    [np.asarray(im) for im in d.images if im is not None]
                    for d in docs
                ]
                yield docs, self.prepare_docs(images_list, [d.layout for d in docs])

        pending = None
        for docs, prepared in prefetch(_prepare_stream(), depth=depth):
            handles = self._dispatch_batch(docs, prepared=prepared)
            if pending is not None:
                yield self._finalize(*pending)
            pending = handles
        if pending is not None:
            yield self._finalize(*pending)

    # ------------------------------------------------------------------ #
    def build_visual_index(self, prepared_docs: List[PreparedDoc]) -> VisualIndex:
        """Encode every prepared doc's patch sets ONCE into a device-resident
        index (embeddings for MaxSim + the patch pixels for generation). The
        per-query path then never touches page imagery on the host — see
        inference_indexed."""
        cfg = self.cfg
        T = cfg.patches_per_chunk
        F = 2 + self.p2s_cfg.vision.patch_dim
        Nd = len(prepared_docs)
        ns = [p.n_chunks for p in prepared_docs]
        floor = max(16, cfg.chunk_num, max(ns), 1)
        mc = min(cfg.max_chunks, 1 << (floor - 1).bit_length())

        patches = np.zeros((Nd, mc, T, F), self._xfer)
        tok_mask = np.zeros((Nd, mc, T), np.float32)
        chunk_valid = np.zeros((Nd, mc), bool)
        chunk_rows = np.zeros((Nd, mc), np.int32)
        chunk_page = np.zeros((Nd, mc), np.int32)
        for d, prep in enumerate(prepared_docs):
            n = min(prep.n_chunks, mc)
            patches[d, :n] = prep.patches[:n]
            tok_mask[d, :n] = prep.tok_mask[:n]
            chunk_valid[d, :n] = True
            chunk_rows[d, :n] = prep.chunk_rows[:n]
            chunk_page[d, :n] = prep.chunk_page[:n]

        dev_patches = jnp.asarray(patches)
        dev_mask = jnp.asarray(tok_mask)
        emb = _encode_patch_sets(
            self.params, self.p2s_cfg,
            dev_patches.reshape(Nd * mc, T, F), dev_mask.reshape(Nd * mc, T),
        ).reshape(Nd, mc, T, -1)
        return VisualIndex(
            emb=emb, tok_mask=dev_mask, patches=dev_patches,
            chunk_valid=jnp.asarray(chunk_valid), chunk_rows=jnp.asarray(chunk_rows),
            chunk_page=jnp.asarray(chunk_page), mc=mc,
        )

    def inference_indexed(
        self,
        questions: Sequence[str],
        doc_ids: Sequence[int],
        index: VisualIndex,
    ) -> Dict[str, Any]:
        """Query a prebuilt VisualIndex: per-query host work is ONLY the
        question render (+ tiny transfers); retrieval, generator-input
        packing (gathers over the resident patch sets with chained row
        offsets) and generation all run on device. The packing differs from
        the reference's crop-merge re-extract (strip-resolution patches are
        reused verbatim instead of re-rendering merged pixel unions) — the
        retrieval itself (MaxSim top-k) is identical; include_surroundings
        expansion needs the host path."""
        cfg = self.cfg
        T = cfg.patches_per_chunk
        B = len(questions)
        assert len(doc_ids) == B
        # generator budget: one T-slot grid for the question header + g chunk
        # grids; g is also capped by k (only k chunks are retrieved)
        g = max(cfg.max_total_patches // T - 1, 1)
        g = min(g, index.mc, cfg.chunk_num)

        q_patches = np.zeros((B, T, 2 + self.p2s_cfg.vision.patch_dim), self._xfer)
        q_mask = np.zeros((B, T), np.float32)
        header_rows = np.zeros((B,), np.int32)
        for b, q in enumerate(questions):
            q_patches[b], q_mask[b], header_rows[b] = self._render_question(q)

        gen_patches, gen_mask, vals, idx, valid, pages = _indexed_retrieve_pack(
            self.params, self.p2s_cfg,
            index.emb, index.tok_mask, index.patches, index.chunk_valid,
            index.chunk_rows, index.chunk_page,
            jnp.asarray(q_patches), jnp.asarray(q_mask),
            jnp.asarray(np.asarray(doc_ids, np.int32)), jnp.asarray(header_rows),
            cfg.chunk_num, g, T,
        )
        tokens, conf = _generate_device(
            self.params, self.p2s_cfg, gen_patches, gen_mask, cfg.max_new_tokens)
        answers = self._decode(tokens)
        pages_np = np.asarray(pages)
        pred_pages = [sorted({int(p) for p in row if p >= 0}) for row in pages_np]
        return {
            "pred_answers": answers,
            "confidences": np.asarray(conf).tolist(),
            "pred_answer_pages": pred_pages,
            "retrieval": {
                "page_indices": pred_pages,
                "similarities": np.asarray(vals),
                "chunk_indices": np.asarray(idx),
                "valid": np.asarray(valid),
            },
        }

    def no_rag_max_conf(self, doc: RawDocument) -> Tuple[str, float]:
        """Score every page separately, keep the max-confidence answer
        (RAGPix2Struct.py:272-320)."""
        cfg = self.cfg
        header = render_text(doc.question)
        flats, masks = [], []
        for img in doc.images:
            flat, mask = pack_multi_image_patches(
                [np.asarray(img)], cfg.max_total_patches, normalize=True, header=header
            )
            flats.append(flat)
            masks.append(mask)
        patches = jnp.asarray(np.stack(flats).astype(self._xfer, copy=False))
        m = jnp.asarray(np.stack(masks))
        tokens, conf = _generate_device(self.params, self.p2s_cfg, patches, m, cfg.max_new_tokens)
        conf = np.asarray(conf)
        best = int(np.argmax(conf))
        return self._decode(tokens)[best], float(conf[best])

    def _decode(self, tokens) -> List[str]:
        toks = np.asarray(tokens)
        out = []
        for row in toks:
            ids = []
            for t in row:
                if t == self.p2s_cfg.text.eos_id:
                    break
                if t != self.p2s_cfg.text.pad_id:
                    ids.append(int(t))
            out.append(self.tokenizer.decode(ids))
        return out


# --------------------------------------------------------------------------- #
# host geometry helpers (ports of the reference's pattern/merge logic)
# --------------------------------------------------------------------------- #
def _surrounding_coords(center, shape, include: Union[int, Tuple[int, int]]):
    """Spiral pattern for int `include`, rectangle for (x, y) tuple
    (src/_modules.py:2207-2282)."""
    row, col = center
    max_rows, max_cols = shape
    coords = set()
    if isinstance(include, tuple) and len(include) == 2:
        xr, yr = include
        for r in range(row - yr, row + yr + 1):
            for c in range(col - xr, col + xr + 1):
                coords.add((r, c))
    else:
        level, phase = include // 3, include % 3
        for r in range(row - level, row + level + 1):
            for c in range(col - level, col + level + 1):
                coords.add((r, c))
        if phase > 0:
            for r in range(row - level, row + level + 1):
                coords.add((r, col - level - 1))
                coords.add((r, col + level + 1))
        if phase > 1:
            for c in range(col - level, col + level + 1):
                coords.add((row - level - 1, c))
                coords.add((row + level + 1, c))
    return [(r, c) for r, c in coords if 0 <= r < max_rows and 0 <= c < max_cols]


def _rect_overlap(a, b) -> bool:
    return a[0] < b[2] and a[2] > b[0] and a[1] < b[3] and a[3] > b[1]


def _merge_overlapping(surround, xyxy, coords, images) -> List[np.ndarray]:
    """Connected components of overlapping retrieved patches -> one bbox-union
    crop each (src/_modules.py:2284-2384). Boxes are page-frame pixels, so
    patches from different layout grids on the same page merge when they
    overlap."""
    coord_to_flat = {c: i for i, c in enumerate(coords)}
    by_page: Dict[int, List[List[int]]] = {}
    for page_idx, gid, row, col in surround:
        flat = coord_to_flat.get((page_idx, gid, row, col))
        if flat is not None:
            by_page.setdefault(page_idx, []).append(xyxy[flat])

    crops: List[np.ndarray] = []
    for page_idx, rects in sorted(by_page.items()):
        n = len(rects)
        seen = [False] * n
        for i in range(n):
            if seen[i]:
                continue
            cluster, queue = [], [i]
            seen[i] = True
            while queue:
                u = queue.pop()
                cluster.append(rects[u])
                for v in range(n):
                    if not seen[v] and _rect_overlap(rects[u], rects[v]):
                        seen[v] = True
                        queue.append(v)
            x1 = min(r[0] for r in cluster)
            y1 = min(r[1] for r in cluster)
            x2 = max(r[2] for r in cluster)
            y2 = max(r[3] for r in cluster)
            img = np.asarray(images[page_idx])
            # clamp to >=1px: a degenerate (zero-area) union would otherwise
            # flow an empty crop into patch_grid_shape, which rejects it
            y2 = min(max(int(y2), int(y1) + 1), img.shape[0])
            x2 = min(max(int(x2), int(x1) + 1), img.shape[1])
            y1 = min(int(y1), y2 - 1)
            x1 = min(int(x1), x2 - 1)
            crops.append(img[y1:y2, x1:x2])
    return crops
