"""Ingestor tests: the fixed-shape contract must faithfully encode the ragged
documents (slot coordinate system, chunk spans, page ranges, tokenization)."""

import numpy as np

from rag_docvqa_tpu.data import ByteTokenizer, DocVQAIngestor, RawDocument
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.ops.chunking import ChunkSpec


def make_doc(n_pages=2, words_per_page=7, q="what is x"):
    words = [[f"p{p}w{i}" for i in range(words_per_page)] for p in range(n_pages)]
    boxes = [
        [[i / 10, p / 10, i / 10 + 0.05, p / 10 + 0.05] for i in range(words_per_page)]
        for p in range(n_pages)
    ]
    return RawDocument(question=q, words=words, boxes=boxes, answers=["p0w3"], answer_page_idx=0)


def test_ingest_shapes_and_masks():
    tok = ByteTokenizer()
    caps = Caps(max_pages=4, max_chunks=16, max_slots=64, tokens_per_word=8, embed_tokens=48)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=1), caps)
    batch, aux = ing.ingest([make_doc(), make_doc(n_pages=1, words_per_page=3)])

    assert batch.chunk_mask.shape == (2, 16)
    assert batch.slot_tokens.shape == (2, 64, 8)
    assert batch.num_pages.tolist() == [2, 1]

    # doc 0: 7 words/page, chunk_size 5 overlap 1 -> chunks [0:5], [4:7](merged?
    # stride=4: i=0 chunk 5 words; i=4 chunk 3 words, merge check 5+(3-1)=7 > 5*1.2=6 -> new chunk)
    # so 2 chunks per page, 4 total; slots = 5+3 per page = 8, 16 total
    assert batch.chunk_mask[0].sum() == 4
    assert batch.slot_mask[0].sum() == 16
    assert batch.page_slot_start[0, :2].tolist() == [0, 8]
    assert batch.page_slot_end[0, :2].tolist() == [8, 16]
    assert batch.chunk_slot_start[0, :4].tolist() == [0, 5, 8, 13]
    assert batch.chunk_slot_len[0, :4].tolist() == [5, 3, 5, 3]
    # overlap duplicate: slot 5 repeats word index 4 of page 0
    assert batch.slot_box[0, 5].tolist() == batch.slot_box[0, 4].tolist()

    # chunk pages
    assert batch.chunk_page[0, :4].tolist() == [0, 0, 1, 1]

    # aux carries strings for the metric layer
    assert aux["questions"][0] == "what is x"
    assert aux["chunk_texts"][0][0] == "p0w0 p0w1 p0w2 p0w3 p0w4"


def test_ingest_tokens_roundtrip():
    tok = ByteTokenizer()
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=1), Caps(max_pages=2, max_chunks=8, max_slots=32, tokens_per_word=8))
    batch, aux = ing.ingest([make_doc(n_pages=1, words_per_page=3)])
    # decode slot 0 tokens back to the word
    ids = batch.slot_tokens[0, 0, : batch.slot_ntok[0, 0]].tolist()
    assert tok.decode(ids) == "p0w0"
    # question tokens decode back
    q_ids = batch.q_tokens[0][batch.q_mask[0]].tolist()
    assert tok.decode(q_ids) == "what is x"


def test_ingest_truncation_respects_caps():
    tok = ByteTokenizer()
    caps = Caps(max_pages=1, max_chunks=2, max_slots=6, tokens_per_word=4)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=1), caps)
    batch, _ = ing.ingest([make_doc(n_pages=3, words_per_page=50)])
    assert batch.num_pages[0] == 1
    assert batch.chunk_mask[0].sum() <= 2
    assert batch.slot_mask[0].sum() <= 6
    # chunk slot spans stay in bounds
    ends = batch.chunk_slot_start[0] + batch.chunk_slot_len[0]
    assert (ends <= 6).all()


def test_chunk_embed_fast_path_matches_reencode():
    """The gathered-from-word-rows chunk embed ids (fast path, taken when the
    tokenizer's encode() is concat-of-encode_word) must equal re-encoding the
    joined chunk text; dirty words (whitespace, truncation) force the exact
    fallback on that page."""
    from rag_docvqa_tpu.data.tokenizer import BaseTokenizer, HashTokenizer

    tok = HashTokenizer(vocab_size=2048)
    assert type(tok).encode is BaseTokenizer.encode  # fast path eligible
    caps = Caps(max_pages=4, max_chunks=16, max_slots=64, tokens_per_word=4, embed_tokens=24)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=1), caps)
    batch, aux = ing.ingest([make_doc(), make_doc(n_pages=1, words_per_page=3)])
    for b, texts in enumerate(aux["chunk_texts"]):
        for ci, text in enumerate(texts):
            want = tok.encode(text)[: caps.embed_tokens]
            got = batch.chunk_emb_tokens[b, ci][batch.chunk_emb_mask[b, ci]].tolist()
            assert got == want, (b, ci, text)

    # a whitespace-containing word triggers the page-level fallback and the
    # batch still matches the joined-text re-encode (split() semantics)
    doc = make_doc(n_pages=1, words_per_page=4)
    doc.words[0][1] = "two words"
    batch2, aux2 = ing.ingest([doc])
    for ci, text in enumerate(aux2["chunk_texts"][0]):
        want = tok.encode(text)[: caps.embed_tokens]
        got = batch2.chunk_emb_tokens[0, ci][batch2.chunk_emb_mask[0, ci]].tolist()
        assert got == want


def test_vectorized_page_path_matches_slow_loop():
    """The page-level vectorized ingest path must produce byte-identical
    batches to the per-chunk loop (forced via _force_slow)."""
    import dataclasses

    from rag_docvqa_tpu.data.tokenizer import HashTokenizer

    docs = [make_doc(n_pages=3, words_per_page=23), make_doc(n_pages=2, words_per_page=9)]
    tok = HashTokenizer(vocab_size=4096)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=2))
    ing.caps = ing.plan_caps(docs)
    fast, aux_f = ing.ingest(docs)
    ing._force_page = True
    page, aux_p = ing.ingest(docs)
    ing._force_page = False
    ing._force_slow = True
    slow, aux_s = ing.ingest(docs)
    for f in dataclasses.fields(fast):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, f.name)), np.asarray(getattr(page, f.name)), err_msg=f.name
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, f.name)), np.asarray(getattr(slow, f.name)), err_msg=f.name
        )
    assert aux_f["chunk_texts"] == aux_p["chunk_texts"] == aux_s["chunk_texts"]
    assert aux_f["slot_words"] == aux_p["slot_words"] == aux_s["slot_words"]


def test_doc_vectorized_path_matches_on_edges():
    """The doc-level vectorized path (one numpy pass per DOC) must match the
    per-page path byte-for-byte on edge shapes: empty pages mid-doc, a
    whitespace-containing word (falls back), uneven page sizes, and caps
    tight enough to force truncation (falls back to the per-page/slow loop,
    which handles overflow)."""
    import dataclasses
    import warnings as _w

    from rag_docvqa_tpu.data.tokenizer import HashTokenizer

    docs = [make_doc(n_pages=4, words_per_page=17), make_doc(n_pages=1, words_per_page=3)]
    docs[0].words[1] = []  # empty page mid-doc
    docs[0].boxes[1] = []
    docs[0].words[2][0] = "two words"  # re-splitting word: doc path must bail
    tok = HashTokenizer(vocab_size=4096)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=2))
    ing.caps = ing.plan_caps(docs)
    fast, aux_f = ing.ingest(docs)
    ing._force_page = True
    page, aux_p = ing.ingest(docs)
    ing._force_page = False
    for f in dataclasses.fields(fast):
        np.testing.assert_array_equal(
            np.asarray(getattr(fast, f.name)), np.asarray(getattr(page, f.name)), err_msg=f.name
        )
    assert aux_f["chunk_texts"] == aux_p["chunk_texts"]
    assert aux_f["slot_words"] == aux_p["slot_words"]

    # truncating caps: both paths fall to the overflow-aware loop and agree
    from rag_docvqa_tpu.data.contract import Caps

    ing2 = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=2),
                          Caps(max_pages=2, max_chunks=3, max_slots=12))
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        t_fast, _ = ing2.ingest(docs)
        ing2._force_page = True
        t_page, _ = ing2.ingest(docs)
    for f in dataclasses.fields(t_fast):
        np.testing.assert_array_equal(
            np.asarray(getattr(t_fast, f.name)), np.asarray(getattr(t_page, f.name)), err_msg=f.name
        )


def test_ingest_carries_layouts_in_aux(tmp_path):
    """aux["layouts"] rides along from RawDocument.layout so layout-guided
    engines (RAGPix2Struct chunk_mode="layout") see regions from the
    standard evaluate() ingest path, and the disk cache restores them live
    (numpy boxes are not JSON-cacheable)."""
    tok = ByteTokenizer()
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=5, overlap=1),
                         Caps(max_pages=2, max_chunks=8, max_slots=32))
    lay = [{"boxes": np.array([[0.0, 0.0, 1.0, 0.5]]), "labels": [1]}]
    doc = make_doc(n_pages=1, words_per_page=3)
    import dataclasses
    doc_l = dataclasses.replace(doc, layout=lay)
    _, aux = ing.ingest([doc, doc_l])
    assert aux["layouts"][0] is None
    assert aux["layouts"][1] is lay

    cache = str(tmp_path / "b.npz")
    ing.ingest_cached([doc, doc_l], cache)  # writes (layouts excluded from json)
    _, aux2 = ing.ingest_cached([doc, doc_l], cache)  # cache-hit path
    assert aux2["layouts"][1] is lay
