"""Multi-process sharded ingest (data/ingest_mp.py) parity with the
single-process DocVQAIngestor — same fixed-shape arrays, same aux."""

import dataclasses

import numpy as np
import pytest

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.ingest_mp import MPIngestor
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.ops.chunking import ChunkSpec


@pytest.fixture(scope="module")
def pool():
    tok = HashTokenizer(vocab_size=4096)
    mp_ing = MPIngestor(tok, ChunkSpec(chunk_size=10, overlap=2), num_workers=2)
    yield mp_ing
    mp_ing.close()


def _ref_ingestor(mp_ing):
    return DocVQAIngestor(HashTokenizer(vocab_size=4096), mp_ing.spec, mp_ing.caps)


def test_mp_ingest_matches_single_process(pool):
    docs = make_corpus(8, n_pages=3, words_per_page=40, seed=7)
    pool.caps = pool.plan_caps(docs)
    ref = _ref_ingestor(pool)

    b_mp, aux_mp = pool.ingest(docs)
    b_sp, aux_sp = ref.ingest(docs)

    for f in dataclasses.fields(b_sp):
        np.testing.assert_array_equal(
            np.asarray(getattr(b_mp, f.name)), np.asarray(getattr(b_sp, f.name)),
            err_msg=f"array mismatch: {f.name}")
    for k in ("questions", "answers", "question_ids", "chunk_texts", "slot_words"):
        assert aux_mp[k] == aux_sp[k], k
    assert len(aux_mp["images"]) == len(docs)
    assert len(aux_mp["layouts"]) == len(docs)


def test_mp_ingest_small_batch_uses_local_path(pool):
    # batches smaller than 2*num_workers skip the pool (latency); result
    # must still be the standard ingest
    docs = make_corpus(2, n_pages=2, words_per_page=30, seed=8)
    pool.caps = pool.plan_caps(docs)
    ref = _ref_ingestor(pool)
    b_mp, _ = pool.ingest(docs)
    b_sp, _ = ref.ingest(docs)
    np.testing.assert_array_equal(np.asarray(b_mp.slot_tokens), np.asarray(b_sp.slot_tokens))


def test_mp_imap_order_and_parity(pool):
    docs = make_corpus(12, n_pages=2, words_per_page=30, seed=9)
    pool.caps = pool.plan_caps(docs)
    ref = _ref_ingestor(pool)
    batches = [docs[i : i + 4] for i in range(0, 12, 4)]

    got = list(pool.imap(batches, depth=2))
    assert len(got) == 3
    for (b_mp, aux_mp), chunk in zip(got, batches):
        b_sp, aux_sp = ref.ingest(chunk)
        np.testing.assert_array_equal(np.asarray(b_mp.chunk_emb_tokens),
                                      np.asarray(b_sp.chunk_emb_tokens))
        assert aux_mp["questions"] == aux_sp["questions"]


def test_mp_caps_resync(pool):
    # caps changed between calls must reach workers (they ride per task)
    docs = make_corpus(8, n_pages=2, words_per_page=30, seed=10)
    pool.caps = pool.plan_caps(docs)
    b1, _ = pool.ingest(docs)
    big = dataclasses.replace(pool.caps, max_chunks=pool.caps.max_chunks * 2)
    pool.caps = big
    b2, _ = pool.ingest(docs)
    assert b2.chunk_mask.shape[1] == b1.chunk_mask.shape[1] * 2


def test_word_matrix_cache_consistency():
    """The round-4 ingest fast path (word-matrix cache) must be insensitive
    to ingest order and caps changes."""
    docs = make_corpus(6, n_pages=2, words_per_page=40, seed=11)
    spec = ChunkSpec(chunk_size=10, overlap=2)
    a = DocVQAIngestor(HashTokenizer(vocab_size=4096), spec)
    b = DocVQAIngestor(HashTokenizer(vocab_size=4096), spec)
    a.caps = b.caps = a.plan_caps(docs)
    # a ingests twice (warm cache), b once (cold): identical output
    a.ingest(docs)
    ba, _ = a.ingest(docs)
    bb, _ = b.ingest(docs)
    np.testing.assert_array_equal(np.asarray(ba.slot_tokens), np.asarray(bb.slot_tokens))
    np.testing.assert_array_equal(np.asarray(ba.chunk_emb_tokens), np.asarray(bb.chunk_emb_tokens))
    # tokens_per_word change rebuilds the matrix instead of mixing widths
    import dataclasses as dc

    a.caps = dc.replace(a.caps, tokens_per_word=a.caps.tokens_per_word + 2)
    bw, _ = a.ingest(docs)
    assert bw.slot_tokens.shape[2] == ba.slot_tokens.shape[2] + 2
