"""Ingest caching, timing splits, MMLongBench report, top-k label stats."""

import jax
import numpy as np

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.ops.chunking import ChunkSpec

TOK = HashTokenizer(vocab_size=1024)


def make_ing():
    return DocVQAIngestor(TOK, ChunkSpec(chunk_size=8, overlap=2), Caps(max_pages=2, max_chunks=8, max_slots=64))


def test_ingest_cache_roundtrip(tmp_path):
    ing = make_ing()
    docs = make_corpus(2, n_pages=2, words_per_page=20, seed=0)
    path = str(tmp_path / "batch.npz")
    b1, a1 = ing.ingest_cached(docs, path)
    b2, a2 = ing.ingest_cached(docs, path)  # loads from cache
    np.testing.assert_array_equal(np.asarray(b1.chunk_emb_tokens), np.asarray(b2.chunk_emb_tokens))
    np.testing.assert_array_equal(np.asarray(b1.slot_box), np.asarray(b2.slot_box))
    assert a1["questions"] == a2["questions"]
    assert a1["chunk_texts"] == a2["chunk_texts"]


def test_engine_reports_timing_splits():
    from rag_docvqa_tpu.engine import RAGConfig, RAGVT5Engine
    from rag_docvqa_tpu.models import t5 as t5m, vt5 as vt5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.models.vit import ViTConfig

    cfg = vt5m.VT5Config(
        t5=t5m.T5Config(vocab_size=1024, d_model=16, d_kv=4, num_heads=4, d_ff=32,
                        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=16, dropout_rate=0.0),
        vit=ViTConfig(hidden_size=8, num_layers=1, num_heads=1, mlp_dim=16, patch_size=8, image_size=16),
        use_visual=False,
    )
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), cfg)
    ing = make_ing()
    batch, aux = ing.ingest(make_corpus(2, n_pages=2, words_per_page=20, seed=1))
    eng = RAGVT5Engine(RAGConfig(page_retrieval="concat", chunk_num=2, max_new_tokens=2, max_source_length=64), cfg, params, TOK)
    out = eng.inference(batch, aux)
    assert out["retrieval"]["retrieval_time"] > 0
    assert out["retrieval"]["generation_time"] > 0


def test_mmlongbench_show_results(tmp_path):
    from rag_docvqa_tpu.metrics.mmlongbench import show_results

    samples = [
        {"score": 1.0, "answer": "x", "pred": "x", "evidence_pages": "[1]",
         "evidence_sources": "['text']", "doc_type": "report"},
        {"score": 0.0, "answer": "Not answerable", "pred": "y", "evidence_pages": [1, 2],
         "evidence_sources": ["figure"], "doc_type": "manual"},
    ]
    path = str(tmp_path / "report.txt")
    show_results(samples, path)
    text = open(path).read()
    assert "Overall Acc: 0.5" in text
    assert "Single-page" in text and "Unanswerable" in text
    assert "Evidence Sources: text" in text
    assert "Document Type: manual" in text


def test_topk_label_stats():
    from rag_docvqa_tpu.data.contract import RetrievalResult
    from rag_docvqa_tpu.ops.chunking import LAYOUT_LABEL_MAP
    from rag_docvqa_tpu.utils_stats import collect_topk_label_stats

    import jax.numpy as jnp

    ret = RetrievalResult(
        top_k_idx=jnp.zeros((1, 3), jnp.int32),
        top_k_valid=jnp.asarray([[True, True, False]]),
        top_k_score=jnp.zeros((1, 3)),
        top_k_page=jnp.zeros((1, 3), jnp.int32),
        top_k_label=jnp.asarray([[1, 3, 0]]),
        top_k_box=jnp.zeros((1, 3, 4)),
        similarities=jnp.zeros((1, 4)),
    )
    sc = collect_topk_label_stats(ret, LAYOUT_LABEL_MAP)
    assert sc.stats["layout_labels_topk_dist"] == {"text": 1, "table": 1}
