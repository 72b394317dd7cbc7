"""MMLongBench typed scoring wired into the eval loop + long-doc caps.

Covers VERDICT round-1 item 3: the reference routes MMLongBenchDoc samples
through eval_score/eval_acc_and_f1/show_results (eval.py:427-432,
src/metrics.py:245-293) and retrieves over ALL pages of 100+-page docs
(src/MMLongBenchDoc.py:44-71).
"""

from __future__ import annotations

import warnings

import numpy as np
import pytest

import jax

from rag_docvqa_tpu.data import DocVQAIngestor
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus, make_document
from rag_docvqa_tpu.data.tokenizer import ByteTokenizer
from rag_docvqa_tpu.engine.evaluate import evaluate
from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig, RAGVT5Engine
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec

TOK = ByteTokenizer()
VT5_CFG = vt5m.VT5Config(
    t5=t5m.T5Config(vocab_size=TOK.vocab_size, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                    num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0),
    spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32, patch_size=8, image_size=16),
    use_visual=False,
)
SPEC = ChunkSpec(chunk_size=20, overlap=4)


def _engine(k=5, max_new=4):
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), VT5_CFG)
    rag = RAGConfig(page_retrieval="concat", chunk_num=k, max_source_length=128, max_new_tokens=max_new)
    return RAGVT5Engine(rag, VT5_CFG, params, TOK)


def _mmlb_docs(n=4, n_pages=4):
    """Synthetic docs decorated with MMLongBench metadata."""
    import random

    docs = make_corpus(n, n_pages=n_pages, words_per_page=40, seed=7)
    rng = random.Random(0)
    for i, d in enumerate(docs):
        d.extra = {
            "answer_format": "Str",
            "evidence_pages": [d.answer_page_idx + 1],
            "evidence_sources": [rng.choice(["Pure-text (Plain-text)", "Table", "Figure"])],
            "doc_type": rng.choice(["Report", "Brochure"]),
        }
    docs[-1].answers = ["Not answerable"]
    docs[-1].extra["answer_format"] = "None"
    return docs


def test_mmlongbench_metrics_in_eval(tmp_path):
    docs = _mmlb_docs()
    ing = DocVQAIngestor(TOK, SPEC, Caps(max_pages=4, max_chunks=16, max_slots=256,
                                         tokens_per_word=16, embed_tokens=64))
    save = tmp_path / "results.json"
    out = evaluate(_engine(), docs, ing, batch_size=4, save_path=str(save))
    assert "mmlongbench" in out
    mm = out["mmlongbench"]
    assert mm["n_samples"] == len(docs)
    assert 0.0 <= mm["accuracy"] <= 1.0 and 0.0 <= mm["f1"] <= 1.0
    breakdown = tmp_path / "results_mmlb_breakdown.txt"
    assert breakdown.exists()
    text = breakdown.read_text()
    assert "Overall Acc" in text and "Unanswerable" in text and "Document Type" in text


def test_mmlongbench_not_enabled_without_metadata():
    docs = make_corpus(2, n_pages=2, words_per_page=30, seed=1)
    ing = DocVQAIngestor(TOK, SPEC, Caps(max_pages=2, max_chunks=8, max_slots=128,
                                         tokens_per_word=16, embed_tokens=64))
    out = evaluate(_engine(k=3), docs, ing, batch_size=2)
    assert "mmlongbench" not in out


def test_plan_caps_fits_100_page_doc():
    """A 100-page doc ingests without truncation under planned caps, and
    retrieval can see the last page."""
    import random

    doc = make_document(random.Random(3), n_pages=100, words_per_page=30, question_id=0)
    # plant the fact on the LAST page so truncation would hide it
    seed = 0
    doc100 = make_document(random.Random(seed), n_pages=100, words_per_page=30, question_id=1)
    while doc100.answer_page_idx != 99:
        seed += 1
        doc100 = make_document(random.Random(seed), n_pages=100, words_per_page=30, question_id=1)

    ing = DocVQAIngestor(TOK, SPEC)
    caps = ing.plan_caps([doc, doc100])
    assert caps.max_pages >= 100
    ing.caps = caps
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any truncation warning fails the test
        batch, aux = ing.ingest([doc, doc100])
    # every page produced chunks
    assert int(batch.num_pages[1]) == 100
    pages_with_chunks = set(np.asarray(batch.chunk_page[1])[np.asarray(batch.chunk_mask[1])].tolist())
    assert pages_with_chunks == set(range(100))

    # the planted chunk on page 99 is retrievable
    eng = _engine(k=3)
    ret = eng.retrieve(batch)
    assert 99 in np.asarray(ret.top_k_page[1]).tolist()


def test_default_caps_warn_on_overflow():
    import random

    doc = make_document(random.Random(5), n_pages=30, words_per_page=50, question_id=0)
    ing = DocVQAIngestor(TOK, SPEC, Caps(max_pages=8, max_chunks=16, max_slots=256,
                                         tokens_per_word=16, embed_tokens=64))
    with pytest.warns(UserWarning, match="ingest truncated"):
        ing.ingest([doc])
