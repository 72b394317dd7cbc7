"""YAML-constructible rerank + NAC stages (VERDICT round-1 item 5) and the
FlagLLMReranker scoring head (item 7).

Reference: RAGVT5 wires Reranker/NAC from the config dict
(src/RAGVT5.py:101-115); "gemma" in reranker_weights selects the LLM
reranker (src/_modules.py:1555-1558).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax

from rag_docvqa_tpu.config import build_engine, build_reranker
from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.engine.reranker import FlagLLMReranker, Reranker
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.ops.chunking import ChunkSpec

TOK = HashTokenizer(vocab_size=2048)
BASE_CFG = {
    "model_name": "VT5",
    "d_model": 32, "d_kv": 8, "num_heads": 4, "d_ff": 64, "num_layers": 2,
    "dropout_rate": 0.0, "page_retrieval": "concat", "chunk_num": 6,
    "max_source_length": 128, "max_new_tokens": 4, "seed": 0,
    "reranker_d_model": 32, "reranker_num_layers": 1, "reranker_num_heads": 4,
    "reranker_d_ff": 64,
}
CAPS = Caps(max_pages=3, max_chunks=16, max_slots=256, tokens_per_word=8, embed_tokens=48)


def _ingest(n=4):
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2), CAPS)
    return ing.ingest(make_corpus(n, n_pages=3, words_per_page=40, seed=2))


def _params(cfg_dict):
    from rag_docvqa_tpu.config import build_vt5_config

    return vt5m.init_vt5_params(jax.random.PRNGKey(0), build_vt5_config(cfg_dict, TOK.vocab_size))


@pytest.mark.slow
def test_rerank_from_config_changes_topk_order():
    cfg = {**BASE_CFG, "rerank": True, "rerank_filter_tresh": 0.0,
           "rerank_max_chunk_num": 4, "rerank_min_chunk_num": 1}
    params = _params(cfg)
    plain = build_engine({**BASE_CFG}, params, TOK)
    reranked = build_engine(cfg, params, TOK)
    assert plain.reranker is None
    assert isinstance(reranked.reranker, Reranker)

    batch, aux = _ingest()
    ret0 = plain.retrieve(batch)
    ret1 = reranked.reranker(batch, ret0)
    # clamp semantics: at most max_chunk_num survive
    assert int(np.asarray(ret1.top_k_valid).sum(axis=1).max()) <= 4
    # the permutation actually reordered at least one sample's top-k
    assert not np.array_equal(np.asarray(ret0.top_k_idx), np.asarray(ret1.top_k_idx))
    # scores are the sorted cross-encoder scores, descending over valid ranks
    s = np.asarray(ret1.top_k_score)
    v = np.asarray(ret1.top_k_valid)
    for b in range(s.shape[0]):
        sv = s[b][v[b]]
        assert np.all(np.diff(sv) <= 1e-6)
    # end-to-end inference consumes the reranked result
    out = reranked.inference(batch, aux)
    assert len(out["pred_answers"]) == batch.batch_size


def test_gemma_sniff_selects_llm_reranker():
    cfg = {**BASE_CFG, "rerank": True, "reranker_weights": "BAAI/bge-reranker-v2-gemma",
           "rerank_filter_tresh": 0.0, "rerank_max_chunk_num": 3}
    rr = build_reranker(cfg, TOK)
    assert isinstance(rr, FlagLLMReranker)

    params = _params(cfg)
    eng = build_engine(cfg, params, TOK)
    assert isinstance(eng.reranker, FlagLLMReranker)
    batch, aux = _ingest()
    ret0 = eng.retrieve(batch)
    ret1 = rr(batch, ret0)
    # rerank_select consumed the yes-logit scores: valid counts clamped,
    # scores sorted descending and in [0, 1] (normalize=True)
    v = np.asarray(ret1.top_k_valid)
    s = np.asarray(ret1.top_k_score)
    assert int(v.sum(axis=1).max()) <= 3
    assert np.all((s[v] >= 0) & (s[v] <= 1))
    out = eng.inference(batch, aux)
    assert len(out["pred_answers"]) == batch.batch_size


def test_nac_from_config_blanks_answers():
    cfg = {**BASE_CFG, "use_not_answerable_classifier": True,
           "not_answerable_threshold": -1.0}  # every prob > -1 -> blank all
    params = _params(cfg)
    eng = build_engine(cfg, params, TOK)
    assert eng.nac is not None
    batch, aux = _ingest()
    out = eng.inference(batch, aux)
    assert all(a == "" for a in out["pred_answers"])
    assert all(c == 0.0 for c in out["confidences"])
    assert "not_answerable_probs" in out["retrieval"]

    # threshold 1.0: nothing blanked, probs still reported
    cfg2 = {**BASE_CFG, "use_not_answerable_classifier": True, "not_answerable_threshold": 1.0}
    eng2 = build_engine(cfg2, params, TOK)
    out2 = eng2.inference(batch, aux)
    assert "not_answerable_probs" in out2["retrieval"]
