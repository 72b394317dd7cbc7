"""End-to-end engine tests: every answering strategy runs on synthetic docs;
retrieval semantics (planted-chunk recall) verified with the VT5 table
embedder."""

import jax
import numpy as np
import pytest

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.engine import RAGConfig, RAGVT5Engine
from rag_docvqa_tpu.metrics import Evaluator
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec

# word-identity subword tokens (a byte tokenizer would share tokens across all
# words and wash out the cosine retrieval signal)
TOK = HashTokenizer(vocab_size=4096)

VT5_CFG = vt5m.VT5Config(
    t5=t5m.T5Config(
        vocab_size=TOK.vocab_size, d_model=32, d_kv=8, num_heads=4, d_ff=64,
        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0,
    ),
    spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32, patch_size=8, image_size=32),
    use_visual=False,
)

CAPS = Caps(max_pages=4, max_chunks=32, max_slots=768, tokens_per_word=12, embed_tokens=64)


@pytest.fixture(scope="module")
def params():
    return vt5m.init_vt5_params(jax.random.PRNGKey(0), VT5_CFG)


def build(mode="fixed", bs=3):
    docs = make_corpus(bs, n_pages=3, words_per_page=60, seed=7)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=15, overlap=3, mode=mode), CAPS)
    batch, aux = ing.ingest(docs)
    return docs, batch, aux


def test_retrieval_finds_planted_chunk(params):
    docs, batch, aux = build()
    eng = RAGVT5Engine(RAGConfig(page_retrieval="concat", chunk_num=3, max_new_tokens=4), VT5_CFG, params, TOK)
    ret = eng.retrieve(batch)
    pages = np.asarray(ret.top_k_page)
    # the top-1 chunk should live on the planted answer page: the question
    # shares its key token with exactly one chunk in the document
    hits = sum(int(pages[b, 0] == docs[b].answer_page_idx) for b in range(len(docs)))
    assert hits == len(docs), f"top-1 page recall {hits}/{len(docs)}"


@pytest.mark.parametrize(
    "strategy",
    ["concat", "maxconf", "anyconf", "maxconfpage", "anyconfpage", "anyconforacle", "majorpage", "weightmajorpage", "none"],
)
def test_strategy_runs_end_to_end(params, strategy):
    docs, batch, aux = build()
    cfg = RAGConfig(page_retrieval=strategy, chunk_num=3, max_new_tokens=3,
                    max_source_length=256, per_chunk_seq_len=128, include_surroundings=2)
    eng = RAGVT5Engine(cfg, VT5_CFG, params, TOK)
    out = eng.inference(batch, aux)
    B = len(docs)
    assert len(out["pred_answers"]) == B
    assert len(out["pred_answer_pages"]) == B
    ev = Evaluator()
    m = ev.get_metrics([d.answers for d in docs], out["pred_answers"])
    assert len(m["anls"]) == B
    if strategy not in ("none", "majorpage", "weightmajorpage"):
        # retrieval precision computable against top-k page lists
        prec = ev.get_retrieval_metric([d.answer_page_idx for d in docs], out["pred_answer_pages"])
        assert len(prec) == B
        # top-1 retrieval found the planted page (checked above), so gt-in-topk
        assert sum(prec) == B
    if strategy.startswith("any"):
        assert isinstance(out["pred_answers"][0], list)


def test_oracle_strategy(params):
    docs, batch, aux = build(mode="oracle")
    cfg = RAGConfig(page_retrieval="oracle", chunk_num=1, max_new_tokens=3, max_source_length=256)
    eng = RAGVT5Engine(cfg, VT5_CFG, params, TOK)
    out = eng.inference(batch, aux)
    for b, d in enumerate(docs):
        assert out["pred_answer_pages"][b] == [d.answer_page_idx]


def test_retrieval_texts_contain_answer(params):
    docs, batch, aux = build()
    cfg = RAGConfig(page_retrieval="concat", chunk_num=3, include_surroundings=3)
    eng = RAGVT5Engine(cfg, VT5_CFG, params, TOK)
    out = eng.inference(batch, aux)
    ev = Evaluator()
    scores = ev.eval_retrieval([d.answers for d in docs], out["retrieval"]["text"])
    # planted value is inside the retrieved top-1 chunk -> near-perfect chunk score
    assert all(s > 0.9 for s in scores["chunk_score"])


def test_sep_token_insertion(params):
    docs, batch, aux = build()
    cfg = RAGConfig(page_retrieval="concat", chunk_num=3, sep_token_id=2)
    eng = RAGVT5Engine(cfg, VT5_CFG, params, TOK)
    from rag_docvqa_tpu.ops.gather import assemble_concat

    ret = eng.retrieve(batch)
    gen, _ = assemble_concat(batch, ret.top_k_idx, ret.top_k_valid, cfg.assemble())
    ids = np.asarray(gen.input_ids)
    # 3 valid chunks -> 2 separators per row
    assert ((ids == 2).sum(axis=1) == 2).all()


@pytest.mark.slow
def test_data_parallel_eval_matches_single_device():
    """evaluate(mesh=...) shards batches over the 8-device mesh and produces
    identical metrics to the unsharded run."""
    from rag_docvqa_tpu.engine.evaluate import evaluate
    from rag_docvqa_tpu.metrics import Evaluator
    from rag_docvqa_tpu.parallel import create_mesh

    # 10 docs at batch_size 8: the trailing batch of 2 is NOT divisible by the
    # 8-way data axis — evaluate() must pad it to a mesh multiple (and trim the
    # padded samples) rather than silently dropping the sharding
    docs = make_corpus(10, n_pages=2, words_per_page=30, seed=12)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=15, overlap=3), CAPS)
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), VT5_CFG)
    eng = RAGVT5Engine(RAGConfig(page_retrieval="concat", chunk_num=3,
                                 max_source_length=128, max_new_tokens=4),
                       VT5_CFG, params, TOK)
    plain = evaluate(eng, docs, ing, Evaluator(), batch_size=8, compute_stats=True)
    mesh = create_mesh((8, 1), ("data", "model"))
    sharded = evaluate(eng, docs, ing, Evaluator(), batch_size=8, mesh=mesh,
                       compute_stats=True)
    assert plain["n_samples"] == sharded["n_samples"] == 10
    for k in ("accuracy", "anls", "retrieval_precision", "chunk_score"):
        assert plain[k] == sharded[k], k
    assert plain["pred_answers"] == sharded["pred_answers"]
    # ingest stats must not count the mesh-padding duplicates of the last
    # partial batch (10 docs pad to 16: 6 copies of doc 10 would skew these)
    assert plain["retrieval_stats"] == sharded["retrieval_stats"]


def test_reading_order_reorder(params):
    """reorder_chunks sorts the retrieved top-k into ascending (page,
    slot_start) with invalid rows last (reference _modules.py:2129-2142)."""
    from rag_docvqa_tpu.engine.rag_vt5 import reading_order_device

    docs, batch, aux = build()
    eng = RAGVT5Engine(RAGConfig(page_retrieval="concat", chunk_num=3, max_new_tokens=3),
                       VT5_CFG, params, TOK)
    ret = eng.retrieve(batch)
    ordered = reading_order_device(ret, batch)
    pages = np.asarray(ordered.top_k_page)
    starts = np.asarray(jax.numpy.take_along_axis(batch.chunk_slot_start, ordered.top_k_idx, axis=1))
    valid = np.asarray(ordered.top_k_valid)
    for b in range(pages.shape[0]):
        keys = [(int(pages[b, r]), int(starts[b, r])) for r in range(pages.shape[1]) if valid[b, r]]
        assert keys == sorted(keys), keys
        # invalid rows trail the valid ones
        first_invalid = valid[b].argmin() if not valid[b].all() else len(valid[b])
        assert valid[b][:first_invalid].all() and not valid[b][first_invalid:].any()
    # same chunk set, different order
    assert set(np.asarray(ret.top_k_idx)[0][np.asarray(ret.top_k_valid)[0]]) == set(
        np.asarray(ordered.top_k_idx)[0][valid[0]]
    )
    # the engine path runs end-to-end with reordering enabled
    eng2 = RAGVT5Engine(
        RAGConfig(page_retrieval="concat", chunk_num=3, max_new_tokens=3, reorder_chunks=True),
        VT5_CFG, params, TOK,
    )
    out = eng2.inference(batch, aux)
    assert len(out["pred_answers"]) == len(docs)
