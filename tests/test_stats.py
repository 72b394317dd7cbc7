"""Stats instrumentation + Hi-VT5 train step."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.ops.chunking import ChunkSpec
from rag_docvqa_tpu.utils_stats import StatsCollector, collect_ingest_stats


def test_stats_collector_add_merge():
    a = StatsCollector(compute_examples=True, n_examples=2)
    a.add("chunk_size_dist", 10, example="q1")
    a.add("chunk_size_dist", 10, example="q2")
    a.add("chunk_size_dist", 10, example="q3")  # capped at 2 examples
    b = StatsCollector(compute_examples=True, n_examples=2)
    b.add("chunk_size_dist", 10)
    b.add("chunk_size_dist", 5)
    a.merge(b)
    assert a.stats["chunk_size_dist"][10] == 4
    assert a.stats["chunk_size_dist"][5] == 1
    assert a.stats_examples["chunk_size_dist"][10] == ["q1", "q2"]


def test_stats_disabled_noop():
    s = StatsCollector(compute_stats=False)
    s.add("x", 1)
    assert s.stats == {}


def test_collect_ingest_stats():
    tok = HashTokenizer(vocab_size=512)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=10, overlap=2), Caps(max_pages=3, max_chunks=16, max_slots=256))
    docs = make_corpus(2, n_pages=2, words_per_page=25, seed=0)
    batch, aux = ing.ingest(docs)
    sc = collect_ingest_stats(batch, aux)
    summary = sc.summary()
    # 25 words, size 10 overlap 2 -> chunks [0:10],[8:18],[16:25](tail 9 merges? 10+(9-2)=17>12 no) -> 3/page
    assert summary["n_chunks_per_doc_dist"] == {6: 2}
    assert summary["n_chunks_per_page_dist"] == {3: 4}
    assert sum(summary["chunk_size_dist"].values()) == 12


def test_hivt5_train_step():
    from rag_docvqa_tpu.models import hivt5, t5 as t5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.training import TrainState, build_optimizer
    from rag_docvqa_tpu.training.train_step import make_hivt5_train_step

    tok = HashTokenizer(vocab_size=512)
    cfg = hivt5.HiVT5Config(
        t5=t5m.T5Config(vocab_size=512, d_model=16, d_kv=4, num_heads=4, d_ff=32,
                        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=16, dropout_rate=0.0),
        page_tokens=2, max_doc_pages=2, page_seq_len=32,
    )
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=8, overlap=2), Caps(max_pages=2, max_chunks=8, max_slots=64))
    docs = make_corpus(2, n_pages=2, words_per_page=15, seed=1)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))

    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)
    state = TrainState.create(params, tx)
    step = make_hivt5_train_step(cfg, tx)
    state, m = step(state, batch, labels)
    assert np.isfinite(float(m["loss"]))
    assert float(m["ret_loss"]) > 0
    assert int(state.step) == 1
