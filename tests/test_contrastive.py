"""Contrastive embedder fine-tune: losses, mining, end-to-end improvement."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.models.embedder import vt5_table_embed
from rag_docvqa_tpu.ops.chunking import ChunkSpec
from rag_docvqa_tpu.training.contrastive import (
    ContrastiveConfig,
    clip_style_loss,
    load_pairs,
    mine_positive_pairs,
    multiple_negatives_ranking_loss,
    save_pairs,
    train_contrastive,
)


def test_losses_prefer_aligned_pairs():
    aligned = jnp.eye(4, 8)
    assert float(multiple_negatives_ranking_loss(aligned, aligned)) < float(
        multiple_negatives_ranking_loss(aligned, jnp.roll(aligned, 1, axis=0))
    )
    assert float(clip_style_loss(aligned, aligned)) < float(
        clip_style_loss(aligned, jnp.roll(aligned, 1, axis=0))
    )


def test_pairs_roundtrip(tmp_path):
    pairs = [("q1", "c1"), ("q2", "c2")]
    p = tmp_path / "pairs.jsonl"
    save_pairs(str(p), pairs)
    assert load_pairs(str(p)) == pairs


def test_train_contrastive_improves_retrieval():
    """Fine-tuning the shared-table embedder on (question, chunk) pairs should
    raise the positive's cosine rank."""
    tok = HashTokenizer(vocab_size=512)
    rng = np.random.RandomState(0)
    # synthetic pairs: each question goes with a distinct chunk text
    pairs = [(f"question about topic{i}", f"topic{i} detail words here") for i in range(16)]

    d = 32
    params = {"shared": jnp.asarray(rng.randn(512, d).astype(np.float32) * 0.1)}

    def embed_fn(p, ids, mask):
        return vt5_table_embed(p["shared"], ids, mask)

    def mean_rank(p):
        ids_a = np.zeros((16, 16), np.int32)
        m_a = np.zeros((16, 16), bool)
        ids_b = np.zeros((16, 16), np.int32)
        m_b = np.zeros((16, 16), bool)
        for i, (a, b) in enumerate(pairs):
            ta, tb = tok.encode(a)[:16], tok.encode(b)[:16]
            ids_a[i, : len(ta)] = ta
            m_a[i, : len(ta)] = True
            ids_b[i, : len(tb)] = tb
            m_b[i, : len(tb)] = True
        ea = embed_fn(p, jnp.asarray(ids_a), jnp.asarray(m_a))
        eb = embed_fn(p, jnp.asarray(ids_b), jnp.asarray(m_b))
        ea = ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
        eb = eb / jnp.linalg.norm(eb, axis=-1, keepdims=True)
        sims = np.asarray(ea @ eb.T)
        ranks = [(sims[i] > sims[i, i]).sum() for i in range(16)]
        return float(np.mean(ranks))

    before = mean_rank(params)
    trained, losses = train_contrastive(
        embed_fn, params, tok, pairs, ContrastiveConfig(lr=3e-3, epochs=8, batch_size=8)
    )
    after = mean_rank(trained)
    assert losses[-1] < losses[0]
    assert after < before, f"retrieval rank did not improve: {before} -> {after}"


def test_mine_positive_pairs():
    """Mining keeps chunks whose per-chunk answer matches the gold answer."""

    class FakeEngine:
        def inference(self, batch, aux):
            B = len(aux["questions"])
            return {
                "pred_answers": [[aux["answers"][b][0], "wrong"] for b in range(B)],
                "confidences": [[0.9, 0.1]] * B,
                "pred_answer_pages": [[0, 0]] * B,
                "retrieval": {"text": [["good chunk", "bad chunk"] for _ in range(B)]},
            }

    tok = HashTokenizer(vocab_size=512)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=8, overlap=2), Caps(max_pages=2, max_chunks=8, max_slots=64))
    docs = make_corpus(3, n_pages=2, words_per_page=20, seed=0)
    pairs = mine_positive_pairs(FakeEngine(), docs, ing, anls_threshold=0.8)
    assert len(pairs) == 3
    assert all(p[1] == "good chunk" for p in pairs)


def test_bf16_compute_still_learns():
    """bf16_compute: bf16 towers with f32 masters — loss still decreases and
    the trained embedder still ranks the positive first."""
    from rag_docvqa_tpu.models.bert import BertConfig, bert_sentence_embed, init_bert_params
    from rag_docvqa_tpu.training.contrastive import ContrastiveConfig, train_contrastive
    from rag_docvqa_tpu.data import HashTokenizer

    cfg = BertConfig(vocab_size=512, hidden_size=32, num_layers=2, num_heads=2,
                     intermediate_size=64)
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(vocab_size=512)
    pairs = [(f"what is item{i}", f"the item{i} is value{i}") for i in range(16)]
    embed = lambda p, ids, m: bert_sentence_embed(p, cfg, ids, m)
    trained, losses = train_contrastive(
        embed, params, tok, pairs,
        ContrastiveConfig(lr=2e-3, epochs=8, batch_size=8, max_tokens=16,
                          bf16_compute=True),
    )
    assert losses[-1] < losses[0]
