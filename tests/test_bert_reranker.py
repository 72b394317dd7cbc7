"""BERT encoder HF parity + reranker filter/clamp semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models.bert import (
    BertConfig,
    bert_encode,
    bert_sentence_embed,
    convert_bert_state_dict,
    cross_encoder_score,
    init_bert_params,
)
from rag_docvqa_tpu.engine.reranker import RerankerConfig, build_pair_tokens, rerank_select

pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'


TINY = BertConfig(
    vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64,
)


def test_bert_shapes_and_pooling():
    p = init_bert_params(jax.random.PRNGKey(0), TINY)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 200, (2, 10)))
    mask = jnp.ones((2, 10), bool)
    h = bert_encode(p, TINY, ids, mask)
    assert h.shape == (2, 10, 32)
    emb = bert_sentence_embed(p, TINY, ids, mask)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5)
    # leading batch dims
    emb3 = bert_sentence_embed(p, TINY, ids[:, None, :], mask[:, None, :])
    assert emb3.shape == (2, 1, 32)


def test_bert_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import BertConfig as HFBertConfig, BertModel

    hf_cfg = HFBertConfig(
        vocab_size=200, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg, add_pooling_layer=False).eval()
    params = jax.tree.map(jnp.asarray, convert_bert_state_dict({k: v.numpy() for k, v in hf.state_dict().items()}, TINY))

    rng = np.random.RandomState(1)
    ids = rng.randint(1, 200, (2, 12))
    mask = np.ones((2, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids), attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got = bert_encode(params, TINY, jnp.asarray(ids), jnp.asarray(mask, bool))
    # compare only non-padded positions (HF computes garbage on masked slots)
    np.testing.assert_allclose(np.asarray(got)[0], want[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got)[1, :8], want[1, :8], rtol=2e-4, atol=2e-4)


def test_cross_encoder_head():
    cfg = BertConfig(
        vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=64, num_labels=1,
    )
    p = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(1, 200, (4, 10)))
    s = cross_encoder_score(p, cfg, ids, jnp.ones((4, 10), bool))
    assert s.shape == (4,)
    assert ((s >= 0) & (s <= 1)).all()


def reference_rerank(scores, thresh, max_n, min_n):
    """Transliteration of src/_modules.py:1582-1590."""
    sorted_indices = list(np.argsort(scores)[::-1])
    filtered = [i for i in sorted_indices if scores[i] >= thresh]
    if len(filtered) > max_n:
        filtered = filtered[:max_n]
    elif len(filtered) < min_n:
        filtered = sorted_indices[:min_n]
    return filtered


@pytest.mark.parametrize(
    "scores,thresh,max_n,min_n",
    [
        ([0.9, 0.1, 0.5, 0.45, 0.8], 0.4, 3, 1),
        ([0.1, 0.2, 0.05], 0.4, 5, 1),  # nothing passes -> min fallback
        ([0.9, 0.8, 0.7, 0.6, 0.5], 0.4, 3, 1),  # too many pass -> clamp max
        ([0.41, 0.39], 0.4, 5, 2),  # below min -> top-min
    ],
)
def test_rerank_select_matches_reference(scores, thresh, max_n, min_n):
    cfg = RerankerConfig(filter_thresh=thresh, max_chunk_num=max_n, min_chunk_num=min_n)
    K = len(scores)
    perm, valid, sorted_scores = rerank_select(
        jnp.asarray([scores]), jnp.ones((1, K), bool), cfg
    )
    want = reference_rerank(np.asarray(scores), thresh, max_n, min_n)
    got = np.asarray(perm[0])[np.asarray(valid[0])].tolist()
    assert got == want


def test_rerank_respects_invalid_ranks():
    cfg = RerankerConfig(filter_thresh=0.4, max_chunk_num=5, min_chunk_num=2)
    scores = jnp.asarray([[0.9, 0.2, 0.95]])
    valid = jnp.asarray([[True, True, False]])  # rank 2 was padding
    perm, new_valid, _ = rerank_select(scores, valid, cfg)
    kept = np.asarray(perm[0])[np.asarray(new_valid[0])].tolist()
    assert kept == [0, 1]  # 0 passes; min=2 pulls in rank 1; padding never kept


def test_build_pair_tokens_layout():
    from rag_docvqa_tpu.data import HashTokenizer, DocVQAIngestor
    from rag_docvqa_tpu.data.contract import Caps
    from rag_docvqa_tpu.data.synthetic import make_corpus
    from rag_docvqa_tpu.ops.chunking import ChunkSpec

    tok = HashTokenizer(vocab_size=1000)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=8, overlap=2), Caps(max_pages=2, max_chunks=8, max_slots=64, embed_tokens=16))
    batch, _ = ing.ingest(make_corpus(2, n_pages=2, words_per_page=20, seed=3))
    cfg = RerankerConfig(cls_id=7, sep_id=9, pair_len=64, question_len=16)
    topk = jnp.asarray([[0, 1], [1, 2]])
    ids, mask = build_pair_tokens(batch, topk, cfg)
    assert ids.shape == (4, 64)
    ids0 = np.asarray(ids[0])
    q_len = int(np.asarray(batch.q_mask[0]).sum())
    c_len = int(np.asarray(batch.chunk_emb_mask[0, 0]).sum())
    assert ids0[0] == 7  # CLS
    np.testing.assert_array_equal(ids0[1 : 1 + q_len], np.asarray(batch.q_tokens[0, :q_len]))
    assert ids0[1 + q_len] == 9  # SEP
    np.testing.assert_array_equal(
        ids0[2 + q_len : 2 + q_len + c_len], np.asarray(batch.chunk_emb_tokens[0, 0, :c_len])
    )
    assert ids0[2 + q_len + c_len] == 9  # final SEP
    assert int(np.asarray(mask[0]).sum()) == 3 + q_len + c_len


def test_jina_backend_alibi_glu_mean_pool():
    """JinaBERT options (the JINA BiEncoder backend, src/_modules.py:1435-1443):
    ALiBi replaces position embeddings (shift-invariant before padding enters),
    GLU feed-forward, mean pooling; normalized embeddings."""
    from rag_docvqa_tpu.models.bert import BertConfig, bert_sentence_embed, init_bert_params

    cfg = BertConfig(vocab_size=500, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, use_alibi=True, glu_mlp=True, pooling="mean")
    params = init_bert_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(3, 500, size=(2, 12)))
    mask = jnp.ones((2, 12), bool)
    emb = bert_sentence_embed(params, cfg, ids, mask)
    assert emb.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0, rtol=1e-5)

    # ALiBi is relative: identical full-length sequences give identical
    # embeddings regardless of content elsewhere in the batch
    emb2 = bert_sentence_embed(params, cfg, ids[:1], mask[:1])
    np.testing.assert_allclose(np.asarray(emb2)[0], np.asarray(emb)[0], rtol=1e-5, atol=1e-6)

    # mean pooling ignores masked positions
    ids3 = jnp.concatenate([ids[:1], jnp.zeros((1, 4), jnp.int32)], axis=1)
    mask3 = jnp.concatenate([mask[:1], jnp.zeros((1, 4), bool)], axis=1)
    emb3 = bert_sentence_embed(params, cfg, ids3, mask3)
    np.testing.assert_allclose(np.asarray(emb3)[0], np.asarray(emb)[0], rtol=1e-4, atol=1e-5)
