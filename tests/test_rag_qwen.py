"""RAG + decoder-only generator engine: retrieval texts, inference, LoRA SFT."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine, build_prompt, sft_step_loss
from rag_docvqa_tpu.models import causal_lm as clm
from rag_docvqa_tpu.models.lora import init_lora, merge_lora
from rag_docvqa_tpu.ops.chunking import ChunkSpec

TOK = HashTokenizer(vocab_size=2048)
LM = clm.CausalLMConfig(vocab_size=2048, d_model=32, num_layers=2, num_heads=4, num_kv_heads=2, d_ff=64)


def build(bs=2):
    docs = make_corpus(bs, n_pages=2, words_per_page=30, seed=21)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2),
                         Caps(max_pages=2, max_chunks=12, max_slots=128))
    batch, aux = ing.ingest(docs)
    return docs, batch, aux


def test_retrieve_texts_and_pages():
    docs, batch, aux = build()
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), LM)
    eng = RAGQwenEngine(QwenRAGConfig(chunk_num=3, max_prompt_tokens=128, max_new_tokens=3), LM, params, TOK)
    texts, pages = eng.retrieve_texts(batch, aux)
    assert len(texts) == len(docs)
    # planted chunk retrieved top-1 -> its text contains the answer value
    for b, d in enumerate(docs):
        assert d.answers[0] in " ".join(texts[b])
        assert pages[b][0] == d.answer_page_idx


def test_inference_end_to_end():
    docs, batch, aux = build()
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), LM)
    eng = RAGQwenEngine(QwenRAGConfig(chunk_num=3, max_prompt_tokens=128, max_new_tokens=3), LM, params, TOK)
    out = eng.inference(batch, aux)
    assert len(out["pred_answers"]) == 2
    assert all(isinstance(a, str) for a in out["pred_answers"])


def test_sft_batch_and_lora_step():
    docs, batch, aux = build()
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), LM)
    eng = RAGQwenEngine(QwenRAGConfig(chunk_num=2, max_prompt_tokens=96, answer_max_tokens=8), LM, params, TOK)
    ids, mask, labels = eng.build_sft_batch(batch, aux)
    labels_np = np.asarray(labels)
    # prompt masked, answer supervised, ends with eos
    assert (labels_np[:, 0] == -100).all()
    for b in range(2):
        sup = labels_np[b][labels_np[b] != -100]
        assert len(sup) > 0 and sup[-1] == LM.eos_id
    loss = sft_step_loss(params, LM, ids, mask, labels)
    assert np.isfinite(float(loss))

    # one LoRA step end-to-end
    import optax

    lora = init_lora(jax.random.PRNGKey(1), params, targets=("q", "v"), rank=2)
    tx = optax.adam(1e-2)
    opt = tx.init(lora)

    def loss_fn(l):
        return sft_step_loss(merge_lora(params, l), LM, ids, mask, labels)

    l0, grads = jax.value_and_grad(loss_fn)(lora)
    updates, opt = tx.update(grads, opt, lora)
    lora2 = optax.apply_updates(lora, updates)
    assert float(loss_fn(lora2)) != float(l0)


def test_build_prompt():
    p = build_prompt("what?", ["chunk one", "chunk two"])
    assert p.startswith("user: what?") and p.endswith("assistant:")
    assert "chunk one chunk two" in p
