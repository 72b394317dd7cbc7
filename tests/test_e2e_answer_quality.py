"""END-TO-END answer quality: the full train -> retrieve -> assemble ->
generate -> decode -> ANLS loop produces correct answers.

This is the in-image stand-in for real-checkpoint ANLS validation (no
pretrained weights ship with this environment): a tiny VT5 trained through
the actual Trainer step on the planted-fact corpus reaches ANLS = 1.0 via
the actual evaluation loop — every stage of the reference pipeline
(eval.py:191-440) demonstrably works at the answer level, not just the
module level.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.engine import RAGConfig, RAGVT5Engine
from rag_docvqa_tpu.engine.evaluate import evaluate
from rag_docvqa_tpu.metrics import Evaluator
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models import vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec
from rag_docvqa_tpu.training import TrainState, build_optimizer, make_train_step, trainable_mask

pytestmark = pytest.mark.slow

TOK = HashTokenizer(vocab_size=2048)
CFG = vt5m.VT5Config(
    t5=t5m.T5Config(vocab_size=2048, d_model=64, d_kv=16, num_heads=4, d_ff=128,
                    num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0),
    spatial=SpatialConfig(hidden_size=64, dropout_rate=0.0),
    vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                  patch_size=8, image_size=16),
    use_visual=False,
)
CAPS = Caps(max_pages=2, max_chunks=12, max_slots=192, tokens_per_word=8, embed_tokens=48)
RAG = RAGConfig(page_retrieval="concat", chunk_num=3, max_source_length=128, max_new_tokens=8)


def test_trained_model_answers_correctly():
    docs = make_corpus(8, n_pages=2, words_per_page=30, seed=42)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2), CAPS)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=8, seed=0))

    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), CFG)
    tx = build_optimizer(lr=3e-3, warmup_steps=10, total_steps=600,
                         mask=trainable_mask(params, ("t5", "spatial")))
    state = TrainState.create(params, tx)
    step = make_train_step(CFG, RAG, tx)
    for _ in range(500):
        state, m = step(state, batch, labels)
    assert float(m["loss"]) < 0.1

    eng = RAGVT5Engine(RAG, CFG, state.params, TOK)
    out = evaluate(eng, docs, ing, Evaluator(), batch_size=8)
    assert out["anls"] == 1.0, f"anls {out['anls']}: {out['pred_answers']}"
    assert out["accuracy"] == 1.0
    # the answers really decode to the planted facts
    assert out["pred_answers"] == [d.answers[0] for d in docs]


def test_trained_hivt5_answers_and_retrieves_pages():
    """The HIERARCHICAL training path learns at the answer level too: a tiny
    Hi-VT5 trained through make_hivt5_train_step (LM CE + page-retrieval CE)
    reaches ANLS 1.0 through the standard evaluate() loop, with the page
    head retrieving the planted page (retrieval_precision 1.0) — evidence
    the pages-in-batch encode -> page-token compression -> decode pipeline
    and its joint loss are trainable end to end, not only grad-parity
    correct. Mirrors the reference's Hi-VT5 objective (train.py:69,
    _modules.py:173)."""
    from rag_docvqa_tpu.engine.hivt5_engine import HiVT5Engine
    from rag_docvqa_tpu.models import hivt5 as hm
    from rag_docvqa_tpu.training.train_step import make_hivt5_train_step

    cfg = hm.HiVT5Config(
        t5=t5m.T5Config(vocab_size=2048, d_model=64, d_kv=16, num_heads=4, d_ff=128,
                        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=64, dropout_rate=0.0),
        page_tokens=6, max_doc_pages=2, page_seq_len=64,
    )
    docs = make_corpus(8, n_pages=2, words_per_page=30, seed=42)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2), CAPS)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=8, seed=0))

    params = hm.init_hivt5_params(jax.random.PRNGKey(0), cfg)
    tx = build_optimizer(lr=3e-3, warmup_steps=10, total_steps=900)
    state = TrainState.create(params, tx)
    step = make_hivt5_train_step(cfg, tx)
    for _ in range(800):
        state, m = step(state, batch, labels)
    assert float(m["loss"]) < 0.1

    eng = HiVT5Engine(cfg, state.params, TOK, max_new_tokens=8)
    out = evaluate(eng, docs, ing, Evaluator(), batch_size=8)
    assert out["anls"] == 1.0, f"anls {out['anls']}: {out['pred_answers']}"
    assert out["retrieval_precision"] == 1.0


def test_sft_qwen_answers_correctly():
    """The decoder-only SFT path learns at the answer level: a tiny Qwen
    trained with masked-label SFT (build_sft_batch -> sft_step_loss) answers
    every planted-fact question through the full RAGQwenEngine loop
    (retrieve -> ChatML prompt -> flash-prefill/cached-decode -> extract).

    Retrieval-drift gotcha this test pins: RAGQwenEngine defaults its
    bi-encoder to the LM's OWN embedding table — SFT trains that table, so
    post-training retrieval diverges from the contexts the SFT batch was
    built with (observed: half the answers collapse onto one doc's value).
    Production fine-tunes must pass a FROZEN `embed_shared` (or a separate
    embedder), exactly as here."""
    import optax

    from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine, sft_step_loss
    from rag_docvqa_tpu.models import causal_lm as clm

    lm = clm.CausalLMConfig(vocab_size=2048, d_model=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, d_ff=128)
    docs = make_corpus(8, n_pages=2, words_per_page=30, seed=42)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2), CAPS)
    batch, aux = ing.ingest(docs)
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), lm)
    frozen_embed = jnp.array(params["embed"])
    rag = QwenRAGConfig(chunk_num=3, max_prompt_tokens=128,
                        answer_max_tokens=8, max_new_tokens=8)
    eng = RAGQwenEngine(rag, lm, params, TOK, embed_shared=frozen_embed)
    ids, mask, labels = eng.build_sft_batch(batch, aux, seed=0)

    tx = optax.adamw(3e-3)
    opt = tx.init(params)

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(params, opt, cfg, i, m, l):
        loss, g = jax.value_and_grad(sft_step_loss)(params, cfg, i, m, l)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    loss = None
    for _ in range(500):
        params, opt, loss = step(params, opt, lm, ids, mask, labels)
    assert float(loss) < 0.05

    eng = RAGQwenEngine(rag, lm, params, TOK, embed_shared=frozen_embed)
    out = eng.inference(batch, aux)
    m = Evaluator().get_metrics(aux["answers"], out["pred_answers"])
    assert float(np.mean(m["anls"])) == 1.0, out["pred_answers"]
    assert float(np.mean(m["accuracy"])) == 1.0


def test_lora_adapters_answer_correctly():
    """Adapter-only fine-tuning (train_lora.py's exact recipe: r=8 LoRA on
    q/v, frozen base) reaches ANLS 1.0 through the full RAGQwenEngine loop.
    Notably the CE loss stays HIGH (~6.3 — q/v-only adapters cannot sharpen
    the output distribution of a frozen random base) while greedy answers
    are exact: the adapters learn the attention COPY circuit that lifts the
    answer out of the retrieved context, which is precisely the behavior a
    RAG fine-tune needs (reference train_lora.py:267-275)."""
    import optax

    from rag_docvqa_tpu.engine.rag_qwen import QwenRAGConfig, RAGQwenEngine
    from rag_docvqa_tpu.models import causal_lm as clm
    from rag_docvqa_tpu.models.lora import init_lora, merge_lora

    lm = clm.CausalLMConfig(vocab_size=2048, d_model=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, d_ff=128)
    docs = make_corpus(8, n_pages=2, words_per_page=30, seed=42)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2), CAPS)
    batch, aux = ing.ingest(docs)
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), lm)
    frozen_embed = jnp.array(params["embed"])
    rag = QwenRAGConfig(chunk_num=3, max_prompt_tokens=128,
                        answer_max_tokens=8, max_new_tokens=8)
    eng = RAGQwenEngine(rag, lm, params, TOK, embed_shared=frozen_embed)
    ids, mask, labels = eng.build_sft_batch(batch, aux, seed=0)

    lora = init_lora(jax.random.PRNGKey(1), params, targets=("q", "v"), rank=8)
    tx = optax.adamw(1e-2)
    opt = tx.init(lora)

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(l, o, cfg, i, m, lb):
        def loss_fn(l_):
            from rag_docvqa_tpu.engine.rag_qwen import sft_step_loss

            return sft_step_loss(merge_lora(params, l_), cfg, i, m, lb)

        loss, g = jax.value_and_grad(loss_fn)(l)
        up, o = tx.update(g, o, l)
        return optax.apply_updates(l, up), o, loss

    loss0 = loss = None
    for i in range(1000):
        lora, opt, loss = step(lora, opt, lm, ids, mask, labels)
        if i == 0:
            loss0 = float(loss)
    assert float(loss) < loss0  # learning, even though CE stays high

    merged = merge_lora(params, lora)
    eng = RAGQwenEngine(rag, lm, merged, TOK, embed_shared=frozen_embed)
    out = eng.inference(batch, aux)
    m = Evaluator().get_metrics(aux["answers"], out["pred_answers"])
    assert float(np.mean(m["anls"])) == 1.0, out["pred_answers"]
