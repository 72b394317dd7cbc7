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
    # ChatML template (the reference applies the Qwen2.5 chat template via
    # processor.apply_chat_template, src/QwenVLInstruct.py:143-146)
    p = build_prompt("what?", ["chunk one", "chunk two"])
    assert p.startswith("<|im_start|>system")
    assert "<|im_start|>user\nquestion: what?" in p
    assert p.endswith("<|im_start|>assistant\n")
    assert "chunk one chunk two" in p


def _visual_engine(params_seed=0):
    from rag_docvqa_tpu.models.qwen_vision import QwenVisionConfig, init_qwen_vision_params
    from rag_docvqa_tpu.models.vit import ViTConfig

    vcfg = QwenVisionConfig(
        vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                      patch_size=8, image_size=32),
        out_dim=LM.d_model,
    )
    params = clm.init_causal_lm_params(jax.random.PRNGKey(params_seed), LM)
    params["vision"] = init_qwen_vision_params(jax.random.PRNGKey(params_seed + 1), vcfg)
    cfg = QwenRAGConfig(chunk_num=3, max_prompt_tokens=196, max_new_tokens=3,
                        use_visual=True, max_crops=2)
    return RAGQwenEngine(cfg, LM, params, TOK, vision_cfg=vcfg), vcfg


def _docs_with_images(bs=2):
    docs = make_corpus(bs, n_pages=2, words_per_page=30, seed=21)
    rng = np.random.RandomState(0)
    for d in docs:
        d.images = [rng.randint(0, 255, (64, 64, 3)).astype(np.uint8) for _ in d.words]
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=10, overlap=2),
                         Caps(max_pages=2, max_chunks=12, max_slots=128))
    batch, aux = ing.ingest(docs)
    return docs, batch, aux


def test_visual_path_reaches_generator():
    """Retrieved image crops change the generator output (the vision tower
    feeds visual tokens through the <|image_pad|> splice —
    src/QwenVLInstruct.py:85-160)."""
    docs, batch, aux = _docs_with_images()
    eng, vcfg = _visual_engine()
    out_vis = eng.inference(batch, aux)

    # same engine, images removed -> placeholders absent -> different prompt
    aux_noimg = dict(aux, images=[None] * len(docs))
    out_txt = eng.inference(batch, aux_noimg)
    assert out_vis["pred_answers"] != out_txt["pred_answers"] or \
        not np.allclose(out_vis["confidences"], out_txt["confidences"])

    # different image content -> different visual embeddings -> output changes
    rng = np.random.RandomState(99)
    for d in docs:
        d.images = [rng.randint(0, 255, (64, 64, 3)).astype(np.uint8) for _ in d.words]
    _, _, aux2 = _docs_with_images()  # re-ingest not needed; aux carries images
    aux2 = dict(aux, images=[d.images for d in docs])
    out_vis2 = eng.inference(batch, aux2)
    assert out_vis2["pred_answers"] != out_vis["pred_answers"] or \
        not np.allclose(out_vis2["confidences"], out_vis["confidences"])


def test_sft_batch_includes_image_placeholders():
    docs, batch, aux = _docs_with_images()
    eng, vcfg = _visual_engine()
    ids, mask, labels, vemb, vmask = eng.build_sft_batch(batch, aux)
    ids_np, vmask_np = np.asarray(ids), np.asarray(vmask)
    # placeholder spans present and aligned with the visual mask
    assert vmask_np.sum() > 0
    assert (ids_np[vmask_np] == eng.image_pad_id).all()
    # expected span length per crop
    assert vmask_np[0].sum() % vcfg.tokens_per_image == 0
    # answer tokens still supervised
    labels_np = np.asarray(labels)
    sup = labels_np[0][labels_np[0] != -100]
    assert len(sup) > 0 and sup[-1] == LM.eos_id
    # loss runs with the visual splice
    loss = clm.sft_loss(eng.params, LM, ids, mask, labels, vemb, vmask)
    assert np.isfinite(float(loss))


def test_visual_path_with_faithful_qwen25_tower():
    """The weight-convertible Qwen2.5-VL tower plugs into the same engine
    visual path (models/qwen25_vision.py)."""
    from rag_docvqa_tpu.models.qwen25_vision import (
        Qwen25VisionConfig, init_qwen25_vision_params,
    )

    vcfg = Qwen25VisionConfig(
        hidden_size=32, intermediate_size=64, num_heads=4, depth=2,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        window_size=16, out_hidden_size=LM.d_model, fullatt_block_indexes=(1,),
        image_size=32,
    )
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), LM)
    params["vision"] = init_qwen25_vision_params(jax.random.PRNGKey(1), vcfg)
    cfg = QwenRAGConfig(chunk_num=3, max_prompt_tokens=256, max_new_tokens=3,
                        use_visual=True, max_crops=2)
    eng = RAGQwenEngine(cfg, LM, params, TOK, vision_cfg=vcfg)

    docs, batch, aux = _docs_with_images()
    out_vis = eng.inference(batch, aux)
    out_txt = eng.inference(batch, dict(aux, images=[None] * len(docs)))
    assert out_vis["pred_answers"] != out_txt["pred_answers"] or \
        not np.allclose(out_vis["confidences"], out_txt["confidences"])
    # placeholder spans per crop match the faithful tower's token count
    ids, mask, labels, vemb, vmask = eng.build_sft_batch(batch, aux)
    assert np.asarray(vmask)[0].sum() % vcfg.tokens_per_image == 0


def test_visual_sft_spans_clipped_at_prompt_truncation():
    """Regression: with a prompt overflowing max_prompt_tokens, placeholder
    spans must NOT bleed into the supervised answer region."""
    docs, batch, aux = _docs_with_images()
    from rag_docvqa_tpu.models.qwen_vision import QwenVisionConfig, init_qwen_vision_params
    from rag_docvqa_tpu.models.vit import ViTConfig

    vcfg = QwenVisionConfig(
        vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                      patch_size=8, image_size=32),
        out_dim=LM.d_model,
    )
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), LM)
    params["vision"] = init_qwen_vision_params(jax.random.PRNGKey(1), vcfg)
    # tiny prompt budget forces truncation mid-placeholder-span
    cfg = QwenRAGConfig(chunk_num=3, max_prompt_tokens=64, answer_max_tokens=8,
                        use_visual=True, max_crops=2)
    eng = RAGQwenEngine(cfg, LM, params, TOK, vision_cfg=vcfg)
    ids, mask, labels, vemb, vmask = eng.build_sft_batch(batch, aux)
    ids_np, vmask_np, labels_np = map(np.asarray, (ids, vmask, labels))
    # every visual-mask position holds a placeholder token and is unsupervised
    assert (ids_np[vmask_np] == eng.image_pad_id).all()
    assert (labels_np[vmask_np] == -100).all()
