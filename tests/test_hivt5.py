"""Hi-VT5: hierarchical encode shapes, page masking, losses, generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.models import hivt5, t5 as t5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec

TOK = HashTokenizer(vocab_size=1024)
CFG = hivt5.HiVT5Config(
    t5=t5m.T5Config(vocab_size=1024, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                    num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0),
    spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
    page_tokens=4,
    max_doc_pages=4,
    page_seq_len=48,
)


def build(bs=2, n_pages=3):
    docs = make_corpus(bs, n_pages=n_pages, words_per_page=20, seed=9)
    ing = DocVQAIngestor(TOK, ChunkSpec(chunk_size=8, overlap=2),
                         Caps(max_pages=4, max_chunks=16, max_slots=128))
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    return docs, batch, labels


def test_encode_document_shapes_and_mask():
    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), CFG)
    docs, batch, _ = build(bs=2, n_pages=3)
    doc_emb, doc_mask = hivt5.encode_document(params, CFG, batch)
    assert doc_emb.shape == (2, 4 * 4, 32)
    mask = np.asarray(doc_mask)
    # 3 real pages of 4 page-tokens each -> 12 valid, 4 masked
    assert mask.sum(axis=1).tolist() == [12, 12]
    assert not mask[:, 12:].any()


@pytest.mark.slow
def test_forward_train_losses_and_grads():
    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), CFG)
    _, batch, labels = build()

    def loss_fn(p):
        loss, aux = hivt5.forward_train(p, CFG, batch, labels)
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(aux["ret_loss"]) > 0
    assert aux["ret_logits"].shape == (2, 4)
    # page head gets gradient
    g = np.asarray(grads["page_head"]["kernel"])
    assert np.abs(g).sum() > 0
    # page embeddings get gradient
    assert np.abs(np.asarray(grads["page_emb"])).sum() > 0


def test_ret_loss_trains_page_prediction():
    import optax

    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), CFG)
    docs, batch, labels = build(bs=2, n_pages=3)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            loss, aux = hivt5.forward_train(p, CFG, batch, labels)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss, aux

    for _ in range(30):
        params, opt, loss, aux = step(params, opt)
    pred = np.argmax(np.asarray(aux["ret_logits"])[:, :3], axis=1)
    want = np.asarray([d.answer_page_idx for d in docs])
    assert (pred == want).all(), f"page head failed to overfit: {pred} vs {want}"


def test_generate():
    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), CFG)
    docs, batch, _ = build()
    tokens, conf, pred_page = hivt5.generate(params, CFG, batch, max_new_tokens=4)
    assert tokens.shape == (2, 4)
    assert conf.shape == (2,)
    assert (np.asarray(pred_page) < 3).all()  # only valid pages predicted


def test_per_page_visual_branch():
    """Hi-VT5 visual branch (HiVT5.py:471-489): per-page ViT features +
    visual-box spatial embeddings append to each page's encoder input and
    change the document embedding / generation."""
    import numpy as np

    from rag_docvqa_tpu.engine.hivt5_engine import HiVT5Engine
    from rag_docvqa_tpu.models.vit import ViTConfig

    vcfg = hivt5.HiVT5Config(
        t5=CFG.t5, spatial=CFG.spatial, page_tokens=CFG.page_tokens,
        max_doc_pages=CFG.max_doc_pages, page_seq_len=CFG.page_seq_len,
        use_visual=True,
        vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                      patch_size=8, image_size=16),
    )
    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), vcfg)
    assert "visual" in params

    docs, batch, labels = build()
    rng = np.random.RandomState(0)
    aux_images = [
        [rng.randint(0, 255, (32, 32, 3)).astype(np.uint8) for _ in d.words] for d in docs
    ]
    aux = {"images": aux_images}

    eng = HiVT5Engine(vcfg, params, TOK, max_new_tokens=3)
    out_vis = eng.inference(batch, aux)
    out_txt = eng.inference(batch, {"images": [None] * len(docs)})
    assert out_vis["pred_answers"] != out_txt["pred_answers"] or \
        not np.allclose(out_vis["confidences"], out_txt["confidences"])

    # training path accepts the visual tokens; validity masks real pages
    page_visual, page_visual_valid = eng._page_visual(batch, aux)
    assert page_visual is not None
    assert np.asarray(page_visual_valid).sum() == sum(len(d.words) for d in docs)
    loss, parts = hivt5.forward_train(params, vcfg, batch, labels,
                                      page_visual=page_visual,
                                      page_visual_valid=page_visual_valid)
    assert np.isfinite(float(loss))


def test_attention_viz_page_relevance():
    """Cross-attention extraction (HiVT5.py:782-851): probs shaped per layer/
    head/step over P*K doc tokens; page relevance sums to 1 over valid pages
    and is zero on padded pages."""
    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), CFG)
    docs, batch, labels = build(bs=2, n_pages=3)
    out = hivt5.attention_viz(params, CFG, batch, labels)
    L, H = CFG.t5.num_decoder_layers, CFG.t5.num_heads
    Td = labels.shape[1]
    assert out["cross_attn"].shape == (L, 2, H, Td, CFG.max_doc_pages * CFG.page_tokens)
    rel = np.asarray(out["page_relevance"])
    assert rel.shape == (2, CFG.max_doc_pages)
    np.testing.assert_allclose(rel.sum(axis=1), 1.0, rtol=1e-5)
    assert (rel[:, 3:] == 0).all()  # page 3 padded (3 real pages)


def test_visual_branch_masks_imageless_pages():
    """Regression: in a mixed batch, pages without a real render must not
    contribute visual tokens (zero-image ViT features were attended before)."""
    import numpy as np

    from rag_docvqa_tpu.engine.hivt5_engine import HiVT5Engine
    from rag_docvqa_tpu.models.vit import ViTConfig

    vcfg = hivt5.HiVT5Config(
        t5=CFG.t5, spatial=CFG.spatial, page_tokens=CFG.page_tokens,
        max_doc_pages=CFG.max_doc_pages, page_seq_len=CFG.page_seq_len,
        use_visual=True,
        vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                      patch_size=8, image_size=16),
    )
    params = hivt5.init_hivt5_params(jax.random.PRNGKey(0), vcfg)
    docs, batch, labels = build()
    rng = np.random.RandomState(0)
    # doc 0 has images, doc 1 does not
    aux = {"images": [
        [rng.randint(0, 255, (32, 32, 3)).astype(np.uint8) for _ in docs[0].words],
        None,
    ]}
    eng = HiVT5Engine(vcfg, params, TOK, max_new_tokens=3)
    pv, pvalid = eng._page_visual(batch, aux)
    pvalid_np = np.asarray(pvalid)
    assert pvalid_np[0].sum() == len(docs[0].words) and pvalid_np[1].sum() == 0

    # doc 1's encoding must equal the no-visual encoding (its visual tokens
    # are fully masked)
    emb_mixed, _ = hivt5.encode_document(params, vcfg, batch, pv, pvalid)
    emb_plain, _ = hivt5.encode_document(params, vcfg, batch)
    np.testing.assert_allclose(np.asarray(emb_mixed)[1], np.asarray(emb_plain)[1],
                               rtol=1e-5, atol=1e-6)
    # doc 0's encoding must differ (its visual tokens are attended)
    assert not np.allclose(np.asarray(emb_mixed)[0], np.asarray(emb_plain)[0], atol=1e-4)
