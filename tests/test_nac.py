"""Not-answerable classifier: math, loss, update semantics, engine wiring."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.models.nac import (
    NACConfig,
    init_nac_params,
    nac_bce_loss,
    nac_prob,
    update_results,
)


def test_nac_prob_shape_and_range():
    cfg = NACConfig(emb_dim=16, hidden_dim=8, num_layers=2)
    p = init_nac_params(jax.random.PRNGKey(0), cfg)
    probs = nac_prob(p, jnp.ones((3, 5, 16)), jnp.ones((3, 2, 16)))
    assert probs.shape == (3,)
    assert ((probs > 0) & (probs < 1)).all()


def test_nac_single_layer_is_linear():
    cfg = NACConfig(emb_dim=4, hidden_dim=0, num_layers=1)
    p = init_nac_params(jax.random.PRNGKey(0), cfg)
    assert len(p["mlp"]) == 1
    assert p["mlp"][0]["kernel"].shape == (8, 1)


def test_update_results_blanks_above_threshold():
    answers, confs, probs = update_results(
        jnp.asarray([0.9, 0.2]), ["yes", "no"], [0.8, 0.7]
    )
    assert answers == ["", "no"]
    assert confs == [0.0, 0.7]
    assert len(probs) == 2


def test_bce_loss_direction():
    # perfect predictions -> near-zero loss; wrong -> large
    good = nac_bce_loss(jnp.asarray([0.99, 0.01]), jnp.asarray([1.0, 0.0]))
    bad = nac_bce_loss(jnp.asarray([0.01, 0.99]), jnp.asarray([1.0, 0.0]))
    assert float(good) < 0.05 < float(bad)
    # pos_weight scales only the positive term
    w = nac_bce_loss(jnp.asarray([0.5]), jnp.asarray([1.0]), pos_weight=2.0)
    u = nac_bce_loss(jnp.asarray([0.5]), jnp.asarray([1.0]), pos_weight=1.0)
    assert abs(float(w) - 2 * float(u)) < 1e-6


def test_engine_nac_integration():
    from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
    from rag_docvqa_tpu.data.contract import Caps
    from rag_docvqa_tpu.data.synthetic import make_corpus
    from rag_docvqa_tpu.engine import RAGConfig, RAGVT5Engine
    from rag_docvqa_tpu.models import t5 as t5m, vt5 as vt5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.models.vit import ViTConfig
    from rag_docvqa_tpu.ops.chunking import ChunkSpec

    tok = HashTokenizer(vocab_size=1024)
    cfg = vt5m.VT5Config(
        t5=t5m.T5Config(vocab_size=1024, d_model=16, d_kv=4, num_heads=4, d_ff=32,
                        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=16, dropout_rate=0.0),
        vit=ViTConfig(hidden_size=8, num_layers=1, num_heads=1, mlp_dim=16, patch_size=8, image_size=16),
        use_visual=False,
    )
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), cfg)
    nac_params = init_nac_params(jax.random.PRNGKey(1), NACConfig(emb_dim=16, hidden_dim=8, num_layers=2))
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=8, overlap=2), Caps(max_pages=2, max_chunks=8, max_slots=64))
    batch, aux = ing.ingest(make_corpus(2, n_pages=2, words_per_page=20, seed=5))
    eng = RAGVT5Engine(
        RAGConfig(page_retrieval="concat", chunk_num=2, max_new_tokens=2, max_source_length=96),
        cfg, params, tok, nac=(nac_params, 0.5),
    )
    out = eng.inference(batch, aux)
    probs = out["retrieval"]["not_answerable_probs"]
    assert len(probs) == 2
    for p, a in zip(probs, out["pred_answers"]):
        if p > 0.5:
            assert a == ""
