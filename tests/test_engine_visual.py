"""Visual-enabled RAGVT5: DiT tokens from grid-packed retrieved crops."""

import jax
import numpy as np
import pytest

from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.contract import Caps, RawDocument
from rag_docvqa_tpu.engine import RAGConfig, RAGVT5Engine
from rag_docvqa_tpu.models import t5 as t5m, vt5 as vt5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig
from rag_docvqa_tpu.models.vit import ViTConfig
from rag_docvqa_tpu.ops.chunking import ChunkSpec


@pytest.mark.slow
def test_concat_with_visual_tokens():
    tok = HashTokenizer(vocab_size=1024)
    cfg = vt5m.VT5Config(
        t5=t5m.T5Config(vocab_size=1024, d_model=16, d_kv=4, num_heads=4, d_ff=32,
                        num_encoder_layers=1, num_decoder_layers=1, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=16, dropout_rate=0.0),
        vit=ViTConfig(hidden_size=8, num_layers=1, num_heads=2, mlp_dim=16, patch_size=8, image_size=32),
        use_visual=True,
    )
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    docs = []
    for d in range(2):
        words = [[f"d{d}w{i}" for i in range(12)] for _ in range(2)]
        boxes = [[[i / 12, 0.1, i / 12 + 0.05, 0.2] for i in range(12)] for _ in range(2)]
        images = [rng.randint(0, 255, (64, 48, 3), np.uint8) for _ in range(2)]
        docs.append(RawDocument(question=f"what {d}?", words=words, boxes=boxes, images=images))

    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=6, overlap=1), Caps(max_pages=2, max_chunks=8, max_slots=64))
    batch, aux = ing.ingest(docs)
    eng = RAGVT5Engine(
        RAGConfig(page_retrieval="concat", chunk_num=2, max_new_tokens=2, max_source_length=64, use_visual=True),
        cfg, params, tok,
    )
    out = eng.inference(batch, aux)
    assert len(out["pred_answers"]) == 2

    # disabling visual changes the generator conditioning path without error
    eng2 = RAGVT5Engine(
        RAGConfig(page_retrieval="concat", chunk_num=2, max_new_tokens=2, max_source_length=64, use_visual=False),
        cfg, params, tok,
    )
    out2 = eng2.inference(batch, aux)
    assert len(out2["pred_answers"]) == 2


def test_step_overlay_rendering(tmp_path):
    """utils_viz: per-page PNGs with layout (green) / chunk (blue) /
    retrieved (red) overlays — the reference demo's step visualization
    (demo.py:68-178), headless."""
    import numpy as np

    from rag_docvqa_tpu.utils_viz import (
        CHUNK_COLOR,
        LAYOUT_COLOR,
        RETRIEVED_COLOR,
        render_page_overlay,
        save_patch_overlays,
        save_step_overlays,
    )

    img = np.full((100, 80, 3), 255, np.uint8)
    out = render_page_overlay(
        img,
        chunk_boxes=[[0.1, 0.1, 0.5, 0.3]],
        retrieved_boxes=[[0.2, 0.5, 0.9, 0.9]],
        layout={"boxes": [[0.0, 0.0, 1.0, 0.45]]},
    )
    assert out.shape == (100, 80, 3)
    flat = out.reshape(-1, 3)
    for color in (CHUNK_COLOR, RETRIEVED_COLOR, LAYOUT_COLOR):
        assert (flat == np.asarray(color)).all(axis=1).any(), color
    # source image untouched
    assert (img == 255).all()

    # end-to-end: engine inference -> overlays on disk
    import jax

    from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
    from rag_docvqa_tpu.data.contract import Caps, RawDocument
    from rag_docvqa_tpu.data.synthetic import make_corpus
    from rag_docvqa_tpu.engine import RAGConfig, RAGVT5Engine
    from rag_docvqa_tpu.models import t5 as t5m, vt5 as vt5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.models.vit import ViTConfig
    from rag_docvqa_tpu.ops.chunking import ChunkSpec

    tok = HashTokenizer(vocab_size=1024)
    cfg = vt5m.VT5Config(
        t5=t5m.T5Config(vocab_size=1024, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                        num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0),
        spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
        vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2, mlp_dim=32,
                      patch_size=8, image_size=16),
        use_visual=False,
    )
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=10, overlap=2),
                         Caps(max_pages=2, max_chunks=16, max_slots=256))
    docs = make_corpus(1, n_pages=2, words_per_page=20, seed=5)
    rng = np.random.RandomState(0)
    docs[0].images = [rng.randint(0, 255, (120, 100, 3), np.uint8) for _ in range(2)]
    batch, aux = ing.ingest(docs)
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), cfg)
    eng = RAGVT5Engine(RAGConfig(page_retrieval="concat", chunk_num=2, max_new_tokens=2,
                                 max_source_length=128), cfg, params, tok)
    out = eng.inference(batch, aux)
    paths = save_step_overlays(docs[0], batch, out, str(tmp_path / "viz"))
    assert len(paths) == 2
    import os

    assert all(os.path.exists(p) and os.path.getsize(p) > 0 for p in paths)

    # visual-engine patch-grid overlay
    steps = {"coords": [(0, 0, 0, 0), (0, 0, 1, 0), (1, 1, 0, 0)],
             "xyxy": [[0, 0, 100, 60], [0, 60, 100, 120], [0, 0, 100, 120]]}
    ppaths = save_patch_overlays(docs[0].images, steps, str(tmp_path / "pviz"), retrieved=[1])
    assert len(ppaths) == 2 and all(os.path.getsize(p) > 0 for p in ppaths)
