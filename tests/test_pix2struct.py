"""Pix2Struct path: patch math, MaxSim parity, vision encoder, RAG engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models import pix2struct as p2s, t5 as t5m
from rag_docvqa_tpu.ops.late_interaction import late_interaction, late_interaction_pallas
from rag_docvqa_tpu.ops.patches import (
    adaptive_normalize,
    divide_image_into_patches,
    extract_flattened_patches,
    pack_multi_image_patches,
    render_text,
)

TINY_P2S = p2s.Pix2StructConfig(
    vision=p2s.P2SVisionConfig(hidden_size=32, num_layers=2, num_heads=4, d_ff=64,
                               patch_dim=768, max_rows=128, max_cols=128),
    text=t5m.T5Config(vocab_size=300, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                      num_encoder_layers=0, num_decoder_layers=2, gated_ffn=True,
                      tie_word_embeddings=False, dropout_rate=0.0),
)


# ---------------------------------------------------------------------- #
# patch math
# ---------------------------------------------------------------------- #
def test_divide_image_modes():
    img = np.zeros((600, 400, 3), np.uint8)
    p, shape, xyxy = divide_image_into_patches(img, 256, overlap=True, mode="page")
    assert shape == (1, 1) and xyxy == [[0, 0, 400, 600]]

    p, shape, xyxy = divide_image_into_patches(img, 256, overlap=True, mode="horizontal")
    # step=128: ceil((600-128)/128)=4 strips; tail 600-3*128=216 in [1,256) merges
    assert shape[1] == 1
    assert all(x[0] == 0 and x[2] == 400 for x in xyxy)
    assert xyxy[-1][3] == 600  # last strip reaches bottom
    assert len(p) == shape[0]

    p, shape, xyxy = divide_image_into_patches(img, 256, overlap=False, mode="square")
    assert shape == (3, 2)
    assert len(p) == 6
    for x in xyxy:
        assert x[2] - x[0] <= 256 and x[3] - x[1] <= 256


def test_extract_flattened_patches_ids_and_padding():
    img = np.random.RandomState(0).rand(64, 48, 3).astype(np.float32)
    flat, max_row = extract_flattened_patches(img, max_patches=12, patch_size=16, row_offset=0)
    assert flat.shape == (12, 2 + 768)
    rows = flat[:, 0]
    cols = flat[:, 1]
    n = int((np.abs(flat).sum(-1) != 0).sum())
    assert rows[:n].min() == 1 and cols[:n].min() == 1  # 1-based ids
    assert max_row == rows[:n].max()
    # offset continues rows across images
    flat2, max_row2 = extract_flattened_patches(img, 12, row_offset=max_row)
    assert flat2[:, 0].max() == max_row2
    assert flat2[0, 0] == max_row + 1


def test_pack_multi_image_budget_and_offsets():
    rng = np.random.RandomState(1)
    imgs = [rng.rand(64, 64, 3) for _ in range(3)]
    flat, mask = pack_multi_image_patches(imgs, max_total_patches=48, normalize=True)
    assert flat.shape == (48, 770)
    valid = flat[mask > 0]
    # rows strictly increase across image boundaries (continued offsets)
    assert valid[:, 0].max() >= 3  # at least one row per image


def test_adaptive_normalize():
    img = np.full((8, 8, 3), 7.0, np.float32)
    out = adaptive_normalize(img)
    assert np.allclose(out, 0.0)  # std floor prevents div-by-zero


def test_normalize_fold_matches_unfolded():
    """extract_flattened_patches(normalize=True) folds adaptive_normalize
    through the (row-stochastic) resize kernel: resize((x-m)/s) ==
    (resize(x)-m)/s with moments taken on the FULL-SIZE image, so the
    full-size normalized copy is never materialized. Must match the
    unfolded normalize-then-extract composition the reference computes
    (custom_pix2struct_processor.py:33-132 after its normalize)."""
    from rag_docvqa_tpu.ops.patches import patch_grid_shape

    rng = np.random.RandomState(3)
    # uint8 input like real page renders; odd non-multiple-of-16 size
    for shape in [(70, 122, 3), (256, 512, 3)]:
        img = rng.randint(0, 255, shape, np.uint8)
        unfolded, row_u = extract_flattened_patches(
            adaptive_normalize(img), max_patches=24, pad=True
        )
        folded, row_f = extract_flattened_patches(img, 24, pad=True, normalize=True)
        np.testing.assert_allclose(folded, unfolded, rtol=1e-4, atol=1e-5)
        assert row_u == row_f
        # grid-shape helper agrees with the extractor's id columns
        rows, cols = patch_grid_shape(shape[0], shape[1], 24)
        assert rows == row_u and cols == int(unfolded[:, 1].max())
        assert rows * cols <= 24

    # float input takes the non-histogram moment path
    fimg = rng.rand(64, 80, 3).astype(np.float32) * 11.0
    a, _ = extract_flattened_patches(adaptive_normalize(fimg), 16, pad=True)
    b, _ = extract_flattened_patches(fimg, 16, pad=True, normalize=True)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # multi-image pack routes normalize through the fold: parity vs the
    # explicit normalize-first composition (header stacking changes the
    # first image's moments, so normalize must happen AFTER stacking)
    docs = [rng.randint(0, 255, (64, 96, 3), np.uint8),
            rng.randint(0, 255, (40, 64, 3), np.uint8)]
    header = render_text("q?")
    packed, mask = pack_multi_image_patches(docs, 48, normalize=True, header=header)
    from rag_docvqa_tpu.ops.patches import stack_header

    imgs = [stack_header(header, docs[0]), docs[1]]
    out, off = [], 0
    for im in imgs:
        p, off = extract_flattened_patches(adaptive_normalize(im), 48 // 2,
                                           row_offset=off, pad=False)
        out.append(p)
    cat = np.concatenate(out)
    np.testing.assert_allclose(packed[: cat.shape[0]], cat, rtol=1e-4, atol=1e-5)
    assert np.all(packed[cat.shape[0]:] == 0)
    np.testing.assert_array_equal(mask, (np.abs(packed).sum(-1) != 0).astype(np.float32))


def test_render_text_deterministic():
    a = render_text("what is the total?")
    b = render_text("what is the total?")
    np.testing.assert_array_equal(a, b)
    assert a.ndim == 3 and a.shape[2] == 3


# ---------------------------------------------------------------------- #
# late interaction
# ---------------------------------------------------------------------- #
def test_late_interaction_reference_math():
    q = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])  # 2 query tokens
    p = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]], [[-1.0, 0.0], [0.0, -1.0]]])  # 2 patches
    scores = late_interaction(q, p)
    np.testing.assert_allclose(np.asarray(scores), [2.0, 0.0], atol=1e-6)


def test_late_interaction_mask():
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (4, 8))
    p = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 8))
    pm = jnp.ones((3, 6), bool).at[1, 3:].set(False)
    full = late_interaction(q, p, patch_mask=pm)
    # masking out tokens can only lower or keep the maxsim score
    unmasked = late_interaction(q, p)
    assert float(full[1]) <= float(unmasked[1]) + 1e-6


def test_late_interaction_pallas_matches():
    q = jax.random.normal(jax.random.PRNGKey(2), (8, 128))
    p = jax.random.normal(jax.random.PRNGKey(3), (5, 16, 128))
    pm = jnp.ones((5, 16))
    ref = late_interaction(q, p, patch_mask=pm.astype(bool))
    fused = late_interaction_pallas(q, p, pm)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(fused), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------- #
# model + engine
# ---------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def p2s_params():
    return p2s.init_p2s_params(jax.random.PRNGKey(0), TINY_P2S)


def test_vision_encode_and_generate(p2s_params):
    patches = jnp.asarray(np.random.RandomState(0).rand(2, 24, 770).astype(np.float32))
    mask = jnp.ones((2, 24))
    h = p2s.vision_encode(p2s_params, TINY_P2S, patches, mask)
    assert h.shape == (2, 24, 32)
    tokens, conf = p2s.generate(p2s_params, TINY_P2S, patches, mask, max_new_tokens=4)
    assert tokens.shape == (2, 4) and conf.shape == (2,)


def test_p2s_train_loss(p2s_params):
    patches = jnp.asarray(np.random.RandomState(0).rand(2, 24, 770).astype(np.float32))
    mask = jnp.ones((2, 24))
    labels = jnp.asarray([[5, 1, -100], [7, 8, 1]], jnp.int32)
    loss, logits = p2s.forward_train(p2s_params, TINY_P2S, patches, mask, labels)
    assert np.isfinite(float(loss))
    assert logits.shape == (2, 3, 300)


def test_rag_pix2struct_engine_end_to_end(p2s_params):
    from rag_docvqa_tpu.data import HashTokenizer
    from rag_docvqa_tpu.data.contract import RawDocument
    from rag_docvqa_tpu.engine.rag_pix2struct import P2SRAGConfig, RAGPix2StructEngine

    rng = np.random.RandomState(0)
    docs = [
        RawDocument(
            question="what is here?",
            words=[[]], boxes=[[]],
            answers=["x"],
            images=[rng.randint(0, 255, (200, 160, 3), np.uint8) for _ in range(2)],
        )
    ]
    cfg = P2SRAGConfig(chunk_num=3, include_surroundings=1, image_patch_size=96,
                       patches_per_chunk=24, max_chunks=16, max_total_patches=64, max_new_tokens=3)
    eng = RAGPix2StructEngine(cfg, TINY_P2S, p2s_params, HashTokenizer(vocab_size=300))
    out = eng.inference(docs)
    assert len(out["pred_answers"]) == 1
    assert isinstance(out["pred_answer_pages"][0], list)
    # no-RAG max-confidence fallback
    ans, conf = eng.no_rag_max_conf(docs[0])
    assert isinstance(ans, str) and 0 <= conf <= 1 + 1e-6


def test_f16_patch_transfer_gate_and_parity(p2s_params):
    """bf16-weight engines ship patches f16 (half the dominant transfer);
    f32-weight engines keep exact f32. With bf16 weights the f16 path's
    answers/pages match the f32-transfer path on the same weights — the
    double rounding stays inside the bf16 noise the tower adds anyway."""
    from rag_docvqa_tpu.data import HashTokenizer
    from rag_docvqa_tpu.data.contract import RawDocument
    from rag_docvqa_tpu.engine.rag_pix2struct import P2SRAGConfig, RAGPix2StructEngine

    cfg = P2SRAGConfig(chunk_num=3, image_patch_size=96, patches_per_chunk=24,
                       max_chunks=16, max_total_patches=64, max_new_tokens=3)
    tok = HashTokenizer(vocab_size=300)
    # f32 weights -> exact f32 transfers (the parity-test configuration)
    eng32 = RAGPix2StructEngine(cfg, TINY_P2S, p2s_params, tok)
    assert eng32._xfer == np.float32

    bf16_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, p2s_params)
    eng16 = RAGPix2StructEngine(cfg, TINY_P2S, bf16_params, tok)
    assert eng16._xfer == np.float16
    # oversized budgets would overflow f16's exact-integer row ids -> f32
    big = P2SRAGConfig(chunk_num=3, max_total_patches=4096)
    assert RAGPix2StructEngine(big, TINY_P2S, bf16_params, tok)._xfer == np.float32

    rng = np.random.RandomState(3)
    docs = [
        RawDocument(question=f"what is item {i}?", words=[[]], boxes=[[]], answers=["x"],
                    images=[rng.randint(0, 255, (200, 160, 3), np.uint8) for _ in range(2)])
        for i in range(2)
    ]
    out16 = eng16.inference(docs)
    eng16._xfer = np.float32  # same bf16 weights, f32 transfers
    out32 = eng16.inference(docs)
    assert out16["pred_answers"] == out32["pred_answers"]
    assert out16["pred_answer_pages"] == out32["pred_answer_pages"]
    np.testing.assert_allclose(out16["confidences"], out32["confidences"],
                               rtol=2e-2, atol=1e-3)


# ---------------------------------------------------------------------- #
# layout-region ImageChunker mode (src/_modules.py:1246-1305,1379-1394)
# ---------------------------------------------------------------------- #
def test_layout_region_crops_cluster_union_and_label_vote():
    from rag_docvqa_tpu.ops.patches import layout_region_crops

    img = np.arange(100 * 200 * 3, dtype=np.uint8).reshape(100, 200, 3)
    # two clustered text/figure boxes + one unclustered table (cluster -1)
    boxes = [[0.5, 0.1, 0.9, 0.3], [0.1, 0.1, 0.4, 0.5], [0.2, 0.6, 0.6, 0.9]]
    labels = [1, 2, 3]
    clusters = [0, 0, -1]
    crops, out_labels, out_boxes = layout_region_crops(img, boxes, labels, clusters)
    # sorted by (x0, y0): the unclustered table (x0=0.2) precedes the cluster
    # union only if its x0 is smaller than... sorting happens pre-clustering;
    # the union inherits the order of insertion (singletons first, then
    # clusters — matching the reference's clustered_boxes assembly)
    assert len(crops) == 2
    assert out_labels[0] == 3  # the singleton table
    # cluster union: bbox of both boxes, label = larger-area member (figure:
    # 0.3*0.4=0.12 > text: 0.4*0.2=0.08)
    assert out_labels[1] == 2
    assert out_boxes[1] == [int(0.1 * 200), int(0.1 * 100), int(0.9 * 200), int(0.5 * 100)]
    np.testing.assert_array_equal(crops[0], img[60:90, 40:120])


def test_divide_image_into_layout_patches_text_vs_figure():
    from rag_docvqa_tpu.ops.patches import divide_image_into_layout_patches

    img = np.random.RandomState(0).randint(0, 255, (400, 300, 3), np.uint8)
    boxes = [[0.0, 0.0, 1.0, 0.6], [0.1, 0.7, 0.9, 1.0]]
    labels = [1, 2]  # text region + figure region
    groups = divide_image_into_layout_patches(
        img, boxes, labels, patch_size=96, overlap=False, mode="horizontal"
    )
    assert len(groups) == 2
    text_patches, text_shape, text_xyxy = groups[0]
    fig_patches, fig_shape, fig_xyxy = groups[1]
    # text region (240px tall) subdivides into horizontal strips
    assert text_shape[0] > 1 and len(text_patches) == text_shape[0]
    # strip boxes are page-frame coords inside the region
    for x0, y0, x1, y1 in text_xyxy:
        assert 0 <= y0 < y1 <= 240 and x0 == 0 and x1 == 300
    # figure stays whole, page-frame box
    assert fig_shape == (1, 1) and len(fig_patches) == 1
    assert fig_xyxy[0] == [int(0.1 * 300), int(0.7 * 400), int(0.9 * 300), 400]
    np.testing.assert_array_equal(fig_patches[0], img[280:400, 30:270])


def test_rag_pix2struct_layout_mode_end_to_end(p2s_params):
    from rag_docvqa_tpu.data import HashTokenizer
    from rag_docvqa_tpu.data.contract import RawDocument
    from rag_docvqa_tpu.engine.rag_pix2struct import P2SRAGConfig, RAGPix2StructEngine

    rng = np.random.RandomState(1)
    layout = [
        {"boxes": [[0.0, 0.0, 1.0, 0.5], [0.2, 0.6, 0.8, 0.95]], "labels": [1, 3]},
        {"boxes": [], "labels": []},  # second page: grid fallback
    ]
    docs = [
        RawDocument(
            question="what is in the table?",
            words=[[]], boxes=[[]],
            answers=["x"],
            images=[rng.randint(0, 255, (200, 160, 3), np.uint8) for _ in range(2)],
            layout=layout,
        )
    ]
    cfg = P2SRAGConfig(chunk_num=3, include_surroundings=1, chunk_mode="layout",
                       layout_fallback_mode="horizontal", image_patch_size=64,
                       patches_per_chunk=24, max_chunks=16, max_total_patches=64,
                       max_new_tokens=3)
    eng = RAGPix2StructEngine(cfg, TINY_P2S, p2s_params, HashTokenizer(vocab_size=300))
    crops, pages, vals, steps = eng.retrieve(docs[0].question, docs[0].images, layouts=layout)
    assert steps["n_chunks"] > 0
    # layout grids exist: page 0 contributes a text grid + a whole-table grid
    gids_page0 = {g for (p, g, r, c) in steps["coords"] if p == 0}
    assert len(gids_page0) == 2
    out = eng.inference(docs)
    assert len(out["pred_answers"]) == 1


def test_engine_chunk_num_above_bucket_floor(p2s_params):
    """Regression (round-4 review): chunk_num > the 16-chunk bucket floor
    must not crash _score_topk's lax.top_k (mc floors at chunk_num too)."""
    from rag_docvqa_tpu.data import HashTokenizer
    from rag_docvqa_tpu.data.contract import RawDocument
    from rag_docvqa_tpu.engine.rag_pix2struct import P2SRAGConfig, RAGPix2StructEngine

    rng = np.random.RandomState(5)
    docs = [
        RawDocument(
            question="what is here?", words=[[]], boxes=[[]], answers=["x"],
            images=[rng.randint(0, 255, (128, 96, 3), np.uint8) for _ in range(2)],
        )
    ]
    cfg = P2SRAGConfig(chunk_num=20, image_patch_size=96, patches_per_chunk=24,
                       max_chunks=64, max_total_patches=64, max_new_tokens=2)
    eng = RAGPix2StructEngine(cfg, TINY_P2S, p2s_params, HashTokenizer(vocab_size=300))
    out = eng.inference(docs)
    assert len(out["pred_answers"]) == 1
