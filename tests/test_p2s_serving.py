"""RAGPix2Struct serving paths (round-5 perf work, reference
src/RAGPix2Struct.py:183-334):

  * prepared docs — query-independent chunk+extract hoisted out of the query
    loop ('pre-rasterize at ingest', SURVEY §7) must not change results;
  * inference_stream — pipelined batches (prepare on a prefetch thread,
    generate fetched one batch late) must equal per-batch inference;
  * VisualIndex + inference_indexed — device-resident patch index with
    on-device generator-input packing: retrieval must match the host path,
    the packed row offsets must chain like pack_multi_image_patches.
"""

import jax
import numpy as np
import pytest

from rag_docvqa_tpu.data import HashTokenizer
from rag_docvqa_tpu.data.contract import RawDocument
from rag_docvqa_tpu.engine.rag_pix2struct import (
    P2SRAGConfig, RAGPix2StructEngine, _indexed_retrieve_pack,
)
from rag_docvqa_tpu.models import pix2struct as p2s, t5 as t5m

TINY_P2S = p2s.Pix2StructConfig(
    vision=p2s.P2SVisionConfig(hidden_size=32, num_layers=2, num_heads=4, d_ff=64,
                               patch_dim=768, max_rows=128, max_cols=128),
    text=t5m.T5Config(vocab_size=300, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                      num_encoder_layers=0, num_decoder_layers=2, gated_ffn=True,
                      tie_word_embeddings=False, dropout_rate=0.0),
)

CFG = P2SRAGConfig(chunk_num=3, image_patch_size=96, patches_per_chunk=24,
                   max_chunks=16, max_total_patches=96, max_new_tokens=3)


@pytest.fixture(scope="module")
def eng():
    params = p2s.init_p2s_params(jax.random.PRNGKey(0), TINY_P2S)
    return RAGPix2StructEngine(CFG, TINY_P2S, params, HashTokenizer(vocab_size=300))


def _docs(seed, n_docs=2, n_pages=2):
    rng = np.random.RandomState(seed)
    return [
        RawDocument(
            question=f"what is item {i}?", words=[[]], boxes=[[]], answers=["x"],
            images=[rng.randint(0, 255, (200, 160, 3), np.uint8)
                    for _ in range(n_pages)],
        )
        for i in range(n_docs)
    ]


def test_prepared_docs_match_direct(eng):
    docs = _docs(0)
    images_list = [[np.asarray(im) for im in d.images] for d in docs]
    prepared = eng.prepare_docs(images_list, [d.layout for d in docs])
    direct = eng.inference(docs)
    via_prep = eng.inference(docs, prepared=prepared)
    assert direct["pred_answers"] == via_prep["pred_answers"]
    assert direct["pred_answer_pages"] == via_prep["pred_answer_pages"]
    np.testing.assert_allclose(direct["confidences"], via_prep["confidences"],
                               rtol=1e-6)


def test_inference_stream_matches_per_batch(eng):
    batches = [_docs(s) for s in (1, 2, 3)]
    piped = list(eng.inference_stream(iter(batches), depth=2))
    assert len(piped) == 3
    for docs, out in zip(batches, piped):
        ref = eng.inference(docs)
        assert out["pred_answers"] == ref["pred_answers"]
        assert out["pred_answer_pages"] == ref["pred_answer_pages"]
        np.testing.assert_allclose(out["confidences"], ref["confidences"], rtol=1e-6)


def test_indexed_retrieval_matches_host_path(eng):
    """MaxSim retrieval over the VisualIndex must rank the same chunks as the
    host _retrieve_batch (surroundings=0 — both score the same embeddings)."""
    docs = _docs(4, n_docs=3)
    images_list = [[np.asarray(im) for im in d.images] for d in docs]
    prepared = eng.prepare_docs(images_list)
    index = eng.build_visual_index(prepared)

    out = eng.inference_indexed([d.question for d in docs], [0, 1, 2], index)
    # host path on the same prepared docs
    _, _, host_vals, _ = eng._retrieve_batch(
        [d.question for d in docs], images_list, prepared=prepared,
        return_steps=True)
    idx_vals = out["retrieval"]["similarities"]
    np.testing.assert_allclose(np.asarray(idx_vals), np.asarray(host_vals),
                               rtol=2e-4, atol=2e-4)
    assert len(out["pred_answers"]) == 3
    assert all(isinstance(a, str) for a in out["pred_answers"])
    # pages come from the same top-k chunks
    for pages, n_pages in zip(out["pred_answer_pages"], [2, 2, 2]):
        assert all(0 <= p < n_pages for p in pages)


def test_indexed_pack_row_offsets(eng):
    """Device packing must chain row offsets exactly like the host packer:
    header rows 1..h, chunk j's rows shifted by h + sum of previous selected
    chunks' row counts; padding rows stay zero."""
    docs = _docs(5, n_docs=1)
    images_list = [[np.asarray(im) for im in docs[0].images]]
    prepared = eng.prepare_docs(images_list)
    index = eng.build_visual_index(prepared)
    T = CFG.patches_per_chunk

    q_patches = np.zeros((1, T, 2 + TINY_P2S.vision.patch_dim), eng._xfer)
    q_mask = np.zeros((1, T), np.float32)
    q_patches[0], q_mask[0], hrow = eng._render_question(docs[0].question)
    g = min(max(CFG.max_total_patches // T - 1, 1), index.mc, CFG.chunk_num)

    gen_patches, gen_mask, vals, idx, valid, pages = _indexed_retrieve_pack(
        eng.params, eng.p2s_cfg,
        index.emb, index.tok_mask, index.patches, index.chunk_valid,
        index.chunk_rows, index.chunk_page,
        jax.numpy.asarray(q_patches), jax.numpy.asarray(q_mask),
        jax.numpy.asarray(np.asarray([0], np.int32)),
        jax.numpy.asarray(np.asarray([hrow], np.int32)),
        CFG.chunk_num, g, T,
    )
    gen_patches = np.asarray(gen_patches, np.float32)
    gen_mask = np.asarray(gen_mask)
    idx, valid = np.asarray(idx), np.asarray(valid)
    assert gen_patches.shape == (1, (g + 1) * T, 2 + TINY_P2S.vision.patch_dim)

    # numpy reference: gather the selected chunks and chain offsets
    host_patches = np.asarray(index.patches, np.float32)[0]
    host_mask = np.asarray(index.tok_mask)[0]
    host_rows = np.asarray(index.chunk_rows)[0]
    off = int(hrow)
    for j in range(g):
        c = int(idx[0, j])
        blk = gen_patches[0, (j + 1) * T : (j + 2) * T]
        blk_mask = gen_mask[0, (j + 1) * T : (j + 2) * T]
        if not valid[0, j]:
            assert (blk == 0).all() and (blk_mask == 0).all()
            continue
        np.testing.assert_array_equal(blk_mask, host_mask[c])
        real = host_mask[c] > 0
        np.testing.assert_allclose(
            blk[real, 0], host_patches[c][real, 0] + off, rtol=1e-3)
        np.testing.assert_array_equal(blk[~real], 0)
        # pixel payload is the resident patch set verbatim
        np.testing.assert_allclose(blk[real, 2:], host_patches[c][real, 2:],
                                   rtol=1e-6)
        off += int(host_rows[c])
    # header block is the question render verbatim
    np.testing.assert_allclose(gen_patches[0, :T], q_patches[0].astype(np.float32),
                               rtol=1e-6)
