"""Device retrieval->generator assembly vs a transliteration of the reference
algorithm (src/_modules.py:2022-2091 surround+dedup, src/VT5.py:131-226
prompt/boxes/EOS/truncation, src/utils.py:233-253 sep flattening)."""

import numpy as np
import jax.numpy as jnp

from rag_docvqa_tpu.data import ByteTokenizer, DocVQAIngestor, RawDocument
from rag_docvqa_tpu.data.contract import Caps
from rag_docvqa_tpu.ops.chunking import ChunkSpec
from rag_docvqa_tpu.ops.gather import (
    AssembleConfig,
    EOS_LABEL,
    PAD_LABEL,
    PROMPT_BOX,
    PROMPT_LABEL,
    assemble_concat,
    assemble_per_chunk,
    compute_ownership,
    group_boxes,
)


def build_batch(n_pages=2, words_per_page=12, chunk_size=5, overlap=1, bs=2):
    tok = ByteTokenizer()
    docs = []
    for d in range(bs):
        words = [[f"d{d}p{p}w{i}" for i in range(words_per_page)] for p in range(n_pages)]
        boxes = [
            [[i / 20, p / 20, i / 20 + 0.04, p / 20 + 0.04] for i in range(words_per_page)]
            for p in range(n_pages)
        ]
        docs.append(RawDocument(question=f"q {d}", words=words, boxes=boxes))
    caps = Caps(max_pages=4, max_chunks=16, max_slots=128, tokens_per_word=10, embed_tokens=64)
    ing = DocVQAIngestor(tok, ChunkSpec(chunk_size=chunk_size, overlap=overlap), caps)
    batch, aux = ing.ingest(docs)
    return batch, aux, tok


def reference_selection(batch, b, topk, s):
    """Transliteration of the reference's per-rank window + dedup walk."""
    included = set()
    groups = []
    for r in topk:
        start = int(batch.chunk_slot_start[b, r])
        end = start + int(batch.chunk_slot_len[b, r])
        page = int(batch.chunk_page[b, r])
        lo = max(int(batch.page_slot_start[b, page]), start - s)
        hi = min(int(batch.page_slot_end[b, page]), end + s)
        new = [g for g in range(lo, hi) if g not in included]
        included.update(new)
        groups.append(sorted(new))
    return groups


def reference_flatten(batch, b, groups, S, sep_id=0, prompt=True):
    """prompt ++ word tokens (sep between groups) truncated to S-1 ++ EOS."""
    ids, boxes, labels = [], [], []
    if prompt:
        plen = int(batch.prompt_len[b])
        ids += batch.prompt_tokens[b, :plen].tolist()
        boxes += [list(PROMPT_BOX)] * plen
        labels += [PROMPT_LABEL] * plen
    first = True
    for g_list in groups:
        if not g_list:
            continue
        if not first and sep_id:
            ids.append(sep_id)
            boxes.append([0, 0, 0, 0])
            labels.append(0)
        first = False
        for g in g_list:
            n = int(batch.slot_ntok[b, g])
            ids += batch.slot_tokens[b, g, :n].tolist()
            box = (np.asarray(batch.slot_box[b, g]) * 1000).astype(np.int32).tolist()
            boxes += [box] * n
            labels += [int(batch.slot_label[b, g])] * n
    ids = ids[: S - 1] + [1]
    boxes = boxes[: S - 1] + [[0, 0, 0, 0]]
    labels = labels[: S - 1] + [EOS_LABEL]
    pad = S - len(ids)
    mask = [True] * len(ids) + [False] * pad
    ids += [0] * pad
    boxes += [[0, 0, 0, 0]] * pad
    labels += [PAD_LABEL] * pad
    return np.array(ids), np.array(boxes), np.array(labels), np.array(mask)


def test_ownership_matches_reference_dedup():
    batch, _, _ = build_batch()
    topk = np.array([[1, 0, 3], [2, 3, 0]])
    valid = np.ones_like(topk, bool)
    for s in (0, 2, 7):
        owner = np.asarray(compute_ownership(batch, jnp.asarray(topk), jnp.asarray(valid), s))
        for b in range(2):
            groups = reference_selection(batch, b, topk[b].tolist(), s)
            want = np.full(batch.slot_mask.shape[1], 3)
            for r, glist in enumerate(groups):
                for g in glist:
                    want[g] = r
            np.testing.assert_array_equal(owner[b], want)


def test_assemble_concat_matches_reference():
    batch, _, _ = build_batch()
    topk = np.array([[2, 0, 1], [1, 3, 2]])
    valid = np.ones_like(topk, bool)
    for s, sep in [(0, 0), (2, 0), (1, 99), (20, 0)]:
        cfg = AssembleConfig(max_source_length=96, include_surroundings=s, sep_token_id=sep)
        gen, owner = assemble_concat(batch, jnp.asarray(topk), jnp.asarray(valid), cfg)
        for b in range(2):
            groups = reference_selection(batch, b, topk[b].tolist(), s)
            ids, boxes, labels, mask = reference_flatten(batch, b, groups, 96, sep_id=sep)
            np.testing.assert_array_equal(np.asarray(gen.input_ids[b]), ids)
            np.testing.assert_array_equal(np.asarray(gen.input_boxes[b]), boxes)
            np.testing.assert_array_equal(np.asarray(gen.input_labels[b]), labels)
            np.testing.assert_array_equal(np.asarray(gen.attention_mask[b]), mask)


def test_assemble_concat_truncation():
    batch, _, _ = build_batch(words_per_page=20)
    topk = np.array([[0, 1, 2, 3], [0, 1, 2, 3]])
    valid = np.ones_like(topk, bool)
    cfg = AssembleConfig(max_source_length=32, include_surroundings=5)
    gen, _ = assemble_concat(batch, jnp.asarray(topk), jnp.asarray(valid), cfg)
    ids = np.asarray(gen.input_ids)
    # EOS at the final position, mask fully on
    assert (ids[:, -1] == 1).all()
    assert np.asarray(gen.attention_mask).all()


def test_assemble_per_chunk_rows():
    batch, _, _ = build_batch()
    topk = np.array([[2, 0, 1], [1, 3, 2]])
    valid = np.ones_like(topk, bool)
    cfg = AssembleConfig(max_source_length=64, include_surroundings=1)
    gen, owner, row_valid = assemble_per_chunk(batch, jnp.asarray(topk), jnp.asarray(valid), cfg, seq_len=64)
    assert gen.input_ids.shape == (6, 64)
    assert np.asarray(row_valid).all()
    for b in range(2):
        groups = reference_selection(batch, b, topk[b].tolist(), 1)
        for r, glist in enumerate(groups):
            ids, boxes, labels, mask = reference_flatten(batch, b, [glist], 64)
            row = b * 3 + r
            np.testing.assert_array_equal(np.asarray(gen.input_ids[row]), ids)
            np.testing.assert_array_equal(np.asarray(gen.input_boxes[row]), boxes)


def test_group_boxes_union_and_empty():
    batch, _, _ = build_batch()
    topk = jnp.asarray([[0, 1, 0], [0, 1, 2]])  # rank 2 duplicates rank 0 -> empty group
    valid = jnp.ones((2, 3), bool)
    owner = compute_ownership(batch, topk, valid, 0)
    boxes = np.asarray(group_boxes(batch, owner, 3))
    # duplicate rank owns nothing -> fallback box
    np.testing.assert_array_equal(boxes[0, 2], [0, 0, 1, 1])
    # rank 0 of sample 0 = chunk 0 words 0..4 of page 0
    start = int(batch.chunk_slot_start[0, 0])
    ln = int(batch.chunk_slot_len[0, 0])
    sb = np.asarray(batch.slot_box[0, start : start + ln])
    want = [sb[:, 0].min(), sb[:, 1].min(), sb[:, 2].max(), sb[:, 3].max()]
    np.testing.assert_allclose(boxes[0, 0], want, rtol=1e-6)
