"""Chunker parity tests: hand-computed fixtures + a faithful line-by-line
re-execution of the reference make_chunks loop (src/_modules.py:907-943)."""

import pytest

from rag_docvqa_tpu.ops.chunking import (
    ChunkSpec,
    chunk_page,
    compact_chunk_box,
    containment_ratio,
    make_chunk_indices,
)


def reference_make_chunks(n_words, chunk_size, overlap, tol):
    """Direct transliteration of the reference closure, over word indices."""
    words = list(range(n_words))
    words_lst = []
    prev_chunk_size = 0
    for i in range(0, len(words), chunk_size - overlap):
        chunk_words = words[i : i + chunk_size]
        this_chunk_size = len(chunk_words)
        if i > 0 and prev_chunk_size + (this_chunk_size - overlap) <= chunk_size * (1 + tol):
            this_chunk_size = prev_chunk_size + this_chunk_size - overlap
            words_lst[-1].extend(chunk_words[overlap:])
        else:
            words_lst.append(chunk_words)
        prev_chunk_size = this_chunk_size
    return words_lst


@pytest.mark.parametrize("n_words", [0, 1, 5, 49, 50, 59, 60, 61, 70, 72, 73, 110, 111, 112, 119, 120, 121, 200, 500])
@pytest.mark.parametrize("chunk_size,overlap,tol", [(60, 10, 0.2), (10, 3, 0.0), (30, 0, 0.5), (5, 4, 1.0)])
def test_make_chunk_indices_matches_reference(n_words, chunk_size, overlap, tol):
    got = make_chunk_indices(range(n_words), chunk_size, overlap, tol)
    want = reference_make_chunks(n_words, chunk_size, overlap, tol)
    assert got == want


def test_tail_merge_example():
    # n=70, size=60, overlap=10, tol=0.2: tail of 20 merges into first chunk
    chunks = make_chunk_indices(range(70), 60, 10, 0.2)
    assert len(chunks) == 1
    assert chunks[0] == list(range(70))


def test_no_merge_when_tail_large():
    # n=115, size=60, ov=10: chunks [0,60), [50,110), tail [100,115) size 15:
    # merge check: 60 + (15-10) = 65 <= 72 -> merges into second chunk
    chunks = make_chunk_indices(range(115), 60, 10, 0.2)
    assert len(chunks) == 2
    assert chunks[0] == list(range(60))
    assert chunks[1] == list(range(50, 115))


def test_oracle_mode_whole_page():
    spec = ChunkSpec(mode="oracle")
    pc = chunk_page(["a", "b", "c"], [[0, 0, 1, 1]] * 3, spec)
    assert pc.word_indices == [[0, 1, 2]]
    assert pc.labels == [spec.default_label]


def test_fixed_mode_empty_page():
    pc = chunk_page([], [], ChunkSpec())
    assert pc.word_indices == []


def test_layout_mode_assignment_and_order():
    # two regions; region at x=0.5 sorts after region at x=0.0
    words = ["w0", "w1", "w2", "w3"]
    boxes = [
        [0.55, 0.1, 0.6, 0.2],  # inside right region
        [0.05, 0.1, 0.1, 0.2],  # inside left region
        [0.06, 0.3, 0.11, 0.4],  # inside left region
        [0.42, 0.9, 0.48, 0.95],  # inside no region (gap between them)
    ]
    layout_boxes = [[0.5, 0.0, 1.0, 1.0], [0.0, 0.0, 0.4, 1.0]]
    layout_labels = [4, 2]  # table, title
    pc = chunk_page(words, boxes, ChunkSpec(chunk_size=10, overlap=2), layout_boxes=layout_boxes, layout_labels=layout_labels)
    # left region (label 2) sorts first: words 1, 2; then right region word 0
    assert pc.word_indices == [[1, 2], [0]]
    assert pc.labels == [2, 4]
    # word labels: w3 keeps the default text label
    assert pc.word_labels == [4, 2, 2, 1]


def test_layout_cluster_concat_majority_label():
    words = ["a", "b", "c"]
    boxes = [
        [0.0, 0.0, 0.1, 0.1],
        [0.2, 0.0, 0.3, 0.1],
        [0.4, 0.0, 0.5, 0.1],
    ]
    layout_boxes = [[0.0, 0.0, 0.15, 1.0], [0.15, 0.0, 0.35, 1.0], [0.35, 0.0, 0.55, 1.0]]
    layout_labels = [2, 4, 4]
    clusters = [7, 7, 7]
    pc = chunk_page(
        words,
        boxes,
        ChunkSpec(chunk_size=10, overlap=2, cluster_layouts=True),
        layout_boxes=layout_boxes,
        layout_labels=layout_labels,
        layout_clusters=clusters,
    )
    assert pc.word_indices == [[0, 1, 2]]
    assert pc.labels == [4]  # majority of {2, 4, 4}


def test_containment_and_compact_box():
    assert containment_ratio([0, 0, 1, 1], [0, 0, 2, 2]) == 1.0
    assert containment_ratio([0, 0, 2, 2], [0, 0, 1, 1]) == 0.25
    assert compact_chunk_box([[0.1, 0.2, 0.3, 0.4], [0.0, 0.5, 0.9, 0.6]], [0, 1]) == (0.0, 0.2, 0.9, 0.6)
    assert compact_chunk_box([], []) == (0.0, 0.0, 1.0, 1.0)
