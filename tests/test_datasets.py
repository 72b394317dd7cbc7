"""Dataset loaders against synthetic fixture files in the reference formats."""

import json

import numpy as np
import pytest

from rag_docvqa_tpu.data.datasets import (
    InfographicsDataset,
    MPDocVQADataset,
    NoisePagesWrapper,
    SPDocVQADataset,
    build_dataset,
    create_balanced_nac_dataset,
    inject_noise_pages,
    proportional_sampling_by_pages,
    rotate_landscape_box,
)
from rag_docvqa_tpu.data.contract import RawDocument


@pytest.fixture()
def imdb_dir(tmp_path):
    """Tiny MP-DocVQA-format imdb: header + 3 records with 2-3 pages."""
    records = [{"dataset_version": "test"}]
    for i in range(3):
        n_pages = 2 + i % 2
        records.append(
            {
                "question_id": 100 + i,
                "question": f"what is item {i}?",
                "answers": [f"Answer{i}", f"answer{i}"],
                "answer_page_idx": i % n_pages,
                "imdb_doc_pages": n_pages,
                "image_id": f"doc{i}",
                "image_name": [f"doc{i}_p{p}" for p in range(n_pages)],
                "ocr_tokens": [[f"Word{p}{j}" for j in range(6)] for p in range(n_pages)],
                "ocr_normalized_boxes": [
                    np.asarray([[j / 10, 0.1, j / 10 + 0.05, 0.2] for j in range(6)], np.float32)
                    for p in range(n_pages)
                ],
            }
        )
    np.save(tmp_path / "imdb_val.npy", np.asarray(records, dtype=object), allow_pickle=True)
    return str(tmp_path)


def test_mpdocvqa_concat_view(imdb_dir):
    ds = MPDocVQADataset(imdb_dir, split="val", page_retrieval="concat")
    assert len(ds) == 3
    d = ds[0]
    assert isinstance(d, RawDocument)
    assert len(d.words) == 2
    assert d.words[0][0] == "word00"  # lowercased
    assert d.answers and all(a == a.lower() for a in d.answers)
    assert d.question_id == 100


def test_mpdocvqa_oracle_view(imdb_dir):
    ds = MPDocVQADataset(imdb_dir, split="val", page_retrieval="oracle")
    d = ds[1]  # record 1 has 3 pages, answer_page_idx = 1
    assert len(d.words) == 1
    assert d.answer_page_idx == 0
    assert d.words[0][0] == "word10"


def test_mpdocvqa_custom_window(imdb_dir):
    ds = MPDocVQADataset(imdb_dir, split="val", page_retrieval="custom", max_pages=2)
    for i in range(3):
        d = ds[i]
        assert len(d.words) <= 2
        assert 0 <= d.answer_page_idx < len(d.words)


def test_mpdocvqa_sample_lookup(imdb_dir):
    ds = MPDocVQADataset(imdb_dir, split="val")
    assert ds.sample(101).question_id == 101
    with pytest.raises(ValueError):
        ds.sample(999)


def test_spdocvqa(tmp_path):
    records = [
        {"dataset_version": "t"},
        {
            "question_id": 7,
            "question": "q?",
            "answers": ["A"],
            "image_name": "img0",
            "ocr_tokens": ["Hello", "World"],
            "ocr_normalized_boxes": np.asarray([[0, 0, 0.1, 0.1], [0.2, 0, 0.3, 0.1]], np.float32),
        },
    ]
    np.save(tmp_path / "imdb_val.npy", np.asarray(records, dtype=object), allow_pickle=True)
    ds = SPDocVQADataset(str(tmp_path), split="val")
    d = ds[0]
    assert d.words == [["hello", "world"]]
    assert d.answer_page_idx == 0


def test_infographics(tmp_path):
    qas = {"data": [{"questionId": 5, "question": "total?", "answers": ["42 dollars"], "image_local_name": "info1.jpeg"}]}
    (tmp_path / "qas.json").write_text(json.dumps(qas))
    ocr = {
        "WORD": [
            {
                "BlockType": "WORD",
                "Text": "Total",
                "Geometry": {"Polygon": [{"X": 0.1, "Y": 0.2}, {"X": 0.3, "Y": 0.2}, {"X": 0.3, "Y": 0.25}, {"X": 0.1, "Y": 0.25}]},
            }
        ]
    }
    (tmp_path / "info1.json").write_text(json.dumps(ocr))
    ds = InfographicsDataset(str(tmp_path / "qas.json"), str(tmp_path))
    d = ds[0]
    assert d.words == [["total"]]
    assert d.boxes[0][0] == [0.1, 0.2, 0.3, 0.25]


def test_rotate_landscape_box():
    assert rotate_landscape_box([0.1, 0.2, 0.4, 0.6]) == [1 - 0.6, 0.1, 1 - 0.2, 0.4]


def test_noise_injection_preserves_answer_page():
    import random

    doc = RawDocument(
        question="q",
        words=[["a"], ["b"], ["answer"]],
        boxes=[[[0, 0, 1, 1]]] * 3,
        answers=["answer"],
        answer_page_idx=2,
    )
    noise = [(["n1"], [[0, 0, 1, 1]]), (["n2"], [[0, 0, 1, 1]])]
    rng = random.Random(0)
    for _ in range(10):
        out = inject_noise_pages(doc, noise, mix=True, rng=rng)
        assert len(out.words) == 5
        assert out.words[out.answer_page_idx] == ["answer"]
    out = inject_noise_pages(doc, noise, mix=False, rng=rng)
    assert out.answer_page_idx == 2
    assert out.words[3] == ["n1"] and out.words[4] == ["n2"]


def test_noise_wrapper(imdb_dir):
    base = MPDocVQADataset(imdb_dir, split="val", page_retrieval="concat")
    ds = NoisePagesWrapper(base, noise_pages=2, mix=True, seed=0)
    d0, b0 = ds[0], base[0]
    assert len(d0.words) == len(b0.words) + 2
    assert d0.words[d0.answer_page_idx] == b0.words[b0.answer_page_idx]


def test_build_dataset_registry(imdb_dir):
    ds = build_dataset({"dataset_name": "MP-DocVQA", "imdb_dir": imdb_dir}, "val")
    assert len(ds) == 3
    noisy = build_dataset(
        {"dataset_name": "MP-DocVQA-Noise", "imdb_dir": imdb_dir, "noise_pages": 1}, "val"
    )
    assert len(noisy[0].words) == len(ds[0].words) + 1
    with pytest.raises(ValueError):
        build_dataset({"dataset_name": "Unknown"}, "val")


def test_proportional_sampling():
    recs = [{"id": i, "pages": 1 + (i % 3)} for i in range(30)]
    out = proportional_sampling_by_pages(recs, 9, lambda r: r["pages"])
    assert len(out) == 9
    from collections import Counter

    dist = Counter(r["pages"] for r in out)
    assert all(v == 3 for v in dist.values())


def test_balanced_nac():
    docs = [
        RawDocument(question="q", words=[[]], boxes=[[]], answer_type="not-answerable")
        for _ in range(2)
    ] + [
        RawDocument(question="q", words=[[]], boxes=[[]], answer_type="string")
        for _ in range(10)
    ]
    out = create_balanced_nac_dataset(docs)
    types = [d.answer_type for d in out]
    assert types.count("not-answerable") == 2
    assert types.count("string") == 2


def test_dude_raw_build_pipeline(tmp_path):
    """Raw DUDE docs -> per-question records -> save_to_disk -> DUDEDataset
    (reference DUDE_Raw.format_data + build_dude, src/DUDE.py:132-213)."""
    import random

    import datasets as hf_datasets

    from rag_docvqa_tpu.data.datasets import DUDEDataset, build_dude, format_dude_document

    # two raw documents, 5 and 2 pages, 2 questions each
    def make_doc(n_pages, qid0):
        return {
            "questions": [
                {"question": f"q{qid0 + i}?", "answers": [f"A{qid0 + i}"],
                 "answer_type": "not-answerable" if i == 1 else "string",
                 "question_id": qid0 + i}
                for i in range(2)
            ],
            "ocr_tokens": [[f"w{p}_{j}" for j in range(6)] for p in range(n_pages)],
            "ocr_boxes": [[[0.1, 0.1, 0.2, 0.2]] * 6 for _ in range(n_pages)],
        }

    # unit: page windowing keeps the answer page inside the window
    rng = random.Random(3)
    recs = format_dude_document(make_doc(5, 0), split="train", max_pages=2, rng=rng)
    for r in recs:
        assert len(r["ocr_tokens"]) == 2
        assert 0 <= r["answer_page_idx"] < 2

    # full build: raw HF dataset dir -> cache dir -> DUDEDataset
    raw = hf_datasets.Dataset.from_dict({
        k: [make_doc(5, 0)[k], make_doc(2, 10)[k]]
        for k in ("questions", "ocr_tokens", "ocr_boxes")
    })
    raw_dir = tmp_path / "raw"
    raw.save_to_disk(str(raw_dir))
    out = build_dude(str(raw_dir), str(tmp_path / "pre"), split="val", seed=0)

    ds = DUDEDataset(out, split="val")
    assert len(ds) == 4
    docs = [ds[i] for i in range(len(ds))]
    assert docs[0].question == "q0?"
    assert docs[1].answer_type == "not-answerable"
    assert all(0 <= d.answer_page_idx < len(d.words) for d in docs)
    # records ingest cleanly
    from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
    from rag_docvqa_tpu.data.contract import Caps
    from rag_docvqa_tpu.ops.chunking import ChunkSpec

    ing = DocVQAIngestor(HashTokenizer(512), ChunkSpec(chunk_size=6, overlap=1),
                         Caps(max_pages=5, max_chunks=16, max_slots=128))
    batch, aux = ing.ingest(docs)
    assert batch.batch_size == 4


def test_hash_tokenizer_vocab_roundtrip(tmp_path):
    """save_vocab/load_vocab carry the reverse map across a process boundary:
    a fresh tokenizer decodes ids produced by the saving one."""
    from rag_docvqa_tpu.data import HashTokenizer

    tok = HashTokenizer(vocab_size=2048)
    ids = tok.encode("answers survive checkpoint restore")
    path = tmp_path / "hash_tokenizer.json"
    tok.save_vocab(str(path))

    fresh = HashTokenizer(vocab_size=2048)
    assert fresh.decode(ids) == ""  # the cross-process artifact, pre-restore
    fresh.load_vocab(str(path))
    assert fresh.decode(ids) == "answers survive checkpoint restore"


def test_sample_lookup_indexed():
    """BaseDataset.sample is an O(1) dict lookup after the first call."""
    from rag_docvqa_tpu.data.contract import RawDocument
    from rag_docvqa_tpu.data.datasets import BaseDataset

    class Tiny(BaseDataset):
        def __init__(self):
            self.gets = 0

        def __len__(self):
            return 5

        def __getitem__(self, i):
            self.gets += 1
            return RawDocument(question=f"q{i}", words=[["w"]], boxes=[[[0, 0, 1, 1]]],
                               question_id=100 + i)

    ds = Tiny()
    assert ds.sample(104).question == "q4"
    first_pass = ds.gets  # one full scan to build the index
    assert ds.sample(100).question == "q0"
    assert ds.gets == first_pass + 1  # only the indexed fetch, no rescan
    with pytest.raises(ValueError):
        ds.sample(999)
