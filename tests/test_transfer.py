"""transfer.py parity: device batch identical through the int16 path."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
from rag_docvqa_tpu.data.synthetic import make_corpus
from rag_docvqa_tpu.data.transfer import device_put_batch
from rag_docvqa_tpu.ops.chunking import ChunkSpec


def test_device_put_batch_bit_identical():
    ing = DocVQAIngestor(HashTokenizer(vocab_size=2048), ChunkSpec(chunk_size=10, overlap=2))
    docs = make_corpus(4, n_pages=2, words_per_page=30, seed=7)
    ing.caps = ing.plan_caps(docs)
    batch, _ = ing.ingest(docs)
    a = jax.device_put(batch)
    b = device_put_batch(batch, 2048)
    for f in dataclasses.fields(batch):
        ga, gb = np.asarray(getattr(a, f.name)), np.asarray(getattr(b, f.name))
        assert ga.dtype == gb.dtype, f.name
        np.testing.assert_array_equal(ga, gb, err_msg=f.name)


def test_device_put_batch_big_vocab_passthrough():
    ing = DocVQAIngestor(HashTokenizer(vocab_size=151936), ChunkSpec(chunk_size=10, overlap=2))
    docs = make_corpus(2, n_pages=2, words_per_page=30, seed=8)
    ing.caps = ing.plan_caps(docs)
    batch, _ = ing.ingest(docs)
    b = device_put_batch(batch, 151936)  # ids may exceed int16: passthrough
    assert np.asarray(b.slot_tokens).dtype == np.int32
    np.testing.assert_array_equal(np.asarray(b.slot_tokens), np.asarray(batch.slot_tokens))


def test_device_put_batch_sharded():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from rag_docvqa_tpu.parallel import create_mesh

    mesh = create_mesh((8,), ("data",))
    ing = DocVQAIngestor(HashTokenizer(vocab_size=2048), ChunkSpec(chunk_size=10, overlap=2))
    docs = make_corpus(8, n_pages=2, words_per_page=30, seed=9)
    ing.caps = ing.plan_caps(docs)
    batch, _ = ing.ingest(docs)
    b = device_put_batch(batch, 2048, NamedSharding(mesh, P("data")))
    assert len(b.slot_tokens.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(b.slot_tokens), np.asarray(batch.slot_tokens))
