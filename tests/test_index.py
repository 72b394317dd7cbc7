"""Property tests: sharded retrieval == single-device retrieval, on an 8-way
virtual CPU mesh (the collectives all_gather + merge are really executed)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.parallel import ShardedIndex, create_mesh
from rag_docvqa_tpu.parallel.index import single_device_query


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh((8, 1), ("data", "model"))


@pytest.mark.parametrize("n,d,b,k", [(1000, 64, 4, 5), (4096, 128, 8, 10), (777, 32, 2, 16)])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_equals_single_device(mesh, n, d, b, k, use_pallas):
    emb = _rand((n, d), seed=n)
    q = _rand((b, d), seed=n + 1)
    idx = ShardedIndex.build(emb, mesh, tile_n=128, use_pallas=use_pallas)
    sv, si, svalid = idx.query(q, k)
    rv, ri, rvalid = single_device_query(emb, q, k)
    np.testing.assert_allclose(np.asarray(sv), np.asarray(rv), rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(si), np.asarray(ri))
    assert np.array_equal(np.asarray(svalid), np.asarray(rvalid))


def test_small_index_fewer_rows_than_k(mesh):
    emb = _rand((3, 16), seed=0)
    q = _rand((2, 16), seed=1)
    idx = ShardedIndex.build(emb, mesh, tile_n=128, use_pallas=False)
    vals, indices, valid = idx.query(q, k=8)
    assert valid.tolist() == [[True] * 3 + [False] * 5] * 2
    assert set(np.asarray(indices)[0, :3].tolist()) == {0, 1, 2}


def test_index_layout_is_sharded(mesh):
    emb = _rand((4096, 64))
    idx = ShardedIndex.build(emb, mesh, tile_n=128)
    # one shard per device along "data"
    assert len(idx.embeddings.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in idx.embeddings.addressable_shards}
    assert shard_shapes == {(4096 // 8, 64)}
