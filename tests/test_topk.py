"""Fused score+top-k kernel: equivalence with the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.ops.topk import (
    cosine_topk_pallas,
    cosine_topk_xla,
    l2_normalize,
    masked_topk,
    pad_index,
)


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


def test_masked_topk_ignores_masked():
    scores = jnp.asarray([[1.0, 5.0, 3.0, 4.0]])
    mask = jnp.asarray([[True, False, True, True]])
    vals, idx, valid = masked_topk(scores, mask, 2)
    assert idx.tolist() == [[3, 2]]
    assert vals.tolist() == [[4.0, 3.0]]
    assert valid.all()


def test_masked_topk_k_exceeds_valid():
    scores = jnp.asarray([[1.0, 2.0, 3.0]])
    mask = jnp.asarray([[True, True, False]])
    vals, idx, valid = masked_topk(scores, mask, 3)
    assert valid.tolist() == [[True, True, False]]
    assert idx.tolist()[0][:2] == [1, 0]


@pytest.mark.parametrize("n,b,d,k", [(512, 4, 64, 5), (1024, 8, 128, 10), (2048, 3, 96, 16)])
def test_pallas_matches_xla(n, b, d, k):
    index = l2_normalize(_rand((n, d), 1))
    queries = _rand((b, d), 2)
    xv, xi, xvalid = cosine_topk_xla(index, queries, k)
    pv, pi, pvalid = cosine_topk_pallas(index, queries, jnp.int32(n), k, tile_n=512)
    np.testing.assert_allclose(np.asarray(xv), np.asarray(pv), rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(xi), np.asarray(pi))
    assert np.array_equal(np.asarray(xvalid), np.asarray(pvalid))


def test_pallas_respects_n_valid_padding():
    n, d, k = 1024, 64, 8
    index = l2_normalize(_rand((n, d), 3))
    queries = _rand((2, d), 4)
    n_valid = 700
    mask = jnp.arange(n) < n_valid
    xv, xi, _ = cosine_topk_xla(index, queries, k, index_mask=mask)
    pv, pi, pvalid = cosine_topk_pallas(index, queries, jnp.int32(n_valid), k)
    np.testing.assert_allclose(np.asarray(xv), np.asarray(pv), rtol=1e-5, atol=1e-5)
    assert np.array_equal(np.asarray(xi), np.asarray(pi))
    assert (np.asarray(pi)[np.asarray(pvalid)] < n_valid).all()


def test_pallas_k_exceeds_valid():
    n, d = 512, 32
    index = l2_normalize(_rand((n, d), 5))
    queries = _rand((2, d), 6)
    vals, idx, valid = cosine_topk_pallas(index, queries, jnp.int32(3), k=6)
    assert valid.tolist() == [[True] * 3 + [False] * 3] * 2
    assert sorted(np.asarray(idx)[0, :3].tolist()) == sorted(set(np.asarray(idx)[0, :3].tolist()))


def test_pad_index():
    x = _rand((700, 32))
    padded, n_valid = pad_index(x, 512)
    assert padded.shape == (1024, 32)
    assert int(n_valid) == 700
    np.testing.assert_array_equal(np.asarray(padded[:700]), np.asarray(x))
