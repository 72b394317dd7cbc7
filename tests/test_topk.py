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


def test_twophase_matches_xla_exactly():
    """Two-phase hierarchical top-k (segment-max preselect + rescoring) is
    exact vs lax.top_k, including lowest-index tie behavior (interpret mode
    is bit-identical; on-TPU only epsilon-close adjacent ranks may swap)."""
    from rag_docvqa_tpu.ops.topk import cosine_topk_twophase

    rng = np.random.RandomState(7)
    for N, B, k, tile in ((1000, 4, 5, 512), (4096, 33, 10, 2048), (8192, 130, 3, 2048)):
        emb = l2_normalize(jnp.asarray(rng.randn(N, 48).astype(np.float32)))
        idxp, n_valid = pad_index(emb, tile_n=tile)
        q = jnp.asarray(rng.randn(B, 48).astype(np.float32))
        v2, i2, ok2 = cosine_topk_twophase(idxp, q, n_valid, k, tile_n=tile, interpret=True)
        vx, ix, okx = cosine_topk_xla(emb, q, k)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ix))
        np.testing.assert_allclose(np.asarray(v2), np.asarray(vx), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ok2), np.asarray(okx))


def test_twophase_tie_semantics_with_duplicates():
    """Duplicate index rows force exact score ties; lowest global index wins,
    matching torch.topk / lax.top_k (src/_modules.py:2014-2016)."""
    from rag_docvqa_tpu.ops.topk import cosine_topk_twophase

    rng = np.random.RandomState(8)
    emb = l2_normalize(jnp.asarray(np.tile(rng.randn(64, 32).astype(np.float32), (8, 1))))
    idxp, n_valid = pad_index(emb, tile_n=512)
    q = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    _, i2, _ = cosine_topk_twophase(idxp, q, n_valid, 10, tile_n=512, group=16, interpret=True)
    _, ix, _ = cosine_topk_xla(emb, q, 10)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ix))


def test_twophase_padding_masked():
    from rag_docvqa_tpu.ops.topk import cosine_topk_twophase

    rng = np.random.RandomState(9)
    emb = l2_normalize(jnp.asarray(rng.randn(700, 32).astype(np.float32)))
    idxp, n_valid = pad_index(emb, tile_n=512)  # pads to 1024
    q = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    _, idx, ok = cosine_topk_twophase(idxp, q, n_valid, 8, tile_n=512, interpret=True)
    assert np.asarray(ok).all()
    assert (np.asarray(idx) < 700).all()


def test_twophase_hierarchical_matches_xla_exactly():
    """The hierarchical (supergroup) phase-2 path must stay exact: at
    N=8192, tile_n=2048, group=16, sgroups=16 -> S2=32 > 2k, hierarchy ON."""
    from rag_docvqa_tpu.ops.topk import cosine_topk_twophase

    rng = np.random.RandomState(12)
    emb = l2_normalize(jnp.asarray(rng.randn(8192, 64).astype(np.float32)))
    q = jnp.asarray(rng.randn(24, 64).astype(np.float32))
    v2, i2, ok = cosine_topk_twophase(emb, q, jnp.int32(8192), 10,
                                      tile_n=2048, group=16, sgroups=16, interpret=True)
    vx, ix, _ = cosine_topk_xla(emb, q, 10)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ix))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(vx), rtol=1e-6, atol=1e-7)
    assert np.asarray(ok).all()


def test_twophase_hierarchical_ties_and_padding():
    """Duplicated rows spanning supergroup boundaries + padded tail: the
    hierarchy must keep lax.top_k's lowest-index tie rule and mask padding."""
    from rag_docvqa_tpu.ops.topk import cosine_topk_twophase

    rng = np.random.RandomState(13)
    base = rng.randn(1100, 32).astype(np.float32)
    base[900:910] = base[100:110]  # exact duplicates ~800 rows apart
    emb = l2_normalize(jnp.asarray(base))
    idxp, n_valid = pad_index(emb, tile_n=2048)  # pads to 2048
    q = jnp.asarray(l2_normalize(jnp.asarray(base[105:109])))  # self-queries hit the dup pair
    # k=6: S2 = 2048/(16*8) = 16 > 2k, so the hierarchical branch is ON
    v2, i2, ok = cosine_topk_twophase(idxp, q, n_valid, 6,
                                      tile_n=2048, group=16, sgroups=8, interpret=True)
    vx, ix, _ = cosine_topk_xla(emb, q, 6)
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(ix))
    assert (np.asarray(i2) < 1100).all()
