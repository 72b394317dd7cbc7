"""Int8 quantized index: roundtrip error bounds + top-k agreement with f32."""

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.ops.quant import (
    build_int8_index,
    cosine_topk_int8,
    dequantize_rows,
    quantize_rows,
)
from rag_docvqa_tpu.ops.topk import cosine_topk_xla, l2_normalize


def test_quantize_roundtrip_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(32, 64).astype(np.float32))
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize_rows(q, s)) - np.asarray(x))
    # symmetric per-row quantization: |err| <= scale/2 per element
    assert (err <= np.asarray(s) / 2 + 1e-6).all()


def test_int8_topk_agrees_with_f32():
    rng = np.random.RandomState(1)
    N, D, B, K = 4096, 128, 16, 10
    emb = jnp.asarray(rng.randn(N, D).astype(np.float32))
    q = jnp.asarray(rng.randn(B, D).astype(np.float32))
    iq, iscale = build_int8_index(emb)
    _, i8, valid8 = cosine_topk_int8(iq, iscale, q, jnp.int32(N), K)
    _, iff, _ = cosine_topk_xla(l2_normalize(emb), q, K)
    i8, iff = np.asarray(i8), np.asarray(iff)
    overlap = np.mean([len(set(i8[b]) & set(iff[b])) / K for b in range(B)])
    assert overlap >= 0.9, f"top-{K} overlap {overlap}"
    assert np.asarray(valid8).all()


def test_int8_respects_n_valid():
    rng = np.random.RandomState(2)
    emb = jnp.asarray(rng.randn(256, 32).astype(np.float32))
    q = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    iq, s = build_int8_index(emb)
    _, idx, valid = cosine_topk_int8(iq, s, q, jnp.int32(100), 8)
    assert (np.asarray(idx)[np.asarray(valid)] < 100).all()


def test_int8_twophase_bit_exact_vs_flat():
    """Two-phase int8 kernel == flat int8 path exactly (integer accumulation
    is order-free, so no epsilon caveat)."""
    from rag_docvqa_tpu.ops.quant import build_int8_index, cosine_topk_int8, cosine_topk_int8_twophase

    rng = np.random.RandomState(3)
    for N, B, k in ((4096, 8, 10), (6144, 33, 5)):
        emb = jnp.asarray(rng.randn(N, 64).astype(np.float32))
        iq, sc = build_int8_index(emb)
        q = jnp.asarray(rng.randn(B, 64).astype(np.float32))
        v1, i1, ok1 = cosine_topk_int8(iq, sc, q, jnp.int32(N), k)
        v2, i2, ok2 = cosine_topk_int8_twophase(iq, sc, q, jnp.int32(N), k, tile_n=2048, interpret=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6, atol=1e-7)


def test_int8_twophase_padding():
    from rag_docvqa_tpu.ops.quant import build_int8_index, cosine_topk_int8_twophase

    rng = np.random.RandomState(4)
    emb = jnp.asarray(rng.randn(700, 32).astype(np.float32))
    iq, sc = build_int8_index(emb)
    iq = jnp.pad(iq, ((0, 1024 - 700), (0, 0)))
    sc = jnp.pad(sc, ((0, 1024 - 700), (0, 0)))
    q = jnp.asarray(rng.randn(4, 32).astype(np.float32))
    vals, idx, ok = cosine_topk_int8_twophase(iq, sc, q, jnp.int32(700), 8, tile_n=512, interpret=True)
    assert np.asarray(ok).all()
    assert (np.asarray(idx) < 700).all()


def test_int8_twophase_invalid_sentinel_unscaled():
    """Regression: invalid slots return the raw NEG_INF sentinel (not scaled
    by the query quant scale) so downstream `> -1e29` validity checks hold."""
    from rag_docvqa_tpu.ops.quant import build_int8_index, cosine_topk_int8_twophase

    rng = np.random.RandomState(5)
    emb = jnp.asarray(rng.randn(600, 32).astype(np.float32))
    iq, sc = build_int8_index(emb)
    iq = jnp.pad(iq, ((0, 1024 - 600), (0, 0)))
    sc = jnp.pad(sc, ((0, 1024 - 600), (0, 0)))
    q = jnp.asarray(rng.randn(4, 32).astype(np.float32) * 50)  # big qs scale
    # n_valid=3 < k=8: most slots invalid
    vals, idx, ok = cosine_topk_int8_twophase(iq, sc, q, jnp.int32(3), 8, tile_n=512, interpret=True)
    vals, ok = np.asarray(vals), np.asarray(ok)
    assert ok[:, :3].all() and not ok[:, 3:].any()
    assert (vals[~ok] < -1e29).all()
