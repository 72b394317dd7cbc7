"""Fused whole-layer BERT encoder kernel (ops/fused_encoder.py) vs the XLA
block path — values, grads, gating, and GSPMD auto-partitioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models.bert import (
    BertConfig,
    bert_encode,
    bert_sentence_embed,
    init_bert_params,
)

CFG = BertConfig(vocab_size=500, hidden_size=64, num_layers=3, num_heads=4,
                 intermediate_size=128)


def _inputs(rng, B=8, T=16, vocab=500):
    ids = jnp.asarray(rng.randint(3, vocab, size=(B, T)), jnp.int32)
    mask = jnp.asarray(rng.rand(B, T) < 0.85).at[:, 0].set(True)
    return ids, mask


@pytest.fixture(scope="module")
def params():
    return init_bert_params(jax.random.PRNGKey(0), CFG)


def test_fused_matches_xla(params):
    rng = np.random.RandomState(0)
    ids, mask = _inputs(rng)
    ref = bert_encode(params, CFG, ids, mask, fused=False)
    got = bert_encode(params, CFG, ids, mask, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_matches_xla_ragged_mask_and_t24(params):
    # T=24 exercises lane padding of the (rows, T, T) score tiles
    cfg = BertConfig(vocab_size=500, hidden_size=64, num_layers=2, num_heads=2,
                     intermediate_size=96, max_position_embeddings=64)
    p = init_bert_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    ids, _ = _inputs(rng, B=6, T=24)
    lens = jnp.asarray([24, 17, 9, 3, 1, 24])
    mask = jnp.arange(24)[None, :] < lens[:, None]
    ref = bert_encode(p, cfg, ids, mask, fused=False)
    got = bert_encode(p, cfg, ids, mask, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_fused_sentence_embed_grad(params):
    """custom_vjp: forward = kernel, backward = XLA recompute; grads match
    the pure-XLA path."""
    rng = np.random.RandomState(2)
    ids, mask = _inputs(rng)

    def loss(p, fused):
        emb = bert_encode(p, CFG, ids, mask, fused=fused)
        return jnp.sum(emb ** 2)

    g_f = jax.grad(lambda p: loss(p, True))(params)
    g_x = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4)


def test_fused_gating():
    from rag_docvqa_tpu.ops.fused_encoder import _pick_rows, fused_encoder_wanted

    # JINA options and odd T are excluded; huge widths fall back when the
    # working set cannot fit VMEM
    alibi = BertConfig(use_alibi=True)
    glu = BertConfig(glu_mlp=True)
    assert not fused_encoder_wanted(alibi, 8, 64)
    assert not fused_encoder_wanted(glu, 8, 64)
    assert not fused_encoder_wanted(BertConfig(), 8, 63)
    assert _pick_rows(8, 4096, 4096, 16384) == 0  # cannot fit

    # the bge-small bench shape picks a multi-row block
    assert _pick_rows(1024, 64, 384, 1536) >= 4


def test_fused_erf_matches_lax():
    from rag_docvqa_tpu.ops.fused_encoder import _erf32

    x = jnp.linspace(-6, 6, 2001, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(_erf32(x)), np.asarray(jax.lax.erf(x)),
                               atol=1e-6, rtol=0)


def test_fused_gspmd_auto_partitioned(params):
    """Plain jit with the batch sharded over the 8-device mesh: the
    custom_partitioning wrapper runs the kernel per-shard; results match the
    unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.parallel import create_mesh

    rng = np.random.RandomState(3)
    ids, mask = _inputs(rng, B=8)
    mesh = create_mesh((8,), ("data",))
    ref = bert_encode(params, CFG, ids, mask, fused=True)

    f = jax.jit(lambda p, i, m: bert_encode(p, CFG, i, m, fused=True))
    sh = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    got = f(params, sh(ids), sh(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------- #
# fused T5 encoder layer
# ---------------------------------------------------------------------- #
import dataclasses

from rag_docvqa_tpu.models import t5 as t5m

T5_CFG = t5m.T5Config(vocab_size=100, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                      num_encoder_layers=3, num_decoder_layers=2, dropout_rate=0.0)


@pytest.mark.parametrize("gated", [False, True])
def test_fused_t5_encode_matches_xla(gated):
    cfg = dataclasses.replace(T5_CFG, gated_ffn=gated)
    params = t5m.init_t5_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 4, 24
    x = jnp.asarray(rng.randn(B, T, 32).astype(np.float32))
    lens = jnp.asarray([24, 16, 7, 1])
    mask = jnp.arange(24)[None, :] < lens[:, None]
    ref = t5m.encode(params, cfg, x, mask, fused=False)
    got = t5m.encode(params, cfg, x, mask, fused=True)
    # the fused path streams the rel-pos bias in bf16 (same cast the flash
    # path makes); tolerance covers that
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fused_t5_encode_grad():
    params = t5m.init_t5_params(jax.random.PRNGKey(1), T5_CFG)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    mask = jnp.ones((2, 16), bool)

    def loss(p, fused):
        return jnp.sum(t5m.encode(p, T5_CFG, x, mask, fused=fused) ** 2)

    g_f = jax.grad(lambda p: loss(p, True))(params)
    g_x = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2, rtol=5e-2)


def test_fused_t5_generation_parity():
    """Greedy generation through the fused encoder decodes the same tokens
    as the XLA encoder (the decoder is shared)."""
    from rag_docvqa_tpu.ops.decode import greedy_decode

    params = t5m.init_t5_params(jax.random.PRNGKey(2), T5_CFG)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 32).astype(np.float32))
    mask = jnp.ones((2, 16), bool)
    toks = []
    for fused in (False, True):
        enc = t5m.encode(params, T5_CFG, x, mask, fused=fused)
        t, conf = greedy_decode(params, T5_CFG, enc, mask, 6)
        toks.append(np.asarray(t))
    np.testing.assert_array_equal(toks[0], toks[1])


def test_fused_t5_gspmd_auto_partitioned():
    """Fused T5 stack under plain jit with the batch sharded over the
    8-device mesh matches the unsharded run (custom_partitioning)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.parallel import create_mesh

    params = t5m.init_t5_params(jax.random.PRNGKey(3), T5_CFG)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 16, 32).astype(np.float32))
    mask = jnp.asarray(rng.rand(8, 16) < 0.9).at[:, 0].set(True)
    mesh = create_mesh((8,), ("data",))
    ref = t5m.encode(params, T5_CFG, x, mask, fused=True)

    f = jax.jit(lambda p, x_, m: t5m.encode(p, T5_CFG, x_, m, fused=True))
    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))
    got = f(params, sh(x), sh(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_fused_t5_odd_length_pads():
    """T not a multiple of 8 (Hi-VT5's K+T+Tv lengths): the fused path pads
    keys/queries internally and slices back; parity with XLA holds."""
    params = t5m.init_t5_params(jax.random.PRNGKey(4), T5_CFG)
    rng = np.random.RandomState(4)
    B, T = 3, 21
    x = jnp.asarray(rng.randn(B, T, 32).astype(np.float32))
    lens = jnp.asarray([21, 13, 2])
    mask = jnp.arange(T)[None, :] < lens[:, None]
    ref = t5m.encode(params, T5_CFG, x, mask, fused=False)
    got = t5m.encode(params, T5_CFG, x, mask, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fused_rows_reranker_shape_eligible():
    """XLM-R-base cross-encoder shape (d=768, d_ff=3072, T=512) fits at
    rows=1 under the relaxed single-row budget — for bf16 runs. The f32
    working set is ~2x and must be rejected (it would fail Mosaic's scoped
    VMEM allocation at compile time otherwise)."""
    from rag_docvqa_tpu.ops.fused_encoder import _pick_rows

    assert _pick_rows(16, 512, 768, 3072, itemsize=2) == 1
    assert _pick_rows(16, 512, 768, 3072, itemsize=4) == 0


def test_fused_true_rejected_for_jina_configs():
    """Explicit fused=True on an ALiBi/GLU config must raise, not silently
    compute vanilla attention."""
    cfg = BertConfig(vocab_size=100, hidden_size=64, num_layers=1, num_heads=4,
                     intermediate_size=128, use_alibi=True)
    p = init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.zeros((4, 16), jnp.int32)
    mask = jnp.ones((4, 16), bool)
    with pytest.raises(ValueError, match="ALiBi/GLU"):
        bert_encode(p, cfg, ids, mask, fused=True)


# ---------------------------------------------------------------------- #
# fused ViT/BEiT encoder layer
# ---------------------------------------------------------------------- #
from rag_docvqa_tpu.models.vit import ViTConfig, init_vit_params, vit_encode


@pytest.mark.parametrize("arch", ["vit", "beit"])
def test_fused_vit_encode_matches_xla(arch):
    """Both towers, incl. BEiT's per-layer rel-pos bias + layer-scale + zero
    k-bias; T=1+N is odd (padding path)."""
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                    num_heads=4, mlp_dim=128, arch=arch,
                    use_rel_pos_bias=arch == "beit",
                    use_abs_pos=arch == "vit",
                    layer_scale_init=0.1 if arch == "beit" else 0.0)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(3, 32, 32, 3).astype(np.float32))
    ref = vit_encode(params, cfg, pixels, fused=False)
    got = vit_encode(params, cfg, pixels, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3, rtol=1e-3)


def test_fused_vit_grad():
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                    num_heads=4, mlp_dim=128)
    params = init_vit_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(1)
    pixels = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss(p, fused):
        return jnp.sum(vit_encode(p, cfg, pixels, fused=fused) ** 2)

    g_f = jax.grad(lambda p: loss(p, True))(params)
    g_x = jax.grad(lambda p: loss(p, False))(params)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3)


def test_fused_vit_hidden_states_stays_xla():
    """return_hidden_states (the BEiT segmentation backbone taps) keeps the
    XLA path — the fused stack does not materialize per-block outputs."""
    cfg = ViTConfig(image_size=32, patch_size=8, hidden_size=64, num_layers=2,
                    num_heads=4, mlp_dim=128)
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(2)
    pixels = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    x, per_layer = vit_encode(params, cfg, pixels, return_hidden_states=True)
    assert per_layer.shape[0] == 2


def test_fused_p2s_vision_matches_xla(monkeypatch):
    """Bias-free fused whole-layer path for the Pix2Struct patch tower
    (interpret mode) == the XLA scan, including odd patch counts (padding)
    and ragged masks."""
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.ops import fused_encoder as fe

    vis = p2s.P2SVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                              d_ff=128, patch_dim=48, max_rows=16, max_cols=16)
    cfg = p2s.Pix2StructConfig(vision=vis)
    params = p2s.init_p2s_params(jax.random.PRNGKey(0), cfg)
    B, N = 4, 13  # odd N exercises the pad-to-8 path
    rng = jax.random.PRNGKey(1)
    vals = jax.random.normal(rng, (B, N, 48), jnp.float32)
    rows = jnp.tile(jnp.arange(N)[None, :, None] // 4, (B, 1, 1)).astype(jnp.float32)
    cols = jnp.tile(jnp.arange(N)[None, :, None] % 4, (B, 1, 1)).astype(jnp.float32)
    patches = jnp.concatenate([rows, cols, vals], axis=-1)
    n_valid = jnp.asarray([13, 9, 1, 5])
    mask = (jnp.arange(N)[None, :] < n_valid[:, None]).astype(jnp.float32)

    ref = p2s.vision_encode(params, cfg, patches, mask, fused=False)
    monkeypatch.setattr(fe, "fused_p2s_encoder_wanted", lambda *a, **k: True)
    out = p2s.vision_encode(params, cfg, patches, mask, fused=True)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(mask, bool)],
        np.asarray(ref)[np.asarray(mask, bool)],
        rtol=2e-5, atol=2e-5,
    )


def test_fused_p2s_vision_ffn_chunked_matches_xla(monkeypatch):
    """ffn_chunk>0 (the T>=1024 VMEM-entry path) computes the same layer:
    chunked f32-accumulated FFN partial outputs == the single-dot FFN."""
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.ops import fused_encoder as fe

    vis = p2s.P2SVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                              d_ff=128, patch_dim=48, max_rows=16, max_cols=16)
    cfg = p2s.Pix2StructConfig(vision=vis)
    params = p2s.init_p2s_params(jax.random.PRNGKey(3), cfg)
    B, N = 4, 16
    vals = jax.random.normal(jax.random.PRNGKey(4), (B, N, 48), jnp.float32)
    rows = jnp.tile(jnp.arange(N)[None, :, None] // 4, (B, 1, 1)).astype(jnp.float32)
    cols = jnp.tile(jnp.arange(N)[None, :, None] % 4, (B, 1, 1)).astype(jnp.float32)
    patches = jnp.concatenate([rows, cols, vals], axis=-1)
    mask = (jnp.arange(N)[None, :] < jnp.asarray([16, 9, 1, 5])[:, None]).astype(jnp.float32)

    ref = p2s.vision_encode(params, cfg, patches, mask, fused=False)
    monkeypatch.setattr(fe, "fused_p2s_encoder_wanted", lambda *a, **k: True)
    monkeypatch.setattr(fe, "_pick_rows_t5", lambda *a, **k: (4, 32, 0))
    out = p2s.vision_encode(params, cfg, patches, mask, fused=True)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(mask, bool)],
        np.asarray(ref)[np.asarray(mask, bool)],
        rtol=2e-5, atol=2e-5,
    )


def test_fused_t5_biasful_ffn_chunked_natural_selection(monkeypatch):
    """Bias-ful (rel-pos) T5 layer through the NATURAL chunk-selection path:
    a shrunk VMEM budget makes _pick_rows_t5 itself choose a chunked FFN
    (C=256 at d_ff=512) rather than a monkeypatched (rows, C) pair — covering
    the text-encoder chunked kernel, not just the Pix2Struct bias-free one."""
    import functools

    from rag_docvqa_tpu.models import t5 as t5m
    from rag_docvqa_tpu.ops import fused_encoder as fe

    cfg = t5m.T5Config(
        vocab_size=64, d_model=128, d_kv=32, num_heads=4, d_ff=512,
        num_encoder_layers=2, num_decoder_layers=1, dropout_rate=0.0,
    )
    params = t5m.init_t5_params(jax.random.PRNGKey(5), cfg)
    B, T = 8, 64
    x = jax.random.normal(jax.random.PRNGKey(6), (B, T, cfg.d_model), jnp.float32)
    mask = jnp.arange(T)[None, :] < jnp.asarray([64, 40, 8, 64, 1, 33, 64, 17])[:, None]

    budget = 1_500_000  # unchunked rows=1 needs ~1.9 MB here; chunked C=256 fits
    picked = fe._pick_rows_t5(B, T, cfg.d_model, cfg.num_heads * cfg.d_kv,
                              cfg.d_ff, cfg.num_heads, False, 4, budget=budget)
    assert picked[0] > 0 and picked[1] > 0, picked  # natural selection chunks

    ref = t5m.encode(params, cfg, x, mask, fused=False)
    monkeypatch.setattr(fe, "_pick_rows_t5",
                        functools.partial(fe._pick_rows_t5, budget=budget))
    got = t5m.encode(params, cfg, x, mask, fused=True)
    # chunked FFN accumulates partial products in a different order; tiny
    # f32-rounding drift (max ~5e-5 over 2 layers) is expected
    np.testing.assert_allclose(
        np.asarray(got)[np.asarray(mask)], np.asarray(ref)[np.asarray(mask)],
        rtol=2e-3, atol=2e-4,
    )


def test_fused_p2s_attn_stream_matches_xla(monkeypatch):
    """attn_stream>0 (the online-softmax entry for the 2048-patch page
    budget): streamed key-chunk attention == materialized scores, incl.
    ragged masks and a chunk boundary cutting through the valid range."""
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.ops import fused_encoder as fe

    vis = p2s.P2SVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                              d_ff=128, patch_dim=48, max_rows=16, max_cols=16)
    cfg = p2s.Pix2StructConfig(vision=vis)
    params = p2s.init_p2s_params(jax.random.PRNGKey(7), cfg)
    B, N = 4, 32
    vals = jax.random.normal(jax.random.PRNGKey(8), (B, N, 48), jnp.float32)
    rows = jnp.tile(jnp.arange(N)[None, :, None] // 8, (B, 1, 1)).astype(jnp.float32)
    cols = jnp.tile(jnp.arange(N)[None, :, None] % 8, (B, 1, 1)).astype(jnp.float32)
    patches = jnp.concatenate([rows, cols, vals], axis=-1)
    # valid lengths straddle the attn_stream=8 chunk boundaries
    mask = (jnp.arange(N)[None, :] < jnp.asarray([32, 21, 3, 9])[:, None]).astype(jnp.float32)

    ref = p2s.vision_encode(params, cfg, patches, mask, fused=False)
    monkeypatch.setattr(fe, "fused_p2s_encoder_wanted", lambda *a, **k: True)
    monkeypatch.setattr(fe, "_pick_rows_t5", lambda *a, **k: (2, 0, 8))
    out = p2s.vision_encode(params, cfg, patches, mask, fused=True)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(mask, bool)],
        np.asarray(ref)[np.asarray(mask, bool)],
        rtol=3e-5, atol=3e-5,
    )


def test_qtile_picker_covers_page_budget():
    """At pix2struct-base dims and the 2048-patch page budget the batch-row
    kernel cannot fit (per-row f32 temporaries scale with T), but the
    query-tiled kernel must (round 3: no entry at all -> flash fallback);
    bias-ful layers must never take the streaming entry (the resident bias
    blows the budget streaming reclaims)."""
    from rag_docvqa_tpu.ops import fused_encoder as fe

    assert fe._pick_rows_t5(16, 2048, 768, 768, 2048, 12, True,
                            itemsize=2, has_bias=False)[0] == 0
    TQ, kc, C = fe._pick_qtile_t5(16, 2048, 768, 768, 2048, 12, True, itemsize=2)
    assert TQ > 0 and kc > 0, (TQ, kc, C)
    rows_b, _, KC_b = fe._pick_rows_t5(16, 2048, 768, 768, 3072, 12, False,
                                       itemsize=2, has_bias=True)
    assert KC_b == 0  # bias-ful: streaming entry not offered


def test_fused_p2s_qtiled_matches_xla(monkeypatch):
    """The query-tiled whole-layer kernel == the XLA path at a shape forced
    through it (batch-row picker disabled), incl. ragged masks whose valid
    lengths straddle both the TQ query blocks and the kc key chunks."""
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.ops import fused_encoder as fe

    vis = p2s.P2SVisionConfig(hidden_size=64, num_layers=2, num_heads=4,
                              d_ff=128, patch_dim=48, max_rows=16, max_cols=16)
    cfg = p2s.Pix2StructConfig(vision=vis)
    params = p2s.init_p2s_params(jax.random.PRNGKey(9), cfg)
    B, N = 3, 32
    vals = jax.random.normal(jax.random.PRNGKey(10), (B, N, 48), jnp.float32)
    rows = jnp.tile(jnp.arange(N)[None, :, None] // 8, (B, 1, 1)).astype(jnp.float32)
    cols = jnp.tile(jnp.arange(N)[None, :, None] % 8, (B, 1, 1)).astype(jnp.float32)
    patches = jnp.concatenate([rows, cols, vals], axis=-1)
    mask = (jnp.arange(N)[None, :] < jnp.asarray([32, 19, 5])[:, None]).astype(jnp.float32)

    ref = p2s.vision_encode(params, cfg, patches, mask, fused=False)
    monkeypatch.setattr(fe, "fused_p2s_encoder_wanted", lambda *a, **k: True)
    monkeypatch.setattr(fe, "_pick_rows_t5", lambda *a, **k: (0, 0, 0))
    monkeypatch.setattr(fe, "_pick_qtile_t5", lambda *a, **k: (8, 8, 0))
    out = p2s.vision_encode(params, cfg, patches, mask, fused=True)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(mask, bool)],
        np.asarray(ref)[np.asarray(mask, bool)],
        rtol=3e-5, atol=3e-5,
    )


def test_fused_p2s_qtiled_ffn_chunked(monkeypatch):
    """Query-tiled + chunked FFN (the combination the 2048 budget uses at
    big d_ff) stays exact."""
    from rag_docvqa_tpu.models import pix2struct as p2s
    from rag_docvqa_tpu.ops import fused_encoder as fe

    vis = p2s.P2SVisionConfig(hidden_size=64, num_layers=1, num_heads=2,
                              d_ff=160, patch_dim=48, max_rows=16, max_cols=16)
    cfg = p2s.Pix2StructConfig(vision=vis)
    params = p2s.init_p2s_params(jax.random.PRNGKey(11), cfg)
    B, N = 2, 16
    vals = jax.random.normal(jax.random.PRNGKey(12), (B, N, 48), jnp.float32)
    r_ = jnp.tile(jnp.arange(N)[None, :, None] // 4, (B, 1, 1)).astype(jnp.float32)
    c_ = jnp.tile(jnp.arange(N)[None, :, None] % 4, (B, 1, 1)).astype(jnp.float32)
    patches = jnp.concatenate([r_, c_, vals], axis=-1)
    mask = (jnp.arange(N)[None, :] < jnp.asarray([16, 11])[:, None]).astype(jnp.float32)

    ref = p2s.vision_encode(params, cfg, patches, mask, fused=False)
    monkeypatch.setattr(fe, "fused_p2s_encoder_wanted", lambda *a, **k: True)
    monkeypatch.setattr(fe, "_pick_rows_t5", lambda *a, **k: (0, 0, 0))
    monkeypatch.setattr(fe, "_pick_qtile_t5", lambda *a, **k: (8, 8, 64))
    out = p2s.vision_encode(params, cfg, patches, mask, fused=True)
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(mask, bool)],
        np.asarray(ref)[np.asarray(mask, bool)],
        rtol=3e-5, atol=3e-5,
    )
