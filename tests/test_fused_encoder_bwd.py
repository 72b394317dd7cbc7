"""Grad parity for the handwritten fused T5 layer backward
(ops/fused_encoder_bwd.py) against jax.grad through the XLA blocks —
interpret mode, f32, so the comparison is tight."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models import t5 as t5m


def _mk(gated: bool):
    cfg = t5m.T5Config(
        vocab_size=64, d_model=64, d_kv=16, num_heads=4, d_ff=128,
        num_encoder_layers=2, num_decoder_layers=1, dropout_rate=0.0,
        gated_ffn=gated,
    )
    params = t5m.init_t5_params(jax.random.PRNGKey(0), cfg)
    enc = params["encoder"]
    stacked = {"ln0": enc["ln0"], "ln1": enc["ln1"],
               "attn": enc["attn"], "ffn": enc["ffn"]}
    B, T = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.d_model), jnp.float32)
    mask = jnp.arange(T)[None, :] < jnp.asarray([16, 11, 3, 8])[:, None]
    pos = jnp.arange(T)
    bias = t5m.relative_bias(enc["rel_bias"], pos, pos, bidirectional=True, cfg=cfg)[0]
    return cfg, stacked, x, mask, bias


@pytest.mark.parametrize("gated", [False, True])
def test_fused_train_stack_grads_match_xla(gated):
    cfg, stacked, x, mask, bias = _mk(gated)

    def loss_fused(s, x_, b):
        out = t5m._fused_t5_stack_train(cfg)(s, x_, mask, b)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    def loss_xla(s, x_, b):
        out = t5m._encode_blocks(s, cfg, x_, mask, b[None])
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(stacked, x, bias)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(stacked, x, bias)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)

    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    for (path, a), (_, b) in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_train_stack_forward_matches_inference_kernel():
    """The train stack's forward (save_x1 variant) must equal the inference
    fused stack's output bit-for-bit — same kernel, one extra output."""
    cfg, stacked, x, mask, bias = _mk(False)
    out_train = t5m._fused_t5_stack_train(cfg)(stacked, x, mask, bias)
    out_inf = t5m._fused_t5_stack(cfg)(stacked, x, mask, bias)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_inf))


def test_ffn_bwd_residual_path():
    """dx1 from t5_ffn_bwd includes the residual: a zero-weight FFN must pass
    the cotangent straight through."""
    from rag_docvqa_tpu.ops.fused_encoder_bwd import t5_ffn_bwd

    B, T, d, d_ff = 2, 8, 32, 64
    x1 = jax.random.normal(jax.random.PRNGKey(2), (B, T, d), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(3), (B, T, d), jnp.float32)
    ln1 = jnp.ones((1, d), jnp.float32)
    wi = jnp.zeros((d, d_ff), jnp.float32)
    wof = jnp.zeros((d_ff, d), jnp.float32)
    dx1, dln1, dffn = t5_ffn_bwd(x1, g, ln1, (wi, wof), eps=1e-6, gated=False,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(g), atol=1e-6)
    assert np.allclose(np.asarray(dln1), 0.0)
    # dwof = f^T g with f = relu(h2 @ 0) = 0
    assert np.allclose(np.asarray(dffn[1]), 0.0)


def test_train_wanted_gate_off_cpu():
    from rag_docvqa_tpu.ops.fused_encoder_bwd import fused_t5_train_wanted

    cfg = t5m.T5Config(num_encoder_layers=2, num_decoder_layers=1)
    assert fused_t5_train_wanted(cfg, 32, 512) is False  # CPU backend


def test_fused_train_step_matches_flash_step(monkeypatch):
    """Full make_train_step with the fused-train encoder (gate forced on; the
    kernels run in interpret mode on CPU) tracks the plain step: same loss
    and near-identical updated params. The only intended divergence is the
    fused path's bf16 rel-pos bias (the XLA path keeps it f32 off-TPU)."""
    from rag_docvqa_tpu.data import DocVQAIngestor, HashTokenizer
    from rag_docvqa_tpu.data.synthetic import make_corpus
    from rag_docvqa_tpu.engine.rag_vt5 import RAGConfig
    from rag_docvqa_tpu.models import vt5 as vt5m
    from rag_docvqa_tpu.models.embeddings import SpatialConfig
    from rag_docvqa_tpu.ops.chunking import ChunkSpec
    from rag_docvqa_tpu.ops import fused_encoder_bwd as feb
    import rag_docvqa_tpu.models.vt5 as vt5_mod
    from rag_docvqa_tpu.training import TrainState, build_optimizer, make_train_step

    cfg = t5m.T5Config(vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                       num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0)
    vcfg = vt5m.VT5Config(t5=cfg, spatial=SpatialConfig(hidden_size=32, dropout_rate=0.0),
                          use_visual=False)
    rag = RAGConfig(page_retrieval="concat", chunk_num=2, max_source_length=32,
                    max_new_tokens=4)
    ing = DocVQAIngestor(HashTokenizer(vocab_size=256), ChunkSpec(chunk_size=8, overlap=2))
    docs = make_corpus(2, n_pages=2, words_per_page=20, seed=9)
    ing.caps = ing.plan_caps(docs)
    batch, aux = ing.ingest(docs)
    labels = jnp.asarray(ing.answer_labels(aux["answers"], max_len=4))
    params = vt5m.init_vt5_params(jax.random.PRNGKey(0), vcfg)
    tx = build_optimizer(lr=1e-3, warmup_steps=1, total_steps=10)

    s_plain = TrainState.create(params, tx)
    s_fused = TrainState.create(jax.tree.map(jnp.array, params), tx)
    step_plain = make_train_step(vcfg, rag, tx)
    s_plain, m_plain = step_plain(s_plain, batch, labels)

    monkeypatch.setattr(feb, "fused_t5_train_wanted", lambda *a, **k: True)
    step_fused = make_train_step(vcfg, rag, tx)
    s_fused, m_fused = step_fused(s_fused, batch, labels)

    np.testing.assert_allclose(float(m_fused["loss"]), float(m_plain["loss"]),
                               rtol=2e-3)
    for a, b in zip(jax.tree.leaves(s_fused.params), jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-3)


def test_fused_train_gspmd_batch_sharded_grads():
    """Data-parallel GSPMD: the fused-train layer stack under plain jit with
    the batch sharded over the 8-device mesh must produce the same loss and
    gradients as the unsharded run — the custom_partitioning wrappers shard
    the batch through all three kernels and one psum completes each
    weight/LN/bias gradient."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.parallel import create_mesh

    cfg, stacked, x, mask, bias = _mk(False)
    B = x.shape[0]  # 4; shard over a 4-way slice of the 8-device mesh
    mesh = create_mesh((4, 2), ("data", "model"))

    def loss(s, x_, b):
        out = t5m._fused_t5_stack_train(cfg)(s, x_, mask, b)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    v_ref, g_ref = vg(stacked, x, bias)

    sh = lambda a: jax.device_put(a, NamedSharding(mesh, P("data")))
    v_sh, g_sh = vg(stacked, sh(x), bias)

    np.testing.assert_allclose(float(v_sh), float(v_ref), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_sh), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
