"""Grad parity for the handwritten fused BERT layer backward
(ops/fused_encoder_bwd.py BERT kernels) against jax.grad through the XLA
blocks — interpret mode, f32, so the comparison is tight. Mirrors
test_fused_encoder_bwd.py for the T5 family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models import bert as bm
from rag_docvqa_tpu.ops.fused_encoder import fuse_bert_blocks
from rag_docvqa_tpu.ops.fused_encoder_bwd import make_fused_bert_layer_train


def _mk():
    cfg = bm.BertConfig(vocab_size=64, hidden_size=64, num_layers=2,
                        num_heads=4, intermediate_size=128)
    params = bm.init_bert_params(jax.random.PRNGKey(0), cfg)
    B, T = 4, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, cfg.hidden_size), jnp.float32)
    mask = jnp.arange(T)[None, :] < jnp.asarray([16, 11, 3, 8])[:, None]
    return cfg, params["blocks"], x, mask


def _run_train(cfg, blocks, x, mask):
    layer = make_fused_bert_layer_train(cfg.num_heads, cfg.layer_norm_eps)
    pre = fuse_bert_blocks(blocks)

    def body(x, l):
        return layer(x, mask, l), None

    out, _ = jax.lax.scan(body, x, pre)
    return out


def test_fused_bert_train_grads_match_xla():
    cfg, blocks, x, mask = _mk()

    def loss_fused(b, x_):
        out = _run_train(cfg, b, x_, mask)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    def loss_xla(b, x_):
        out = bm._xla_blocks(b, cfg, x_, mask)
        return jnp.sum(jnp.where(mask[..., None], out, 0.0) ** 2)

    vf, gf = jax.value_and_grad(loss_fused, argnums=(0, 1))(blocks, x)
    vx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1))(blocks, x)
    np.testing.assert_allclose(float(vf), float(vx), rtol=1e-5)

    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    for (path, a), (_, b) in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_bert_train_forward_matches_inference_kernel():
    """The train stack's primal forward must equal the inference fused stack
    bit-for-bit — same kernel, x1 only saved under differentiation."""
    cfg, blocks, x, mask = _mk()
    out_train = _run_train(cfg, blocks, x, mask)
    out_inf = bm._fused_blocks(cfg)(blocks, x, mask)
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(out_inf))


def test_bert_encode_routes_training_through_fused_bwd(monkeypatch):
    """bert_encode(fused=True) must pick the handwritten-backward stack when
    the gate says it fits — pinned by monkeypatching the gate and asserting
    the train stack ran."""
    cfg, blocks, x, mask = _mk()
    params = bm.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.zeros((4, 16), jnp.int32)

    calls = {}
    real = bm._fused_train_blocks

    def spy(c):
        calls["hit"] = True
        return real(c)

    monkeypatch.setattr(bm, "_fused_train_blocks", spy)
    monkeypatch.setattr(
        "rag_docvqa_tpu.ops.fused_encoder_bwd.fused_bert_train_wanted",
        lambda *a, **k: True)
    out = bm.bert_encode(params, cfg, ids, mask, fused=True)
    assert calls.get("hit"), "train stack not selected"
    # and it must agree with the XLA path on the same params
    ref = bm.bert_encode(params, cfg, ids, mask, fused=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_contrastive_step_grads_through_fused_path():
    """End-to-end: an MNRL contrastive loss differentiated through the fused
    train stack matches the XLA path's gradients (the train_cl workflow)."""
    from rag_docvqa_tpu.training.contrastive import multiple_negatives_ranking_loss

    cfg, blocks, x, mask = _mk()
    params = bm.init_bert_params(jax.random.PRNGKey(0), cfg)
    ids_a = jnp.asarray(np.random.RandomState(0).randint(3, 64, (4, 16)), jnp.int32)
    ids_p = jnp.asarray(np.random.RandomState(1).randint(3, 64, (4, 16)), jnp.int32)
    am = jnp.ones((4, 16), bool)

    def loss(p, fused):
        # route encode explicitly so both paths share the pooling math
        ea = bm.bert_encode(p, cfg, ids_a, am, fused=fused)[:, 0]
        ep = bm.bert_encode(p, cfg, ids_p, am, fused=fused)[:, 0]
        return multiple_negatives_ranking_loss(ea, ep)

    import rag_docvqa_tpu.ops.fused_encoder_bwd as feb
    orig = feb.fused_bert_train_wanted
    feb.fused_bert_train_wanted = lambda *a, **k: True
    try:
        gf = jax.grad(lambda p: loss(p, True))(params)
    finally:
        feb.fused_bert_train_wanted = orig
    gx = jax.grad(lambda p: loss(p, False))(params)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(gx)
    for (path, a), (_, b) in zip(flat_f, flat_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fused_bert_train_gspmd_batch_sharded_grads():
    """Under a data mesh the custom_partitioning wrappers shard the batch and
    psum the weight grads: sharded grads == unsharded grads."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg, blocks, x, mask = _mk()
    x = jnp.tile(x, (2, 1, 1))
    mask = jnp.tile(mask, (2, 1))

    def loss(b, x_, m):
        layer = make_fused_bert_layer_train(cfg.num_heads, cfg.layer_norm_eps)
        pre = fuse_bert_blocks(b)

        def body(x, l):
            return layer(x, m, l), None

        out, _ = jax.lax.scan(body, x_, pre)
        return jnp.sum(jnp.where(m[..., None], out, 0.0) ** 2)

    g_ref = jax.grad(loss)(blocks, x, mask)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1), ("data", "model"))
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    with jax.set_mesh(mesh):
        g_sh = jax.jit(jax.grad(loss))(blocks, xs, ms)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_sh)
    for (path, a), (_, b) in zip(flat_r, flat_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
