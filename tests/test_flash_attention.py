"""Flash attention kernel vs the jnp oracle (interpret mode off-TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.ops.flash_attention import attention_reference, flash_attention


def _rand(rng, *shape):
    return jnp.asarray(rng.randn(*shape).astype(np.float32))


def _mk(rng, B=2, Tq=48, Tk=48, H=3, dh=16):
    q = _rand(rng, B, Tq, H, dh)
    k = _rand(rng, B, Tk, H, dh)
    v = _rand(rng, B, Tk, H, dh)
    return q, k, v


@pytest.mark.parametrize("block", [(16, 16), (32, 48), (64, 64)])
def test_flash_matches_reference_blocks(block):
    rng = np.random.RandomState(0)
    q, k, v = _mk(rng)
    out = flash_attention(q, k, v, block_q=block[0], block_k=block[1], interpret=True)
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_key_padding_mask():
    rng = np.random.RandomState(1)
    q, k, v = _mk(rng, B=3, Tq=40, Tk=56)
    lens = jnp.asarray([56, 17, 1])
    mask = jnp.arange(56)[None, :] < lens[:, None]
    out = flash_attention(q, k, v, key_mask=mask, block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_batch_shared_bias():
    """T5 mode: (1, H, Tq, Tk) relative-position bias streamed blockwise."""
    rng = np.random.RandomState(2)
    q, k, v = _mk(rng, B=2, Tq=32, Tk=48)
    bias = _rand(rng, 1, 3, 32, 48) * 2.0
    mask = jnp.arange(48)[None, :] < jnp.asarray([48, 29])[:, None]
    out = flash_attention(q, k, v, key_mask=mask, bias=bias, block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v, key_mask=mask, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_per_sample_bias_and_scale():
    rng = np.random.RandomState(3)
    q, k, v = _mk(rng, B=2, Tq=32, Tk=32, dh=32)
    bias = _rand(rng, 2, 3, 32, 32)
    out = flash_attention(q, k, v, bias=bias, scale=32**-0.5, block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v, bias=bias, scale=32**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_causal():
    rng = np.random.RandomState(4)
    q, k, v = _mk(rng, B=2, Tq=48, Tk=48)
    mask = jnp.arange(48)[None, :] < jnp.asarray([48, 31])[:, None]
    out = flash_attention(q, k, v, key_mask=mask, causal=True, block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v, key_mask=mask, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_unaligned_lengths_pad():
    """Tq/Tk not multiples of the blocks: wrapper pads and slices back."""
    rng = np.random.RandomState(5)
    q, k, v = _mk(rng, B=2, Tq=37, Tk=53)
    mask = jnp.arange(53)[None, :] < jnp.asarray([53, 11])[:, None]
    out = flash_attention(q, k, v, key_mask=mask, block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v, key_mask=mask)
    assert out.shape == (2, 37, 3, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_bf16_inputs():
    rng = np.random.RandomState(6)
    q, k, v = _mk(rng, B=2, Tq=32, Tk=32)
    q, k, v = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(q, k, v, block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2
    )


def test_t5_encode_flash_flag_parity():
    """t5.encode with flash_encoder=True (interpret kernel) matches XLA path."""
    from rag_docvqa_tpu.models import t5 as t5m

    cfg = t5m.T5Config(vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                       num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0)
    params = t5m.init_t5_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 40, 32).astype(np.float32))
    mask = jnp.arange(40)[None, :] < jnp.asarray([40, 23])[:, None]
    ref = t5m.encode(params, cfg, x, mask)
    import dataclasses
    out = t5m.encode(params, dataclasses.replace(cfg, flash_encoder=True), x, mask)
    # flash streams the rel-pos bias in bf16 (the XLA path adds it in f32) —
    # that's the designed HBM trade-off, so tolerance is bf16-bias-sized
    np.testing.assert_allclose(
        np.asarray(out)[mask], np.asarray(ref)[mask], atol=2e-3, rtol=2e-2
    )


def test_p2s_vision_encode_flash_flag_parity():
    from rag_docvqa_tpu.models import pix2struct as p2s
    import dataclasses

    vcfg = p2s.P2SVisionConfig(hidden_size=32, num_layers=2, num_heads=4, d_ff=64,
                               patch_dim=48, max_rows=16, max_cols=16)
    cfg = p2s.Pix2StructConfig(
        vision=vcfg,
        text=dataclasses.replace(p2s.Pix2StructConfig().text, vocab_size=128, d_model=32,
                                 d_kv=8, num_heads=4, d_ff=64, num_decoder_layers=1),
    )
    params = p2s.init_p2s_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(8)
    patches = jnp.asarray(rng.rand(2, 24, 50).astype(np.float32))
    mask = (jnp.arange(24)[None, :] < jnp.asarray([24, 13])[:, None]).astype(jnp.float32)
    ref = p2s.vision_encode(params, cfg, patches, mask)
    fcfg = dataclasses.replace(cfg, vision=dataclasses.replace(vcfg, flash_encoder=True))
    out = p2s.vision_encode(params, fcfg, patches, mask)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(ref)[valid], atol=5e-5, rtol=5e-5)


def test_flash_gqa_heads():
    """k/v with fewer heads than q: kernel maps query head h -> kv head h//rep."""
    rng = np.random.RandomState(9)
    B, Tq, Tk, H, Hkv, dh = 2, 32, 48, 8, 2, 16
    q = _rand(rng, B, Tq, H, dh)
    k = _rand(rng, B, Tk, Hkv, dh)
    v = _rand(rng, B, Tk, Hkv, dh)
    mask = jnp.arange(Tk)[None, :] < jnp.asarray([48, 21])[:, None]
    out = flash_attention(q, k, v, key_mask=mask, causal=True, scale=dh**-0.5,
                          block_q=16, block_k=16, interpret=True)
    ref = attention_reference(q, k, v, key_mask=mask, causal=True, scale=dh**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_causal_lm_flash_prefill_parity():
    """forward_hidden + generate with flash_prefill=True match the XLA path."""
    import dataclasses
    from rag_docvqa_tpu.models import causal_lm as clm

    cfg = clm.CausalLMConfig(vocab_size=128, d_model=32, num_layers=2, num_heads=4,
                             num_kv_heads=2, d_ff=64)
    fcfg = dataclasses.replace(cfg, flash_prefill=True)
    params = clm.init_causal_lm_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(10)
    ids = jnp.asarray(rng.randint(3, 128, size=(2, 40)), jnp.int32)
    mask = jnp.arange(40)[None, :] < jnp.asarray([40, 27])[:, None]
    h_ref = clm.forward_hidden(params, cfg, ids, mask)
    h_fl = clm.forward_hidden(params, fcfg, ids, mask)
    np.testing.assert_allclose(
        np.asarray(h_fl)[np.asarray(mask)], np.asarray(h_ref)[np.asarray(mask)],
        atol=2e-4, rtol=2e-3,
    )
    t_ref, c_ref = clm.generate(params, cfg, ids, mask, max_new_tokens=4)
    t_fl, c_fl = clm.generate(params, fcfg, ids, mask, max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_fl))
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_fl), atol=1e-3, rtol=1e-3)


# --------------------------------------------------------------------------- #
# backward (custom VJP) vs jax.grad through the oracle
# --------------------------------------------------------------------------- #
def _grad_parity(q, k, v, key_mask=None, bias=None, scale=1.0, causal=False,
                 block=(16, 16), atol=3e-4, rtol=3e-3):
    """Compare grads of a scalar loss through flash vs the XLA oracle."""
    cot = jnp.asarray(np.random.RandomState(99).randn(*q.shape[:2], q.shape[2], q.shape[3]).astype(np.float32))

    def loss_flash(q, k, v, bias):
        out = flash_attention(q, k, v, key_mask=key_mask, bias=bias, scale=scale,
                              causal=causal, block_q=block[0], block_k=block[1],
                              interpret=True)
        return jnp.sum(out.astype(jnp.float32) * cot)

    def loss_ref(q, k, v, bias):
        out = attention_reference(q, k, v, key_mask=key_mask, bias=bias,
                                  scale=scale, causal=causal)
        return jnp.sum(out.astype(jnp.float32) * cot)

    argnums = (0, 1, 2) if bias is None else (0, 1, 2, 3)
    g_fl = jax.grad(loss_flash, argnums)(q, k, v, bias)
    g_rf = jax.grad(loss_ref, argnums)(q, k, v, bias)
    names = ("dq", "dk", "dv", "dbias")
    for name, a, b in zip(names, g_fl, g_rf):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=atol, rtol=rtol, err_msg=name,
        )


def test_flash_grad_basic():
    rng = np.random.RandomState(20)
    q, k, v = _mk(rng, B=2, Tq=32, Tk=48)
    _grad_parity(q, k, v)


def test_flash_grad_mask_and_scale():
    rng = np.random.RandomState(21)
    q, k, v = _mk(rng, B=3, Tq=32, Tk=48)
    mask = jnp.arange(48)[None, :] < jnp.asarray([48, 17, 5])[:, None]
    _grad_parity(q, k, v, key_mask=mask, scale=16**-0.5)


def test_flash_grad_batch_shared_bias():
    """T5 mode: the rel-pos bias gradient reduces over the batch axis."""
    rng = np.random.RandomState(22)
    q, k, v = _mk(rng, B=3, Tq=32, Tk=48)
    bias = _rand(rng, 1, 3, 32, 48)
    mask = jnp.arange(48)[None, :] < jnp.asarray([48, 29, 12])[:, None]
    _grad_parity(q, k, v, key_mask=mask, bias=bias)


def test_flash_grad_per_sample_bias():
    rng = np.random.RandomState(23)
    q, k, v = _mk(rng, B=2, Tq=32, Tk=32)
    bias = _rand(rng, 2, 3, 32, 32)
    _grad_parity(q, k, v, bias=bias)


def test_flash_grad_causal():
    rng = np.random.RandomState(24)
    q, k, v = _mk(rng, B=2, Tq=48, Tk=48)
    mask = jnp.arange(48)[None, :] < jnp.asarray([48, 31])[:, None]
    _grad_parity(q, k, v, key_mask=mask, causal=True)


def test_flash_grad_causal_bias():
    """Causal + batch-shared bias (T5 decoder self-attention shape)."""
    rng = np.random.RandomState(25)
    q, k, v = _mk(rng, B=2, Tq=32, Tk=32)
    bias = _rand(rng, 1, 3, 32, 32)
    _grad_parity(q, k, v, bias=bias, causal=True)


def test_flash_grad_gqa():
    rng = np.random.RandomState(26)
    B, Tq, Tk, H, Hkv, dh = 2, 32, 48, 8, 2, 16
    q = _rand(rng, B, Tq, H, dh)
    k = _rand(rng, B, Tk, Hkv, dh)
    v = _rand(rng, B, Tk, Hkv, dh)
    mask = jnp.arange(Tk)[None, :] < jnp.asarray([48, 21])[:, None]
    _grad_parity(q, k, v, key_mask=mask, causal=True, scale=dh**-0.5)


def test_flash_grad_unaligned_pad():
    """Odd Tq/Tk exercise the pad-outside-VJP path: padded query rows carry
    zero cotangents, so they must not leak into dK/dV/dbias."""
    rng = np.random.RandomState(27)
    q, k, v = _mk(rng, B=2, Tq=37, Tk=53)
    bias = _rand(rng, 1, 3, 37, 53)
    mask = jnp.arange(53)[None, :] < jnp.asarray([53, 11])[:, None]
    _grad_parity(q, k, v, key_mask=mask, bias=bias)


def test_flash_grad_t5_encoder_train_step():
    """End-to-end: grads of a t5.encode loss agree between flash and XLA
    paths at train-realistic tolerance (bf16 bias streaming)."""
    import dataclasses
    from rag_docvqa_tpu.models import t5 as t5m

    cfg = t5m.T5Config(vocab_size=256, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                       num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0)
    fcfg = dataclasses.replace(cfg, flash_encoder=True)
    params = t5m.init_t5_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(28)
    x = jnp.asarray(rng.randn(2, 40, 32).astype(np.float32))
    mask = jnp.arange(40)[None, :] < jnp.asarray([40, 23])[:, None]

    def loss(params, cfg):
        h = t5m.encode(params, cfg, x, mask)
        return jnp.mean(jnp.where(mask[..., None], h, 0.0) ** 2)

    g_ref = jax.grad(loss)(params, cfg)
    g_fl = jax.grad(loss)(params, fcfg)
    flat_ref = jax.tree.leaves(g_ref["encoder"])
    flat_fl = jax.tree.leaves(g_fl["encoder"])
    for a, b in zip(flat_fl, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=3e-2)


def test_flash_shard_map_batch_sharded():
    """The kernel runs per-shard inside shard_map on the 8-device mesh with
    bitwise-equal results to the single-device call (values and grads)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.parallel import create_mesh

    rng = np.random.RandomState(30)
    q, k, v = _mk(rng, B=8, Tq=32, Tk=32)
    bias = _rand(rng, 1, 3, 32, 32)
    mask = jnp.arange(32)[None, :] < jnp.asarray([32, 17, 5, 32, 9, 32, 21, 3])[:, None]
    mesh = create_mesh((8,), ("data",))

    def fa(q, k, v, mask, bias):
        return flash_attention(q, k, v, key_mask=mask, bias=bias,
                               block_q=16, block_k=16, interpret=True)

    single = fa(q, k, v, mask, bias)
    sharded_fn = jax.shard_map(
        fa, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=P("data"),
        check_vma=False,  # pallas outputs carry no vma (same as parallel/index.py)
    )
    sharded = sharded_fn(q, k, v, mask, bias)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))

    # grads: per-shard dbias is reduced by the caller's psum (here: the
    # autodiff of the replicated in_spec), matching the single-device grad
    def loss(fn, *args):
        return jnp.sum(fn(*args) ** 2)

    g_single = jax.grad(lambda b: loss(fa, q, k, v, mask, b))(bias)
    g_sharded = jax.grad(lambda b: loss(sharded_fn, q, k, v, mask, b))(bias)
    np.testing.assert_allclose(np.asarray(g_single), np.asarray(g_sharded), atol=1e-5, rtol=1e-5)


def test_flash_gspmd_auto_partitioned():
    """Plain jit with mesh-sharded operands (NO shard_map): the
    custom_partitioning wrapper lets GSPMD run the kernel per-shard over
    (batch, kv-head) instead of replicating the opaque Mosaic call. Values
    and grads (incl. the psum'd batch-shared bias gradient) must match the
    unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.parallel import create_mesh

    rng = np.random.RandomState(31)
    B, Tq, Tk, H, dh = 8, 32, 32, 4, 16
    q, k, v = _mk(rng, B=B, Tq=Tq, Tk=Tk, H=H, dh=dh)
    bias = _rand(rng, 1, H, Tq, Tk)
    mask = jnp.arange(Tk)[None, :] < jnp.asarray([32, 17, 5, 32, 9, 32, 21, 3])[:, None]
    mesh = create_mesh((4, 2), ("data", "model"))

    def fa(q, k, v, mask, bias):
        return flash_attention(q, k, v, key_mask=mask, bias=bias,
                               block_q=16, block_k=16, interpret=True)

    def loss(q, k, v, mask, bias):
        return jnp.sum(fa(q, k, v, mask, bias) ** 2)

    ref_out = fa(q, k, v, mask, bias)
    ref_gq, ref_gb = jax.grad(loss, argnums=(0, 4))(q, k, v, mask, bias)

    # shard batch over "data" AND heads over "model" — the wrapper must keep
    # both and insert only the dbias psum
    qs = jax.device_put(q, NamedSharding(mesh, P("data", None, "model")))
    ks = jax.device_put(k, NamedSharding(mesh, P("data", None, "model")))
    vs = jax.device_put(v, NamedSharding(mesh, P("data", None, "model")))
    ms = jax.device_put(mask, NamedSharding(mesh, P("data")))
    bs = jax.device_put(bias, NamedSharding(mesh, P(None, "model")))

    out = jax.jit(fa)(qs, ks, vs, ms, bs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5, rtol=1e-5)

    gq, gb = jax.jit(jax.grad(loss, argnums=(0, 4)))(qs, ks, vs, ms, bs)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(ref_gq), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(ref_gb), atol=1e-5, rtol=1e-5)


def test_flash_gspmd_per_sample_bias_causal():
    """Causal + per-sample bias through the auto-partitioned path (also
    covers the zeroed above-diagonal dbias blocks)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.parallel import create_mesh

    rng = np.random.RandomState(32)
    B, T, H, dh = 8, 32, 3, 16
    q, k, v = _mk(rng, B=B, Tq=T, Tk=T, H=H, dh=dh)
    bias = _rand(rng, B, H, T, T)
    mesh = create_mesh((8,), ("data",))

    def loss(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, causal=True,
                                       block_q=16, block_k=16, interpret=True) ** 2)

    ref = jax.grad(loss, argnums=(0, 3))(q, k, v, bias)
    sh = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    got = jax.jit(jax.grad(loss, argnums=(0, 3)))(sh(q), sh(k), sh(v), sh(bias))
    for a, b in zip(got, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
