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
