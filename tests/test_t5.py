"""T5 stack tests: HF parity via weight conversion + KV-cache consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models.convert import convert_t5_state_dict, torch_state_dict_to_numpy
from rag_docvqa_tpu.ops.decode import greedy_decode

pytestmark = pytest.mark.parity  # slow torch/HF parity; core suite runs -m 'not parity'


TINY = t5m.T5Config(
    vocab_size=128,
    d_model=32,
    d_kv=8,
    num_heads=4,
    d_ff=64,
    num_encoder_layers=2,
    num_decoder_layers=2,
    dropout_rate=0.0,
)


@pytest.fixture(scope="module")
def tiny_params():
    return init_f32(TINY)


def init_f32(cfg):
    return t5m.init_t5_params(jax.random.PRNGKey(0), cfg)


def test_encode_shapes(tiny_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, TINY.d_model))
    mask = jnp.ones((2, 10), bool)
    h = t5m.encode(tiny_params, TINY, x, mask)
    assert h.shape == (2, 10, TINY.d_model)


def test_decode_train_shapes(tiny_params):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, TINY.d_model))
    mask = jnp.ones((2, 10), bool)
    h = t5m.encode(tiny_params, TINY, x, mask)
    dec_ids = jnp.asarray([[0, 5, 6], [0, 7, 8]], jnp.int32)
    logits = t5m.decode_train(tiny_params, TINY, dec_ids, h, mask)
    assert logits.shape == (2, 3, TINY.vocab_size)


def test_cache_decode_matches_teacher_forced(tiny_params):
    """Incremental decode_step logits must equal full-forward logits."""
    B, Te, Td = 2, 7, 5
    x = jax.random.normal(jax.random.PRNGKey(2), (B, Te, TINY.d_model))
    mask = jnp.asarray([[True] * 7, [True] * 4 + [False] * 3])
    h = t5m.encode(tiny_params, TINY, x, mask)
    dec_ids = jax.random.randint(jax.random.PRNGKey(3), (B, Td), 3, TINY.vocab_size)
    dec_ids = dec_ids.at[:, 0].set(TINY.decoder_start_token_id)
    full_logits = t5m.decode_train(tiny_params, TINY, dec_ids, h, mask)

    cache = t5m.init_decode_cache(tiny_params, TINY, h, Td)
    step_logits = []
    for t in range(Td):
        lg, cache = t5m.decode_step(tiny_params, TINY, cache, dec_ids[:, t], jnp.int32(t), mask)
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(full_logits), np.asarray(step_logits), rtol=2e-4, atol=2e-4)


def test_greedy_decode_shapes_and_eos(tiny_params):
    B, Te = 3, 6
    x = jax.random.normal(jax.random.PRNGKey(4), (B, Te, TINY.d_model))
    mask = jnp.ones((B, Te), bool)
    h = t5m.encode(tiny_params, TINY, x, mask)
    tokens, conf = greedy_decode(tiny_params, TINY, h, mask, max_new_tokens=8)
    assert tokens.shape == (B, 8)
    assert conf.shape == (B,)
    assert ((conf > 0) & (conf <= 1.0 + 1e-6)).all()
    # after an EOS, everything is pad
    toks = np.asarray(tokens)
    for b in range(B):
        eos_pos = np.where(toks[b] == TINY.eos_id)[0]
        if len(eos_pos):
            assert (toks[b, eos_pos[0] + 1 :] == TINY.pad_id).all()


def test_shift_tokens_right():
    labels = jnp.asarray([[5, 6, -100], [7, 1, 2]])
    out = t5m.shift_tokens_right(labels, pad_id=0, decoder_start_token_id=0)
    assert out.tolist() == [[0, 5, 6], [0, 7, 1]]


# --------------------------------------------------------------------------- #
# HF parity (random tiny torch T5 -> convert -> compare forwards)
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config
    from transformers import T5ForConditionalGeneration

    hf_cfg = HFT5Config(
        vocab_size=128,
        d_model=32,
        d_kv=8,
        num_heads=4,
        d_ff=64,
        num_layers=2,
        num_decoder_layers=2,
        dropout_rate=0.0,
        feed_forward_proj="relu",
        tie_word_embeddings=True,
        decoder_start_token_id=0,
    )
    torch.manual_seed(0)
    hf = T5ForConditionalGeneration(hf_cfg).eval()
    params = convert_t5_state_dict(torch_state_dict_to_numpy(hf), TINY)
    return hf, jax.tree.map(jnp.asarray, params)


def test_hf_parity_full_forward(hf_pair):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    B, Te, Td = 2, 9, 4
    rng = np.random.RandomState(0)
    emb = rng.randn(B, Te, TINY.d_model).astype(np.float32)
    enc_mask = np.ones((B, Te), np.int64)
    enc_mask[1, 6:] = 0
    dec_ids = rng.randint(2, 128, size=(B, Td))
    dec_ids[:, 0] = 0

    with torch.no_grad():
        out = hf(
            inputs_embeds=torch.from_numpy(emb),
            attention_mask=torch.from_numpy(enc_mask),
            decoder_input_ids=torch.from_numpy(dec_ids),
        )
    hf_logits = out.logits.numpy()

    h = t5m.encode(params, TINY, jnp.asarray(emb), jnp.asarray(enc_mask, bool))
    logits = t5m.decode_train(params, TINY, jnp.asarray(dec_ids), h, jnp.asarray(enc_mask, bool))
    np.testing.assert_allclose(np.asarray(logits), hf_logits, rtol=2e-4, atol=2e-4)


def test_hf_parity_greedy_generate(hf_pair):
    torch = pytest.importorskip("torch")
    hf, params = hf_pair
    B, Te = 2, 6
    rng = np.random.RandomState(1)
    emb = rng.randn(B, Te, TINY.d_model).astype(np.float32)
    enc_mask = np.ones((B, Te), np.int64)

    with torch.no_grad():
        out = hf.generate(
            inputs_embeds=torch.from_numpy(emb),
            attention_mask=torch.from_numpy(enc_mask),
            max_new_tokens=6,
            do_sample=False,
            num_beams=1,
        )
    hf_tokens = out.numpy()[:, 1:]  # drop decoder_start

    h = t5m.encode(params, TINY, jnp.asarray(emb), jnp.asarray(enc_mask, bool))
    tokens, _ = greedy_decode(params, TINY, h, jnp.asarray(enc_mask, bool), max_new_tokens=6)
    tokens = np.asarray(tokens)
    # compare up to HF's early stop length
    T = hf_tokens.shape[1]
    np.testing.assert_array_equal(tokens[:, :T], hf_tokens)


def test_decode_kv_int8_close_to_fp(tiny_params):
    """int8 cross-KV decode: logits near the fp path, same greedy tokens."""
    import dataclasses

    from rag_docvqa_tpu.ops.decode import greedy_decode

    B, Te, Td = 2, 7, 5
    x = jax.random.normal(jax.random.PRNGKey(5), (B, Te, TINY.d_model))
    mask = jnp.asarray([[True] * 7, [True] * 4 + [False] * 3])
    h = t5m.encode(tiny_params, TINY, x, mask)
    qcfg = dataclasses.replace(TINY, decode_kv_int8=True)
    dec_ids = jax.random.randint(jax.random.PRNGKey(6), (B, Td), 3, TINY.vocab_size)
    dec_ids = dec_ids.at[:, 0].set(TINY.decoder_start_token_id)

    cache_fp = t5m.init_decode_cache(tiny_params, TINY, h, Td)
    cache_q = t5m.init_decode_cache(tiny_params, qcfg, h, Td)
    assert cache_q.cross_k.dtype == jnp.int8 and cache_q.cross_k_scale is not None
    for t in range(Td):
        lg_fp, cache_fp = t5m.decode_step(tiny_params, TINY, cache_fp, dec_ids[:, t], jnp.int32(t), mask)
        lg_q, cache_q = t5m.decode_step(tiny_params, qcfg, cache_q, dec_ids[:, t], jnp.int32(t), mask)
        # channel-wise int8 quantization: ~1% relative score error budget
        np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_fp), rtol=0.05, atol=0.05)

    toks_fp, conf_fp = greedy_decode(tiny_params, TINY, h, mask, max_new_tokens=6)
    toks_q, conf_q = greedy_decode(tiny_params, qcfg, h, mask, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(toks_fp), np.asarray(toks_q))
    np.testing.assert_allclose(np.asarray(conf_fp), np.asarray(conf_q), rtol=0.02, atol=0.02)


def test_fused_decode_attention_matches_xla():
    """ops/decode_attention.py (interpret) == _attend_one semantics, and the
    full greedy decode is identical with fused_decode_attn on/off for both
    bf16 and int8 caches."""
    import dataclasses

    from rag_docvqa_tpu.ops.decode_attention import fused_cross_attention, pack_decode_kv

    rng = np.random.RandomState(0)
    B, H, Te, dk = 3, 4, 24, 8
    q = jnp.asarray(rng.randn(B, H, dk).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, Te, dk).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, Te, dk).astype(np.float32))
    mask = jnp.arange(Te)[None, :] < jnp.asarray([24, 11, 5])[:, None]

    k2, v2 = pack_decode_kv(k, v)
    want = t5m._attend_one(q, k, v, None, mask[:, None, :])
    # exact mode (f32 matmul operands): tight parity with the oracle
    got = fused_cross_attention(q, k2, v2, mask, interpret=True, exact=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32),
                               rtol=2e-5, atol=2e-5)
    # default mode (bf16 operands, f32 accumulation — the flash kernel's
    # precision contract; ~8x MXU rate on v5e): bf16-level agreement
    got_b = fused_cross_attention(q, k2, v2, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)

    # channel scales fold outside: matches explicit dequant
    ks = jnp.asarray(rng.rand(B, H, dk).astype(np.float32) + 0.5)
    vs = jnp.asarray(rng.rand(B, H, dk).astype(np.float32) + 0.5)
    ki = jnp.clip(jnp.round(k / ks[:, :, None, :]), -127, 127).astype(jnp.int8)
    vi = jnp.clip(jnp.round(v / vs[:, :, None, :]), -127, 127).astype(jnp.int8)
    ki2, vi2 = pack_decode_kv(ki, vi)
    want8 = t5m._attend_one(
        q, ki.astype(jnp.float32) * ks[:, :, None, :],
        vi.astype(jnp.float32) * vs[:, :, None, :], None, mask[:, None, :],
    )
    got8 = fused_cross_attention(q, ki2, vi2, mask, k_scale=ks, v_scale=vs,
                                 interpret=True, exact=True)
    np.testing.assert_allclose(np.asarray(got8), np.asarray(want8, np.float32),
                               rtol=2e-4, atol=2e-4)
    # bf16 mode: int8 -> bf16 dequant is EXACT; only the scaled query rounds
    got8b = fused_cross_attention(q, ki2, vi2, mask, k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got8b), np.asarray(want8, np.float32),
                               rtol=2e-2, atol=2e-2)

    # end-to-end greedy decode parity, both cache dtypes. H*dk=128 / Te=128
    # satisfy the tile-alignment gate so the packed-cache fused path really
    # runs (interpret mode on CPU); the unaligned fallback is covered by the
    # misaligned config afterwards.
    cfg = t5m.T5Config(vocab_size=128, d_model=32, d_kv=32, num_heads=4, d_ff=64,
                       num_encoder_layers=2, num_decoder_layers=2, dropout_rate=0.0)
    params = t5m.init_t5_params(jax.random.PRNGKey(0), cfg)
    enc = jnp.asarray(rng.randn(2, 128, 32).astype(np.float32))
    emask = jnp.arange(128)[None, :] < jnp.asarray([128, 77])[:, None]
    from rag_docvqa_tpu.ops.decode import greedy_decode

    for int8 in (False, True):
        base = dataclasses.replace(cfg, decode_kv_int8=int8)
        fused = dataclasses.replace(base, fused_decode_attn=True)
        cache = t5m.init_decode_cache(params, fused, enc, 6)
        assert cache.cross_k.ndim == 4, "aligned config must take the packed-cache path"
        t_ref, c_ref = greedy_decode(params, base, enc, emask, max_new_tokens=6)
        t_fus, c_fus = greedy_decode(params, fused, enc, emask, max_new_tokens=6)
        np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_fus))
        # bf16 kernel operands: confidences agree to bf16 precision
        np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_fus), rtol=2e-2, atol=2e-2)

    # misaligned Te (20): _fused_decode_ok must refuse and fall back bit-exact
    enc_m = jnp.asarray(rng.randn(2, 20, 32).astype(np.float32))
    emask_m = jnp.arange(20)[None, :] < jnp.asarray([20, 13])[:, None]
    base = dataclasses.replace(cfg, fused_decode_attn=True)
    cache = t5m.init_decode_cache(params, base, enc_m, 6)
    assert cache.cross_k.ndim == 5
    t_ref, _ = greedy_decode(params, cfg, enc_m, emask_m, max_new_tokens=6)
    t_fus, _ = greedy_decode(params, base, enc_m, emask_m, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_fus))


def test_greedy_decode_split_matches_single_program(tiny_params):
    """greedy_decode_split (cache build + decode loop as separate XLA
    programs — the TPU engines' dispatch, ops/decode.py) is bit-identical to
    the single-program greedy_decode, for f32 and int8 caches."""
    import dataclasses

    from rag_docvqa_tpu.ops.decode import greedy_decode, greedy_decode_split

    params, cfg = tiny_params, TINY
    rng = np.random.RandomState(3)
    enc = jnp.asarray(rng.randn(3, 24, cfg.d_model).astype(np.float32))
    emask = jnp.arange(24)[None, :] < jnp.asarray([24, 17, 9])[:, None]
    for int8 in (False, True):
        c = dataclasses.replace(cfg, decode_kv_int8=int8)
        t_one, conf_one = greedy_decode(params, c, enc, emask, max_new_tokens=7)
        t_two, conf_two = greedy_decode_split(params, c, enc, emask, max_new_tokens=7)
        np.testing.assert_array_equal(np.asarray(t_one), np.asarray(t_two))
        np.testing.assert_allclose(np.asarray(conf_one), np.asarray(conf_two),
                                   rtol=1e-6, atol=1e-6)
