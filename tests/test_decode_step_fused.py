"""Monolithic decode-step kernel (ops/decode_step_fused.py) vs
models/t5.py::decode_step — interpret mode, bf16 and int8 caches, multi-step
cache append."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.ops.decode_step_fused import decode_step_fused, fuse_decoder_weights

CFG = t5m.T5Config(vocab_size=100, d_model=32, d_kv=8, num_heads=4, d_ff=64,
                   num_encoder_layers=2, num_decoder_layers=3, dropout_rate=0.0)


def _setup(int8, seed=0, B=4, Te=16, Tmax=6):
    cfg = t5m.T5Config(**{**CFG.__dict__, "decode_kv_int8": int8})
    params = t5m.init_t5_params(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    enc = jnp.asarray(rng.randn(B, Te, cfg.d_model).astype(np.float32))
    emask = jnp.asarray(rng.rand(B, Te) < 0.9).at[:, 0].set(True)
    cache = t5m.init_decode_cache(params, cfg, enc, Tmax)
    return cfg, params, rng, emask, cache, Tmax


def _fused_step(cfg, params, w, emask, t, token, sk, sv, cache):
    Tmax = sk.shape[3]
    bias = t5m.relative_bias(params["decoder"]["rel_bias"], jnp.int32(t)[None],
                             jnp.arange(Tmax), bidirectional=False, cfg=cfg)
    x0 = params["shared"][token]
    kw = {}
    if cfg.decode_kv_int8:
        kw = dict(k_scale=cache.cross_k_scale, v_scale=cache.cross_v_scale)
    xf, sk2, sv2 = decode_step_fused(
        x0, emask, bias[0, :, 0, :], jnp.int32(t), w, sk, sv,
        cache.cross_k, cache.cross_v, eps=cfg.layer_norm_eps, **kw)
    xf = t5m.rms_norm(xf, params["decoder"]["final_ln"], cfg.layer_norm_eps)
    logits = t5m.lm_logits(params, cfg, xf[:, None, :])[:, 0, :]
    return logits, sk2, sv2


@pytest.mark.parametrize("int8", [False, True])
def test_fused_decode_step_matches_reference(int8):
    cfg, params, rng, emask, cache, Tmax = _setup(int8)
    w = fuse_decoder_weights(params["decoder"])
    token = jnp.asarray(rng.randint(0, 100, size=(4,)), jnp.int32)
    sk, sv = cache.self_k, cache.self_v
    ref_cache = cache
    tol = 1e-4 if not int8 else 1e-3
    for t in range(3):  # three steps: covers append + bias/mask evolution
        ref_logits, ref_cache = t5m.decode_step(params, cfg, ref_cache, token,
                                                jnp.int32(t), emask)
        logits, sk, sv = _fused_step(cfg, params, w, emask, t, token, sk, sv, cache)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                                   atol=tol, rtol=tol, err_msg=f"step {t}")
        np.testing.assert_allclose(np.asarray(sk), np.asarray(ref_cache.self_k),
                                   atol=1e-5, rtol=1e-5)
        token = jnp.argmax(ref_logits, -1).astype(jnp.int32)


def test_fused_decode_step_rejects_unfit():
    from rag_docvqa_tpu.ops.decode_step_fused import _pick_rows_decode

    assert _pick_rows_decode(128, 12, 512, 64, 1) >= 1
    assert _pick_rows_decode(7, 12, 512, 64, 1) == 1  # B=7: only rows=1 divides
