"""Decoder-only causal LM (Qwen2 + Gemma families, HF weight compatible).

Backs the framework's Qwen-style generator path (reference
src/QwenVLInstruct.py wraps Qwen2.5-VL): RoPE, RMSNorm (pre-norm), grouped-
query attention with QKV biases (Qwen2), SwiGLU MLP, tied or untied lm head.
Visual inputs enter as projected patch embeddings spliced into the token
embedding sequence at image-placeholder positions — the same mechanism
Qwen2.5-VL uses — so retrieved page crops can condition generation without a
separate cross-attention stack.

arch="gemma" switches to the Gemma-1 conventions (the bge-reranker-v2-gemma
backbone the reference's FlagLLMReranker runs, src/_modules.py:1513-1541):
sqrt(d_model) input-embedding scale, RMSNorm with (1 + w) weights,
tanh-GELU gated MLP, no QKV bias, explicit head_dim (MQA via num_kv_heads=1).

Decoding follows ops/decode.py's pattern: explicit KV cache + one lax.scan,
with the same confidence-product semantics as VT5.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rag_docvqa_tpu.models.layers import dense, normal_init, rms_norm


@dataclass(frozen=True)
class CausalLMConfig:
    vocab_size: int = 32000
    d_model: int = 1024
    num_layers: int = 12
    num_heads: int = 16
    num_kv_heads: int = 4  # GQA
    d_ff: int = 2816
    rope_theta: float = 1_000_000.0
    rms_eps: float = 1e-6
    qkv_bias: bool = True  # Qwen2 style
    tie_word_embeddings: bool = True
    pad_id: int = 0
    eos_id: int = 1
    arch: str = "qwen2"  # "qwen2" | "gemma"
    head_dim_override: int = 0  # gemma sets head_dim independent of d_model
    # fused causal flash attention for prefill / full forward (inference-only,
    # no VJP; GQA-aware). Engines enable it on a single TPU chip.
    flash_prefill: bool = False

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or self.d_model // self.num_heads


def init_causal_lm_params(rng: jax.Array, cfg: CausalLMConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    d, L, hd = cfg.d_model, cfg.num_layers, cfg.head_dim
    q_dim = cfg.num_heads * hd
    kv_dim = cfg.num_kv_heads * hd

    def lin(rng, din, dout, bias):
        p = {"kernel": normal_init(rng, (L, din, dout), din**-0.5)}
        if bias:
            p["bias"] = jnp.zeros((L, dout))
        return p

    params = {
        "embed": normal_init(ks[0], (cfg.vocab_size, d), 0.02),
        "blocks": {
            "ln0": jnp.ones((L, d)),
            "q": lin(ks[1], d, q_dim, cfg.qkv_bias),
            "k": lin(ks[2], d, kv_dim, cfg.qkv_bias),
            "v": lin(ks[3], d, kv_dim, cfg.qkv_bias),
            "o": lin(ks[4], q_dim, d, False),
            "ln1": jnp.ones((L, d)),
            "gate": lin(ks[5], d, cfg.d_ff, False),
            "up": lin(ks[6], d, cfg.d_ff, False),
            "down": lin(ks[7], cfg.d_ff, d, False),
        },
        "final_ln": jnp.ones((d,)),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal_init(jax.random.fold_in(rng, 9), (d, cfg.vocab_size), d**-0.5)
    return params


# --------------------------------------------------------------------------- #
# RoPE
# --------------------------------------------------------------------------- #
def rope_frequencies(cfg: CausalLMConfig, positions: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """positions (...,) -> (cos, sin) of shape (..., head_dim/2)."""
    hd = cfg.head_dim
    inv_freq = 1.0 / (cfg.rope_theta ** (jnp.arange(0, hd, 2) / hd))
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x (..., T, H, hd); cos/sin (..., T, hd/2) -> rotated (HF half-split
    convention: rotate_half)."""
    hd = x.shape[-1]
    x1, x2 = x[..., : hd // 2], x[..., hd // 2 :]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1).astype(x.dtype)


def _attend_gqa(q, k, v, mask):
    """q (B,Tq,H,hd); k/v (B,Tk,Hkv,hd) with GQA head repetition."""
    B, Tq, H, hd = q.shape
    Hkv = k.shape[2]
    rep = H // Hkv
    k = jnp.repeat(k, rep, axis=2)
    v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * (hd**-0.5)
    s = jnp.where(mask, s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return out.reshape(B, Tq, H * hd)


def _attend_causal(cfg: "CausalLMConfig", q, k, v, mask, key_mask):
    """Causal self-attention over the full sequence: flash kernel when the
    config asks for it (inference on TPU), else the XLA GQA path. `mask` is
    the combined causal+padding mask the XLA path consumes; `key_mask` the
    (B, T) padding mask the kernel rebuilds causality from."""
    if cfg.flash_prefill:
        from rag_docvqa_tpu.ops.flash_attention import flash_attention

        out = flash_attention(
            q, k, v, key_mask=key_mask, causal=True, scale=cfg.head_dim**-0.5
        )
        return out.reshape(out.shape[0], out.shape[1], -1)
    return _attend_gqa(q, k, v, mask)


def _proj(x, p):
    k = p["kernel"]
    if isinstance(k, dict):  # int8-quantized weights (quantize_weights_int8)
        # per-output-channel scale factors OUT of the dot: the MXU reads the
        # int8 bytes (convert fused into the dot operand) and one VPU
        # multiply rescales the (.., out) result — w == q8 * scale exactly
        # up to the quantizer's rounding
        y = jnp.dot(x, k["q8"].astype(x.dtype), preferred_element_type=x.dtype)
        y = y * k["scale"][..., 0, :].astype(x.dtype)
        b = p.get("bias")
        return y + b.astype(x.dtype) if b is not None else y
    return dense(x, k, p.get("bias"))


def _embed_tokens(params, cfg: CausalLMConfig, ids: jax.Array) -> jax.Array:
    e = params["embed"]
    if isinstance(e, dict):  # int8 table: per-row scales gather alongside
        x = e["q8"][ids].astype(e["scale"].dtype) * e["scale"][ids]
    else:
        x = e[ids]
    if cfg.arch == "gemma":
        x = x * jnp.asarray(cfg.d_model**0.5, x.dtype)  # Gemma input scale
    return x


def _lm_logits(params, cfg: CausalLMConfig, x: jax.Array) -> jax.Array:
    """LM head for (.., D) hidden states; handles int8-quantized tables."""
    if cfg.tie_word_embeddings:
        e = params["embed"]
        if isinstance(e, dict):
            y = jnp.dot(x, jnp.swapaxes(e["q8"], -1, -2).astype(x.dtype),
                        preferred_element_type=x.dtype)
            return y * e["scale"][:, 0].astype(x.dtype)
        return jnp.dot(x, jnp.swapaxes(e, -1, -2).astype(x.dtype),
                       preferred_element_type=x.dtype)
    k = params["lm_head"]
    if isinstance(k, dict):
        return jnp.dot(x, k["q8"].astype(x.dtype),
                       preferred_element_type=x.dtype) * k["scale"][..., 0, :].astype(x.dtype)
    return dense(x, k)


def quantize_weights_int8(params: Dict[str, Any]) -> Dict[str, Any]:
    """Symmetric per-output-channel int8 quantization of every matmul weight
    (block kernels, embedding table, untied LM head); norms/biases stay in
    their original dtype. Halves the decode step's dominant cost — the
    per-token re-read of ALL weights (~6.2 GB bf16 at Qwen2.5-3B dims) — IF
    the backend's int8 HBM read rate holds up: bulk int8 reads through
    Pallas/XLA streams measured HALF the bf16 byte rate on the tunneled v5e,
    while the Qwen decode's scan-pipelined weight stream measured ~626 GB/s
    effective (PERF.md §6) — this path exists to answer which regime wins,
    measured in bench detail. Standard W8 quality (~0.4% per-channel RMS
    rounding); parity bounds in tests/test_causal_lm.py."""

    def qmat(w, per_row: bool = False):
        axis = -1 if per_row else -2  # reduce over the input dim
        w32 = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=axis, keepdims=True), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
        return {"q8": q8, "scale": scale.astype(w.dtype)}

    out = dict(params)
    out["blocks"] = {
        name: ({**p, "kernel": qmat(p["kernel"])}
               if isinstance(p, dict) and "kernel" in p else p)
        for name, p in params["blocks"].items()
    }
    out["embed"] = qmat(params["embed"], per_row=True)
    if "lm_head" in params:
        out["lm_head"] = qmat(params["lm_head"])
    return out


def _largest_divisor_upto(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


def init_causal_lm_params_int8(
    rng: jax.Array, cfg: CausalLMConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    """Random-init int8-quantized params with a BOUNDED device-memory peak.

    Same tree (shapes, dtypes, scale conventions) as
    ``quantize_weights_int8(init_causal_lm_params(...))``, but every weight is
    drawn and quantized one layer slice / vocab block at a time inside
    ``lax.map``, so the transient f32 footprint is a single slice (~272 MB at
    Qwen2.5-7B dims) instead of the full stacked tensor (~7.6 GB for the 7B
    gate/up/down stacks). This is what makes REFERENCE-scale serving benchable
    on one 16 GB v5e: the reference ships Qwen2.5-VL-7B
    (/root/reference/eval.py:459) — its bf16 weights (15.2 GB) cannot fit,
    the int8 stack (~7.7 GB) can. The random draw uses per-slice keys, so it
    matches ``init_causal_lm_params`` in distribution, not in exact values.
    Norms/biases are created directly in `dtype` (no f32 master copy)."""
    d, L, hd = cfg.d_model, cfg.num_layers, cfg.head_dim
    q_dim, kv_dim = cfg.num_heads * hd, cfg.num_kv_heads * hd

    def qslice(w32, axis):
        scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=axis, keepdims=True), 1e-12) / 127.0
        q8 = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
        return q8, scale.astype(dtype)

    def qstack(key, din, dout, bias):
        def body(k):
            return qslice(jax.random.normal(k, (din, dout), jnp.float32) * din**-0.5, axis=0)

        q8, scale = jax.lax.map(body, jax.random.split(key, L))
        p = {"kernel": {"q8": q8, "scale": scale}}
        if bias:
            p["bias"] = jnp.zeros((L, dout), dtype)
        return p

    def qrows(key, v, std):  # per-row scales (embedding-table convention)
        nb = _largest_divisor_upto(v, 16)

        def body(k):
            return qslice(jax.random.normal(k, (v // nb, d), jnp.float32) * std, axis=-1)

        q8, scale = jax.lax.map(body, jax.random.split(key, nb))
        return {"q8": q8.reshape(v, d), "scale": scale.reshape(v, 1)}

    def qcols(key, v, std):  # per-output-channel scales for the untied head
        nb = _largest_divisor_upto(v, 16)

        def body(k):
            return qslice(jax.random.normal(k, (d, v // nb), jnp.float32) * std, axis=0)

        q8, scale = jax.lax.map(body, jax.random.split(key, nb))
        return {
            "q8": jnp.transpose(q8, (1, 0, 2)).reshape(d, v),
            "scale": scale.reshape(1, v),
        }

    ks = jax.random.split(rng, 8)
    params = {
        "embed": qrows(ks[0], cfg.vocab_size, 0.02),
        "blocks": {
            "ln0": jnp.ones((L, d), dtype),
            "q": qstack(ks[1], d, q_dim, cfg.qkv_bias),
            "k": qstack(ks[2], d, kv_dim, cfg.qkv_bias),
            "v": qstack(ks[3], d, kv_dim, cfg.qkv_bias),
            "o": qstack(ks[4], q_dim, d, False),
            "ln1": jnp.ones((L, d), dtype),
            "gate": qstack(ks[5], d, cfg.d_ff, False),
            "up": qstack(ks[6], d, cfg.d_ff, False),
            "down": qstack(ks[7], cfg.d_ff, d, False),
        },
        "final_ln": jnp.ones((d,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = qcols(jax.random.fold_in(rng, 9), cfg.vocab_size, d**-0.5)
    return params


def _ln(x: jax.Array, w: jax.Array, cfg: CausalLMConfig) -> jax.Array:
    # Gemma RMSNorm multiplies by (1 + weight)
    return rms_norm(x, 1.0 + w if cfg.arch == "gemma" else w, cfg.rms_eps)


def _act(x: jax.Array, cfg: CausalLMConfig) -> jax.Array:
    return jax.nn.gelu(x, approximate=True) if cfg.arch == "gemma" else jax.nn.silu(x)




def forward_hidden(
    params: Dict[str, Any],
    cfg: CausalLMConfig,
    input_ids: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T) bool
    visual_embeds: Optional[jax.Array] = None,  # (B, T, D): added where visual_mask
    visual_mask: Optional[jax.Array] = None,  # (B, T) bool placeholder positions
) -> jax.Array:
    """Final-layer hidden states (B, T, D) — `forward` minus the LM head.
    Lets heads that need a single position (e.g. the LLM reranker's yes-logit)
    avoid materializing (B, T, V) logits."""
    B, T = input_ids.shape
    x = _embed_tokens(params, cfg, input_ids)
    if visual_embeds is not None and visual_mask is not None:
        x = jnp.where(visual_mask[..., None], visual_embeds.astype(x.dtype), x)
    pos = jnp.arange(T)
    cos, sin = rope_frequencies(cfg, pos)
    causal = (pos[None, :] <= pos[:, None])[None, None]
    mask = causal & attention_mask[:, None, None, :]

    def block(x, layer):
        h = _ln(x, layer["ln0"], cfg)
        q = apply_rope(_proj(h, layer["q"]).reshape(B, T, cfg.num_heads, -1), cos, sin)
        k = apply_rope(_proj(h, layer["k"]).reshape(B, T, cfg.num_kv_heads, -1), cos, sin)
        v = _proj(h, layer["v"]).reshape(B, T, cfg.num_kv_heads, -1)
        x = x + _proj(_attend_causal(cfg, q, k, v, mask, attention_mask), layer["o"])
        h = _ln(x, layer["ln1"], cfg)
        x = x + _proj(_act(_proj(h, layer["gate"]), cfg) * _proj(h, layer["up"]), layer["down"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return _ln(x, params["final_ln"], cfg)


def forward(
    params: Dict[str, Any],
    cfg: CausalLMConfig,
    input_ids: jax.Array,  # (B, T)
    attention_mask: jax.Array,  # (B, T) bool
    visual_embeds: Optional[jax.Array] = None,
    visual_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Full teacher-forced forward; returns (B, T, V) logits."""
    x = forward_hidden(params, cfg, input_ids, attention_mask, visual_embeds, visual_mask)
    return _lm_logits(params, cfg, x)


def sft_loss(
    params: Dict[str, Any],
    cfg: CausalLMConfig,
    input_ids: jax.Array,  # (B, T) prompt ++ answer
    attention_mask: jax.Array,
    labels: jax.Array,  # (B, T) with -100 on prompt/pad (masked-label SFT,
    visual_embeds: Optional[jax.Array] = None,  # src/QwenVLInstruct.py:165-203)
    visual_mask: Optional[jax.Array] = None,
) -> jax.Array:
    logits = forward(params, cfg, input_ids, attention_mask, visual_embeds, visual_mask)
    # causal shift: token t predicts t+1
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    valid = targets != -100
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


# --------------------------------------------------------------------------- #
# cached greedy decode
# --------------------------------------------------------------------------- #
@struct.dataclass
class LMCache:
    # (B, Hkv, Tmax, hd) per layer: the layout the GQA single-query
    # contractions consume directly — no per-step transpose, and no
    # jnp.repeat head inflation (which re-materialized H/Hkv x the KV bytes
    # every decode step)
    k: jax.Array  # (L, B, Hkv, Tmax, hd)
    v: jax.Array


def prefill(
    params: Dict[str, Any],
    cfg: CausalLMConfig,
    input_ids: jax.Array,  # (B, Tp) prompt
    attention_mask: jax.Array,  # (B, Tp)
    max_len: int,
    visual_embeds: Optional[jax.Array] = None,
    visual_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, LMCache]:
    """Run the prompt, fill the KV cache; returns (last logits (B, V), cache)."""
    B, Tp = input_ids.shape
    x = _embed_tokens(params, cfg, input_ids)
    if visual_embeds is not None and visual_mask is not None:
        x = jnp.where(visual_mask[..., None], visual_embeds.astype(x.dtype), x)
    pos = jnp.arange(Tp)
    cos, sin = rope_frequencies(cfg, pos)
    causal = (pos[None, :] <= pos[:, None])[None, None]
    mask = causal & attention_mask[:, None, None, :]
    hd = cfg.head_dim

    def block(x, layer):
        h = _ln(x, layer["ln0"], cfg)
        q = apply_rope(_proj(h, layer["q"]).reshape(B, Tp, cfg.num_heads, hd), cos, sin)
        k = apply_rope(_proj(h, layer["k"]).reshape(B, Tp, cfg.num_kv_heads, hd), cos, sin)
        v = _proj(h, layer["v"]).reshape(B, Tp, cfg.num_kv_heads, hd)
        x = x + _proj(_attend_causal(cfg, q, k, v, mask, attention_mask), layer["o"])
        h = _ln(x, layer["ln1"], cfg)
        x = x + _proj(_act(_proj(h, layer["gate"]), cfg) * _proj(h, layer["up"]), layer["down"])
        # cache layout (B, Hkv, Tmax, hd) — one-time relayout at prefill
        kc = jnp.pad(jnp.transpose(k, (0, 2, 1, 3)), ((0, 0), (0, 0), (0, max_len - Tp), (0, 0)))
        vc = jnp.pad(jnp.transpose(v, (0, 2, 1, 3)), ((0, 0), (0, 0), (0, max_len - Tp), (0, 0)))
        return x, (kc, vc)

    x, (kc, vc) = jax.lax.scan(block, x, params["blocks"])
    x = _ln(x, params["final_ln"], cfg)
    last = x[jnp.arange(B), jnp.sum(attention_mask, axis=1) - 1]
    return _lm_logits(params, cfg, last), LMCache(k=kc, v=vc)


def _attend_gqa_one(q, kc, vc, mask, hd):
    """Single-position GQA attention in cache layout, no head repetition.

    q (B, H, hd); kc/vc (B, Hkv, T, hd); mask (B, 1, 1, T) -> (B, H*hd)."""
    B, H, _ = q.shape
    Hkv = kc.shape[1]
    qg = q.reshape(B, Hkv, H // Hkv, hd)
    s = jax.lax.dot_general(
        qg, kc,
        dimension_numbers=(((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) * (hd**-0.5)  # (B, Hkv, rep, T)
    s = jnp.where(mask, s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    out = jax.lax.dot_general(
        p, vc,
        dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)  # (B, Hkv, rep, hd)
    return out.reshape(B, H * hd)


def decode_step(
    params: Dict[str, Any],
    cfg: CausalLMConfig,
    cache: LMCache,
    token: jax.Array,  # (B,)
    step: jax.Array,  # () cache slot this token's K/V is written to
    attn_len_mask: jax.Array,  # (B, Tmax) valid cache positions incl. this one
    rope_pos: Optional[jax.Array] = None,  # (B,) per-sample rotary positions
) -> Tuple[jax.Array, LMCache]:
    """One cached decode step. With right-padded ragged prompts the cache
    SLOT (Tp + t, fixed across the batch) and the token's rotary POSITION
    (prompt_len + t, per sample) differ — rope_pos carries the latter so
    relative distances match an unpadded (reference left-padded) decode
    exactly. Defaults to `step` when prompts are equal-length."""
    B = token.shape[0]
    hd = cfg.head_dim
    x = _embed_tokens(params, cfg, token)
    if rope_pos is None:
        cos, sin = rope_frequencies(cfg, step[None])
    else:
        cos, sin = rope_frequencies(cfg, rope_pos[:, None])  # (B, 1, hd/2)
    mask = attn_len_mask[:, None, None, :]  # (B, 1, 1, Tmax)

    def block(x, layer_cache):
        layer, (kc, vc) = layer_cache
        h = _ln(x, layer["ln0"], cfg)
        q = apply_rope(_proj(h, layer["q"]).reshape(B, 1, cfg.num_heads, hd), cos, sin)[:, 0]
        k_new = apply_rope(_proj(h, layer["k"]).reshape(B, 1, cfg.num_kv_heads, hd), cos, sin)
        v_new = _proj(h, layer["v"]).reshape(B, 1, cfg.num_kv_heads, hd)
        kc = jax.lax.dynamic_update_slice(kc, jnp.transpose(k_new, (0, 2, 1, 3)), (0, 0, step, 0))
        vc = jax.lax.dynamic_update_slice(vc, jnp.transpose(v_new, (0, 2, 1, 3)), (0, 0, step, 0))
        x = x + _proj(_attend_gqa_one(q, kc, vc, mask, hd), layer["o"])
        h = _ln(x, layer["ln1"], cfg)
        x = x + _proj(_act(_proj(h, layer["gate"]), cfg) * _proj(h, layer["up"]), layer["down"])
        return x, (kc, vc)

    # FULLY unroll the layer loop: a rolled lax.scan nested inside the decode
    # loop materializes each layer's KV-cache dynamic-slice instead of fusing
    # it into the attention dots (measured 2.7x on the T5 decoder, see
    # models/t5.py::decode_step). Same nested-scan structure here.
    x, (kc, vc) = jax.lax.scan(block, x, (params["blocks"], (cache.k, cache.v)),
                               unroll=cfg.num_layers)
    x = _ln(x, params["final_ln"], cfg)
    return _lm_logits(params, cfg, x), LMCache(k=kc, v=vc)


def generate(
    params: Dict[str, Any],
    cfg: CausalLMConfig,
    input_ids: jax.Array,  # (B, Tp) right-aligned or left-padded prompt
    attention_mask: jax.Array,
    max_new_tokens: int = 16,  # reference uses 16 (QwenVLInstruct.py:234-264)
    visual_embeds: Optional[jax.Array] = None,
    visual_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode; returns (tokens (B, T_new), confidence (B,))."""
    B, Tp = input_ids.shape
    max_len = Tp + max_new_tokens
    logits0, cache = prefill(params, cfg, input_ids, attention_mask, max_len, visual_embeds, visual_mask)
    prompt_len = jnp.sum(attention_mask, axis=1)  # (B,)

    tok0 = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    conf0 = jnp.max(jax.nn.softmax(logits0.astype(jnp.float32), -1), -1)
    done0 = tok0 == cfg.eos_id

    def step(carry, t):
        token, cache, done, conf = carry
        # cache slot for generated token i is Tp + i (fixed layout); its
        # rotary position is prompt_len + i per sample, so ragged right-padded
        # prompts decode with exactly the contiguous-position semantics of the
        # reference's left-padded batch generate (QwenVLInstruct.py:234-264)
        slot = jnp.int32(Tp) + t
        k_pos = jnp.arange(max_len)[None, :]
        mask = (k_pos < prompt_len[:, None]) | ((k_pos >= Tp) & (k_pos <= slot))
        logits, cache = decode_step(params, cfg, cache, token, slot, mask,
                                    rope_pos=prompt_len + t)
        next_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        max_prob = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), -1), -1)
        emitted = jnp.where(done, cfg.pad_id, next_tok)
        contrib = jnp.where(done | (t >= max_new_tokens - 2), 1.0, max_prob)
        conf = conf * contrib
        done = done | (emitted == cfg.eos_id)
        return (emitted, cache, done, conf), emitted

    first = jnp.where(done0, cfg.pad_id, tok0)
    (_, _, _, conf), tokens = jax.lax.scan(
        step, (first, cache, done0, conf0), jnp.arange(max_new_tokens - 1)
    )
    tokens = jnp.concatenate([first[:, None], jnp.transpose(tokens, (1, 0))], axis=1)
    return tokens, conf


# --------------------------------------------------------------------------- #
# HF conversion (Qwen2ForCausalLM)
# --------------------------------------------------------------------------- #
def convert_qwen2_state_dict(sd: Dict[str, Any], cfg: CausalLMConfig) -> Dict[str, Any]:
    import numpy as np

    # accept both the on-disk hub naming (model.layers.*) and the refactored
    # transformers>=4.54 module naming (model.language_model.layers.*) that
    # VLM wrappers re-save with
    if any(k.startswith("model.language_model.") for k in sd):
        sd = {
            ("model." + k[len("model.language_model."):] if k.startswith("model.language_model.") else k): v
            for k, v in sd.items()
        }
    L = cfg.num_layers
    p = "model.layers.{}."

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    def stack(fmt, transpose=True):
        mats = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
        if transpose:
            mats = [np.ascontiguousarray(m.T) for m in mats]
        return np.stack(mats)

    def lin(base, bias):
        out = {"kernel": stack(base + ".weight")}
        if bias:
            out["bias"] = stack(base + ".bias", transpose=False)
        return out

    params = {
        "embed": a("model.embed_tokens.weight"),
        "blocks": {
            "ln0": stack(p + "input_layernorm.weight", False),
            "q": lin(p + "self_attn.q_proj", cfg.qkv_bias),
            "k": lin(p + "self_attn.k_proj", cfg.qkv_bias),
            "v": lin(p + "self_attn.v_proj", cfg.qkv_bias),
            "o": lin(p + "self_attn.o_proj", False),
            "ln1": stack(p + "post_attention_layernorm.weight", False),
            "gate": lin(p + "mlp.gate_proj", False),
            "up": lin(p + "mlp.up_proj", False),
            "down": lin(p + "mlp.down_proj", False),
        },
        "final_ln": a("model.norm.weight"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = t("lm_head.weight")
    return params

def convert_gemma_state_dict(sd: Dict[str, Any], cfg: CausalLMConfig) -> Dict[str, Any]:
    """HF GemmaForCausalLM -> param tree (same module layout as Qwen2; the
    arch differences — embed scale, (1+w) norms, tanh-GELU, no biases — live
    in the forward via cfg.arch="gemma"). Covers bge-reranker-v2-gemma."""
    assert cfg.arch == "gemma" and not cfg.qkv_bias
    return convert_qwen2_state_dict(sd, cfg)


def gemma_config_from_hf(hf_cfg, **overrides) -> CausalLMConfig:
    """CausalLMConfig for an HF GemmaConfig or its config.json dict
    (gemma-1; gemma-2b: d=2048, 8 heads, head_dim 256, MQA)."""
    get = hf_cfg.get if isinstance(hf_cfg, dict) else lambda k, d=None: getattr(hf_cfg, k, d)
    kw = dict(
        vocab_size=get("vocab_size"),
        d_model=get("hidden_size"),
        num_layers=get("num_hidden_layers"),
        num_heads=get("num_attention_heads"),
        num_kv_heads=get("num_key_value_heads"),
        d_ff=get("intermediate_size"),
        rope_theta=get("rope_theta", 10000.0),
        rms_eps=get("rms_norm_eps", 1e-6),
        qkv_bias=False,
        tie_word_embeddings=True,
        arch="gemma",
        head_dim_override=get("head_dim", 0) or 0,
    )
    kw.update(overrides)
    return CausalLMConfig(**kw)
