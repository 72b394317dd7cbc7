"""Pix2Struct: screenshot-parsing encoder-decoder (HF weight compatible).

Used by the OCR-free RAGPix2Struct engine (src/RAGPix2Struct.py): the vision
encoder consumes pre-extracted flattened patches with (row, col) ids
(ops/patches.py), the text decoder is T5-style (RMSNorm, relative bias, gated
gelu FFN) and reuses models/t5.py with decoder-only params.

Vision stack (HF Pix2StructVisionModel):
  embeddings = patch_projection(patches) + row_emb[row] + col_emb[col]
  layers: pre-RMSNorm attention (no scaling, no bias) + pre-RMSNorm gated-gelu
  MLP, final RMSNorm.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models.layers import dense, normal_init, rms_norm
from rag_docvqa_tpu.ops.decode import greedy_decode


@dataclass(frozen=True)
class P2SVisionConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    d_ff: int = 2048
    patch_dim: int = 768  # 16*16*3
    max_rows: int = 4096
    max_cols: int = 4096
    layer_norm_eps: float = 1e-6
    # fused flash attention for the patch encoder (inference-only; at the
    # 2048-patch budget the (B, H, N, N) score matrices dominate HBM traffic)
    flash_encoder: bool = False


@dataclass(frozen=True)
class Pix2StructConfig:
    vision: P2SVisionConfig = field(default_factory=P2SVisionConfig)
    # text decoder as a T5Config with 0 encoder layers (decoder-only use)
    text: t5m.T5Config = field(
        default_factory=lambda: t5m.T5Config(
            vocab_size=50244, d_model=768, d_kv=64, num_heads=12, d_ff=2048,
            num_encoder_layers=0, num_decoder_layers=12, gated_ffn=True,
            tie_word_embeddings=False,
        )
    )


def init_p2s_params(rng: jax.Array, cfg: Pix2StructConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 8)
    v = cfg.vision
    d, L = v.hidden_size, v.num_layers

    def attn(rng):
        kk = jax.random.split(rng, 4)
        inner = v.num_heads * (d // v.num_heads)
        return {
            "q": normal_init(kk[0], (L, d, inner), (d * (d // v.num_heads)) ** -0.5),
            "k": normal_init(kk[1], (L, d, inner), d**-0.5),
            "v": normal_init(kk[2], (L, d, inner), d**-0.5),
            "o": normal_init(kk[3], (L, inner, d), inner**-0.5),
        }

    text_params = t5m.init_t5_params(ks[6], cfg.text)
    return {
        "vision": {
            "patch_proj": {
                "kernel": normal_init(ks[0], (v.patch_dim, d), v.patch_dim**-0.5),
                "bias": jnp.zeros((d,)),
            },
            "row_emb": normal_init(ks[1], (v.max_rows, d), 0.02),
            "col_emb": normal_init(ks[2], (v.max_cols, d), 0.02),
            "attn": attn(ks[3]),
            "ln0": jnp.ones((L, d)),
            "ffn": {
                "wi_0": normal_init(ks[4], (L, d, v.d_ff), d**-0.5),
                "wi_1": normal_init(ks[5], (L, d, v.d_ff), d**-0.5),
                "wo": normal_init(ks[5], (L, v.d_ff, d), v.d_ff**-0.5),
            },
            "ln1": jnp.ones((L, d)),
            "final_ln": jnp.ones((d,)),
        },
        "text": text_params,
    }


def vision_encode(
    params: Dict[str, Any],
    cfg: Pix2StructConfig,
    flattened_patches: jax.Array,  # (B, N, 2 + patch_dim)
    attention_mask: jax.Array,  # (B, N)
    fused: bool = True,  # allow the whole-layer inference kernel (training
    # passes False: the raw pallas layer has no VJP — same contract as
    # t5.encode, whose training callers pin fused=False)
) -> jax.Array:
    v = cfg.vision
    p = params["vision"]
    rows = jnp.clip(flattened_patches[:, :, 0].astype(jnp.int32), 0, v.max_rows - 1)
    cols = jnp.clip(flattened_patches[:, :, 1].astype(jnp.int32), 0, v.max_cols - 1)
    # compute in the parameter dtype: host patches arrive f32, and f32 @ bf16
    # promotes the WHOLE tower to f32 (2x MXU cost — and the decode cache,
    # sized off encoder dtype, then mismatches the bf16 decoder)
    pk = p["patch_proj"]["kernel"]
    x = dense(flattened_patches[:, :, 2:].astype(pk.dtype), pk, p["patch_proj"]["bias"])
    x = x + p["row_emb"][rows] + p["col_emb"][cols]

    B, N, _ = x.shape
    H = v.num_heads
    key_mask = attention_mask.astype(bool)
    mask = key_mask[:, None, None, :]

    # whole-layer fused kernel (ops/fused_encoder.py, bias-free variant): the
    # patch-tower layer is T5-shaped with no rel-pos bias; at chunk-crop
    # patch budgets (<= ~768 at d=768) the entire layer runs with
    # activations resident in VMEM. Inference-only, like t5.encode's fused
    # path; the 2048-patch full-page budget falls back to flash.
    from rag_docvqa_tpu.ops.fused_encoder import fused_p2s_encoder_wanted

    if fused and fused_p2s_encoder_wanted(v, B, N, x.dtype.itemsize):
        from rag_docvqa_tpu.ops.fused_encoder import fuse_t5_blocks, fused_t5_layer_parts

        stacked = {"ln0": p["ln0"], "ln1": p["ln1"], "attn": p["attn"], "ffn": p["ffn"]}
        pre = fuse_t5_blocks(stacked, gated=True)
        Np = -(-N // 8) * 8
        pad = Np - N
        km = key_mask
        if pad:
            # padded keys are masked off; padded query rows are sliced away
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            km = jnp.pad(key_mask, ((0, 0), (0, pad)))

        def fused_body(x, layer):
            return fused_t5_layer_parts(
                x, km, None, layer,
                num_heads=H, eps=v.layer_norm_eps, gated=True,
            ), None

        x, _ = jax.lax.scan(fused_body, x, pre)
        if pad:
            x = x[:, :N]
        return rms_norm(x, p["final_ln"], v.layer_norm_eps)

    if v.flash_encoder:
        from rag_docvqa_tpu.ops.flash_attention import flash_attention

    def block(x, layer):
        h = rms_norm(x, layer["ln0"], v.layer_norm_eps)
        q = dense(h, layer["attn"]["q"]).reshape(B, N, H, -1)
        k = dense(h, layer["attn"]["k"]).reshape(B, N, H, -1)
        val = dense(h, layer["attn"]["v"]).reshape(B, N, H, -1)
        if v.flash_encoder:
            att = flash_attention(q, k, val, key_mask=key_mask).reshape(B, N, -1)
        else:
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            s = jnp.where(mask, s, -1e9)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            att = jnp.einsum("bhqk,bkhd->bqhd", a, val).reshape(B, N, -1)
        x = x + dense(att, layer["attn"]["o"])
        h = rms_norm(x, layer["ln1"], v.layer_norm_eps)
        g = jax.nn.gelu(dense(h, layer["ffn"]["wi_0"]), approximate=True) * dense(h, layer["ffn"]["wi_1"])
        x = x + dense(g, layer["ffn"]["wo"])
        return x, None

    stacked = {"ln0": p["ln0"], "ln1": p["ln1"], "attn": p["attn"], "ffn": p["ffn"]}
    x, _ = jax.lax.scan(block, x, stacked)
    return rms_norm(x, p["final_ln"], v.layer_norm_eps)


def generate(
    params: Dict[str, Any],
    cfg: Pix2StructConfig,
    flattened_patches: jax.Array,
    attention_mask: jax.Array,
    max_new_tokens: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy decode conditioned on the vision encoding; returns
    (tokens, confidence) with VT5-compatible confidence semantics."""
    enc = vision_encode(params, cfg, flattened_patches, attention_mask)
    return greedy_decode(params["text"], cfg.text, enc, attention_mask.astype(bool), max_new_tokens)


def forward_train(
    params: Dict[str, Any],
    cfg: Pix2StructConfig,
    flattened_patches: jax.Array,
    attention_mask: jax.Array,
    labels: jax.Array,  # (B, Td) with -100 padding
) -> Tuple[jax.Array, jax.Array]:
    # fused=False: the whole-layer kernel has no VJP (inference-only)
    enc = vision_encode(params, cfg, flattened_patches, attention_mask, fused=False)
    dec_in = t5m.shift_tokens_right(labels, cfg.text.pad_id, cfg.text.decoder_start_token_id)
    logits = t5m.decode_train(params["text"], cfg.text, dec_in, enc, attention_mask.astype(bool))
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)
    return loss, logits


def convert_p2s_state_dict(sd: Dict[str, Any], cfg: Pix2StructConfig) -> Dict[str, Any]:
    """HF Pix2StructForConditionalGeneration.state_dict() -> our tree."""
    import numpy as np

    v = cfg.vision
    L = v.num_layers

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    def stack(fmt, transpose=True):
        mats = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
        if transpose:
            mats = [np.ascontiguousarray(m.T) for m in mats]
        return np.stack(mats)

    e = "encoder.encoder.layer.{}."
    vision = {
        "patch_proj": {
            "kernel": t("encoder.embeddings.patch_projection.weight"),
            "bias": a("encoder.embeddings.patch_projection.bias"),
        },
        "row_emb": a("encoder.embeddings.row_embedder.weight"),
        "col_emb": a("encoder.embeddings.column_embedder.weight"),
        "attn": {
            "q": stack(e + "attention.query.weight"),
            "k": stack(e + "attention.key.weight"),
            "v": stack(e + "attention.value.weight"),
            "o": stack(e + "attention.output.weight"),
        },
        "ln0": stack(e + "pre_attention_layer_norm.weight", False),
        "ffn": {
            "wi_0": stack(e + "mlp.wi_0.weight"),
            "wi_1": stack(e + "mlp.wi_1.weight"),
            "wo": stack(e + "mlp.wo.weight"),
        },
        "ln1": stack(e + "pre_mlp_layer_norm.weight", False),
        "final_ln": a("encoder.layernorm.weight"),
    }

    # text decoder: map HF decoder.* names onto a T5 param tree
    Ld = cfg.text.num_decoder_layers
    d = "decoder.layer.{}."

    def dstack(fmt, transpose=True):
        mats = [np.asarray(sd[fmt.format(i)]) for i in range(Ld)]
        if transpose:
            mats = [np.ascontiguousarray(m.T) for m in mats]
        return np.stack(mats)

    text = {
        "shared": a("decoder.embed_tokens.weight"),
        "encoder": {},  # unused (0 encoder layers)
        "decoder": {
            "rel_bias": a("decoder.layer.0.self_attention.attention.relative_attention_bias.weight"),
            "self_attn": {
                "q": dstack(d + "self_attention.attention.query.weight"),
                "k": dstack(d + "self_attention.attention.key.weight"),
                "v": dstack(d + "self_attention.attention.value.weight"),
                "o": dstack(d + "self_attention.attention.output.weight"),
            },
            "cross_attn": {
                "q": dstack(d + "encoder_decoder_attention.attention.query.weight"),
                "k": dstack(d + "encoder_decoder_attention.attention.key.weight"),
                "v": dstack(d + "encoder_decoder_attention.attention.value.weight"),
                "o": dstack(d + "encoder_decoder_attention.attention.output.weight"),
            },
            "ffn": {
                "wi_0": dstack(d + "mlp.DenseReluDense.wi_0.weight"),
                "wi_1": dstack(d + "mlp.DenseReluDense.wi_1.weight"),
                "wo": dstack(d + "mlp.DenseReluDense.wo.weight"),
            },
            "ln0": dstack(d + "self_attention.layer_norm.weight", False),
            "ln1": dstack(d + "encoder_decoder_attention.layer_norm.weight", False),
            "ln2": dstack(d + "mlp.layer_norm.weight", False),
            "final_ln": a("decoder.final_layer_norm.weight"),
        },
        "lm_head": t("decoder.lm_head.weight"),
    }
    return {"vision": vision, "text": text}
