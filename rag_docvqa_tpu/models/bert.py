"""BERT/RoBERTa-family encoder: BGE bi-encoder + cross-encoder reranker.

Covers the reference's sentence-transformers backends:
  * BGE embedder  `BAAI/bge-small-en-v1.5` (BertModel, CLS pooling + L2
    normalize)                                   — src/_modules.py:1437-1439
  * BGE reranker  `BAAI/bge-reranker-v2-m3` (XLM-RoBERTa sequence
    classifier, sigmoid score)                   — src/_modules.py:1480-1510

One implementation parameterized for both: post-LayerNorm encoder blocks,
absolute position embeddings (with RoBERTa's pad-offset variant), optional
token-type embeddings, optional classification head.
"""

from __future__ import annotations

import functools as _functools
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layers import dense, layer_norm, normal_init


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384  # bge-small
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    position_offset: int = 0  # RoBERTa: pad_id + 1 (= 2)
    pad_id: int = 0
    num_labels: int = 0  # > 0 adds a classification head (reranker)
    # JinaBERT (jina-embeddings-v2, the reference's JINA BiEncoder backend,
    # src/_modules.py:1435-1443): ALiBi attention bias instead of position
    # embeddings, GLU feed-forward, mean pooling
    use_alibi: bool = False
    glu_mlp: bool = False
    pooling: str = "cls"  # "cls" | "mean"


def _linear(rng, din, dout):
    return {"kernel": normal_init(rng, (din, dout), 0.02), "bias": jnp.zeros((dout,))}


def _stack_linear(rng, n, din, dout):
    return {"kernel": normal_init(rng, (n, din, dout), 0.02), "bias": jnp.zeros((n, dout))}


def init_bert_params(rng: jax.Array, cfg: BertConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 12)
    d, L = cfg.hidden_size, cfg.num_layers
    params: Dict[str, Any] = {
        "word_emb": normal_init(ks[0], (cfg.vocab_size, d), 0.02),
        "pos_emb": jnp.zeros((1, d)) if cfg.use_alibi
        else normal_init(ks[1], (cfg.max_position_embeddings, d), 0.02),
        "type_emb": normal_init(ks[2], (max(cfg.type_vocab_size, 1), d), 0.02),
        "emb_ln_w": jnp.ones((d,)),
        "emb_ln_b": jnp.zeros((d,)),
        "blocks": {
            "q": _stack_linear(ks[3], L, d, d),
            "k": _stack_linear(ks[4], L, d, d),
            "v": _stack_linear(ks[5], L, d, d),
            "o": _stack_linear(ks[6], L, d, d),
            "attn_ln_w": jnp.ones((L, d)),
            "attn_ln_b": jnp.zeros((L, d)),
            "fc1": _stack_linear(
                ks[7], L, d, cfg.intermediate_size * (2 if cfg.glu_mlp else 1)
            ),
            "fc2": _stack_linear(ks[8], L, cfg.intermediate_size, d),
            "out_ln_w": jnp.ones((L, d)),
            "out_ln_b": jnp.zeros((L, d)),
        },
    }
    if cfg.num_labels > 0:
        # RobertaClassificationHead: dense -> tanh -> out_proj
        params["cls_dense"] = _linear(ks[9], d, d)
        params["cls_out"] = _linear(ks[10], d, cfg.num_labels)
    return params


def bert_encode(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jax.Array,  # (B, T) int32
    attention_mask: jax.Array,  # (B, T) bool
    token_type_ids: Optional[jax.Array] = None,
    fused: Optional[bool] = None,  # None = auto (fused TPU layer kernel when eligible)
) -> jax.Array:
    B, T = input_ids.shape
    if cfg.use_alibi:
        x = params["word_emb"][input_ids]  # positions come from the ALiBi bias
    else:
        if cfg.position_offset:
            # RoBERTa: cumulative positions over non-pad tokens, offset by pad_id+1
            pos = jnp.cumsum(attention_mask.astype(jnp.int32), axis=1) * attention_mask + cfg.pad_id
            pos = jnp.clip(pos + cfg.position_offset - 1 - cfg.pad_id, 0, cfg.max_position_embeddings - 1)
        else:
            pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        x = params["word_emb"][input_ids] + params["pos_emb"][pos]
    if token_type_ids is None:
        token_type_ids = jnp.zeros((B, T), jnp.int32)
    x = x + params["type_emb"][token_type_ids]
    x = layer_norm(x, params["emb_ln_w"], params["emb_ln_b"], cfg.layer_norm_eps)

    if fused is None:
        from rag_docvqa_tpu.ops.fused_encoder import fused_encoder_wanted

        fused = fused_encoder_wanted(cfg, B, T, x.dtype.itemsize)
    if fused:
        from rag_docvqa_tpu.ops.fused_encoder_bwd import fused_bert_train_wanted

        if fused_bert_train_wanted(cfg, B, T, x.dtype.itemsize):
            # layer-level custom_vjp: fused forward (saving x1 only under
            # differentiation) + handwritten Pallas backward kernels — the
            # contrastive embedder fine-tune's hot path (PERF.md §4)
            return _fused_train_blocks(cfg)(params["blocks"], x, attention_mask)
        return _fused_blocks(cfg)(params["blocks"], x, attention_mask)
    return _xla_blocks(params["blocks"], cfg, x, attention_mask)


def _xla_blocks(blocks, cfg: BertConfig, x: jax.Array, attention_mask: jax.Array) -> jax.Array:
    B, T, _ = x.shape
    H, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    scale = dh**-0.5
    mask = attention_mask[:, None, None, :]
    alibi = _alibi_bias(H, T) if cfg.use_alibi else None

    def block(x, layer):
        q = dense(x, layer["q"]["kernel"], layer["q"]["bias"]).reshape(B, T, H, dh)
        k = dense(x, layer["k"]["kernel"], layer["k"]["bias"]).reshape(B, T, H, dh)
        v = dense(x, layer["v"]["kernel"], layer["v"]["bias"]).reshape(B, T, H, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if alibi is not None:
            s = s + alibi
        s = jnp.where(mask, s, -1e9)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, cfg.hidden_size)
        x = layer_norm(
            x + dense(a, layer["o"]["kernel"], layer["o"]["bias"]),
            layer["attn_ln_w"], layer["attn_ln_b"], cfg.layer_norm_eps,
        )
        h = dense(x, layer["fc1"]["kernel"], layer["fc1"]["bias"])
        if cfg.glu_mlp:
            gate, up = jnp.split(h, 2, axis=-1)
            h = jax.nn.gelu(gate, approximate=False) * up
        else:
            h = jax.nn.gelu(h, approximate=False)
        x = layer_norm(
            x + dense(h, layer["fc2"]["kernel"], layer["fc2"]["bias"]),
            layer["out_ln_w"], layer["out_ln_b"], cfg.layer_norm_eps,
        )
        return x, None

    x, _ = jax.lax.scan(block, x, blocks)
    return x


@_functools.lru_cache(maxsize=None)
def _fused_train_blocks(cfg: BertConfig):
    """Layer stack through the layer-level custom_vjp pair: fused whole-layer
    forward + handwritten Pallas backward (ops/fused_encoder_bwd.py BERT
    kernels). Inference runs the same forward kernel with no extra writes;
    under differentiation each layer saves (x, x1) and the backward keeps the
    whole layer's gradient math resident in VMEM — the treatment that took
    the VT5 train step 0.31 -> 0.40 MFU (PERF.md §4), applied to the
    contrastive embedder's BERT block."""
    from rag_docvqa_tpu.ops.fused_encoder import fuse_bert_blocks
    from rag_docvqa_tpu.ops.fused_encoder_bwd import make_fused_bert_layer_train

    layer = make_fused_bert_layer_train(cfg.num_heads, cfg.layer_norm_eps)

    def run(blocks, x, key_mask):
        pre = fuse_bert_blocks(blocks)  # differentiable concats/stacks

        def body(x, l):
            return layer(x, key_mask, l), None

        x, _ = jax.lax.scan(body, x, pre)
        return x

    return run


@_functools.lru_cache(maxsize=None)
def _fused_blocks(cfg: BertConfig):
    """Layer stack through ops/fused_encoder.py's whole-layer TPU kernel.
    custom_vjp: forward runs the kernel; backward recomputes through the XLA
    blocks — the FALLBACK when the handwritten backward kernels don't fit
    (see _fused_train_blocks for the fast train path)."""
    from rag_docvqa_tpu.ops.fused_encoder import fuse_bert_blocks, fused_bert_layer_parts

    if cfg.use_alibi or cfg.glu_mlp:
        raise ValueError(
            "fused=True is not available for ALiBi/GLU (JINA) configs — the "
            "fused kernel implements the vanilla-BERT block only")

    @jax.custom_vjp
    def run(blocks, x, key_mask):
        # pre-fuse the stacked weights ONCE, outside the layer scan
        pre = fuse_bert_blocks(blocks)

        def body(x, layer):
            return fused_bert_layer_parts(
                x, key_mask, layer, num_heads=cfg.num_heads, eps=cfg.layer_norm_eps
            ), None
        x, _ = jax.lax.scan(body, x, pre)
        return x

    def fwd(blocks, x, key_mask):
        return run(blocks, x, key_mask), (blocks, x, key_mask)

    def bwd(res, g):
        import numpy as np

        blocks, x, key_mask = res
        _, vjp = jax.vjp(lambda b, x_: _xla_blocks(b, cfg, x_, key_mask), blocks, x)
        db, dx = vjp(g)
        dmask = np.zeros(key_mask.shape, dtype=jax.dtypes.float0)
        return db, dx, dmask

    run.defvjp(fwd, bwd)
    return run


def _alibi_bias(n_heads: int, T: int) -> jax.Array:
    """Symmetric (encoder) ALiBi: bias[h, i, j] = -slope_h * |i - j| with the
    standard geometric slopes 2^(-8h/H)."""
    import math

    def slopes(n):
        if math.log2(n).is_integer():
            start = 2.0 ** (-8.0 / n)
            return [start ** (i + 1) for i in range(n)]
        p = 2 ** math.floor(math.log2(n))
        return slopes(p) + slopes(2 * p)[0::2][: n - p]

    m = jnp.asarray(slopes(n_heads), jnp.float32)[:, None, None]
    dist = jnp.abs(jnp.arange(T)[:, None] - jnp.arange(T)[None, :]).astype(jnp.float32)
    return (-m * dist)[None]  # (1, H, T, T)


def bert_sentence_embed(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jax.Array,  # (..., T)
    attention_mask: jax.Array,
) -> jax.Array:
    """Sentence embedding + L2 normalize: CLS token (BGE) or masked mean
    pooling (JINA), per cfg.pooling. Accepts leading batch dims (e.g.
    (B, C, T) chunk batches)."""
    lead = input_ids.shape[:-1]
    T = input_ids.shape[-1]
    mask = attention_mask.reshape(-1, T)
    h = bert_encode(params, cfg, input_ids.reshape(-1, T), mask)
    if cfg.pooling == "mean":
        m = mask.astype(h.dtype)[..., None]
        emb = jnp.sum(h * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1e-9, None)
    else:
        emb = h[:, 0, :]
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-12)
    return emb.reshape(lead + (cfg.hidden_size,))


def cross_encoder_score(
    params: Dict[str, Any],
    cfg: BertConfig,
    input_ids: jax.Array,  # (N, T) [CLS] q [SEP] doc [SEP]
    attention_mask: jax.Array,
    token_type_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Pair relevance scores in [0, 1] (sentence-transformers CrossEncoder
    applies sigmoid for single-label heads)."""
    h = bert_encode(params, cfg, input_ids, attention_mask, token_type_ids)
    cls = h[:, 0, :]
    cls = jnp.tanh(dense(cls, params["cls_dense"]["kernel"], params["cls_dense"]["bias"]))
    logits = dense(cls, params["cls_out"]["kernel"], params["cls_out"]["bias"])
    return jax.nn.sigmoid(logits[..., 0])


# --------------------------------------------------------------------------- #
# HF conversion
# --------------------------------------------------------------------------- #
def convert_bert_state_dict(sd: Dict[str, Any], cfg: BertConfig, prefix: str = "") -> Dict[str, Any]:
    """Convert HF BertModel / XLMRobertaForSequenceClassification weights.

    `prefix` is "" for BertModel, "roberta." / "bert." for classifier models.
    """
    import numpy as np

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    L = cfg.num_layers
    e = prefix + "embeddings."
    lyr = prefix + "encoder.layer.{}."

    def stack(fmt, transpose=True):
        mats = [sd[fmt.format(i)] for i in range(L)]
        mats = [np.asarray(m) for m in mats]
        if transpose:
            mats = [np.ascontiguousarray(m.T) for m in mats]
        return np.stack(mats)

    params = {
        "word_emb": a(e + "word_embeddings.weight"),
        "pos_emb": a(e + "position_embeddings.weight"),
        "type_emb": a(e + "token_type_embeddings.weight")
        if e + "token_type_embeddings.weight" in sd
        else np.zeros((1, cfg.hidden_size), np.float32),
        "emb_ln_w": a(e + "LayerNorm.weight"),
        "emb_ln_b": a(e + "LayerNorm.bias"),
        "blocks": {
            "q": {"kernel": stack(lyr + "attention.self.query.weight"), "bias": stack(lyr + "attention.self.query.bias", False)},
            "k": {"kernel": stack(lyr + "attention.self.key.weight"), "bias": stack(lyr + "attention.self.key.bias", False)},
            "v": {"kernel": stack(lyr + "attention.self.value.weight"), "bias": stack(lyr + "attention.self.value.bias", False)},
            "o": {"kernel": stack(lyr + "attention.output.dense.weight"), "bias": stack(lyr + "attention.output.dense.bias", False)},
            "attn_ln_w": stack(lyr + "attention.output.LayerNorm.weight", False),
            "attn_ln_b": stack(lyr + "attention.output.LayerNorm.bias", False),
            "fc1": {"kernel": stack(lyr + "intermediate.dense.weight"), "bias": stack(lyr + "intermediate.dense.bias", False)},
            "fc2": {"kernel": stack(lyr + "output.dense.weight"), "bias": stack(lyr + "output.dense.bias", False)},
            "out_ln_w": stack(lyr + "output.LayerNorm.weight", False),
            "out_ln_b": stack(lyr + "output.LayerNorm.bias", False),
        },
    }
    if cfg.num_labels > 0:
        params["cls_dense"] = {"kernel": t("classifier.dense.weight"), "bias": a("classifier.dense.bias")}
        params["cls_out"] = {"kernel": t("classifier.out_proj.weight"), "bias": a("classifier.out_proj.bias")}
    return params
