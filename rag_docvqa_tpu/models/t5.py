"""T5 encoder-decoder stack, pure-functional JAX, HF-weight compatible.

The reference drives HF's `T5ForConditionalGeneration` through the VT5 wrapper
(src/VT5.py:37, src/LayoutT5.py). This is a from-scratch implementation shaped
for TPU execution:

  * per-layer weights stacked on a leading axis, iterated with `lax.scan`
    (flat compile time, natural pjit sharding on the stacked axes),
  * attention logits/softmax accumulated in f32, activations bf16-friendly,
  * explicit KV-cache decoding (`init_decode_cache` + `decode_step`) instead
    of HF's Python generate loop, so greedy decoding is a single `lax.scan`
    (see ops/decode.py),
  * relative position bias shared across layers (matches HF semantics where
    only block 0 holds the bias table and later blocks reuse it).

No scaling by 1/sqrt(d_k) in attention — T5 folds it into init, and weight
compatibility requires matching that.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rag_docvqa_tpu.models.layers import dense, dropout, normal_init, rms_norm


@dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 768
    d_kv: int = 64
    num_heads: int = 12
    d_ff: int = 3072
    num_encoder_layers: int = 12
    num_decoder_layers: int = 12
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-6
    gated_ffn: bool = False  # t5-base uses plain ReLU FFN
    tie_word_embeddings: bool = True
    pad_id: int = 0
    eos_id: int = 1
    decoder_start_token_id: int = 0
    # fused flash encoder self-attention (ops/flash_attention.py). Usable for
    # BOTH inference and training — the kernel has a custom recompute-based
    # VJP including the trainable rel-pos bias gradient. Engines and the
    # Trainer flip this on when running on a TPU backend; keep False off-TPU.
    flash_encoder: bool = False
    # int8 cross-attention KV cache for greedy decode. Decode on the bench
    # chip is HBM-bound on exactly these reads (cross KV is ~2.4 GB at
    # t5-base B=128 Te=512), so halving the bytes halves the decode wall.
    # Channel-wise (per L,B,H,dk) scales fold into the query / the output —
    # no extra bandwidth. Small quality drift (opt-in; see test_t5 tolerance).
    decode_kv_int8: bool = False
    # per-LAYER rematerialization for training: wrap each scan-body layer in
    # jax.checkpoint so the backward recomputes one layer's forward at a
    # time. Whole-forward remat (train_step.py remat=True) still saves every
    # layer's flash-VJP residuals as stacked (L, B, H, T, dk) buffers — at
    # t5-base B=64 T=512 that is ~15 GB and OOMs the 16 GB chip; per-layer
    # remat caps the peak at ONE layer's residuals (+ the layer inputs), the
    # standard memory/FLOPs trade for scaling batch on HBM-bound chips.
    remat_layers: bool = False
    # fused Pallas single-query cross-attention (ops/decode_attention.py):
    # streams the KV cache HBM->VMEM once per step in its stored dtype
    # (int8/bf16) via tile-aligned packed layouts and dequantizes on chip.
    # EXPERIMENTAL, off by default: with the layer loop unrolled and the
    # decode loop dispatched as its own program (ops/decode.py), the plain
    # XLA int8 path measured FASTER than the kernel (0.227 vs 0.304
    # ms/layer-step isolated at t5-base B=128 Te=512 on v5e) — the kernel's
    # per-grid-step overhead outweighs its single-stream advantage. Kept
    # correctness-tested for iteration on future shapes.
    fused_decode_attn: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


Params = Dict[str, Any]


# --------------------------------------------------------------------------- #
# init
# --------------------------------------------------------------------------- #
def _init_attn(rng, cfg: T5Config, n_layers: int) -> Params:
    d, inner = cfg.d_model, cfg.inner_dim
    ks = jax.random.split(rng, 4)
    return {
        "q": normal_init(ks[0], (n_layers, d, inner), (d * cfg.d_kv) ** -0.5),
        "k": normal_init(ks[1], (n_layers, d, inner), d**-0.5),
        "v": normal_init(ks[2], (n_layers, d, inner), d**-0.5),
        "o": normal_init(ks[3], (n_layers, inner, d), inner**-0.5),
    }


def _init_ffn(rng, cfg: T5Config, n_layers: int) -> Params:
    d, f = cfg.d_model, cfg.d_ff
    ks = jax.random.split(rng, 3)
    p = {"wo": normal_init(ks[2], (n_layers, f, d), f**-0.5)}
    if cfg.gated_ffn:
        p["wi_0"] = normal_init(ks[0], (n_layers, d, f), d**-0.5)
        p["wi_1"] = normal_init(ks[1], (n_layers, d, f), d**-0.5)
    else:
        p["wi"] = normal_init(ks[0], (n_layers, d, f), d**-0.5)
    return p


def init_t5_params(rng: jax.Array, cfg: T5Config) -> Params:
    keys = jax.random.split(rng, 8)
    L_e, L_d = cfg.num_encoder_layers, cfg.num_decoder_layers
    params: Params = {
        "shared": normal_init(keys[0], (cfg.vocab_size, cfg.d_model), 1.0),
        "encoder": {
            "rel_bias": normal_init(keys[1], (cfg.rel_buckets, cfg.num_heads), (cfg.d_model * cfg.d_kv) ** -0.5),
            "attn": _init_attn(keys[2], cfg, L_e),
            "ffn": _init_ffn(keys[3], cfg, L_e),
            "ln0": jnp.ones((L_e, cfg.d_model)),
            "ln1": jnp.ones((L_e, cfg.d_model)),
            "final_ln": jnp.ones((cfg.d_model,)),
        },
        "decoder": {
            "rel_bias": normal_init(keys[4], (cfg.rel_buckets, cfg.num_heads), (cfg.d_model * cfg.d_kv) ** -0.5),
            "self_attn": _init_attn(keys[5], cfg, L_d),
            "cross_attn": _init_attn(keys[6], cfg, L_d),
            "ffn": _init_ffn(keys[7], cfg, L_d),
            "ln0": jnp.ones((L_d, cfg.d_model)),
            "ln1": jnp.ones((L_d, cfg.d_model)),
            "ln2": jnp.ones((L_d, cfg.d_model)),
            "final_ln": jnp.ones((cfg.d_model,)),
        },
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = normal_init(rng, (cfg.d_model, cfg.vocab_size), cfg.d_model**-0.5)
    return params


# --------------------------------------------------------------------------- #
# relative position bias
# --------------------------------------------------------------------------- #
def _relative_position_bucket(
    relative_position: jax.Array, bidirectional: bool, num_buckets: int, max_distance: int
) -> jax.Array:
    ret = jnp.zeros_like(relative_position)
    if bidirectional:
        num_buckets //= 2
        ret += (relative_position > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(relative_position)
    else:
        n = -jnp.minimum(relative_position, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def relative_bias(
    rel_bias_table: jax.Array,  # (buckets, H)
    q_pos: jax.Array,  # (Tq,)
    k_pos: jax.Array,  # (Tk,)
    bidirectional: bool,
    cfg: T5Config,
) -> jax.Array:
    """Returns (1, H, Tq, Tk) additive attention bias."""
    rel = k_pos[None, :] - q_pos[:, None]  # (Tq, Tk)
    buckets = _relative_position_bucket(rel, bidirectional, cfg.rel_buckets, cfg.rel_max_distance)
    bias = rel_bias_table[buckets]  # (Tq, Tk, H)
    return jnp.transpose(bias, (2, 0, 1))[None]


# --------------------------------------------------------------------------- #
# attention / ffn primitives
# --------------------------------------------------------------------------- #
def _split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, -1)


def _attend(
    q: jax.Array,  # (B, Tq, H, dk)
    k: jax.Array,  # (B, Tk, H, dk)
    v: jax.Array,  # (B, Tk, H, dk)
    bias: Optional[jax.Array],  # (1|B, H, Tq, Tk)
    mask: Optional[jax.Array],  # (B, 1, Tq, Tk) bool
    return_probs: bool = False,
):
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    out = out.reshape(out.shape[0], out.shape[1], -1)
    if return_probs:
        return out, probs
    return out


def _ffn(p: Params, cfg: T5Config, x: jax.Array) -> jax.Array:
    if cfg.gated_ffn:
        # gated variants (t5-v1.1, Pix2Struct text) use gelu_new = tanh approx
        h = jax.nn.gelu(dense(x, p["wi_0"]), approximate=True) * dense(x, p["wi_1"])
    else:
        h = jax.nn.relu(dense(x, p["wi"]))
    return dense(h, p["wo"])


# --------------------------------------------------------------------------- #
# encoder
# --------------------------------------------------------------------------- #
def encode(
    params: Params,
    cfg: T5Config,
    inputs_embeds: jax.Array,  # (B, T, D)
    attention_mask: jax.Array,  # (B, T) bool
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    fused: Optional[bool] = None,  # None = auto (whole-layer TPU kernel when eligible)
) -> jax.Array:
    enc = params["encoder"]
    B, T = inputs_embeds.shape[:2]
    x = dropout(inputs_embeds, cfg.dropout_rate, rng, deterministic)
    stacked = {
        "ln0": enc["ln0"],
        "ln1": enc["ln1"],
        "attn": enc["attn"],
        "ffn": enc["ffn"],
    }

    Tp = -(-T // 8) * 8  # fused kernel wants sublane-aligned sequence length
    if fused is None:
        from rag_docvqa_tpu.ops.fused_encoder import fused_t5_encoder_wanted

        # inference auto-select; training callers pass fused="train" (whole-
        # layer forward + handwritten Pallas backward, fused_encoder_bwd) or
        # fused=False (flash fwd+bwd pair) explicitly
        fused = fused_t5_encoder_wanted(cfg, B, Tp, x.dtype.itemsize)
    elif fused == "train":
        # the AUTHORITATIVE train-path gate runs here, against the exact
        # assembled (B, Tp) the kernels will see — callers request "train"
        # without re-deriving the encoder layout (hivt5's K+T+Tv concat
        # made caller-side estimates fragile); fall back to the flash
        # fwd+bwd pair when the kernels don't fit
        from rag_docvqa_tpu.ops.fused_encoder_bwd import fused_t5_train_wanted

        if not fused_t5_train_wanted(cfg, B, Tp, x.dtype.itemsize):
            fused = False
    if fused:
        pad = Tp - T
        am = attention_mask
        if pad:
            # padded keys are masked off; padded query rows produce sliced-
            # away uniform-softmax garbage (Hi-VT5's K+T+Tv lengths are
            # rarely multiples of 8)
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            am = jnp.pad(attention_mask, ((0, 0), (0, pad)))
        pos = jnp.arange(Tp)
        bias = relative_bias(enc["rel_bias"], pos, pos, bidirectional=True, cfg=cfg)
        stack = _fused_t5_stack_train(cfg) if fused == "train" else _fused_t5_stack(cfg)
        x = stack(stacked, x, am, bias[0].astype(jnp.bfloat16))
        if pad:
            x = x[:, :T]
    else:
        pos = jnp.arange(T)
        bias = relative_bias(enc["rel_bias"], pos, pos, bidirectional=True, cfg=cfg)
        x = _encode_blocks(stacked, cfg, x, attention_mask, bias)
    return rms_norm(x, enc["final_ln"], cfg.layer_norm_eps)


def _encode_blocks(stacked, cfg: T5Config, x, attention_mask, bias) -> jax.Array:
    mask = attention_mask[:, None, None, :]  # (B,1,1,T) — keys masked

    # flash applies in training too (custom VJP): neither path implements
    # attention-prob dropout, so semantics agree deterministic or not
    use_flash = cfg.flash_encoder
    if use_flash:
        from rag_docvqa_tpu.ops.flash_attention import flash_attention

        # batch-shared rel-pos bias streamed blockwise in bf16: ~6x less
        # attention HBM than materializing (B, H, T, T) scores + probs
        flash_bias = bias.astype(jnp.bfloat16)

    def block(x, layer):
        h = rms_norm(x, layer["ln0"], cfg.layer_norm_eps)
        q = _split_heads(dense(h, layer["attn"]["q"]), cfg.num_heads)
        k = _split_heads(dense(h, layer["attn"]["k"]), cfg.num_heads)
        v = _split_heads(dense(h, layer["attn"]["v"]), cfg.num_heads)
        if use_flash:
            a = flash_attention(q, k, v, key_mask=attention_mask, bias=flash_bias)
            a = a.reshape(a.shape[0], a.shape[1], -1)
        else:
            a = _attend(q, k, v, bias, mask)
        x = x + dense(a, layer["attn"]["o"])
        h = rms_norm(x, layer["ln1"], cfg.layer_norm_eps)
        x = x + _ffn(layer["ffn"], cfg, h)
        return x, None

    blk = jax.checkpoint(block) if cfg.remat_layers else block
    x, _ = jax.lax.scan(lambda c, l: blk(c, l), x, stacked)
    return x


@functools.lru_cache(maxsize=None)
def _fused_t5_stack(cfg: T5Config):
    """Encoder layer stack through ops/fused_encoder.py's whole-layer T5
    kernel (inference hot path). custom_vjp backward recomputes through the
    flash/XLA blocks so the stack stays differentiable."""
    from rag_docvqa_tpu.ops.fused_encoder import fuse_t5_blocks, fused_t5_layer_parts

    @jax.custom_vjp
    def run(stacked, x, key_mask, bias_bf16):
        # pre-fuse the stacked weights ONCE, outside the layer scan
        pre = fuse_t5_blocks(stacked, cfg.gated_ffn)

        def body(x, layer):
            return fused_t5_layer_parts(
                x, key_mask, bias_bf16, layer,
                num_heads=cfg.num_heads, eps=cfg.layer_norm_eps,
                gated=cfg.gated_ffn,
            ), None
        x, _ = jax.lax.scan(body, x, pre)
        return x

    def fwd(stacked, x, key_mask, bias_bf16):
        return run(stacked, x, key_mask, bias_bf16), (stacked, x, key_mask, bias_bf16)

    def bwd(res, g):
        import numpy as np

        stacked, x, key_mask, bias_bf16 = res
        _, vjp = jax.vjp(
            lambda s, x_, b: _encode_blocks(s, cfg, x_, key_mask, b[None]),
            stacked, x, bias_bf16,
        )
        ds, dx, dbias = vjp(g)
        dmask = np.zeros(key_mask.shape, dtype=jax.dtypes.float0)
        return ds, dx, dmask, dbias

    run.defvjp(fwd, bwd)
    return run


@functools.lru_cache(maxsize=None)
def _fused_t5_stack_train(cfg: T5Config):
    """Encoder layer stack for TRAINING through the whole-layer kernel pair:
    fused forward (saving the attention-residual sum x1) + handwritten Pallas
    backward (ops/fused_encoder_bwd.py). The custom_vjp sits at the LAYER
    level, so jax differentiates the scan + weight pre-fusing naturally —
    weight gradients stack over layers, the concatenated qkv gradient splits
    back through the concatenate VJP, and the batch-shared rel-pos bias
    gradient accumulates across layers in the transposed scan."""
    from rag_docvqa_tpu.ops.fused_encoder import fuse_t5_blocks
    from rag_docvqa_tpu.ops.fused_encoder_bwd import make_fused_t5_layer_train

    layer_fn = make_fused_t5_layer_train(cfg.num_heads, cfg.layer_norm_eps,
                                         cfg.gated_ffn)

    def run(stacked, x, key_mask, bias_bf16):
        pre = fuse_t5_blocks(stacked, cfg.gated_ffn)

        def body(x, layer):
            return layer_fn(x, key_mask, bias_bf16, layer), None

        x, _ = jax.lax.scan(body, x, pre)
        return x

    return run


# --------------------------------------------------------------------------- #
# decoder (teacher-forced)
# --------------------------------------------------------------------------- #
def decode_train(
    params: Params,
    cfg: T5Config,
    decoder_input_ids: jax.Array,  # (B, Td)
    encoder_hidden: jax.Array,  # (B, Te, D)
    encoder_mask: jax.Array,  # (B, Te) bool
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    return_cross_attn: bool = False,
) -> jax.Array:
    """Full-sequence decoder forward; returns (B, Td, V) logits.

    With return_cross_attn, also returns the per-layer cross-attention
    probabilities (L, B, H, Td, Te) — the signal Hi-VT5's attention-viz
    extraction maps back to pages (reference HiVT5.py:782-851)."""
    dec = params["decoder"]
    B, Td = decoder_input_ids.shape
    x = params["shared"][decoder_input_ids]
    pos = jnp.arange(Td)
    bias = relative_bias(dec["rel_bias"], pos, pos, bidirectional=False, cfg=cfg)
    causal = (pos[None, :] <= pos[:, None])[None, None]  # (1,1,Td,Td)
    cross_mask = encoder_mask[:, None, None, :]
    x = dropout(x, cfg.dropout_rate, rng, deterministic)

    def block(x, layer):
        h = rms_norm(x, layer["ln0"], cfg.layer_norm_eps)
        q = _split_heads(dense(h, layer["self_attn"]["q"]), cfg.num_heads)
        k = _split_heads(dense(h, layer["self_attn"]["k"]), cfg.num_heads)
        v = _split_heads(dense(h, layer["self_attn"]["v"]), cfg.num_heads)
        x = x + dense(_attend(q, k, v, bias, causal), layer["self_attn"]["o"])
        h = rms_norm(x, layer["ln1"], cfg.layer_norm_eps)
        q = _split_heads(dense(h, layer["cross_attn"]["q"]), cfg.num_heads)
        k = _split_heads(dense(encoder_hidden, layer["cross_attn"]["k"]), cfg.num_heads)
        v = _split_heads(dense(encoder_hidden, layer["cross_attn"]["v"]), cfg.num_heads)
        attended, probs = _attend(q, k, v, None, cross_mask, return_probs=True)
        x = x + dense(attended, layer["cross_attn"]["o"])
        h = rms_norm(x, layer["ln2"], cfg.layer_norm_eps)
        x = x + _ffn(layer["ffn"], cfg, h)
        return x, (probs if return_cross_attn else None)

    stacked = {
        "ln0": dec["ln0"],
        "ln1": dec["ln1"],
        "ln2": dec["ln2"],
        "self_attn": dec["self_attn"],
        "cross_attn": dec["cross_attn"],
        "ffn": dec["ffn"],
    }
    blk = jax.checkpoint(block) if cfg.remat_layers and not return_cross_attn else block
    x, cross_attn = jax.lax.scan(lambda c, l: blk(c, l), x, stacked)
    x = rms_norm(x, dec["final_ln"], cfg.layer_norm_eps)
    logits = lm_logits(params, cfg, x)
    if return_cross_attn:
        return logits, cross_attn
    return logits


def lm_logits(params: Params, cfg: T5Config, hidden: jax.Array) -> jax.Array:
    if cfg.tie_word_embeddings:
        hidden = hidden * (cfg.d_model**-0.5)
        return jnp.einsum("btd,vd->btv", hidden, params["shared"].astype(hidden.dtype))
    return dense(hidden, params["lm_head"])


# --------------------------------------------------------------------------- #
# incremental decoding with KV cache
# --------------------------------------------------------------------------- #
@struct.dataclass
class DecodeCache:
    # (B, H, T, dk) per layer: exactly the layout the single-query attention
    # contractions consume, so no per-step physical transpose of the (large)
    # cross K/V ever happens — at t5-base B=128 Te=512 that relayout was ~2x
    # the unavoidable KV HBM read per decode step
    self_k: jax.Array  # (L, B, H, Tmax, dk)
    self_v: jax.Array  # (L, B, H, Tmax, dk)
    # Natural layout (L, B, H, Te, dk) bf16/f32/int8 — OR, when the fused
    # decode kernel is active, the pack_decode_kv layouts
    # cross_k (L, B, H*dk, Te) / cross_v (L, B, Te, H*dk). The ndim (4 vs 5)
    # is the single source of truth for which path decode_step takes, so the
    # cache-build decision and the step can never disagree.
    cross_k: jax.Array
    cross_v: jax.Array
    # channel-wise dequant scales, present only with decode_kv_int8
    cross_k_scale: Optional[jax.Array] = None  # (L, B, H, 1, dk) f32
    cross_v_scale: Optional[jax.Array] = None


def _fused_decode_ok(cfg: T5Config, seq_len: int, itemsize: int) -> bool:
    """Whether the fused decode cross-attention kernel applies: opted in,
    tile-aligned dims, and the per-row blocks fit the VMEM budget."""
    if not cfg.fused_decode_attn:
        return False
    if seq_len % 128 != 0 or (cfg.num_heads * cfg.d_kv) % 128 != 0:
        return False
    from rag_docvqa_tpu.ops.decode_attention import fused_decode_vmem_bytes

    return fused_decode_vmem_bytes(cfg.num_heads, seq_len, cfg.d_kv, itemsize) < 12 * 2**20


def _quantize_kv(x: jax.Array):
    """(B, H, T, dk) -> int8 values + per-(B, H, dk) channel scales."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=2, keepdims=True)  # (B,H,1,dk)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def init_decode_cache(
    params: Params,
    cfg: T5Config,
    encoder_hidden: jax.Array,  # (B, Te, D)
    max_decode_len: int,
) -> DecodeCache:
    """Precompute per-layer cross-attention K/V once; allocate self K/V."""
    dec = params["decoder"]
    B, Te, _ = encoder_hidden.shape
    L = cfg.num_decoder_layers
    fused = _fused_decode_ok(cfg, Te, 1 if cfg.decode_kv_int8 else encoder_hidden.dtype.itemsize)

    def per_layer(_, layer):
        k = _split_heads(dense(encoder_hidden, layer["k"]), cfg.num_heads)
        v = _split_heads(dense(encoder_hidden, layer["v"]), cfg.num_heads)
        # one-time relayout (B, Te, H, dk) -> (B, H, Te, dk)
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))
        if cfg.decode_kv_int8:
            k, ks = _quantize_kv(k)
            v, vs = _quantize_kv(v)
        if fused:
            from rag_docvqa_tpu.ops.decode_attention import pack_decode_kv

            k, v = pack_decode_kv(k, v)
        if cfg.decode_kv_int8:
            return None, (k, v, ks, vs)
        return None, (k, v)

    shape = (L, B, cfg.num_heads, max_decode_len, cfg.d_kv)
    dtype = encoder_hidden.dtype
    if cfg.decode_kv_int8:
        _, (cross_k, cross_v, ks, vs) = jax.lax.scan(per_layer, None, dec["cross_attn"])
        return DecodeCache(
            self_k=jnp.zeros(shape, dtype), self_v=jnp.zeros(shape, dtype),
            cross_k=cross_k, cross_v=cross_v, cross_k_scale=ks, cross_v_scale=vs,
        )
    _, (cross_k, cross_v) = jax.lax.scan(per_layer, None, dec["cross_attn"])
    return DecodeCache(
        self_k=jnp.zeros(shape, dtype),
        self_v=jnp.zeros(shape, dtype),
        cross_k=cross_k,
        cross_v=cross_v,
    )


def _attend_one(
    q: jax.Array,  # (B, H, dk) single-position query
    k: jax.Array,  # (B, H, T, dk)
    v: jax.Array,  # (B, H, T, dk)
    bias: Optional[jax.Array],  # (1|B, H, T) additive
    mask: Optional[jax.Array],  # (1|B, 1|H, T) bool
) -> jax.Array:
    """Layout-native single-query attention; returns (B, H*dk)."""
    scores = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )  # (B, H, T)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, -1e9)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jax.lax.dot_general(
        probs, v,
        dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)  # (B, H, dk)
    return out.reshape(out.shape[0], -1)


def decode_step(
    params: Params,
    cfg: T5Config,
    cache: DecodeCache,
    token: jax.Array,  # (B,) int32 current input token
    step: jax.Array,  # () int32 position of `token`
    encoder_mask: jax.Array,  # (B, Te) bool
) -> Tuple[jax.Array, DecodeCache]:
    """One greedy-decode step; returns ((B, V) logits, updated cache)."""
    dec = params["decoder"]
    B = token.shape[0]
    Tmax = cache.self_k.shape[3]
    x = params["shared"][token]  # (B, D)

    # bias/mask over cached positions for this query step
    k_pos = jnp.arange(Tmax)
    bias = relative_bias(dec["rel_bias"], step[None], k_pos, bidirectional=False, cfg=cfg)
    self_bias = bias[0, :, 0, :][None]  # (1, H, Tmax)
    self_mask = (k_pos <= step)[None, None, :]  # (1, 1, Tmax)
    cross_mask = encoder_mask[:, None, :]  # (B, 1, Te)

    def split_q(h, w):
        return dense(h, w).reshape(B, cfg.num_heads, cfg.d_kv)

    stacked = {
        "ln0": dec["ln0"],
        "ln1": dec["ln1"],
        "ln2": dec["ln2"],
        "self_attn": dec["self_attn"],
        "cross_attn": dec["cross_attn"],
        "ffn": dec["ffn"],
    }

    int8_kv = cfg.decode_kv_int8
    # the cache layout (4-D packed vs 5-D natural per layer) IS the decision:
    # init_decode_cache packed it iff the fused kernel applies
    use_fused_decode = cache.cross_k.ndim == 4

    def block(x, layer_and_cache):
        if int8_kv:
            layer, (ck, cv, ks, vs, sk, sv) = layer_and_cache
        else:
            layer, (ck, cv, sk, sv) = layer_and_cache
        h = rms_norm(x, layer["ln0"], cfg.layer_norm_eps)
        q = split_q(h, layer["self_attn"]["q"])
        k_new = split_q(h, layer["self_attn"]["k"])[:, :, None, :]  # (B, H, 1, dk)
        v_new = split_q(h, layer["self_attn"]["v"])[:, :, None, :]
        sk = jax.lax.dynamic_update_slice(sk, k_new, (0, 0, step, 0))
        sv = jax.lax.dynamic_update_slice(sv, v_new, (0, 0, step, 0))
        x = x + dense(_attend_one(q, sk, sv, self_bias, self_mask), layer["self_attn"]["o"])
        h = rms_norm(x, layer["ln1"], cfg.layer_norm_eps)
        q = split_q(h, layer["cross_attn"]["q"])
        if use_fused_decode:
            from rag_docvqa_tpu.ops.decode_attention import fused_cross_attention

            # ck (B, H*dk, Te) / cv (B, Te, H*dk) — pack_decode_kv layout
            a = fused_cross_attention(
                q, ck, cv, encoder_mask,
                k_scale=ks[:, :, 0, :] if int8_kv else None,
                v_scale=vs[:, :, 0, :] if int8_kv else None,
            ).astype(q.dtype)
        elif int8_kv:
            # channel scales fold into the query (scores) and the output (PV):
            # only int8 bytes stream from HBM
            qs = q.astype(jnp.float32) * ks[:, :, 0, :]  # (B, H, dk)
            scores = jax.lax.dot_general(
                qs, ck.astype(jnp.float32),
                dimension_numbers=(((2,), (3,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            )
            scores = jnp.where(cross_mask, scores, -1e9)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jax.lax.dot_general(
                probs, cv.astype(jnp.float32),
                dimension_numbers=(((2,), (2,)), ((0, 1), (0, 1))),
                preferred_element_type=jnp.float32,
            ) * vs[:, :, 0, :]  # (B, H, dk)
            a = out.astype(q.dtype).reshape(out.shape[0], -1)
        else:
            a = _attend_one(q, ck, cv, None, cross_mask)
        x = x + dense(a, layer["cross_attn"]["o"])
        h = rms_norm(x, layer["ln2"], cfg.layer_norm_eps)
        x = x + _ffn(layer["ffn"], cfg, h)
        return x, (sk, sv)

    if int8_kv:
        xs = (stacked, (cache.cross_k, cache.cross_v, cache.cross_k_scale,
                        cache.cross_v_scale, cache.self_k, cache.self_v))
    else:
        xs = (stacked, (cache.cross_k, cache.cross_v, cache.self_k, cache.self_v))
    # FULLY unroll the layer loop: a rolled lax.scan nested inside the decode
    # loop materializes each layer's ~100 MB KV dynamic-slice instead of
    # fusing it into the attention dots — measured 6.15 -> 2.25 ms/step at
    # t5-base B=128 Te=512 int8 on v5e (2.7x; 1.5x off the HBM floor).
    # Partial unroll keeps the loop and is WORSE (13.7 ms/step at unroll=4).
    x, (new_sk, new_sv) = jax.lax.scan(block, x, xs, unroll=cfg.num_decoder_layers)
    x = rms_norm(x, dec["final_ln"], cfg.layer_norm_eps)
    logits = lm_logits(params, cfg, x[:, None, :])[:, 0, :]
    return logits, cache.replace(self_k=new_sk, self_v=new_sv)


def shift_tokens_right(labels: jax.Array, pad_id: int, decoder_start_token_id: int) -> jax.Array:
    """Teacher-forcing shift (src/_model_utils.py:26-41); -100 -> pad."""
    shifted = jnp.zeros_like(labels)
    shifted = shifted.at[:, 1:].set(labels[:, :-1])
    shifted = shifted.at[:, 0].set(decoder_start_token_id)
    return jnp.where(shifted == -100, pad_id, shifted)
