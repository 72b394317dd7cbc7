"""Fully-fused BERT encoder layer for the chunk embedder (TPU Pallas).

The embedder workload (reference BiEncoder BGE backend,
src/_modules.py:1438-1442) is a small-width transformer (d=384) over many
SHORT sequences (chunk_tokens ~64). At that shape the XLA layer is
bandwidth/overhead-bound, not FLOPs-bound: every dense/LN/softmax round-trips
a (B*T, d) activation through HBM (~1 GB per layer at B=1024, T=64), and the
(B, H, T, T) attention scores are materialized besides — measured 0.16 MFU on
v5e with only ~15% of the time on the MXU.

This kernel runs ONE ENTIRE encoder layer per grid step on a block of `rows`
sequences resident in VMEM:

    qkv = x @ Wqkv + b            (one (R, d) x (d, 3d) matmul, R = rows*T)
    per head: s = q k^T; masked softmax (f32); p v   (batched over rows)
    attn written back per-head into a (R, d) scratch (unaligned lane slices)
    x = LN(x + attn @ Wo + bo)
    x = LN(x + gelu(x @ W1 + b1) @ W2 + b2)

so per layer the only HBM traffic is x in/out (2*B*T*d bf16) plus the layer's
weights once (Mosaic keeps constant-index blocks resident across grid steps).
Numerics match the XLA path: f32 scores/softmax/LayerNorm, exact (erf) GELU,
bf16 matmul inputs.

Differentiable via custom_vjp: the backward recomputes through the XLA
reference layers (`bert.py::bert_encode` body) — the embedder trains rarely
(contrastive fine-tune, train_cl.py) while inference throughput is the hot
path, so the forward gets the kernel and the backward pays one recompute.

Used by `models/bert.py::bert_encode` on TPU for the vanilla-BERT config
(no ALiBi, no GLU — i.e. the BGE family); JINA variants keep the XLA path.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08, -2.10102402082508e-06,
              -5.69250639462346e-05, -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04, -1.68282697438203e-03,
             -7.37332916720468e-03, -1.42647390514189e-02)


def _erf32(x: jax.Array) -> jax.Array:
    """float32 erf, Eigen's generic_fast_erf_float rational form (the same
    polynomial XLA lowers jax.lax.erf to on CPU/TPU)."""
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.full_like(x, _ERF_ALPHA[0])
    for a in _ERF_ALPHA[1:]:
        p = p * x2 + a
    p = p * x
    q = jnp.full_like(x, _ERF_BETA[0])
    for b in _ERF_BETA[1:]:
        q = q * x2 + b
    return p / q


def _layer_kernel(
    x_ref,      # (rows, T, d) bf16/f32 input activations
    mask_ref,   # (rows, 1, T) bool key mask
    wqkv_ref,   # (d, 3d)
    bqkv_ref,   # (1, 3d)
    wo_ref,     # (d, d)
    bo_ref,     # (1, d)
    ln1_ref,    # (2, d) [scale; bias]
    w1_ref,     # (d, d_ff)
    b1_ref,     # (1, d_ff)
    w2_ref,     # (d_ff, d)
    b2_ref,     # (1, d)
    ln2_ref,    # (2, d)
    *out_and_scratch,  # o_ref [, x1_ref] + (qkv, attn) scratch
    rows: int,
    T: int,
    d: int,
    H: int,
    scale: float,
    eps: float,
    save_x1: bool = False,  # also write the post-LN1 activation (train bwd)
):
    if save_x1:
        o_ref, x1_ref, qkv_ref, attn_ref = out_and_scratch
    else:
        o_ref, qkv_ref, attn_ref = out_and_scratch
        x1_ref = None
    R = rows * T
    dh = d // H
    cdt = x_ref.dtype
    x = x_ref[...].reshape(R, d)

    qkv_ref[...] = (
        jax.lax.dot_general(x, wqkv_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(cdt)

    valid = jnp.broadcast_to(mask_ref[...][:, :, None, :], (rows, 1, T, T)).reshape(rows, T, T)
    # per-head attention, batched over the `rows` sequences in one
    # dot_general (Mosaic: one batch dim); head slices are unaligned lane
    # reads from the qkv scratch
    for h in range(H):
        q = qkv_ref[:, pl.ds(h * dh, dh)].reshape(rows, T, dh)
        k = qkv_ref[:, pl.ds(d + h * dh, dh)].reshape(rows, T, dh)
        v = qkv_ref[:, pl.ds(2 * d + h * dh, dh)].reshape(rows, T, dh)
        s = jax.lax.dot_general(q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = jnp.where(valid, s, -1e30)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(cdt), v,
                                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        attn_ref[:, pl.ds(h * dh, dh)] = o.reshape(R, dh).astype(cdt)

    def _ln(y32, ln_ref):
        mean = jnp.mean(y32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
        n = (y32 - mean) * jax.lax.rsqrt(var + eps)
        w = ln_ref[0, :].astype(jnp.float32)
        b = ln_ref[1, :].astype(jnp.float32)
        return n * w[None, :] + b[None, :]

    ao = (
        jax.lax.dot_general(attn_ref[...], wo_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bo_ref[...].astype(jnp.float32)
    )
    x1 = _ln(x.astype(jnp.float32) + ao, ln1_ref).astype(cdt)
    if x1_ref is not None:
        x1_ref[...] = x1.reshape(rows, T, d).astype(x1_ref.dtype)

    h1 = (
        jax.lax.dot_general(x1, w1_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32)
    )
    # exact GELU (erf), matching jax.nn.gelu(approximate=False); Mosaic has
    # no erf primitive, so use the same float32 rational approximation
    # XLA/Eigen lower erf to (agrees with jax.lax.erf to rounding)
    h1 = 0.5 * h1 * (1.0 + _erf32(h1 * (2.0 ** -0.5)))
    x2 = (
        jax.lax.dot_general(h1.astype(cdt), w2_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b2_ref[...].astype(jnp.float32)
    )
    out = _ln(x1.astype(jnp.float32) + x2, ln2_ref)
    o_ref[...] = out.reshape(rows, T, d).astype(o_ref.dtype)


def _pick_rows(B: int, T: int, d: int, d_ff: int, itemsize: int = 2,
               budget: int = 26 * 2**20, save_x1: bool = False) -> int:
    # budget tuned on v5e (64 MB scoped-vmem limit requested): rows=8 at the
    # bge chunk shape measured 0.42 MFU vs 0.35 at rows=4 and 0.41 at rows=16.
    # Wide-and-long shapes (XLM-R-base reranker: d=768, T=512) exceed it at
    # every row count with this conservative bound, but fit comfortably at
    # rows=1 under the 64 MB scoped limit — allow them explicitly.
    # itemsize: the caller's activation/weight dtype width — an f32 run needs
    # ~2x the VMEM of the bf16 shapes the budget was tuned on.
    for rows in (16, 8, 4, 2, 1):
        if B % rows:
            continue
        R = rows * T
        Tl = max(T, 128)  # lane padding of the (rows, T, T) tiles
        est = (
            2 * 2 * rows * T * d * itemsize      # x in + out blocks, double-buffered
            # train forward: the x1 output block is double-buffered too
            + (2 * rows * T * d * itemsize if save_x1 else 0)
            + R * 3 * d * itemsize + R * d * itemsize   # qkv + attn scratch
            + 3 * rows * T * Tl * 4       # s/p f32 tiles
            + 2 * R * d_ff * 4            # h1 f32 (+ gelu temporary)
            + 2 * R * d * 4               # LN f32 temporaries
            + (3 * d * d + 2 * d * d_ff) * itemsize  # resident weights
        )
        if est <= budget or (rows == 1 and est <= 52 * 2**20):
            return rows
    return 0  # nothing fits — caller must use the XLA path


def _layer_call(x, maskB, wqkv, bqkv, wo, bo, ln1, w1, b1, w2, b2, ln2,
                *, num_heads, eps, interpret, save_x1=False):
    B, T, d = x.shape
    d_ff = w1.shape[1]
    rows = _pick_rows(B, T, d, d_ff, x.dtype.itemsize, save_x1=save_x1)
    if not rows:
        raise ValueError(
            f"fused layer does not fit VMEM at (B={B}, T={T}, d={d}, d_ff={d_ff}, "
            f"dtype={x.dtype}) — call with fused=False")
    dh = d // num_heads

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    out_blk = pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out_sh = jax.ShapeDtypeStruct((B, T, d), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _layer_kernel, rows=rows, T=T, d=d, H=num_heads,
            scale=dh**-0.5, eps=eps, save_x1=save_x1,
        ),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            full(d, 3 * d), full(1, 3 * d),
            full(d, d), full(1, d), full(2, d),
            full(d, d_ff), full(1, d_ff), full(d_ff, d), full(1, d), full(2, d),
        ],
        out_specs=[out_blk, out_blk] if save_x1 else out_blk,
        out_shape=[out_sh, out_sh] if save_x1 else out_sh,
        scratch_shapes=[
            pltpu.VMEM((rows * T, 3 * d), x.dtype),
            pltpu.VMEM((rows * T, d), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * d * d + 2 * d * d_ff) + 4 * B * num_heads * T * T * dh,
            bytes_accessed=2 * B * T * d * x.dtype.itemsize,
            transcendentals=B * T * (num_heads * T + d_ff),
        ),
        interpret=interpret,
    )(x, maskB, wqkv, bqkv, wo, bo, ln1, w1, b1, w2, b2, ln2)


def _batch_axis_of(mesh, x_info):
    """Usable batch (dim-0) mesh axis from an operand's propagated sharding;
    None when unsharded, non-Named, or the axis does not divide the dim."""
    from jax.sharding import NamedSharding

    sh = x_info.sharding
    if not isinstance(sh, NamedSharding) or not len(sh.spec):
        return None
    b = sh.spec[0]
    if b is not None:
        names = b if isinstance(b, tuple) else (b,)
        n = 1
        for a in names:
            n *= mesh.shape[a]
        if x_info.shape[0] % n:
            return None
    return b


@functools.lru_cache(maxsize=None)
def _make_layer_cp(num_heads, eps, interpret, save_x1=False):
    """custom_partitioning wrapper: under plain jit with GSPMD-sharded
    operands the Mosaic call is opaque and XLA would replicate it; declare it
    partitionable over the batch dim (weights replicated). Same pattern as
    ops/flash_attention.py. save_x1 adds the (b t d) x1 output (train fwd)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(num_heads=num_heads, eps=eps, interpret=interpret, save_x1=save_x1)
    fn = custom_partitioning(lambda *args: _layer_call(*args, **kw))
    out_rule = "b t d, b t d" if save_x1 else "b t d"
    rule = ("b t d, b u t, c0 c1, c2 c3, c4 c5, c6 c7, c8 c9, d0 d1, d2 d3, "
            f"d4 d5, d6 d7, d8 d9 -> {out_rule}")

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        xs = NamedSharding(mesh, P(b, None, None))
        ms = NamedSharding(mesh, P(b, None, None))
        rep2 = NamedSharding(mesh, P(None, None))
        outs = (xs, xs) if save_x1 else xs
        return (xs, ms) + (rep2,) * 10, outs

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[1]

    def part(mesh, arg_infos, result_infos):
        arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            return _layer_call(*args, **kw)

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


def fuse_bert_blocks(blocks: Dict[str, Any]) -> Dict[str, jax.Array]:
    """Pre-fuse the STACKED (L, ...) block params once (outside the layer
    scan): one qkv concat over the whole stack instead of one per layer per
    call."""
    return {
        "wqkv": jnp.concatenate(
            [blocks["q"]["kernel"], blocks["k"]["kernel"], blocks["v"]["kernel"]], axis=2),
        "bqkv": jnp.concatenate(
            [blocks["q"]["bias"], blocks["k"]["bias"], blocks["v"]["bias"]], axis=1)[:, None, :],
        "wo": blocks["o"]["kernel"],
        "bo": blocks["o"]["bias"][:, None, :],
        "ln1": jnp.stack([blocks["attn_ln_w"], blocks["attn_ln_b"]], axis=1),
        "w1": blocks["fc1"]["kernel"],
        "b1": blocks["fc1"]["bias"][:, None, :],
        "w2": blocks["fc2"]["kernel"],
        "b2": blocks["fc2"]["bias"][:, None, :],
        "ln2": jnp.stack([blocks["out_ln_w"], blocks["out_ln_b"]], axis=1),
    }


def fused_bert_layer_parts(x, key_mask, l: Dict[str, jax.Array], *,
                           num_heads: int, eps: float,
                           interpret: bool | None = None,
                           save_x1: bool = False):
    """One fused layer from a fuse_bert_blocks-style per-layer dict.
    save_x1=True also returns the post-LN1 activation (train backward)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    args = (x, key_mask[:, None, :], l["wqkv"], l["bqkv"], l["wo"], l["bo"],
            l["ln1"], l["w1"], l["b1"], l["w2"], l["b2"], l["ln2"])

    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if _auto_partition_wanted():
        return _make_layer_cp(num_heads, eps, interpret, save_x1)(*args)
    return _layer_call(*args, num_heads=num_heads, eps=eps, interpret=interpret,
                       save_x1=save_x1)


def fused_bert_layer(
    x: jax.Array,        # (B, T, d)
    key_mask: jax.Array,  # (B, T) bool
    layer: Dict[str, Any],  # one layer of bert params (un-stacked)
    *,
    num_heads: int,
    eps: float,
    interpret: bool | None = None,
) -> jax.Array:
    l = {
        "wqkv": jnp.concatenate(
            [layer["q"]["kernel"], layer["k"]["kernel"], layer["v"]["kernel"]], axis=1),
        "bqkv": jnp.concatenate(
            [layer["q"]["bias"], layer["k"]["bias"], layer["v"]["bias"]])[None],
        "wo": layer["o"]["kernel"],
        "bo": layer["o"]["bias"][None],
        "ln1": jnp.stack([layer["attn_ln_w"], layer["attn_ln_b"]]),
        "w1": layer["fc1"]["kernel"],
        "b1": layer["fc1"]["bias"][None],
        "w2": layer["fc2"]["kernel"],
        "b2": layer["fc2"]["bias"][None],
        "ln2": jnp.stack([layer["out_ln_w"], layer["out_ln_b"]]),
    }
    return fused_bert_layer_parts(x, key_mask, l, num_heads=num_heads, eps=eps,
                                  interpret=interpret)


# --------------------------------------------------------------------------- #
# fused T5 encoder layer (pre-norm RMS, batch-shared rel-pos bias, no biases)
# --------------------------------------------------------------------------- #
def _t5_layer_kernel(
    x_ref,      # (rows, T, d)
    mask_ref,   # (rows, 1, T) bool
    bias_ref,   # (H, T, T) bf16 batch-shared rel-pos bias (resident)
    wqkv_ref,   # (d, 3*inner)
    wo_ref,     # (inner, d)
    ln0_ref,    # (1, d)
    ln1_ref,    # (1, d)
    *ffn_and_out,  # gated: wi0, wi1, wof | plain: wi, wof; then o_ref + scratch
    rows: int,
    T: int,
    d: int,
    H: int,
    dk: int,
    eps: float,
    gated: bool,
    ffn_chunk: int = 0,  # >0: FFN in d_ff column chunks (f32 accumulator)
    save_x1: bool = False,  # also write the attention-residual sum (train bwd)
    attn_stream: int = 0,  # >0: online-softmax over key chunks (bias-free only)
):
    if gated:
        wi0_ref, wi1_ref, wof_ref, *out = ffn_and_out
    else:
        wi_ref, wof_ref, *out = ffn_and_out
    if save_x1:
        o_ref, x1_ref, qkv_ref, attn_ref = out
    else:
        o_ref, qkv_ref, attn_ref = out
        x1_ref = None
    R = rows * T
    inner = H * dk
    cdt = x_ref.dtype
    x = x_ref[...].reshape(R, d)

    def _rms(y, ln_ref):
        y32 = y.astype(jnp.float32)
        var = jnp.mean(jnp.square(y32), axis=-1, keepdims=True)
        n = y32 * jax.lax.rsqrt(var + eps)
        return (n * ln_ref[...].astype(jnp.float32)).astype(cdt)

    h = _rms(x, ln0_ref)
    qkv_ref[...] = jax.lax.dot_general(
        h, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    if attn_stream:
        # online-softmax (flash-style) score stream over key chunks: never
        # materializes the (T, T) scores, which are THE VMEM term that locks
        # the whole-layer kernel out of the 2048-patch Pix2Struct page
        # budget. Bias-free only: a resident (H, T, T) rel-pos bias would
        # blow the budget the stream just reclaimed.
        assert bias_ref is None, "attn_stream requires the bias-free layer"
        kmask = mask_ref[...].reshape(rows, 1, T)  # (rows, 1, T)
        for hh in range(H):
            q = qkv_ref[:, pl.ds(hh * dk, dk)].reshape(rows, T, dk)
            k = qkv_ref[:, pl.ds(inner + hh * dk, dk)].reshape(rows, T, dk)
            v = qkv_ref[:, pl.ds(2 * inner + hh * dk, dk)].reshape(rows, T, dk)
            m = jnp.full((rows, T, 1), -1e30, jnp.float32)
            l = jnp.zeros((rows, T, 1), jnp.float32)
            acc = jnp.zeros((rows, T, dk), jnp.float32)
            for c0 in range(0, T, attn_stream):
                kc = min(attn_stream, T - c0)
                k_c = jax.lax.slice(k, (0, c0, 0), (rows, c0 + kc, dk))
                v_c = jax.lax.slice(v, (0, c0, 0), (rows, c0 + kc, dk))
                s = jax.lax.dot_general(
                    q, k_c, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # (rows, T, kc)
                valid_c = jnp.broadcast_to(
                    jax.lax.slice(kmask, (0, 0, c0), (rows, 1, c0 + kc)),
                    (rows, T, kc))
                s = jnp.where(valid_c, s, -1e9)
                m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
                alpha = jnp.exp(m - m_new)
                p = jnp.exp(s - m_new)
                l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
                # p casts to the compute dtype before the p@v dot, like the
                # materialized path (and the flash kernel) do
                acc = acc * alpha + jax.lax.dot_general(
                    p.astype(cdt), v_c,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                m = m_new
            o = acc / jnp.maximum(l, 1e-30)
            attn_ref[:, pl.ds(hh * dk, dk)] = o.reshape(R, dk).astype(cdt)
    else:
        valid = jnp.broadcast_to(mask_ref[...][:, :, None, :], (rows, 1, T, T)).reshape(rows, T, T)
        for hh in range(H):
            q = qkv_ref[:, pl.ds(hh * dk, dk)].reshape(rows, T, dk)
            k = qkv_ref[:, pl.ds(inner + hh * dk, dk)].reshape(rows, T, dk)
            v = qkv_ref[:, pl.ds(2 * inner + hh * dk, dk)].reshape(rows, T, dk)
            s = jax.lax.dot_general(q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            if bias_ref is not None:
                s = s + jnp.broadcast_to(bias_ref[hh][None].astype(jnp.float32), (rows, T, T))
            s = jnp.where(valid, s, -1e9)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
            o = jax.lax.dot_general(p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            attn_ref[:, pl.ds(hh * dk, dk)] = o.reshape(R, dk).astype(cdt)

    ao = jax.lax.dot_general(attn_ref[...], wo_ref[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(cdt)
    x = x + ao
    if x1_ref is not None:
        x1_ref[...] = x.reshape(rows, T, d)
    h2 = _rms(x, ln1_ref)

    def _gelu_tanh_mul(g, u):
        # gelu_new (tanh approximation), matching jax.nn.gelu(approximate=True)
        g32 = g.astype(jnp.float32)
        inner_t = (2.0 / jnp.pi) ** 0.5 * (g32 + 0.044715 * g32 * g32 * g32)
        return (0.5 * g32 * (1.0 + jnp.tanh(inner_t))).astype(cdt) * u

    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if ffn_chunk:
        # d_ff column chunks: the (R, d_ff) f32 temporaries were the VMEM
        # budget's dominant term at T >= 1024 — chunking swaps them for
        # (R, C) temporaries + one (R, d) f32 accumulator. Same products,
        # f32-accumulated partial outputs (order differs from the single
        # dot by <= f32 rounding).
        d_ff = (wi0_ref if gated else wi_ref).shape[1]
        fo32 = jnp.zeros((R, d), jnp.float32)
        for c0 in range(0, d_ff, ffn_chunk):
            sl = pl.ds(c0, min(ffn_chunk, d_ff - c0))
            if gated:
                g = dot(h2, wi0_ref[:, sl]).astype(cdt)
                u = dot(h2, wi1_ref[:, sl]).astype(cdt)
                f_c = _gelu_tanh_mul(g, u)
            else:
                f_c = jnp.maximum(dot(h2, wi_ref[:, sl]), 0.0).astype(cdt)
            fo32 = fo32 + dot(f_c, wof_ref[sl, :])
        fo = fo32.astype(cdt)
    else:
        if gated:
            g = dot(h2, wi0_ref[...]).astype(cdt)
            u = dot(h2, wi1_ref[...]).astype(cdt)
            f = _gelu_tanh_mul(g, u)
        else:
            f = jnp.maximum(dot(h2, wi_ref[...]), 0.0).astype(cdt)
        fo = dot(f, wof_ref[...]).astype(cdt)
    o_ref[...] = (x + fo).reshape(rows, T, d)


def _pick_rows_t5(B, T, d, inner, d_ff, H, gated, itemsize: int = 2,
                  budget: int = 52 * 2**20, has_bias: bool = True,
                  save_x1: bool = False):
    """Returns (rows, ffn_chunk, attn_stream); (0, 0, 0) when nothing fits.
    The unchunked FFN (ffn_chunk=0) is preferred at any row count — chunking
    only buys entry for shapes whose (R, d_ff) f32 FFN temporaries dominate
    the budget (T >= ~1024), at the cost of per-chunk dot dispatch. The
    materialized-scores attention (attn_stream=0) is preferred over the
    online-softmax stream; streaming (bias-free layers only) buys entry for
    shapes whose (T, T) f32 scores lock the kernel out (the 2048-patch
    Pix2Struct page budget)."""
    n_wi = 2 if gated else 1
    dk = inner // H

    def est(rows, C, KC):
        R = rows * T
        Tl = max(T, 128)
        # chunked: (n_wi+1) (R, C) f32 temporaries + the fo32 accumulator
        # AND each chunk's (R, d) f32 partial product live at the same time
        ffn_tmp = ((n_wi + 1) * R * C * 4 + 2 * R * d * 4) if C else (2 + n_wi) * R * d_ff * 4
        if KC:
            # streamed: s + p (rows, T, KC) f32, acc (rows, T, dk) f32,
            # m/l/alpha small, plus per-head k/v chunk values
            attn_tmp = 2 * rows * T * KC * 4 + rows * T * dk * 4 \
                + 2 * rows * T * dk * itemsize + 3 * rows * T * 4
        else:
            attn_tmp = 3 * rows * T * Tl * 4
        return (
            2 * 2 * rows * T * d * itemsize
            + R * 3 * inner * itemsize + R * inner * itemsize
            + attn_tmp
            + ffn_tmp
            + 2 * R * d * 4
            + (3 * d * inner + inner * d + (n_wi + 1) * d * d_ff) * itemsize
            # resident bias (always bf16 by construction); bias-free layers
            # (Pix2Struct's patch encoder) skip it
            + (H * T * Tl * 2 if has_bias else 0)
            # train forward (save_x1): the second double-buffered
            # (rows, T, d) output block (the attention-residual sum)
            + (2 * rows * T * d * itemsize if save_x1 else 0)
        )

    streams = (0, 512) if not has_bias else (0,)
    for KC in streams:
        if KC and KC >= T:
            continue
        for C in (0, 512, 256):
            if C and (C >= d_ff):
                continue
            for rows in (8, 4, 2, 1):
                if B % rows:
                    continue
                if est(rows, C, KC) <= budget:
                    return rows, C, KC
    return 0, 0, 0


def _t5_layer_kernel_nobias(x_ref, mask_ref, wqkv_ref, wo_ref, ln0_ref, ln1_ref,
                            *ffn_and_out, **kw):
    _t5_layer_kernel(x_ref, mask_ref, None, wqkv_ref, wo_ref, ln0_ref, ln1_ref,
                     *ffn_and_out, **kw)


# --------------------------------------------------------------------------- #
# query-tiled whole-layer kernel (bias-free): the 2048-patch page budget
# --------------------------------------------------------------------------- #
def _t5_layer_kernel_qtiled(
    x_ref,      # (1, T, d) one batch row, resident across its tq steps
    mask_ref,   # (1, 1, T)
    wqkv_ref, wo_ref, ln0_ref, ln1_ref,
    *ffn_and_out,
    T: int, TQ: int, d: int, H: int, dk: int,
    eps: float, gated: bool, ffn_chunk: int, kc: int,
):
    """Whole layer with the QUERY dimension tiled over the grid: at T=2048
    the batch-row kernel's per-row working set (f32 temporaries scale with
    R = T) exceeds VMEM even with streamed attention, so this variant runs
    grid (B, T/TQ) — QKV for the full row computes ONCE (tq == 0) into a
    resident scratch, each step does online-softmax attention for its TQ
    queries against all T keys from that scratch, then LN1+FFN+residual on
    the block. Everything is 2-D (Mosaic-friendly). Inference-only,
    bias-free (a resident (H, T, T) bias would defeat the point)."""
    if gated:
        wi0_ref, wi1_ref, wof_ref, o_ref, qkv_ref, attn_ref = ffn_and_out
    else:
        wi_ref, wof_ref, o_ref, qkv_ref, attn_ref = ffn_and_out
    tq = pl.program_id(1)
    inner = H * dk
    cdt = x_ref.dtype

    def _rms(y, ln_ref):
        y32 = y.astype(jnp.float32)
        var = jnp.mean(jnp.square(y32), axis=-1, keepdims=True)
        n = y32 * jax.lax.rsqrt(var + eps)
        return (n * ln_ref[...].astype(jnp.float32)).astype(cdt)

    @pl.when(tq == 0)
    def _fill_qkv():
        h = _rms(x_ref[...].reshape(T, d), ln0_ref)
        qkv_ref[...] = jax.lax.dot_general(
            h, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(cdt)

    kmask = mask_ref[...].reshape(1, T)
    q0 = tq * TQ
    for hh in range(H):
        q = qkv_ref[pl.ds(q0, TQ), pl.ds(hh * dk, dk)]  # (TQ, dk)
        m = jnp.full((TQ, 1), -1e30, jnp.float32)
        l = jnp.zeros((TQ, 1), jnp.float32)
        acc = jnp.zeros((TQ, dk), jnp.float32)
        for c0 in range(0, T, kc):
            cur = min(kc, T - c0)
            k_c = qkv_ref[pl.ds(c0, cur), pl.ds(inner + hh * dk, dk)]
            v_c = qkv_ref[pl.ds(c0, cur), pl.ds(2 * inner + hh * dk, dk)]
            s = jax.lax.dot_general(
                q, k_c, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (TQ, cur)
            valid_c = jnp.broadcast_to(
                jax.lax.slice(kmask, (0, c0), (1, c0 + cur)), (TQ, cur))
            s = jnp.where(valid_c, s, -1e9)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p.astype(cdt), v_c, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = m_new
        attn_ref[:, pl.ds(hh * dk, dk)] = (acc / jnp.maximum(l, 1e-30)).astype(cdt)

    ao = jax.lax.dot_general(attn_ref[...], wo_ref[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32).astype(cdt)
    x1 = x_ref[0, pl.ds(q0, TQ), :] + ao  # (TQ, d)
    h2 = _rms(x1, ln1_ref)

    def _gelu_tanh_mul(g, u):
        g32 = g.astype(jnp.float32)
        inner_t = (2.0 / jnp.pi) ** 0.5 * (g32 + 0.044715 * g32 * g32 * g32)
        return (0.5 * g32 * (1.0 + jnp.tanh(inner_t))).astype(cdt) * u

    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    if ffn_chunk:
        d_ff = (wi0_ref if gated else wi_ref).shape[1]
        fo32 = jnp.zeros((TQ, d), jnp.float32)
        for c0 in range(0, d_ff, ffn_chunk):
            sl = pl.ds(c0, min(ffn_chunk, d_ff - c0))
            if gated:
                g = dot(h2, wi0_ref[:, sl]).astype(cdt)
                u = dot(h2, wi1_ref[:, sl]).astype(cdt)
                f_c = _gelu_tanh_mul(g, u)
            else:
                f_c = jnp.maximum(dot(h2, wi_ref[:, sl]), 0.0).astype(cdt)
            fo32 = fo32 + dot(f_c, wof_ref[sl, :])
        fo = fo32.astype(cdt)
    else:
        if gated:
            f = _gelu_tanh_mul(dot(h2, wi0_ref[...]).astype(cdt),
                               dot(h2, wi1_ref[...]).astype(cdt))
        else:
            f = jnp.maximum(dot(h2, wi_ref[...]), 0.0).astype(cdt)
        fo = dot(f, wof_ref[...]).astype(cdt)
    o_ref[...] = (x1 + fo).reshape(1, TQ, d)


def _t5_layer_call_qtiled(x, maskB, wqkv, wo, ln0, ln1, *ffn_ws,
                          num_heads, eps, gated, interpret, TQ, kc, ffn_chunk):
    B, T, d = x.shape
    inner = wo.shape[0]
    dk = inner // num_heads
    full = lambda *shape: pl.BlockSpec(shape, lambda b, t: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        # the x row and mask keep the same block index across a row's tq
        # steps, so Pallas fetches them once per batch row
        pl.BlockSpec((1, T, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM),
        full(d, 3 * inner), full(inner, d), full(1, d), full(1, d),
    ]
    if gated:
        in_specs += [full(d, ffn_ws[0].shape[1]), full(d, ffn_ws[0].shape[1]),
                     full(ffn_ws[0].shape[1], d)]
    else:
        in_specs += [full(d, ffn_ws[0].shape[1]), full(ffn_ws[0].shape[1], d)]
    return pl.pallas_call(
        functools.partial(_t5_layer_kernel_qtiled, T=T, TQ=TQ, d=d,
                          H=num_heads, dk=dk, eps=eps, gated=gated,
                          ffn_chunk=ffn_chunk, kc=kc),
        grid=(B, T // TQ),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, TQ, d), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((T, 3 * inner), x.dtype),   # per-row QKV (filled at tq=0)
            pltpu.VMEM((TQ, inner), x.dtype),      # attention output block
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * d * inner + (3 if gated else 2) * d * ffn_ws[0].shape[1])
            + 4 * B * num_heads * T * T * dk,
            bytes_accessed=2 * B * T * d * x.dtype.itemsize,
            transcendentals=B * T * (num_heads * T + ffn_ws[0].shape[1]),
        ),
        interpret=interpret,
    )(x, maskB, wqkv, wo, ln0, ln1, *ffn_ws)


def _pick_qtile_t5(B, T, d, inner, d_ff, H, gated, itemsize: int = 2,
                   budget: int = 52 * 2**20):
    """Entry sizes for the query-tiled kernel. Returns (TQ, kc, ffn_chunk)
    or (0, 0, 0)."""
    n_wi = 2 if gated else 1
    dk = inner // H

    def est(TQ, kc, C):
        ffn_tmp = ((n_wi + 1) * TQ * C * 4 + 2 * TQ * d * 4) if C else (2 + n_wi) * TQ * d_ff * 4
        return (
            T * d * itemsize                       # resident x row
            + TQ * d * itemsize                    # out block
            + T * 3 * inner * itemsize             # qkv scratch
            + TQ * inner * itemsize                # attn scratch
            + 2 * TQ * kc * 4 + TQ * dk * 4        # s/p + acc f32
            + ffn_tmp
            + 2 * TQ * d * 4                       # h2/x1 f32 temps
            + 2 * T * d * 4                        # tq==0 QKV fill: h + dot f32
            + (3 * d * inner + inner * d + (n_wi + 1) * d * d_ff) * itemsize
        )

    for TQ in (512, 256, 128):
        if T % TQ:
            continue
        for C in (0, 512, 256):
            if C and C >= d_ff:
                continue
            if est(TQ, 512, C) <= budget:
                return TQ, 512, C
    return 0, 0, 0


def _t5_layer_call(x, maskB, bias, wqkv, wo, ln0, ln1, *ffn_ws,
                   num_heads, eps, gated, interpret, save_x1=False):
    B, T, d = x.shape
    inner = wo.shape[0]
    dk = inner // num_heads
    d_ff = ffn_ws[0].shape[1]
    rows, ffn_chunk, attn_stream = _pick_rows_t5(
        B, T, d, inner, d_ff, num_heads, gated,
        x.dtype.itemsize, has_bias=bias is not None, save_x1=save_x1)
    if not rows and bias is None and not save_x1:
        TQ, kc, qc = _pick_qtile_t5(B, T, d, inner, d_ff, num_heads, gated,
                                    x.dtype.itemsize)
        if TQ:
            return _t5_layer_call_qtiled(x, maskB, wqkv, wo, ln0, ln1, *ffn_ws,
                                         num_heads=num_heads, eps=eps,
                                         gated=gated, interpret=interpret,
                                         TQ=TQ, kc=kc, ffn_chunk=qc)
    if not rows:
        raise ValueError(
            f"fused t5 layer does not fit VMEM at (B={B}, T={T}, d={d}, "
            f"d_ff={d_ff}, dtype={x.dtype}) — call with fused=False")

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if bias is not None:
        in_specs.append(full(num_heads, T, T))
    in_specs += [full(d, 3 * inner), full(inner, d), full(1, d), full(1, d)]
    if gated:
        in_specs += [full(d, d_ff), full(d, d_ff), full(d_ff, d)]
    else:
        in_specs += [full(d, d_ff), full(d_ff, d)]

    kernel = _t5_layer_kernel if bias is not None else _t5_layer_kernel_nobias
    args = (x, maskB) + ((bias,) if bias is not None else ()) + (wqkv, wo, ln0, ln1) + ffn_ws
    out_blk = pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out_sh = jax.ShapeDtypeStruct((B, T, d), x.dtype)
    return pl.pallas_call(
        functools.partial(kernel, rows=rows, T=T, d=d, H=num_heads,
                          dk=dk, eps=eps, gated=gated, ffn_chunk=ffn_chunk,
                          save_x1=save_x1, attn_stream=attn_stream),
        grid=(B // rows,),
        in_specs=in_specs,
        out_specs=[out_blk, out_blk] if save_x1 else out_blk,
        out_shape=[out_sh, out_sh] if save_x1 else out_sh,
        scratch_shapes=[
            pltpu.VMEM((rows * T, 3 * inner), x.dtype),
            pltpu.VMEM((rows * T, inner), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * d * inner + (3 if gated else 2) * d * d_ff)
            + 4 * B * num_heads * T * T * dk,
            bytes_accessed=2 * B * T * d * x.dtype.itemsize,
            transcendentals=B * T * (num_heads * T + d_ff),
        ),
        interpret=interpret,
    )(*args)


def fuse_t5_blocks(stacked: Dict[str, Any], gated: bool) -> Dict[str, jax.Array]:
    """Pre-fuse the STACKED (L, ...) encoder params once (outside the layer
    scan)."""
    attn, ffn = stacked["attn"], stacked["ffn"]
    pre = {
        "wqkv": jnp.concatenate([attn["q"], attn["k"], attn["v"]], axis=2),
        "wo": attn["o"],
        "ln0": stacked["ln0"][:, None, :],
        "ln1": stacked["ln1"][:, None, :],
    }
    if gated:
        pre.update(wi_0=ffn["wi_0"], wi_1=ffn["wi_1"], wof=ffn["wo"])
    else:
        pre.update(wi=ffn["wi"], wof=ffn["wo"])
    return pre


def fused_t5_layer_parts(x, key_mask, bias, l: Dict[str, jax.Array], *,
                         num_heads: int, eps: float, gated: bool,
                         interpret: bool | None = None,
                         save_x1: bool = False):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ffn_ws = (l["wi_0"], l["wi_1"], l["wof"]) if gated else (l["wi"], l["wof"])
    args = (x, key_mask[:, None, :], bias, l["wqkv"], l["wo"],
            l["ln0"], l["ln1"]) + ffn_ws

    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if save_x1:
        # train-path forward (fused_encoder_bwd): also returns the attention-
        # residual sum. Batch-partitioned under GSPMD (data-parallel train
        # steps); bias/weights replicate — tensor-parallel meshes should
        # keep flash (fused_t5_train_wanted's working-set gate is per-shard).
        if _auto_partition_wanted():
            assert bias is not None, "train path is bias-ful (T5 rel-pos)"
            return _make_t5_train_fwd_cp(num_heads, eps, gated, interpret)(*args)
        return _t5_layer_call(*args, num_heads=num_heads, eps=eps, gated=gated,
                              interpret=interpret, save_x1=True)
    if _auto_partition_wanted():
        if bias is None:
            # no-bias variant has no GSPMD wrapper: the direct opaque call is
            # still CORRECT under auto-sharding (XLA gathers + replicates) but
            # not batch-partitioned — fused_p2s_encoder_wanted gates it off in
            # multi-device auto contexts, so this is only reached when a
            # caller (or test) forces the fused path.
            return _t5_layer_call(*args, num_heads=num_heads, eps=eps,
                                  gated=gated, interpret=interpret)
        return _make_t5_layer_cp(num_heads, eps, gated, interpret)(*args)
    return _t5_layer_call(*args, num_heads=num_heads, eps=eps, gated=gated,
                          interpret=interpret)


def fused_t5_layer(
    x: jax.Array,         # (B, T, d)
    key_mask: jax.Array,  # (B, T) bool
    bias: jax.Array,      # (H, T, T) bf16 batch-shared rel-pos bias
    layer: Dict[str, Any],  # {"attn": {q,k,v,o}, "ffn": {...}, "ln0", "ln1"}
    *,
    num_heads: int,
    eps: float,
    gated: bool,
    interpret: bool | None = None,
) -> jax.Array:
    attn, ffn = layer["attn"], layer["ffn"]
    l = {
        "wqkv": jnp.concatenate([attn["q"], attn["k"], attn["v"]], axis=1),
        "wo": attn["o"],
        "ln0": layer["ln0"][None],
        "ln1": layer["ln1"][None],
    }
    if gated:
        l.update(wi_0=ffn["wi_0"], wi_1=ffn["wi_1"], wof=ffn["wo"])
    else:
        l.update(wi=ffn["wi"], wof=ffn["wo"])
    return fused_t5_layer_parts(x, key_mask, bias, l, num_heads=num_heads,
                                eps=eps, gated=gated, interpret=interpret)


@functools.lru_cache(maxsize=None)
def _make_t5_layer_cp(num_heads, eps, gated, interpret):
    """GSPMD batch partitioning for the fused T5 layer (same pattern as
    _make_layer_cp): x/mask shard over dim 0, bias and weights replicate."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_w = 7 if gated else 6  # wqkv, wo, ln0, ln1 + ffn weights
    kw = dict(num_heads=num_heads, eps=eps, gated=gated, interpret=interpret)
    fn = custom_partitioning(lambda *args: _t5_layer_call(*args, **kw))
    w_rule = ", ".join(f"c{i} d{i}" for i in range(n_w))
    rule = f"b t d, b u t, h t2 t3, {w_rule} -> b t d"

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        xs = NamedSharding(mesh, P(b, None, None))
        rep3 = NamedSharding(mesh, P(None, None, None))
        rep2 = NamedSharding(mesh, P(None, None))
        return (xs, xs, rep3) + (rep2,) * n_w, xs

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[1]

    def part(mesh, arg_infos, result_infos):
        arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            return _t5_layer_call(*args, **kw)

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def _make_t5_train_fwd_cp(num_heads, eps, gated, interpret):
    """GSPMD batch partitioning for the TRAIN forward (save_x1=True): same
    shape as _make_t5_layer_cp with a second batch-sharded output (the
    attention-residual sum the handwritten backward consumes)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_w = 7 if gated else 6
    kw = dict(num_heads=num_heads, eps=eps, gated=gated, interpret=interpret,
              save_x1=True)
    fn = custom_partitioning(lambda *args: tuple(_t5_layer_call(*args, **kw)))
    w_rule = ", ".join(f"c{i} d{i}" for i in range(n_w))
    rule = f"b t d, b u t, h t2 t3, {w_rule} -> b t d, b t d"

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        xs = NamedSharding(mesh, P(b, None, None))
        rep3 = NamedSharding(mesh, P(None, None, None))
        rep2 = NamedSharding(mesh, P(None, None))
        return (xs, xs, rep3) + (rep2,) * n_w, (xs, xs)

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[1]

    def part(mesh, arg_infos, result_infos):
        arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            return tuple(_t5_layer_call(*args, **kw))

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


def fused_t5_encoder_wanted(cfg, B: int, T: int, itemsize: int = 2) -> bool:
    """Whole-layer fused T5 encoder: eligible on TPU when the working set
    fits VMEM. (T arrives pre-rounded to a multiple of 8 — t5.encode PADS odd
    lengths rather than falling back.) Inference path only — training keeps
    the flash fwd+bwd pair (the custom_vjp backward here recomputes through
    the flash path, which would make a train step strictly slower than flash
    alone)."""
    inner = cfg.num_heads * cfg.d_kv
    return (
        jax.default_backend() == "tpu"
        and _pick_rows_t5(B, T, cfg.d_model, inner, cfg.d_ff, cfg.num_heads,
                          cfg.gated_ffn, itemsize)[0] > 0
    )


def fused_p2s_encoder_wanted(v_cfg, B: int, T: int, itemsize: int = 2) -> bool:
    """Whole-layer fused encoder for the Pix2Struct patch tower: the layer is
    T5-shaped (pre-RMS, no projection biases, gated tanh-GELU FFN) with NO
    rel-pos bias, so the bias-free kernel applies. Eligible on TPU in a
    single-device auto context (the no-bias variant has no GSPMD wrapper —
    sharded eval keeps flash) when the working set fits VMEM at the padded
    patch length — via the batch-row kernel at chunk budgets, or the
    query-tiled kernel at the 2048-patch full-page budget."""
    if jax.default_backend() != "tpu":
        return False
    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if _auto_partition_wanted():
        return False
    d, H = v_cfg.hidden_size, v_cfg.num_heads
    Tp = -(-T // 8) * 8
    return (
        _pick_rows_t5(B, Tp, d, d, v_cfg.d_ff, H, True, itemsize,
                      has_bias=False)[0] > 0
        # 2048-patch page budget: the query-tiled kernel takes over where
        # the batch-row kernel's per-row working set exceeds VMEM
        or _pick_qtile_t5(B, Tp, d, d, v_cfg.d_ff, H, True, itemsize)[0] > 0
    )


def fused_encoder_wanted(cfg, B: int, T: int, itemsize: int = 2) -> bool:
    """The fused layer covers the vanilla-BERT block (BGE family): softmax
    attention without ALiBi, plain-GELU MLP. JINA variants, and shapes whose
    working set cannot fit VMEM, fall back to XLA."""
    return (
        jax.default_backend() == "tpu"
        and not cfg.use_alibi
        and not cfg.glu_mlp
        and T % 8 == 0
        and cfg.hidden_size % cfg.num_heads == 0
        and _pick_rows(B, T, cfg.hidden_size, cfg.intermediate_size, itemsize) > 0
    )


# --------------------------------------------------------------------------- #
# fused ViT/BEiT encoder layer (pre-LN, biased projections, optional per-layer
# rel-pos bias and layer-scale)
# --------------------------------------------------------------------------- #
def _vit_layer_kernel(
    x_ref,      # (rows, T, d)
    mask_ref,   # (rows, 1, T) bool (True = real token; padding masked off)
    *rest,      # [bias (H,T,T)], wqkv, bqkv, wo, bo, ln1 (2,d), ln2 (2,d),
                # w1, b1, w2, b2, [gamma (2,d)], o_ref, scratches
    rows: int,
    T: int,
    d: int,
    H: int,
    scale: float,
    eps: float,
    has_bias: bool,
    has_gamma: bool,
):
    i = 0
    bias_ref = None
    if has_bias:
        bias_ref = rest[i]; i += 1
    wqkv_ref, bqkv_ref, wo_ref, bo_ref, ln1_ref, ln2_ref, w1_ref, b1_ref, w2_ref, b2_ref = rest[i:i + 10]
    i += 10
    gamma_ref = None
    if has_gamma:
        gamma_ref = rest[i]; i += 1
    o_ref, qkv_ref, attn_ref = rest[i:i + 3]

    R = rows * T
    dh = d // H
    cdt = x_ref.dtype
    x = x_ref[...].reshape(R, d)

    def _ln(y, ln_ref):
        y32 = y.astype(jnp.float32)
        mean = jnp.mean(y32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
        n = (y32 - mean) * jax.lax.rsqrt(var + eps)
        w = ln_ref[0, :].astype(jnp.float32)
        b = ln_ref[1, :].astype(jnp.float32)
        return (n * w[None, :] + b[None, :]).astype(cdt)

    h = _ln(x, ln1_ref)
    qkv_ref[...] = (
        jax.lax.dot_general(h, wqkv_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bqkv_ref[...].astype(jnp.float32)
    ).astype(cdt)

    valid = jnp.broadcast_to(mask_ref[...][:, :, None, :], (rows, 1, T, T)).reshape(rows, T, T)
    for hh in range(H):
        q = qkv_ref[:, pl.ds(hh * dh, dh)].reshape(rows, T, dh)
        k = qkv_ref[:, pl.ds(d + hh * dh, dh)].reshape(rows, T, dh)
        v = qkv_ref[:, pl.ds(2 * d + hh * dh, dh)].reshape(rows, T, dh)
        s = jax.lax.dot_general(q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        if bias_ref is not None:
            s = s + jnp.broadcast_to(bias_ref[hh][None].astype(jnp.float32), (rows, T, T))
        s = jnp.where(valid, s, -1e30)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        o = jax.lax.dot_general(p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        attn_ref[:, pl.ds(hh * dh, dh)] = o.reshape(R, dh).astype(cdt)

    ao = (
        jax.lax.dot_general(attn_ref[...], wo_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bo_ref[...].astype(jnp.float32)
    ).astype(cdt)
    if gamma_ref is not None:
        ao = ao * gamma_ref[0, :].astype(cdt)[None, :]
    x = x + ao

    h2 = _ln(x, ln2_ref)
    f = (
        jax.lax.dot_general(h2, w1_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b1_ref[...].astype(jnp.float32)
    )
    f = 0.5 * f * (1.0 + _erf32(f * (2.0 ** -0.5)))
    fo = (
        jax.lax.dot_general(f.astype(cdt), w2_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + b2_ref[...].astype(jnp.float32)
    ).astype(cdt)
    if gamma_ref is not None:
        fo = fo * gamma_ref[1, :].astype(cdt)[None, :]
    o_ref[...] = (x + fo).reshape(rows, T, d)


def _pick_rows_vit(B, T, d, d_ff, has_bias, H, itemsize: int = 2,
                   budget: int = 26 * 2**20) -> int:
    for rows in (8, 4, 2, 1):
        if B % rows:
            continue
        R = rows * T
        Tl = -(-T // 128) * 128
        est = (
            2 * 2 * rows * T * d * itemsize
            + R * 3 * d * itemsize + R * d * itemsize
            + 3 * rows * T * Tl * 4
            + 2 * R * d_ff * 4
            + 2 * R * d * 4
            + (4 * d * d + 2 * d * d_ff) * itemsize
            + (H * T * Tl * 2 if has_bias else 0)
        )
        if est <= budget or (rows == 1 and est <= 52 * 2**20):
            return rows
    return 0


def _vit_layer_call(x, maskB, *rest, num_heads, eps, has_bias, has_gamma, interpret):
    B, T, d = x.shape
    i = 1 if has_bias else 0
    w1 = rest[i + 6]
    d_ff = w1.shape[1]
    rows = _pick_rows_vit(B, T, d, d_ff, has_bias, num_heads, x.dtype.itemsize)
    if not rows:
        raise ValueError(
            f"fused vit layer does not fit VMEM at (B={B}, T={T}, d={d}, "
            f"d_ff={d_ff}, dtype={x.dtype}) — call with fused=False")
    dh = d // num_heads

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if has_bias:
        in_specs.append(full(num_heads, T, T))
    in_specs += [
        full(d, 3 * d), full(1, 3 * d), full(d, d), full(1, d),
        full(2, d), full(2, d),
        full(d, d_ff), full(1, d_ff), full(d_ff, d), full(1, d),
    ]
    if has_gamma:
        in_specs.append(full(2, d))

    return pl.pallas_call(
        functools.partial(_vit_layer_kernel, rows=rows, T=T, d=d, H=num_heads,
                          scale=dh**-0.5, eps=eps, has_bias=has_bias,
                          has_gamma=has_gamma),
        grid=(B // rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, d), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((rows * T, 3 * d), x.dtype),
            pltpu.VMEM((rows * T, d), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * d * d + 2 * d * d_ff) + 4 * B * num_heads * T * T * dh,
            bytes_accessed=2 * B * T * d * x.dtype.itemsize,
            transcendentals=B * T * (num_heads * T + d_ff),
        ),
        interpret=interpret,
    )(x, maskB, *rest)


def fuse_vit_blocks(blocks: Dict[str, Any], rel_index=None) -> Dict[str, jax.Array]:
    """Pre-fuse the STACKED (L, ...) ViT/BEiT block params once. BEiT's
    missing k bias becomes zeros; the per-layer rel-pos bias tables gather to
    (L, H, T, T) bf16 here (one gather per encode, resident per grid step in
    the kernel)."""
    k_bias = blocks["k"].get("bias")
    if k_bias is None:
        k_bias = jnp.zeros_like(blocks["q"]["bias"])
    pre = {
        "wqkv": jnp.concatenate(
            [blocks["q"]["kernel"], blocks["k"]["kernel"], blocks["v"]["kernel"]], axis=2),
        "bqkv": jnp.concatenate(
            [blocks["q"]["bias"], k_bias, blocks["v"]["bias"]], axis=1)[:, None, :],
        "wo": blocks["o"]["kernel"],
        "bo": blocks["o"]["bias"][:, None, :],
        "ln1": jnp.stack([blocks["ln1_w"], blocks["ln1_b"]], axis=1),
        "ln2": jnp.stack([blocks["ln2_w"], blocks["ln2_b"]], axis=1),
        "w1": blocks["fc1"]["kernel"],
        "b1": blocks["fc1"]["bias"][:, None, :],
        "w2": blocks["fc2"]["kernel"],
        "b2": blocks["fc2"]["bias"][:, None, :],
    }
    if rel_index is not None:
        tbl = blocks["rel_bias_table"]  # (L, n_dist, H)
        bias = tbl[:, rel_index]  # (L, T, T, H)
        pre["bias"] = jnp.transpose(bias, (0, 3, 1, 2)).astype(jnp.bfloat16)
    if "lambda_1" in blocks:
        pre["gamma"] = jnp.stack([blocks["lambda_1"], blocks["lambda_2"]], axis=1)
    return pre


def fused_vit_layer_parts(x, key_mask, l: Dict[str, jax.Array], *,
                          num_heads: int, eps: float,
                          interpret: bool | None = None) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    has_bias = "bias" in l
    has_gamma = "gamma" in l
    rest = ((l["bias"],) if has_bias else ()) + (
        l["wqkv"], l["bqkv"], l["wo"], l["bo"], l["ln1"], l["ln2"],
        l["w1"], l["b1"], l["w2"], l["b2"],
    ) + ((l["gamma"],) if has_gamma else ())
    return _vit_layer_call(x, key_mask[:, None, :], *rest,
                           num_heads=num_heads, eps=eps, has_bias=has_bias,
                           has_gamma=has_gamma, interpret=interpret)


def fused_vit_encoder_wanted(cfg, B: int, T: int, itemsize: int = 2) -> bool:
    """Whole-layer fused ViT/BEiT encoder for the visual towers (inference).
    T arrives pre-rounded — vit_encode pads the 1+N sequence to a multiple
    of 8."""
    return (
        jax.default_backend() == "tpu"
        and cfg.hidden_size % cfg.num_heads == 0
        and _pick_rows_vit(B, T, cfg.hidden_size, cfg.mlp_dim,
                           cfg.arch == "beit" and cfg.use_rel_pos_bias,
                           cfg.num_heads, itemsize) > 0
    )
