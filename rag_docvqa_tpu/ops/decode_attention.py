"""Fused single-query cross-attention for greedy decode on TPU.

Each decode step re-reads the entire per-layer cross-attention KV cache —
at t5-base B=128 Te=512 that is 2.4 GB bf16 (1.2 GB int8) per step, the
decode bottleneck. Round-3 diagnosis revised the attribution: the ~5 ms/step
the XLA path appeared to waste came from (a) the rolled lax.scan over layers
materializing each layer's ~100 MB KV slice inside the decode loop (fixed by
full unroll, models/t5.py::decode_step) and (b) XLA relayouting and
slow-reading a cache built in the same program as the loop (fixed by the
dispatch split, ops/decode.py::greedy_decode_split) — not from the
batched-matvec lowering itself, which streams int8 at 1.8x the HBM floor.

This kernel streams each batch row's KV block HBM->VMEM ONCE in its stored
dtype (int8 or bf16), dequantizes in VMEM, and folds the H per-head matvecs
into two tile-aligned MXU matmuls via a block-diagonal query:

    K2 = K^T per row, stored (H*dk, Te)       # lanes = Te, 128-aligned
    V2 = V  per row, stored (Te, H*dk)        # lanes = H*dk, 128-aligned
    Qd = block-diag(q) (H, H*dk)              # built outside, tiny
    S  = Qd @ K2                (H, Te)       # per-head scores, exact
    P  = softmax(S + key mask)
    O  = P @ V2                 (H, H*dk)     # row h holds head h's output
                                              # in lane block h*dk:(h+1)*dk
    o[h, :] = O[h, h*dk:(h+1)*dk]             # diagonal extract, outside

The cross-head blocks of O are wasted flops (H x), but the step is
HBM-bound — MXU time is noise next to the cache stream. Band-form v1
stored KV as (H*Te, dk): the 64-lane minor dim broke Mosaic tiling and
measured SLOWER than XLA; this layout fixes that. Final round-3 verdict:
with the decode loop dispatched as its own XLA program and the layer loop
unrolled (ops/decode.py, models/t5.py), the plain XLA int8 path runs at
0.227 ms/layer-step vs this kernel's 0.304 (isolated 12-layer loop,
t5-base B=128 Te=512 on v5e) — per-grid-step overhead (~1.3 us/row)
outweighs the single-stream advantage, so the kernel stays opt-in.

Channel-wise int8 scales fold OUTSIDE the kernel (k-scale into the query,
v-scale into the output), so the kernel body is dtype-agnostic.

Inference-only (no VJP): training uses teacher forcing, never this path.
Replaces the decode path of the reference's HF `generate` cross-attention
(/root/reference/src/VT5.py:37 drives T5ForConditionalGeneration).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def pack_decode_kv(k: jax.Array, v: jax.Array):
    """(B, H, Te, dk) K/V -> kernel layouts K2 (B, H*dk, Te), V2 (B, Te, H*dk).

    One-time relayout at cache build; every decode step then streams the
    arrays exactly as stored."""
    B, H, Te, dk = k.shape
    k2 = jnp.transpose(k, (0, 1, 3, 2)).reshape(B, H * dk, Te)
    v2 = jnp.transpose(v, (0, 2, 1, 3)).reshape(B, Te, H * dk)
    return k2, v2


def fused_decode_vmem_bytes(n_heads: int, seq_len: int, d_head: int, itemsize: int) -> int:
    """Per-grid-step VMEM estimate: double-buffered K2/V2 blocks in stored
    dtype + their f32 dequant copies + score/prob tiles."""
    hd = n_heads * d_head
    kv = 2 * hd * seq_len  # elements per tensor pair member
    return (
        2 * kv * itemsize * 2  # k2+v2, double-buffered
        + 2 * kv * 4  # f32 dequant copies
        + 2 * max(8, n_heads) * seq_len * 4  # scores + probs
        + 2 * max(8, n_heads) * hd * 4  # Qd + O
    )


def _kernel(qd_ref, k_ref, v_ref, mask_ref, o_ref, *, compute_dtype, rows):
    """`rows` batch rows per grid step (unrolled): qd (rows, H, H*dk)
    block-diagonal queries, k (rows, H*dk, Te), v (rows, Te, H*dk) stored
    dtype, mask (rows, 1, Te) bool -> o (rows, H, H*dk) f32 (head h's output
    in row h, lane block h). Multiple rows per step amortize the per-grid-step
    launch/DMA-issue overhead (measured ~1.3 us/row at rows=1 on v5e — as
    large as the DMA itself).

    compute_dtype=bf16: int8 cache values dequantize to bf16 EXACTLY
    (|x| <= 127 < 2^8 mantissa), scores/output still accumulate in f32 —
    the flash kernel's precision contract."""
    for i in range(rows):
        qd = qd_ref[i]  # (H, H*dk)
        k = k_ref[i].astype(compute_dtype)  # (H*dk, Te) — VMEM-local dequant
        s = jax.lax.dot_general(
            qd, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, Te) true per-head scores: row h contracts only its own dk block
        s = jnp.where(mask_ref[i], s, NEG_INF)  # (1, Te) key-padding broadcast
        p = jax.nn.softmax(s, axis=-1)
        v = v_ref[i].astype(compute_dtype)  # (Te, H*dk)
        o_ref[i] = jax.lax.dot_general(
            p.astype(compute_dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (H, H*dk)


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def fused_cross_attention(
    q: jax.Array,  # (B, H, dk) query at one decode position (f32/bf16)
    k2: jax.Array,  # (B, H*dk, Te) int8 | bf16 | f32  (pack_decode_kv layout)
    v2: jax.Array,  # (B, Te, H*dk)
    mask: jax.Array,  # (B, Te) bool, True = attend
    k_scale: Optional[jax.Array] = None,  # (B, H, dk) channel scales (int8)
    v_scale: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
    exact: bool = False,  # f32 matmul operands (tests); default bf16 ops
) -> jax.Array:
    """Returns (B, H*dk) f32 — semantics of models/t5.py::_attend_one with a
    key-padding mask (no bias: T5 cross-attention carries none)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, hd, Te = k2.shape
    H, dk = q.shape[1], q.shape[2]
    compute_dtype = jnp.float32 if exact else jnp.bfloat16
    qs = q.astype(jnp.float32)
    if k_scale is not None:
        qs = qs * k_scale.astype(jnp.float32)
    # block-diagonal query: Qd[b, h, h2*dk+d] = q[b, h, d] * (h == h2)
    eye = jnp.eye(H, dtype=jnp.float32)[None, :, :, None]
    qd = (qs[:, :, None, :] * eye).astype(compute_dtype).reshape(B, H, hd)

    # rows per grid step: largest divisor of B whose double-buffered blocks
    # (+ bf16 dequant copies) stay inside the VMEM budget
    kv_bytes = 2 * hd * Te * (2 * k2.dtype.itemsize + 2)  # 2x-buffered stored + dequant copy
    rows = 1
    for r in (8, 4, 2):
        if B % r == 0 and r * kv_bytes < 10 * 2**20:
            rows = r
            break

    out = pl.pallas_call(
        functools.partial(_kernel, compute_dtype=compute_dtype, rows=rows),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, H, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, hd, Te), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, Te, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # 3-D mask block keeps the last two dims (1, Te) array-equal
            pl.BlockSpec((rows, 1, Te), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, H, hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, hd), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * hd * Te,
            bytes_accessed=2 * B * hd * Te * k2.dtype.itemsize,
            transcendentals=B * H * Te,
        ),
        interpret=interpret,
    )(qd, k2, v2, mask[:, None, :])
    # diagonal extract: head h's true output lives at O[:, h, h*dk:(h+1)*dk]
    out = (out.reshape(B, H, H, dk) * eye).sum(axis=2)  # (B, H, dk)
    if v_scale is not None:
        out = out * v_scale.astype(jnp.float32)
    return out.reshape(B, H * dk)
