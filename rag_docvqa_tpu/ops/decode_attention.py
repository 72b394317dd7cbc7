"""Fused single-query cross-attention for greedy decode on TPU.

Each decode step re-reads the entire per-layer cross-attention KV cache —
at t5-base B=128 Te=512 that is 2.4 GB bf16 (1.2 GB int8) per step, the
decode bottleneck. The XLA path pays extra on top of the raw bytes: the
int8 cache dequantizes through a materialized full-precision copy and the
batched matvec lowering adds relayout traffic (measured ~7.7 ms/step vs a
~1.75 ms HBM floor, BENCH r3 stage split).

This kernel streams each batch row's (H, Te, dk) KV block HBM→VMEM ONCE in
its stored dtype (int8 or bf16) and dequantizes in VMEM. The per-head
matvecs are folded into ONE band matmul so the compute is two real MXU
dots per batch row instead of 2·H latency-bound matvecs:

    S_full = Q (H, dk) @ K2ᵀ (dk, H·Te)       # K2 = KV sublane-merged
    softmax over the banded columns only       # off-band masked to -inf
    O      = P_full (H, H·Te) @ V2 (H·Te, dk)  # off-band probs are 0 ⇒ exact

The cross-head products are wasted flops (H×), but the step is HBM-bound —
MXU time is noise next to the cache stream.

Channel-wise int8 scales fold OUTSIDE the kernel (k-scale into the query,
v-scale into the output), so the kernel body is dtype-agnostic.

Inference-only (no VJP): training uses teacher forcing, never this path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, n_heads: int, seq_len: int):
    """One batch row per grid step: q (1, H, dk), k/v (1, H·Te, dk),
    mask (1, 1, H·Te) (pad mask pre-tiled per head) -> o (1, H, dk)."""
    H, Te = n_heads, seq_len
    q = q_ref[0]  # (H, dk) f32
    k = k_ref[0].astype(jnp.float32)  # (H*Te, dk) — VMEM-local dequant
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, H*Te)
    # band + key-padding mask: column j belongs to head j // Te
    row = jax.lax.broadcasted_iota(jnp.int32, (H, H * Te), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, H * Te), 1)
    on_band = col // Te == row
    key_ok = jnp.broadcast_to(mask_ref[0], (H, H * Te))
    s = jnp.where(on_band & key_ok, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)  # off-band probs underflow to exactly 0
    v = v_ref[0].astype(jnp.float32)
    o_ref[0] = jax.lax.dot_general(
        p, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (H, dk)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_cross_attention(
    q: jax.Array,  # (B, H, dk) query at one decode position (f32/bf16)
    k: jax.Array,  # (B, H, Te, dk) int8 | bf16 | f32
    v: jax.Array,  # (B, H, Te, dk)
    mask: jax.Array,  # (B, Te) bool, True = attend
    k_scale: Optional[jax.Array] = None,  # (B, H, dk) channel scales (int8)
    v_scale: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, H*dk) f32 — semantics of models/t5.py::_attend_one with a
    key-padding mask (no bias: T5 cross-attention carries none)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Te, dk = k.shape
    qs = q.astype(jnp.float32)
    if k_scale is not None:
        qs = qs * k_scale.astype(jnp.float32)
    k2 = k.reshape(B, H * Te, dk)
    v2 = v.reshape(B, H * Te, dk)

    out = pl.pallas_call(
        functools.partial(_kernel, n_heads=H, seq_len=Te),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * Te, dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H * Te, dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            # (B, 1, H*Te) layout keeps the block's trailing dims Mosaic-tileable
            pl.BlockSpec((1, 1, H * Te), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, dk), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, dk), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * H * Te * dk,
            bytes_accessed=2 * B * H * Te * dk * k.dtype.itemsize,
            transcendentals=B * H * H * Te,
        ),
        interpret=interpret,
    )(qs, k2, v2, jnp.tile(mask, (1, H))[:, None, :])
    if v_scale is not None:
        out = out * v_scale.astype(jnp.float32)
    return out.reshape(B, H * dk)
