"""Fused (flash) attention for encoder self-attention on TPU.

The XLA attention path (`models/t5.py::_attend`) materializes the (B, H, T, T)
score and probability matrices in HBM — at T=512, B=128 that is ~4.8 GB of
HBM traffic per encoder layer, several times the cost of the attention
matmuls themselves. This kernel streams K/V tiles through VMEM with the
standard online-softmax recurrence, so per layer only Q/K/V/O and (optionally)
a bf16 additive-bias tensor touch HBM.

Bias handling is what makes this T5-native:
  * T5's learned relative-position bias is batch-invariant — it is
    precomputed ONCE per encode as a (1, H, T, T) bf16 tensor (~6 MB at
    T=512) and streamed blockwise; vs the score matrices this is a 6x HBM
    reduction, and vs recomputing the bucket gather per (batch, head) block
    it wins because the table lookup has no MXU-friendly form.
  * Key-padding masks are applied in-kernel from the (B, T) bool mask.
  * `causal=True` masks upper-triangular positions (decoder prefill).

Inference-only: no custom VJP — training keeps the XLA path (the bias table
is trainable there). Numerics: scores and the softmax recurrence accumulate
in f32 (same as the XLA path); outputs cast back to the query dtype.

Replaces the hot loop of reference VT5 generation (src/VT5.py:278-287 runs
HF T5Attention, which materializes scores the same way torch-side).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def flash_wanted(min_len: int = 0, seq_len: int = 1 << 30) -> bool:
    """Shared engine gate: fused attention pays on a single TPU chip at
    sequence lengths past the measured crossover (multi-device runs keep the
    XLA path — pallas_call + GSPMD batch partitioning is not wired; training
    never calls this, the kernels have no VJP)."""
    return (
        jax.default_backend() == "tpu"
        and jax.device_count() == 1
        and seq_len >= min_len
    )


def _flash_kernel(
    q_ref,  # (1, 1, rep, bq, dh) — the KV group's `rep` query heads
    k_ref,  # (1, 1, bk, dh)
    v_ref,  # (1, 1, bk, dh)
    mask_ref,  # (1, 1, bk) bool key-padding mask
    bias_ref,  # (1, 1, rep, bq, bk) or None
    o_ref,  # (1, 1, rep, bq, dh)
    ml_ref,  # scratch (2, rep*bq, 128) f32: [0]=running max, [1]=denominator
    acc_ref,  # scratch (rep*bq, dh) f32 running numerator
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    rep: int,
):
    qi, kj = pl.program_id(2), pl.program_id(3)
    nk = pl.num_programs(3)
    R = rep * block_q

    @pl.when(kj == 0)
    def _init():
        ml_ref[0] = jnp.full((R, 128), NEG_INF, jnp.float32)
        ml_ref[1] = jnp.zeros((R, 128), jnp.float32)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # compute guard: in causal mode, blocks entirely above the diagonal are
    # skipped (their K/V index map also re-points at an already-fetched block,
    # so neither MXU work nor HBM streaming is spent on them)
    live = (kj * block_k <= qi * block_q + block_q - 1) if causal else True

    @pl.when(live)
    def _compute():
        # all `rep` query heads of this KV group attend the K/V tile in ONE
        # matmul — K/V stream from HBM once per group, not once per head
        q = q_ref[0, 0].reshape(R, q_ref.shape[-1])  # (rep*bq, dh)
        k = k_ref[0, 0]  # (bk, dh)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (rep*bq, bk) f32
        if scale != 1.0:
            s = s * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0].reshape(R, block_k).astype(jnp.float32)

        valid = jnp.broadcast_to(mask_ref[0], (R, block_k))
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0)
            q_pos = qi * block_q + row % block_q  # row r*bq+q is query qi*bq+q
            k_pos = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 1)
            valid = valid & (k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)

        m_old = ml_ref[0, :, :1]  # (R, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        # fully-masked-so-far rows keep exp(0)=1 garbage out of the accumulators
        alive = m_new > NEG_INF / 2
        p = jnp.where(alive, jnp.exp(s - m_new), 0.0)  # (R, bk)
        alpha = jnp.where(alive, jnp.exp(m_old - m_new), 0.0)  # (R, 1)

        ml_ref[1] = ml_ref[1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, dh)
        acc_ref[:] = acc_ref[:] * alpha + pv
        ml_ref[0] = jnp.broadcast_to(m_new, (R, 128))

    @pl.when(kj == nk - 1)
    def _emit():
        denom = jnp.maximum(ml_ref[1, :, :1], 1e-30)
        out = (acc_ref[:] / denom).astype(o_ref.dtype)
        o_ref[0, 0] = out.reshape(rep, block_q, o_ref.shape[-1])


@functools.partial(
    jax.jit, static_argnames=("scale", "causal", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,  # (B, Tq, H, dh)
    k: jax.Array,  # (B, Tk, H, dh)
    v: jax.Array,  # (B, Tk, H, dh)
    key_mask: Optional[jax.Array] = None,  # (B, Tk) bool, True = attend
    bias: Optional[jax.Array] = None,  # (1|B, H, Tq, Tk) additive (bf16 ok)
    scale: float = 1.0,
    causal: bool = False,
    block_q: int = 512,  # 512x512 measured fastest at T=512 on v5e (6.5 vs 7.1 ms/layer)
    block_k: int = 512,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns (B, Tq, H, dh) in q's dtype. Semantics match
    `models/t5.py::_attend(q, k, v, bias, mask)` with a key-padding mask.

    GQA: k/v may carry fewer heads than q (H % Hkv == 0); query head h reads
    kv head h // (H // Hkv) straight from HBM — no jnp.repeat inflation."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, Tq, H, dh = q.shape
    Tk = k.shape[1]
    Hkv = k.shape[2]
    assert H % Hkv == 0, f"query heads {H} not a multiple of kv heads {Hkv}"
    rep = H // Hkv
    bk = min(block_k, Tk)
    # the group fold makes the q/o blocks, score tiles, and scratch rep*bq
    # rows tall; shrink bq until the estimated VMEM footprint (double-buffered
    # blocks + f32 score/prob tiles + scratch) fits the ~16 MB budget —
    # without this, rep=8/dh=256 shapes (gemma rerankers) fail Mosaic
    # allocation by a few hundred KB
    bq = min(block_q, Tq)

    def _vmem(bq_):
        R_ = rep * bq_
        blocks = 2 * 2 * R_ * dh * q.dtype.itemsize  # q + o, double-buffered
        kv = 2 * 2 * bk * dh * k.dtype.itemsize
        tiles = 2 * R_ * bk * 4  # s and p in f32
        scratch = 2 * R_ * 128 * 4 + R_ * dh * 4
        bias_b = 2 * R_ * bk * (bias.dtype.itemsize if bias is not None else 0)
        return blocks + kv + tiles + scratch + bias_b

    while bq > 16 and _vmem(bq) > 14 * 2**20:
        bq //= 2
    # keep block rows sublane-aligned for any caller-supplied Tq (a 300-row
    # block halves to 150/75 — Mosaic would reject the tiling on real TPU);
    # 16 covers the bf16 (16, 128) min tile, and f32's (8, 128) divides it
    bq = max(16, bq - bq % 16)

    # pad sequence dims to block multiples (padded keys are masked off;
    # padded query rows are sliced away)
    pq = (-Tq) % bq
    pk = (-Tk) % bk
    if key_mask is None:
        key_mask = jnp.ones((B, Tk), bool)
    if pq or pk:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pk)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pq), (0, pk)))
    Tq_p, Tk_p = Tq + pq, Tk + pk

    # q grouped by KV head: (B, Hkv, rep, T, dh); k/v: (B, Hkv, T, dh). One
    # grid step covers a whole KV group, so each K/V tile streams from HBM
    # once per group (not once per query head).
    qT = jnp.transpose(q, (0, 2, 1, 3)).reshape(B, Hkv, rep, Tq_p, dh)
    kT = jnp.transpose(k, (0, 2, 1, 3))
    vT = jnp.transpose(v, (0, 2, 1, 3))

    nq, nk = Tq_p // bq, Tk_p // bk
    if causal:
        # blocks above the diagonal re-point at the previous (already live)
        # K/V tile: no DMA, and the kernel's `live` guard skips their compute
        kv_j = lambda i, j: jnp.minimum(j, (i * bq + bq - 1) // bk)
    else:
        kv_j = lambda i, j: j

    grid = (B, Hkv, nq, nk)
    in_specs = [
        pl.BlockSpec((1, 1, rep, bq, dh), lambda b, g, i, j: (b, g, 0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda b, g, i, j: (b, g, kv_j(i, j), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda b, g, i, j: (b, g, kv_j(i, j), 0), memory_space=pltpu.VMEM),
        # (B, 1, Tk) layout keeps the block's trailing dims Mosaic-tileable
        pl.BlockSpec((1, 1, bk), lambda b, g, i, j: (b, 0, j), memory_space=pltpu.VMEM),
    ]
    args = [qT, kT, vT, key_mask[:, None, :]]
    if bias is not None:
        bb = bias.shape[0]  # 1 = batch-shared (T5 rel-pos), B = per-sample
        bias5 = bias.reshape(bb, Hkv, rep, Tq_p, Tk_p)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rep, bq, bk),
                (lambda b, g, i, j: (0, g, 0, i, j)) if bb == 1 else (lambda b, g, i, j: (b, g, 0, i, j)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias5)

    kernel = functools.partial(
        _flash_kernel if bias is not None else _flash_kernel_nobias,
        scale=scale, causal=causal, block_q=bq, block_k=bk, rep=rep,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, rep, bq, dh), lambda b, g, i, j: (b, g, 0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, rep, Tq_p, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rep * bq, 128), jnp.float32),
            pltpu.VMEM((rep * bq, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq_p * Tk_p * dh,
            bytes_accessed=(
                B * (H * Tq_p + 2 * Hkv * Tk_p) * dh * q.dtype.itemsize
                + (H * Tq_p * Tk_p * bias.dtype.itemsize if bias is not None else 0)
                + B * H * Tq_p * dh * q.dtype.itemsize
            ),
            transcendentals=B * H * Tq_p * Tk_p,
        ),
        interpret=interpret,
    )(*args)
    out = jnp.transpose(out.reshape(B, H, Tq_p, dh), (0, 2, 1, 3))
    return out[:, :Tq] if pq else out


def _flash_kernel_nobias(q_ref, k_ref, v_ref, mask_ref, o_ref, ml_ref, acc_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, mask_ref, None, o_ref, ml_ref, acc_ref, **kw)


def attention_reference(q, k, v, key_mask=None, bias=None, scale=1.0, causal=False):
    """jnp oracle with identical semantics (for tests and the non-TPU path).

    Fully-masked query rows (no valid key) emit ZEROS — matching the kernel's
    online-softmax recurrence, which never accumulates for such rows. (A plain
    softmax would emit the uniform average of V instead; engine callers always
    have >= 1 valid key, so the choice only pins down the oracle contract.)"""
    if k.shape[2] != q.shape[2]:  # GQA
        rep = q.shape[2] // k.shape[2]
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    if scale != 1.0:
        s = s * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    Tq, Tk = q.shape[1], k.shape[1]
    valid = jnp.ones((1, 1, Tq, Tk), bool)
    if key_mask is not None:
        valid = valid & key_mask[:, None, None, :]
    if causal:
        valid = valid & (jnp.arange(Tk)[None, :] <= jnp.arange(Tq)[:, None])[None, None]
    s = jnp.where(valid, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    p = jnp.where(jnp.any(valid, axis=-1, keepdims=True), p, 0.0).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)
