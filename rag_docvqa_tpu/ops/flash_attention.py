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

Differentiable: a custom VJP implements the standard recompute-based flash
backward (two passes — dK/dV with query-block accumulation, dQ with key-block
accumulation; the forward saves only O and the per-row logsumexp). The
additive-bias gradient (T5's trainable rel-pos table arrives batch-shared)
is accumulated across batch and key blocks inside the dQ pass, so training
never materializes the (B, H, T, T) probability tensor either. Numerics:
scores and the softmax recurrence accumulate in f32 (same as the XLA path);
outputs cast back to the query dtype.

Multi-device: two paths.
  * shard_map — inside shard_map each device runs the kernel on its local
    batch/head shard with no cross-device traffic (the only cross-shard
    reduction, the batch-summed bias gradient, is produced per shard and
    reduced by the caller's ordinary gradient psum).
  * plain jit over GSPMD-sharded operands (how the engines and the Trainer
    run) — Mosaic kernels are opaque to the auto-partitioner, which would
    otherwise all-gather the operands and replicate the full kernel per
    device. custom_partitioning wrappers (below) declare the call
    partitionable over the batch and KV-head dims, so each device runs its
    local shard; the batch-summed bias gradient gets one psum.

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
    """Shared engine gate: fused attention pays on TPU at sequence lengths
    past the measured crossover. Multi-device runs keep it too — the kernel
    is differentiable (custom VJP below) and GSPMD-partitionable over batch
    and KV-head dims (custom_partitioning below), so sharded jit programs
    run it per-shard instead of replicating it."""
    return jax.default_backend() == "tpu" and seq_len >= min_len


def _flash_kernel(
    q_ref,  # (1, 1, rep, bq, dh) — the KV group's `rep` query heads
    k_ref,  # (1, 1, bk, dh)
    v_ref,  # (1, 1, bk, dh)
    mask_ref,  # (1, 1, bk) bool key-padding mask
    bias_ref,  # (1, 1, rep, bq, bk) or None
    o_ref,  # (1, 1, rep, bq, dh)
    lse_ref,  # (1, 1, rep, bq, 1) f32 per-row logsumexp (backward residual)
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
        m = ml_ref[0, :, :1]
        denom = jnp.maximum(ml_ref[1, :, :1], 1e-30)
        out = (acc_ref[:] / denom).astype(o_ref.dtype)
        o_ref[0, 0] = out.reshape(rep, block_q, o_ref.shape[-1])
        alive = m > NEG_INF / 2
        lse = jnp.where(alive, m + jnp.log(denom), NEG_INF)
        # (R, 1) -> (rep, bq, 1): sublane-only split (a trailing singleton
        # lane everywhere — lane-collapsing reshapes are unsupported Mosaic
        # shape casts for rep > 1)
        lse_ref[0, 0] = lse.reshape(rep, block_q, 1)


def _flash_kernel_nobias(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, ml_ref, acc_ref, **kw):
    _flash_kernel(q_ref, k_ref, v_ref, mask_ref, None, o_ref, lse_ref, acc_ref=acc_ref, ml_ref=ml_ref, **kw)


def _flash_kernel_single(
    q_ref, k_ref, v_ref, mask_ref, bias_ref, o_ref, lse_ref,
    *, scale: float, causal: bool, block_q: int, block_k: int, rep: int,
    rows: int = 1,
):
    """Single-K-block fast path (nk == 1: the whole key axis fits one block —
    the common encoder case at T <= block_k). One plain softmax pass, no
    running-max/denominator scratch, no revisit bookkeeping.

    Grid is (Hkv, nq, B/rows) with BATCH INNERMOST: the batch-shared T5
    rel-pos bias block's index is then constant across consecutive grid
    steps, so Mosaic skips its re-fetch — at B=128 H=12 T=512 that cuts bias
    DMA from ~786 MB to ~6 MB per layer (the bias tile was half of every
    step's streamed bytes). `rows` batch rows per step (unrolled loop)
    amortize the fixed per-grid-step overhead."""
    qi = pl.program_id(1)
    R = rep * block_q
    bias = None
    if bias_ref is not None:
        bias = bias_ref[0, 0].reshape(R, block_k)
        if bias.dtype != jnp.float32:
            bias = bias.astype(jnp.float32)
    for i in range(rows):
        q = q_ref[i, 0].reshape(R, q_ref.shape[-1])
        k = k_ref[i, 0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, bk) f32
        if scale != 1.0:
            s = s * scale
        if bias is not None:
            s = s + bias
        if causal:
            valid = jnp.broadcast_to(mask_ref[i], (R, block_k))
            row = jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 0)
            q_pos = qi * block_q + row % block_q
            k_pos = jax.lax.broadcasted_iota(jnp.int32, (R, block_k), 1)
            s = jnp.where(valid & (k_pos <= q_pos), s, NEG_INF)
        else:
            # key-pad mask as a (1, bk) additive vector: one cheap select on
            # 1 row + a broadcast add, instead of a (R, bk) broadcast+select
            s = s + jnp.where(mask_ref[i], 0.0, NEG_INF)
        # clamping the row max keeps exp(s - m) underflowing to exactly 0 for
        # fully-masked rows (s = -1e30, m = -5e29 -> exp(-5e29) = 0), so the
        # zeros-for-masked-rows contract holds with no (R, bk) `alive` select
        m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), NEG_INF * 0.5)  # (R, 1)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[i, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, dh)
        out = (pv / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[i, 0] = out.reshape(rep, block_q, o_ref.shape[-1])
        # fully-masked rows: m is the -5e29 clamp and l = 0, so lse lands
        # below NEG_INF/2 — the backward's `alive` guard still rejects them
        lse = m + jnp.log(jnp.maximum(l, 1e-30))
        lse_ref[i, 0] = lse.reshape(rep, block_q, 1)


def _flash_kernel_single_nobias(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref, **kw):
    _flash_kernel_single(q_ref, k_ref, v_ref, mask_ref, None, o_ref, lse_ref, **kw)


def _pick_block_q(block_q, Tq, vmem_fn, budget=14 * 2**20):
    """Shrink the query-block rows until the estimated VMEM footprint fits,
    then round to a sublane-aligned multiple of 16 (a 300-row block halves to
    150/75 — Mosaic would reject the tiling on real TPU)."""
    bq = min(block_q, Tq)
    while bq > 16 and vmem_fn(bq) > budget:
        bq //= 2
    return max(16, bq - bq % 16)


def _fwd_call_single(qT, kT, vT, maskB, bias5, *, scale, causal, bq, bk, rep, interpret):
    """Forward dispatch for nk == 1 (whole key axis in one block): the
    no-scratch single-pass kernel on a (Hkv, nq, B) grid — batch innermost so
    the batch-shared bias block is fetched once per (head, q-block), not once
    per batch row (see _flash_kernel_single)."""
    B, Hkv, _, Tq_p, dh = qT.shape
    Tk_p = kT.shape[2]
    H = Hkv * rep
    nq = Tq_p // bq

    # batch rows per grid step: amortize fixed per-step overhead while the
    # in-flight f32 score/prob tiles (~rep*bq*bk*8 bytes per row) fit VMEM.
    # Per-sample bias (bb == B) keeps rows=1 — its block is indexed per row.
    rows = 1
    tile_bytes = rep * bq * bk * 8 + 4 * bq * dh * qT.dtype.itemsize
    if bias5 is None or bias5.shape[0] == 1:
        for r in (4, 2):
            if B % r == 0 and r * tile_bytes < 8 * 2**20:
                rows = r
                break

    grid = (Hkv, nq, B // rows)
    in_specs = [
        pl.BlockSpec((rows, 1, rep, bq, dh), lambda g, i, b: (b, g, 0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, bk, dh), lambda g, i, b: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, bk, dh), lambda g, i, b: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, 1, bk), lambda g, i, b: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [qT, kT, vT, maskB]
    if bias5 is not None:
        bb = bias5.shape[0]
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rep, bq, bk),
                # bb == 1 (batch-shared): index constant in b -> one DMA per
                # (head, q-block); bb == B (per-sample): streams per row
                (lambda g, i, b: (0, g, 0, i, 0)) if bb == 1 else (lambda g, i, b: (b, g, 0, i, 0)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias5)

    kernel = functools.partial(
        _flash_kernel_single if bias5 is not None else _flash_kernel_single_nobias,
        scale=scale, causal=causal, block_q=bq, block_k=bk, rep=rep, rows=rows,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rows, 1, rep, bq, dh), lambda g, i, b: (b, g, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, rep, bq, 1), lambda g, i, b: (b, g, 0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, rep, Tq_p, dh), qT.dtype),
            jax.ShapeDtypeStruct((B, Hkv, rep, Tq_p, 1), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq_p * Tk_p * dh,
            bytes_accessed=(
                B * (H * Tq_p + 2 * Hkv * Tk_p) * dh * qT.dtype.itemsize
                + (Hkv * rep * Tq_p * Tk_p * bias5.dtype.itemsize if bias5 is not None else 0)
                + B * H * Tq_p * dh * qT.dtype.itemsize
            ),
            transcendentals=B * H * Tq_p * Tk_p,
        ),
        interpret=interpret,
    )(*args)
    return out, lse


def _fwd_call_impl(qT, kT, vT, maskB, bias5, *, scale, causal, bq, bk, rep, interpret):
    """Forward pallas dispatch on grouped tensors.

    qT (B, Hkv, rep, Tq, dh) / kT, vT (B, Hkv, Tk, dh) / maskB (B, 1, Tk) /
    bias5 (1|B, Hkv, rep, Tq, Tk) or None. Returns (out (B, Hkv, rep, Tq, dh),
    lse (B, Hkv, rep, Tq) f32). Tq, Tk must be block multiples."""
    B, Hkv, _, Tq_p, dh = qT.shape
    Tk_p = kT.shape[2]
    H = Hkv * rep
    nq, nk = Tq_p // bq, Tk_p // bk
    if nk == 1:
        return _fwd_call_single(qT, kT, vT, maskB, bias5,
                                scale=scale, causal=causal, bq=bq, bk=bk,
                                rep=rep, interpret=interpret)
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
    args = [qT, kT, vT, maskB]
    if bias5 is not None:
        bb = bias5.shape[0]  # 1 = batch-shared (T5 rel-pos), B = per-sample
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rep, bq, bk),
                (lambda b, g, i, j: (0, g, 0, i, j)) if bb == 1 else (lambda b, g, i, j: (b, g, 0, i, j)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias5)

    kernel = functools.partial(
        _flash_kernel if bias5 is not None else _flash_kernel_nobias,
        scale=scale, causal=causal, block_q=bq, block_k=bk, rep=rep,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, rep, bq, dh), lambda b, g, i, j: (b, g, 0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, bq, 1), lambda b, g, i, j: (b, g, 0, i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hkv, rep, Tq_p, dh), qT.dtype),
            jax.ShapeDtypeStruct((B, Hkv, rep, Tq_p, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rep * bq, 128), jnp.float32),
            pltpu.VMEM((rep * bq, dh), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * Tq_p * Tk_p * dh,
            bytes_accessed=(
                B * (H * Tq_p + 2 * Hkv * Tk_p) * dh * qT.dtype.itemsize
                + (H * Tq_p * Tk_p * bias5.dtype.itemsize if bias5 is not None else 0)
                + B * H * Tq_p * dh * qT.dtype.itemsize
            ),
            transcendentals=B * H * Tq_p * Tk_p,
        ),
        interpret=interpret,
    )(*args)
    return out, lse


# --------------------------------------------------------------------------- #
# backward kernels (standard recompute-based flash backward)
# --------------------------------------------------------------------------- #
def _recompute_p_gs(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref,
                    bias_ref, *, scale, causal, bq, bk, rep, qi, kj):
    """Shared backward tile math: recompute p from (q, k, bias, lse), then
    g_s = p * (dp - D) — the gradient w.r.t. the post-scale scores."""
    R = rep * bq
    dh = q_ref.shape[-1]
    q = q_ref[0, 0].reshape(R, dh)
    do = do_ref[0, 0].reshape(R, dh)
    # (rep, bq, 1) -> (R, 1): sublane-only merges (lane stays singleton)
    lse = lse_ref[0, 0].reshape(R, 1)
    dd = dd_ref[0, 0].reshape(R, 1)
    k = k_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        s = s * scale
    if bias_ref is not None:
        s = s + bias_ref[0, 0].reshape(R, bk).astype(jnp.float32)
    valid = jnp.broadcast_to(mask_ref[0], (R, bk))
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (R, bk), 0)
        q_pos = qi * bq + row % bq
        k_pos = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (R, bk), 1)
        valid = valid & (k_pos <= q_pos)
    alive = lse > NEG_INF / 2  # guards fully-masked rows (lse = -inf)
    p = jnp.where(valid & alive, jnp.exp(s - lse), 0.0)  # (R, bk) f32
    dp = jax.lax.dot_general(
        do, v_ref[0, 0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (R, bk)
    gs = p * (dp - dd)
    return q, do, p, gs


def _flash_bwd_dkv_kernel(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref, bias_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, causal, bq, bk, rep,
):
    """grid (B, Hkv, nk, nq): for each K/V tile, accumulate dK/dV over all
    query blocks; emit at the last query block."""
    kj, qi = pl.program_id(2), pl.program_id(3)
    ni = pl.num_programs(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    live = (qi * bq + bq - 1 >= kj * bk) if causal else True

    @pl.when(live)
    def _compute():
        q, do, p, gs = _recompute_p_gs(
            q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref, bias_ref,
            scale=scale, causal=causal, bq=bq, bk=bk, rep=rep, qi=qi, kj=kj,
        )
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, dh)
        dk_acc[:] += jax.lax.dot_general(
            gs.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, dh)

    @pl.when(qi == ni - 1)
    def _emit():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_dkv_kernel_single(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref, bias_ref,
    dk_ref, dv_ref,
    *, scale, causal, bq, bk, rep,
):
    """nq == 1 dK/dV: the whole query axis is one block, so each K/V tile's
    gradient completes in a single grid step — no scratch accumulators. Grid
    (Hkv, nk, B), batch innermost (bias-block reuse, see _bwd_call)."""
    kj = pl.program_id(1)
    q, do, p, gs = _recompute_p_gs(
        q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref, bias_ref,
        scale=scale, causal=causal, bq=bq, bk=bk, rep=rep, qi=0, kj=kj,
    )
    dv_ref[0, 0] = jax.lax.dot_general(
        p.astype(do.dtype), do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dk_ref[0, 0] = (jax.lax.dot_general(
        gs.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale).astype(dk_ref.dtype)


def _dkv_single_nobias(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref,
                       dk_ref, dv_ref, **kw):
    _flash_bwd_dkv_kernel_single(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref,
                                 mask_ref, None, dk_ref, dv_ref, **kw)


def _flash_bwd_dq_kernel(
    q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref, bias_ref,
    dq_ref, dbias_ref, dq_acc,
    *, scale, causal, bq, bk, rep, bias_batched,
):
    """grid (Hkv, nq, B, nk): for each query block, accumulate dQ over key
    blocks. The batch-shared bias gradient accumulates IN the output block
    across both the key and batch grid axes (its block index depends only on
    (g, i), so revisits are consecutive and the TPU's sequential grid makes
    read-modify-write accumulation exact)."""
    qi, b, kj = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    nb, nk = pl.num_programs(2), pl.num_programs(3)
    R = rep * bq

    @pl.when(kj == 0)
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if dbias_ref is not None and not bias_batched:
        @pl.when((b == 0) & (kj == 0))
        def _init_dbias():
            dbias_ref[...] = jnp.zeros(dbias_ref.shape, dbias_ref.dtype)

    live = (kj * bk <= qi * bq + bq - 1) if causal else True

    if dbias_ref is not None and bias_batched and causal:
        # per-sample bias blocks map 1:1 to grid steps; steps above the
        # causal diagonal skip _compute, so their output blocks must be
        # zeroed explicitly — on real TPU an unwritten HBM block is garbage
        # (interpret mode zero-fills, which hid this)
        @pl.when(jnp.logical_not(live))
        def _zero_dead_dbias():
            dbias_ref[0, 0] = jnp.zeros(dbias_ref.shape[2:], dbias_ref.dtype)

    @pl.when(live)
    def _compute():
        q, do, p, gs = _recompute_p_gs(
            q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref, bias_ref,
            scale=scale, causal=causal, bq=bq, bk=bk, rep=rep, qi=qi, kj=kj,
        )
        dq_acc[:] += jax.lax.dot_general(
            gs.astype(k_ref.dtype), k_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, dh)
        if dbias_ref is not None:
            if bias_batched:
                dbias_ref[0, 0] = gs.reshape(rep, bq, bk)
            else:
                dbias_ref[0, :, :, pl.ds(kj * bk, bk)] += gs.reshape(rep, bq, bk)

    @pl.when(kj == nk - 1)
    def _emit():
        dq_ref[0, 0] = (dq_acc[:] * scale).reshape(rep, bq, dq_ref.shape[-1]).astype(dq_ref.dtype)


def _bwd_call_impl(res, g, *, scale, causal, rep, interpret, block_q=512, block_k=512):
    """Dispatch the two backward kernels; returns (dq, dk, dv, dbias?) on the
    grouped layouts. Chooses its own block sizes — the _vmem estimator
    shrinks block_q when the backward's larger live set would not fit (e.g.
    rep-folded GQA shapes); at T5-encoder shapes bq=512 holds, which enables
    the single-query-block dK/dV pass below."""
    qT, kT, vT, maskB, bias5, out, lse = res
    B, Hkv, _, Tq_p, dh = qT.shape
    Tk_p = kT.shape[2]
    H = Hkv * rep
    bb = bias5.shape[0] if bias5 is not None else 0
    esz = qT.dtype.itemsize

    bk = min(block_k, Tk_p)

    def _vmem(bq_):
        R_ = rep * bq_
        blocks = 2 * 2 * 2 * R_ * dh * esz  # q, do (+ dq out), double-buffered
        kv = 2 * 2 * bk * dh * esz
        tiles = 4 * R_ * bk * 4  # s, p, dp, gs in f32
        scratch = R_ * dh * 4 + 2 * bk * dh * 4
        bias_b = 2 * R_ * bk * (bias5.dtype.itemsize if bias5 is not None else 0)
        dbias_b = rep * bq_ * Tk_p * 4 if (bias5 is not None and bb == 1) else 0
        return blocks + kv + tiles + scratch + bias_b + dbias_b

    bq = _pick_block_q(block_q, Tq_p, _vmem)
    # backward tiles must divide the (already block-padded) forward shapes
    while Tq_p % bq:
        bq //= 2
    while Tk_p % bk:
        bk //= 2
    nq, nk = Tq_p // bq, Tk_p // bk

    # D = rowsum(dO * O), the only residual beyond (O, lse); trailing
    # singleton keeps every in-kernel reshape sublane-only
    dd = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True)
    do = g.astype(qT.dtype)

    cost = pl.CostEstimate(
        flops=10 * B * H * Tq_p * Tk_p * dh,
        bytes_accessed=3 * B * (H * Tq_p + Hkv * Tk_p) * dh * esz,
        transcendentals=2 * B * H * Tq_p * Tk_p,
    )

    # ---- pass 1: dK/dV ----------------------------------------------------
    if nq == 1:
        # single query block: no accumulation over query tiles, so the grid
        # reorders to (Hkv, nk, B) with batch innermost — the batch-shared
        # bias block index is then constant across consecutive steps and
        # Mosaic fetches it once per (head, key-block) instead of once per
        # batch row (same trick as the forward _fwd_call_single)
        dkv_in_specs = [
            pl.BlockSpec((1, 1, rep, bq, dh), lambda g_, j, b: (b, g_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, bq, dh), lambda g_, j, b: (b, g_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, bq, 1), lambda g_, j, b: (b, g_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rep, bq, 1), lambda g_, j, b: (b, g_, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), lambda g_, j, b: (b, g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), lambda g_, j, b: (b, g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk), lambda g_, j, b: (b, 0, j), memory_space=pltpu.VMEM),
        ]
        dkv_args = [qT, do, lse, dd, kT, vT, maskB]
        if bias5 is not None:
            dkv_in_specs.append(
                pl.BlockSpec(
                    (1, 1, rep, bq, bk),
                    (lambda g_, j, b: (0, g_, 0, 0, j)) if bb == 1
                    else (lambda g_, j, b: (b, g_, 0, 0, j)),
                    memory_space=pltpu.VMEM,
                )
            )
            dkv_args.append(bias5)
        dkv_kernel_s = functools.partial(
            _flash_bwd_dkv_kernel_single if bias5 is not None else _dkv_single_nobias,
            scale=scale, causal=causal, bq=bq, bk=bk, rep=rep,
        )
        dk, dv = pl.pallas_call(
            dkv_kernel_s,
            grid=(Hkv, nk, B),
            in_specs=dkv_in_specs,
            out_specs=(
                pl.BlockSpec((1, 1, bk, dh), lambda g_, j, b: (b, g_, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bk, dh), lambda g_, j, b: (b, g_, j, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(kT.shape, kT.dtype),
                jax.ShapeDtypeStruct(vT.shape, vT.dtype),
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(*dkv_args)
        return _dq_pass(res, do, lse, dd, dk, dv, scale=scale, causal=causal,
                        rep=rep, interpret=interpret, bq=bq, bk=bk, nq=nq, nk=nk, cost=cost)

    if causal:
        q_i = lambda j, i: jnp.maximum(i, (j * bk) // bq)  # skip dead DMA
    else:
        q_i = lambda j, i: i
    in_specs = [
        pl.BlockSpec((1, 1, rep, bq, dh), lambda b, g_, j, i: (b, g_, 0, q_i(j, i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rep, bq, dh), lambda b, g_, j, i: (b, g_, 0, q_i(j, i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rep, bq, 1), lambda b, g_, j, i: (b, g_, 0, q_i(j, i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rep, bq, 1), lambda b, g_, j, i: (b, g_, 0, q_i(j, i), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda b, g_, j, i: (b, g_, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda b, g_, j, i: (b, g_, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk), lambda b, g_, j, i: (b, 0, j), memory_space=pltpu.VMEM),
    ]
    args = [qT, do, lse, dd, kT, vT, maskB]
    if bias5 is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rep, bq, bk),
                (lambda b, g_, j, i: (0, g_, 0, q_i(j, i), j)) if bb == 1
                else (lambda b, g_, j, i: (b, g_, 0, q_i(j, i), j)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias5)

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel if bias5 is not None else _dkv_nobias,
        scale=scale, causal=causal, bq=bq, bk=bk, rep=rep,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B, Hkv, nk, nq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, bk, dh), lambda b, g_, j, i: (b, g_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bk, dh), lambda b, g_, j, i: (b, g_, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(kT.shape, kT.dtype),
            jax.ShapeDtypeStruct(vT.shape, vT.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    return _dq_pass(res, do, lse, dd, dk, dv, scale=scale, causal=causal,
                    rep=rep, interpret=interpret, bq=bq, bk=bk, nq=nq, nk=nk, cost=cost)


def _dq_pass(res, do, lse, dd, dk, dv, *, scale, causal, rep, interpret, bq, bk, nq, nk, cost):
    """Pass 2: dQ (+ dbias), grid (Hkv, nq, B, nk). The batch-shared bias
    gradient's output block index depends only on (g, i), so its (batch,
    key-block) revisits are consecutive and accumulate in place."""
    qT, kT, vT, maskB, bias5, out, lse_res = res
    B, Hkv, _, Tq_p, dh = qT.shape
    Tk_p = kT.shape[2]
    bb = bias5.shape[0] if bias5 is not None else 0
    if causal:
        kv_j = lambda i, j: jnp.minimum(j, (i * bq + bq - 1) // bk)
    else:
        kv_j = lambda i, j: j
    in_specs = [
        pl.BlockSpec((1, 1, rep, bq, dh), lambda g_, i, b, j: (b, g_, 0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rep, bq, dh), lambda g_, i, b, j: (b, g_, 0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rep, bq, 1), lambda g_, i, b, j: (b, g_, 0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, rep, bq, 1), lambda g_, i, b, j: (b, g_, 0, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda g_, i, b, j: (b, g_, kv_j(i, j), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dh), lambda g_, i, b, j: (b, g_, kv_j(i, j), 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk), lambda g_, i, b, j: (b, 0, j), memory_space=pltpu.VMEM),
    ]
    args = [qT, do, lse, dd, kT, vT, maskB]
    out_specs = [
        pl.BlockSpec((1, 1, rep, bq, dh), lambda g_, i, b, j: (b, g_, 0, i, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct(qT.shape, qT.dtype)]
    if bias5 is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 1, rep, bq, bk),
                (lambda g_, i, b, j: (0, g_, 0, i, j)) if bb == 1
                else (lambda g_, i, b, j: (b, g_, 0, i, j)),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias5)
        if bb == 1:
            # batch-shared bias: accumulate over (batch, key blocks) in-place
            out_specs.append(
                pl.BlockSpec((1, rep, bq, Tk_p), lambda g_, i, b, j: (g_, 0, i, 0), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((Hkv, rep, Tq_p, Tk_p), jnp.float32))
        else:
            out_specs.append(
                pl.BlockSpec((1, 1, rep, bq, bk), lambda g_, i, b, j: (b, g_, 0, i, j), memory_space=pltpu.VMEM)
            )
            out_shape.append(jax.ShapeDtypeStruct((B, Hkv, rep, Tq_p, Tk_p), jnp.float32))

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel if bias5 is not None else _dq_nobias,
        scale=scale, causal=causal, bq=bq, bk=bk, rep=rep, bias_batched=bb == B and bb != 1,
    )
    outs = pl.pallas_call(
        dq_kernel,
        grid=(Hkv, nq, B, nk),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((rep * bq, dh), jnp.float32)],
        cost_estimate=cost,
        interpret=interpret,
    )(*args)
    if bias5 is None:
        dq = outs[0] if isinstance(outs, (tuple, list)) else outs
        return dq, dk, dv, None
    dq, dbias = outs
    if bb == 1:
        dbias = dbias[None]  # (1, Hkv, rep, Tq, Tk)
    return dq, dk, dv, dbias.astype(bias5.dtype)


def _dkv_nobias(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, **kw):
    _flash_bwd_dkv_kernel(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref,
                          None, dk_ref, dv_ref, dk_acc, dv_acc, **kw)


def _dq_nobias(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref,
               dq_ref, dq_acc, **kw):
    _flash_bwd_dq_kernel(q_ref, do_ref, lse_ref, dd_ref, k_ref, v_ref, mask_ref,
                         None, dq_ref, None, dq_acc, **kw)


# --------------------------------------------------------------------------- #
# GSPMD partitioning: Mosaic kernels are opaque to the auto-sharding
# partitioner — under plain jit with mesh-sharded operands XLA would insert
# all-gathers and run the FULL kernel replicated on every device. The
# custom_partitioning wrappers below declare the kernel partitionable over
# the batch (dim 0) and KV-head (dim 1) axes: each device runs the pallas
# call on its local (B/n, Hkv/m) shard, with the single cross-shard
# reduction (the batch-summed rel-pos bias gradient) done with one psum.
# Inside shard_map the kernel is already manually sharded, so the wrapper
# steps aside (manual_axes is non-empty there).
# --------------------------------------------------------------------------- #
def _auto_partition_wanted() -> bool:
    if jax.device_count() == 1:
        return False
    m = jax.sharding.get_abstract_mesh()
    return not getattr(m, "manual_axes", ())


def _axis_size(mesh, entry) -> int:
    names = entry if isinstance(entry, tuple) else (entry,)
    n = 1
    for a in names:
        n *= mesh.shape[a]
    return n


def _bg_of(mesh, q_info):
    """Usable (batch, kv-head) mesh axes from q's propagated sharding
    (qT: (B, Hkv, rep, Tq, dh)); an axis is kept only when it divides the
    corresponding dim (otherwise that dim reshards to replicated)."""
    from jax.sharding import NamedSharding

    sh = q_info.sharding
    if not isinstance(sh, NamedSharding):
        return None, None
    spec = sh.spec
    B, Hkv = q_info.shape[0], q_info.shape[1]
    b = spec[0] if len(spec) > 0 else None
    g = spec[1] if len(spec) > 1 else None
    if b is not None and B % _axis_size(mesh, b):
        b = None
    if g is not None and Hkv % _axis_size(mesh, g):
        g = None
    return b, g


@functools.lru_cache(maxsize=None)
def _make_fwd_cp(has_bias, bias_batched, scale, causal, bq, bk, rep, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(scale=scale, causal=causal, bq=bq, bk=bk, rep=rep, interpret=interpret)

    if has_bias:
        fn = custom_partitioning(lambda q, k, v, m, b: _fwd_call_impl(q, k, v, m, b, **kw))
        zb = "b" if bias_batched else "z"
        rule = f"b g r q d, b g t d, b g t d, b u t, {zb} g r q t -> b g r q d, b g r q i"
    else:
        fn = custom_partitioning(lambda q, k, v, m: _fwd_call_impl(q, k, v, m, None, **kw))
        rule = "b g r q d, b g t d, b g t d, b u t -> b g r q d, b g r q i"

    def _shardings(mesh, arg_infos):
        b, g = _bg_of(mesh, arg_infos[0])
        qs = NamedSharding(mesh, P(b, g, None, None, None))
        kvs = NamedSharding(mesh, P(b, g, None, None))
        ms = NamedSharding(mesh, P(b, None, None))
        args = [qs, kvs, kvs, ms]
        if has_bias:
            args.append(NamedSharding(mesh, P(b if bias_batched else None, g, None, None, None)))
        return tuple(args), (qs, qs)

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[1]

    def part(mesh, arg_infos, result_infos):
        arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            a = args if has_bias else (*args, None)
            return _fwd_call_impl(*a, **kw)

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def _make_bwd_cp(has_bias, bias_batched, scale, causal, rep, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    kw = dict(scale=scale, causal=causal, rep=rep, interpret=interpret)

    def _impl(qT, kT, vT, maskB, bias5, out, lse, do):
        res = (qT, kT, vT, maskB, bias5, out, lse)
        dq, dk, dv, dbias = _bwd_call_impl(res, do, **kw)
        return (dq, dk, dv, dbias) if has_bias else (dq, dk, dv)

    if has_bias:
        fn = custom_partitioning(lambda q, k, v, m, b, o, l, g: _impl(q, k, v, m, b, o, l, g))
        zb = "b" if bias_batched else "z"
        rule = (f"b g r q d, b g t d, b g t d, b u t, {zb} g r q t, b g r q d, "
                f"b g r q i, b g r q d -> b g r q d, b g t d, b g t d, {zb} g r q t")
    else:
        fn = custom_partitioning(lambda q, k, v, m, o, l, g: _impl(q, k, v, m, None, o, l, g))
        rule = ("b g r q d, b g t d, b g t d, b u t, b g r q d, b g r q i, "
                "b g r q d -> b g r q d, b g t d, b g t d")

    def _shardings(mesh, arg_infos):
        b, g = _bg_of(mesh, arg_infos[0])
        qs = NamedSharding(mesh, P(b, g, None, None, None))
        kvs = NamedSharding(mesh, P(b, g, None, None))
        ms = NamedSharding(mesh, P(b, None, None))
        args = [qs, kvs, kvs, ms]
        outs = [qs, kvs, kvs]
        if has_bias:
            bs = NamedSharding(mesh, P(b if bias_batched else None, g, None, None, None))
            args.append(bs)
            outs.append(bs)
        args += [qs, qs, qs]  # out, lse, do
        return b, tuple(args), tuple(outs)

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[2]

    def part(mesh, arg_infos, result_infos):
        b, arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            if has_bias:
                outs = _impl(*args)
                if b is not None and not bias_batched:
                    # batch-shared bias: each shard reduced over its LOCAL
                    # batch only — one psum completes the sum (then every
                    # shard holds the full dbias, matching its replicated-
                    # over-b output sharding)
                    dq, dk, dv, dbias = outs
                    outs = (dq, dk, dv, jax.lax.psum(dbias, b))
                return outs
            return _impl(args[0], args[1], args[2], args[3], args[4], args[5], args[6])

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


def _fwd_call(qT, kT, vT, maskB, bias5, *, scale, causal, bq, bk, rep, interpret):
    if _auto_partition_wanted():
        cp = _make_fwd_cp(bias5 is not None,
                          bias5 is not None and bias5.shape[0] > 1,
                          scale, causal, bq, bk, rep, interpret)
        args = (qT, kT, vT, maskB) + ((bias5,) if bias5 is not None else ())
        return cp(*args)
    return _fwd_call_impl(qT, kT, vT, maskB, bias5, scale=scale, causal=causal,
                          bq=bq, bk=bk, rep=rep, interpret=interpret)


def _bwd_call(res, g, *, scale, causal, rep, interpret):
    if _auto_partition_wanted():
        qT, kT, vT, maskB, bias5, out, lse = res
        has_bias = bias5 is not None
        cp = _make_bwd_cp(has_bias, has_bias and bias5.shape[0] > 1,
                          scale, causal, rep, interpret)
        if has_bias:
            dq, dk, dv, dbias = cp(qT, kT, vT, maskB, bias5, out, lse, g)
        else:
            (dq, dk, dv), dbias = cp(qT, kT, vT, maskB, out, lse, g), None
        return dq, dk, dv, dbias
    return _bwd_call_impl(res, g, scale=scale, causal=causal, rep=rep,
                          interpret=interpret)


# --------------------------------------------------------------------------- #
# custom-VJP core on grouped, block-padded tensors
# --------------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_core(qT, kT, vT, maskB, bias5, scale, causal, bq, bk, rep, interpret):
    out, _ = _fwd_call(qT, kT, vT, maskB, bias5, scale=scale, causal=causal,
                       bq=bq, bk=bk, rep=rep, interpret=interpret)
    return out


def _flash_core_fwd(qT, kT, vT, maskB, bias5, scale, causal, bq, bk, rep, interpret):
    out, lse = _fwd_call(qT, kT, vT, maskB, bias5, scale=scale, causal=causal,
                         bq=bq, bk=bk, rep=rep, interpret=interpret)
    return out, (qT, kT, vT, maskB, bias5, out, lse)


def _flash_core_bwd(scale, causal, bq, bk, rep, interpret, res, g):
    import numpy as np

    dq, dk, dv, dbias = _bwd_call(res, g, scale=scale, causal=causal, rep=rep,
                                  interpret=interpret)
    dmask = np.zeros(res[3].shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask, dbias


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


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
    `models/t5.py::_attend(q, k, v, bias, mask)` with a key-padding mask;
    differentiable w.r.t. q, k, v and bias (custom flash VJP).

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
    def _vmem(bq_):
        R_ = rep * bq_
        blocks = 2 * 2 * R_ * dh * q.dtype.itemsize  # q + o, double-buffered
        kv = 2 * 2 * bk * dh * k.dtype.itemsize
        tiles = 2 * R_ * bk * 4  # s and p in f32
        scratch = 2 * R_ * 128 * 4 + R_ * dh * 4
        bias_b = 2 * R_ * bk * (bias.dtype.itemsize if bias is not None else 0)
        return blocks + kv + tiles + scratch + bias_b

    bq = _pick_block_q(block_q, Tq, _vmem)

    # pad sequence dims to block multiples (padded keys are masked off; padded
    # query rows are sliced away — and their cotangents arrive as zeros, so
    # dO = 0 and D = 0 null their dK/dV/dbias contributions in the backward)
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
    bias5 = bias.reshape(bias.shape[0], Hkv, rep, Tq_p, Tk_p) if bias is not None else None

    out = _flash_core(qT, kT, vT, key_mask[:, None, :], bias5,
                      scale, causal, bq, bk, rep, interpret)
    out = jnp.transpose(out.reshape(B, H, Tq_p, dh), (0, 2, 1, 3))
    return out[:, :Tq] if pq else out


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
