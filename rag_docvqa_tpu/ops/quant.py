"""Int8-quantized retrieval index.

Symmetric per-row int8 quantization of the (pre-normalized) chunk embedding
matrix: 4x less HBM than f32 (2x less than bf16) for the corpus index, scored
with the MXU's native int8 path (int8 x int8 -> int32 accumulate) and
rescaled to cosine similarities. Queries quantize dynamically per row.

For normalized embeddings the per-row scale is ~1/127 x amax, so the score
error is bounded by ~1% relative — top-k overlap with the f32 index is
property-tested (tests/test_quant.py) and the big-index speed win is measured
in bench detail.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.ops.topk import NEG_INF, l2_normalize, masked_topk


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, D) f32 -> (int8 values, (N, 1) f32 scales); symmetric per-row."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_rows(q: jax.Array, scale: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scale


def build_int8_index(embeddings: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Normalize + quantize a raw (N, D) embedding matrix."""
    return quantize_rows(l2_normalize(embeddings.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_int8(
    index_q: jax.Array,  # (N, D) int8
    index_scale: jax.Array,  # (N, 1) f32
    queries: jax.Array,  # (B, D) f32 unnormalized
    n_valid: jax.Array,  # () int32
    k: int,
):
    """Masked top-k cosine over an int8 index: int8 MXU dot + rescale."""
    qn = l2_normalize(queries.astype(jnp.float32))
    q8, qs = quantize_rows(qn)
    acc = jax.lax.dot_general(
        q8,
        index_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (B, N) int32
    scores = acc.astype(jnp.float32) * qs * index_scale[:, 0][None, :]
    row = jnp.arange(index_q.shape[0])[None, :]
    scores = jnp.where(row < n_valid, scores, NEG_INF)
    return masked_topk(scores, None, k)


# --------------------------------------------------------------------------- #
# two-phase int8 kernel (fused segment-max preselect, like ops/topk.py)
# --------------------------------------------------------------------------- #
def _segmax_int8_kernel(n_valid_ref, q_ref, scale_ref, idx_tile_ref, segmax_ref,
                        tile_n: int, group: int):
    """int8 x int8 -> int32 MXU dot, rescale by per-row index scales, masked
    segment-max. The query's own positive scale is applied outside (it cannot
    change any per-row ordering). Scores are produced in (tile_n, B)
    orientation so the group max is a major-dim reshape — the old in-kernel
    transpose made the kernel VPU-bound (int8 ran no faster than bf16)."""
    import jax
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    n_valid = n_valid_ref[0]
    acc = jax.lax.dot_general(
        idx_tile_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (tile_n, B)
    scores = acc.astype(jnp.float32) * scale_ref[:]  # (tile_n, 1) broadcast
    B = scores.shape[1]
    global_idx = t * tile_n + jax.lax.broadcasted_iota(jnp.int32, (tile_n, B), 0)
    scores = jnp.where(global_idx < n_valid, scores, NEG_INF)
    segmax_ref[:] = jnp.max(scores.reshape(tile_n // group, group, B), axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "group", "interpret"))
def cosine_topk_int8_twophase(
    index_q: jax.Array,  # (N, D) int8, N % tile_n == 0 (pad upstream)
    index_scale: jax.Array,  # (N, 1) f32
    queries: jax.Array,  # (B, D) f32 unnormalized
    n_valid: jax.Array,
    k: int,
    tile_n: int = 2048,
    group: int = 16,
    interpret=None,
):
    """Exact int8 top-k without materializing (B, N): fused segment-max
    preselect + integer re-score of the k winning segments. Integer
    accumulation is order-free and phase 3 applies the scales in the flat
    path's order, so results match cosine_topk_int8 (verified bit-identical
    on a 512k device index; only sub-ulp rounding ties in the qs-free
    segment-max selection could theoretically differ)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D = index_q.shape
    B = queries.shape[0]
    assert N % tile_n == 0 and tile_n % group == 0
    if k * group >= N:
        return cosine_topk_int8(index_q, index_scale, queries, n_valid, k)

    qn = l2_normalize(queries.astype(jnp.float32))
    q8, qs = quantize_rows(qn)
    S = N // group
    kernel = functools.partial(_segmax_int8_kernel, tile_n=tile_n, group=group)
    segmax = pl.pallas_call(
        kernel,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n // group, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D + B * D + N * 4 + B * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1), q8, index_scale, index_q).T  # (B, S)

    _, seg_idx = jax.lax.top_k(segmax, k)
    seg_idx = jnp.sort(seg_idx, axis=1)
    cand_idx = seg_idx[:, :, None] * group + jnp.arange(group)[None, None, :]
    cand_rows = index_q[cand_idx]  # (B, k, G, D) int8
    acc = jnp.einsum(
        "bkgd,bd->bkg", cand_rows.astype(jnp.int32), q8.astype(jnp.int32)
    )
    # apply the scales in the flat path's order ((acc*qs)*index_scale) so
    # final values and tie behavior match cosine_topk_int8
    cand_scores = (acc.astype(jnp.float32) * qs[:, :, None]) * index_scale[
        cand_idx.reshape(B, -1), 0
    ].reshape(B, k, group)
    flat_idx = cand_idx.reshape(B, k * group)
    flat = jnp.where(flat_idx < n_valid, cand_scores.reshape(B, k * group), NEG_INF)
    vals, pos = jax.lax.top_k(flat, k)
    idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    valid = vals > NEG_INF / 2
    # invalid slots keep the raw NEG_INF sentinel (NOT scaled by qs — the
    # sharded merge's `> -1e29` validity check depends on it)
    return jnp.where(valid, vals, NEG_INF), idx.astype(jnp.int32), valid


def cosine_topk_int8_auto(index_q, index_scale, queries, n_valid, k: int, tile_n: int = 2048):
    """Measured on v5e, 512k x 768 int8: flat wins at tiny batch (B=8:
    3.6 vs 4.3 ms — pure index-read bound), two-phase wins beyond (B=256:
    5.9 vs 9.2; B=512: 7.9 vs 15.1). Both paths are bit-identical."""
    if jax.default_backend() != "tpu" or queries.shape[0] <= 16 or index_q.shape[0] % tile_n != 0:
        return cosine_topk_int8(index_q, index_scale, queries, n_valid, k)
    return cosine_topk_int8_twophase(index_q, index_scale, queries, n_valid, k, tile_n=tile_n)


# --------------------------------------------------------------------------- #
# int4-packed index: 8x corpus capacity per chip (2x over int8)
# --------------------------------------------------------------------------- #
# Packing layout: element d pairs with element d + D/2 in one byte
# (lo nibble = x[:, :D/2], hi nibble = x[:, D/2:]). Unpacking then yields two
# CONTIGUOUS (N, D/2) halves — no lane interleave, which Mosaic's reshape
# rules make hostile — and the cosine numerator is lo @ q[:, :D/2] +
# hi @ q[:, D/2:]. The backend's jnp.int4 dtype is unusable (device_put
# recurses, PERF.md §6), so nibbles ride in int8 bytes.


def quantize_rows_int4(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, D) f32 (D even) -> ((N, D/2) int8 packed nibbles, (N, 1) f32
    scales). Symmetric per-row, values in [-7, 7], scale clipped at the
    99th |x| percentile — with only 15 levels, spending them on the outlier
    tail costs more recall than clipping it (worst-case random-gaussian
    top-10 agreement 0.80 -> 0.83 measured; tests/test_quant.py).

    Accuracy expectation: int4 is the CAPACITY extreme (8x f32). On
    worst-case random normalized data top-10 agreement vs exact is ~0.73-
    0.83 (vs int8's ~0.97); real embedding distributions cluster with
    larger score margins and agree better — validate per corpus before
    choosing int4 over int8."""
    N, D = x.shape
    assert D % 2 == 0, "int4 packing needs an even feature dim"
    clip = jnp.percentile(jnp.abs(x), 99.0, axis=-1, keepdims=True)
    scale = jnp.maximum(clip, 1e-12) / 7.0
    q = jnp.clip(jnp.round(x / scale), -7, 7).astype(jnp.int32)
    lo = q[:, : D // 2] & 0xF
    hi = q[:, D // 2 :] & 0xF
    packed = (lo | (hi << 4)).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(packed, jnp.int8), scale


def unpack_int4(packed: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(N, D/2) int8 -> (lo, hi) int8 halves, each (N, D/2), sign-extended."""
    b32 = packed.astype(jnp.int32)
    lo = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b32, 28), 28)
    hi = jax.lax.shift_right_arithmetic(jax.lax.shift_left(b32, 24), 28)
    return lo.astype(jnp.int8), hi.astype(jnp.int8)


def build_int4_index(embeddings: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Normalize + int4-quantize a raw (N, D) embedding matrix."""
    return quantize_rows_int4(l2_normalize(embeddings.astype(jnp.float32)))


@functools.partial(jax.jit, static_argnames=("k",))
def cosine_topk_int4(
    index_p: jax.Array,  # (N, D/2) int8 packed nibbles
    index_scale: jax.Array,  # (N, 1) f32
    queries: jax.Array,  # (B, D) f32 unnormalized
    n_valid: jax.Array,
    k: int,
):
    """Masked top-k cosine over an int4-packed index (XLA unpack + int8 MXU
    dots; reference path for tests and CPU)."""
    D = queries.shape[1]
    qn = l2_normalize(queries.astype(jnp.float32))
    q8, qs = quantize_rows(qn)
    lo, hi = unpack_int4(index_p)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = dot(q8[:, : D // 2], lo) + dot(q8[:, D // 2 :], hi)  # (B, N) int32
    scores = acc.astype(jnp.float32) * qs * index_scale[:, 0][None, :]
    row = jnp.arange(index_p.shape[0])[None, :]
    scores = jnp.where(row < n_valid, scores, NEG_INF)
    return masked_topk(scores, None, k)


def _segmax_int4_kernel(n_valid_ref, qlo_ref, qhi_ref, scale_ref, packed_ref,
                        segmax_ref, tile_n: int, group: int):
    """In-kernel nibble unpack (widen -> two arithmetic shifts per half) +
    two int8 MXU dots + rescale + masked segment max, (tile_n, B) oriented
    like the int8 kernel."""
    import jax
    from jax.experimental import pallas as pl

    t = pl.program_id(0)
    n_valid = n_valid_ref[0]
    lo, hi = unpack_int4(packed_ref[:])  # pure jnp/lax — traceable in-kernel
    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    acc = dot(lo, qlo_ref[:]) + dot(hi, qhi_ref[:])  # (tile_n, B) int32
    scores = acc.astype(jnp.float32) * scale_ref[:]
    B = scores.shape[1]
    global_idx = t * tile_n + jax.lax.broadcasted_iota(jnp.int32, (tile_n, B), 0)
    scores = jnp.where(global_idx < n_valid, scores, NEG_INF)
    segmax_ref[:] = jnp.max(scores.reshape(tile_n // group, group, B), axis=1)


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "group", "interpret"))
def cosine_topk_int4_twophase(
    index_p: jax.Array,  # (N, D/2) int8 packed, N % tile_n == 0
    index_scale: jax.Array,
    queries: jax.Array,  # (B, D) f32
    n_valid: jax.Array,
    k: int,
    tile_n: int = 2048,
    group: int = 16,
    interpret=None,
):
    """Exact int4 top-k: fused unpack+segment-max preselect, then integer
    re-score of the k winning segments (same structure and tie handling as
    the int8 two-phase kernel)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, Dh = index_p.shape
    D = queries.shape[1]
    B = queries.shape[0]
    assert N % tile_n == 0 and tile_n % group == 0
    if k * group >= N:
        return cosine_topk_int4(index_p, index_scale, queries, n_valid, k)

    qn = l2_normalize(queries.astype(jnp.float32))
    q8, qs = quantize_rows(qn)
    S = N // group
    kernel = functools.partial(_segmax_int4_kernel, tile_n=tile_n, group=group)
    segmax = pl.pallas_call(
        kernel,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, Dh), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Dh), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, Dh), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n // group, B), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, B), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * Dh + B * D + N * 4 + B * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1),
      q8[:, : D // 2], q8[:, D // 2 :], index_scale, index_p).T  # (B, S)

    _, seg_idx = jax.lax.top_k(segmax, k)
    seg_idx = jnp.sort(seg_idx, axis=1)
    cand_idx = seg_idx[:, :, None] * group + jnp.arange(group)[None, None, :]
    cand_rows = index_p[cand_idx]  # (B, k, G, D/2) int8 packed
    lo, hi = unpack_int4(cand_rows.reshape(B, k * group, Dh))
    acc = jnp.einsum("bnd,bd->bn", lo.astype(jnp.int32), q8[:, : D // 2].astype(jnp.int32)) \
        + jnp.einsum("bnd,bd->bn", hi.astype(jnp.int32), q8[:, D // 2 :].astype(jnp.int32))
    cand_scores = (acc.astype(jnp.float32) * qs) * index_scale[
        cand_idx.reshape(B, -1), 0
    ]
    flat_idx = cand_idx.reshape(B, k * group)
    flat = jnp.where(flat_idx < n_valid, cand_scores, NEG_INF)
    vals, pos = jax.lax.top_k(flat, k)
    idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    valid = vals > NEG_INF / 2
    return jnp.where(valid, vals, NEG_INF), idx.astype(jnp.int32), valid


def cosine_topk_int4_auto(index_p, index_scale, queries, n_valid, k: int, tile_n: int = 2048):
    if jax.default_backend() != "tpu" or queries.shape[0] <= 16 or index_p.shape[0] % tile_n != 0:
        return cosine_topk_int4(index_p, index_scale, queries, n_valid, k)
    return cosine_topk_int4_twophase(index_p, index_scale, queries, n_valid, k, tile_n=tile_n)


# --------------------------------------------------------------------------- #
# refined int4: device shortlist + host full-precision rescore
# --------------------------------------------------------------------------- #
# Pure int4 residency cannot order the top-10 on worst-case random data: 15
# levels leave a per-score error ~0.10 sigma_elem, and the top of a 512k-score
# distribution is denser than that, so agreement plateaus ~0.73-0.81 no matter
# the quantizer (design study, PERF.md §1: per-row amax 0.730, p99 clip 0.786,
# per-group-32 scales 0.8125, Lloyd-max-15 codebook 0.783). What int4 IS good
# at is the SHORTLIST: the true top-10 sits inside the int4 top-40 with
# recall 0.998+ (measured, same study), because rank displacement — unlike
# exact order — only needs the error to be small vs the rank-40 score gap.
#
# The refined query therefore keeps the 8x-capacity int4 index in HBM for the
# corpus stream (the expensive part), takes the EXACT int4 top-k' (the
# existing two-phase kernel at k=k'), and rescores those k' candidates per
# query on the HOST against the builder's full-precision matrix — which the
# index builder always has (precompute.py writes it to the .npz), lives in
# host RAM where capacity is cheap, and costs only k'/N of its bytes per
# query (~19 MB gather per 256-query batch at k'=48 vs the 805 MB the device
# would need resident). `refined_query_batches` pipelines the host rescore of
# batch i under the device shortlist of batch i+1 (dispatch is async), so
# throughput is max(device, host), not the sum.


def normalize_host_rows(host_rows: "np.ndarray") -> "np.ndarray":
    """Pre-normalize the rescore source ONCE at build time. Per-query row
    normalization measured 18 ms/256-query batch (3 extra passes over the
    37 MB gather); pre-normalized f32 rows bring the whole rescore to
    ~8 ms. f32 over f16 is deliberate: the f16->f32 astype of the gathered
    block alone measured 25 ms (numpy converts at ~1.5 GB/s) while the f32
    gather costs 6.8 ms — host RAM is the cheap resource here."""
    import numpy as np

    rows = np.asarray(host_rows, np.float32)
    return rows / np.maximum(np.linalg.norm(rows, axis=1, keepdims=True), 1e-12)


def cosine_topk_int4_refined(
    index_p: jax.Array,  # (N, D/2) int8 packed nibbles (device)
    index_scale: jax.Array,  # (N, 1) f32 (device)
    queries,  # (B, D) f32 unnormalized (host or device)
    n_valid,
    k: int,
    host_rows: "np.ndarray",  # (N, D) float — full-precision rescore source
    kprime: int = 48,
    rows_normalized: bool = False,
):
    """Two-stage top-k: exact-int4 shortlist of k' candidates on device, then
    exact cosine rescore of the gathered candidates on host. Top-10 agreement
    vs the exact f32 index is bounded by shortlist recall (~0.998 worst-case
    random at k'=48, N=512k) instead of int4 ordering (~0.78)."""
    import numpy as np

    vals, idx, valid = cosine_topk_int4_auto(
        index_p, index_scale, queries, n_valid, kprime)
    return _rescore_host(np.asarray(idx), np.asarray(valid),
                         np.asarray(queries), host_rows, k,
                         rows_normalized=rows_normalized)


def _rescore_host(idx, valid, queries, host_rows, k: int,
                  rows_normalized: bool = False):
    """Host stage: gather (B, k') candidate rows, exact cosine, final top-k.
    Ties break toward the lower index (matching masked_topk's stable
    jax.lax.top_k order after candidates are index-sorted). Hot path
    (rows_normalized f32 source): gather 6.8 ms + batched matmul 1.4 ms per
    (B=256, k'=48) batch — see normalize_host_rows for the measured variants."""
    import numpy as np

    B, kprime = idx.shape
    qn = queries.astype(np.float32)
    qn /= np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    # sort candidates by index so equal scores resolve to the lower index,
    # like the flat path's stable top_k over an index-ordered score row
    order = np.argsort(idx, axis=1, kind="stable")
    idx = np.take_along_axis(idx, order, axis=1)
    valid = np.take_along_axis(valid, order, axis=1)
    rows = host_rows[idx.reshape(-1)]
    if rows.dtype != np.float32:
        rows = rows.astype(np.float32)
    rows = rows.reshape(B, kprime, -1)
    if not rows_normalized:
        rows = rows / np.maximum(np.linalg.norm(rows, axis=2, keepdims=True), 1e-12)
    scores = np.matmul(rows, qn[:, :, None])[..., 0]
    scores = np.where(valid, scores, NEG_INF)
    part = np.argpartition(-scores, min(k, kprime - 1), axis=1)[:, :k]
    pvals = np.take_along_axis(scores, part, axis=1)
    order2 = np.argsort(-pvals, axis=1, kind="stable")
    pos = np.take_along_axis(part, order2, axis=1)
    out_vals = np.take_along_axis(scores, pos, axis=1)
    out_idx = np.take_along_axis(idx, pos, axis=1)
    out_valid = out_vals > NEG_INF / 2
    return (out_vals.astype(np.float32),
            out_idx.astype(np.int32),
            out_valid)


def refined_query_batches(
    index_p: jax.Array,
    index_scale: jax.Array,
    query_batches,  # iterable of (B, D) f32 host arrays, or (device, host) pairs
    n_valid,
    k: int,
    host_rows: "np.ndarray",
    kprime: int = 48,
    rows_normalized: bool = False,
):
    """Pipelined refined queries: the device shortlist for batch i+1 is
    dispatched (async) before the host rescores batch i, so the host gather/
    GEMM hides under the device stream. Yields (vals, idx, valid) per batch.

    Each element of query_batches is either a host (B, D) array (shipped to
    the device per batch) or a (device_array, host_array) pair of the same
    queries — pass the pair when the queries are already device-resident
    (e.g. they came out of the question embedder): on a high-latency link
    the per-batch ship otherwise dominates the loop."""
    import numpy as np

    def _dispatch(q_dev):
        handles = cosine_topk_int4_auto(index_p, index_scale, q_dev, n_valid, kprime)
        # start the device->host copies now (they queue behind the compute):
        # the later np.asarray then finds the bytes already landed instead of
        # paying a fresh fetch round-trip per batch
        for h in handles[1:]:  # vals are never fetched — only idx + valid
            try:
                h.copy_to_host_async()
            except AttributeError:  # non-array (tracer/CPU fallback paths)
                pass
        return handles

    pending = None  # (device handles, host queries)
    for q in query_batches:
        q_dev, q_np = q if isinstance(q, tuple) else (q, None)
        handles = _dispatch(q_dev)
        if pending is not None:
            (pv, pi, pvd), pq = pending
            yield _rescore_host(np.asarray(pi), np.asarray(pvd),
                                pq, host_rows, k,
                                rows_normalized=rows_normalized)
        pending = (handles, np.asarray(q_dev) if q_np is None else q_np)
    if pending is not None:
        (pv, pi, pvd), pq = pending
        yield _rescore_host(np.asarray(pi), np.asarray(pvd),
                            pq, host_rows, k,
                            rows_normalized=rows_normalized)
