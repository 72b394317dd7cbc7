"""Fused similarity scoring + top-k selection.

This is the TPU-native replacement for the reference Retriever's per-sample
Python loop (`_get_similarities` src/_modules.py:1978-1997 + `torch.topk`
src/_modules.py:2014-2016): one batched matmul over an L2-normalized index and
a masked top-k.

Two implementations with identical semantics:
  * ``cosine_topk_xla``    — jnp reference (matmul + lax.top_k), used for
                             correctness baselines and small problems.
  * ``cosine_topk_pallas`` — fused Pallas kernel that streams index tiles
                             HBM -> VMEM once, keeps the running top-k in VMEM,
                             and never materializes the (B, N) score matrix in
                             HBM. Falls back to interpret mode off-TPU.

Scores are cosine similarities; the index is expected pre-normalized (done
once at index build — the reference re-normalizes per query,
src/_modules.py:1990-1993, which is redundant work we hoist).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # plain float so Pallas kernels don't capture a traced const


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    """Match the reference's eps placement: x / (||x|| + eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / (norm + eps)


def masked_topk(
    scores: jax.Array,  # (..., N) float
    mask: Optional[jax.Array],  # (..., N) bool, True = valid
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Top-k over the last axis ignoring masked entries.

    Returns (values, indices, valid) where valid marks entries that came from
    real (unmasked) candidates — the fixed-shape analogue of the reference's
    `k_min = min(k, n_chunks)` clamp (src/_modules.py:2015).
    """
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    valid = vals > NEG_INF / 2
    return vals, idx, valid


def cosine_topk_xla(
    index: jax.Array,  # (N, D) pre-normalized
    queries: jax.Array,  # (B, D) unnormalized
    k: int,
    index_mask: Optional[jax.Array] = None,  # (N,) bool
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference implementation: one matmul + masked top-k."""
    q = l2_normalize(queries.astype(jnp.float32))
    scores = jax.lax.dot_general(
        q,
        index.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, N)
    mask = None if index_mask is None else jnp.broadcast_to(index_mask[None, :], scores.shape)
    return masked_topk(scores, mask, k)


# --------------------------------------------------------------------------- #
# Pallas fused kernel
# --------------------------------------------------------------------------- #
def _topk_merge(cand_vals: jax.Array, cand_idx: jax.Array, k: int):
    """Extract the k largest (value, index) pairs from candidates.

    Iterative max-extraction: k passes of max/argmax over the candidate axis.
    First-match argmax reproduces lax.top_k's lowest-index tie behavior as
    long as candidates are ordered by ascending global index, which the
    caller guarantees (running top-k entries precede the new tile).
    """
    B, C = cand_vals.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, C), 1)
    out_col = jax.lax.broadcasted_iota(jnp.int32, (B, k), 1)

    def body(j, carry):
        cvals, out_vals, out_idx = carry
        m = jnp.max(cvals, axis=-1)  # (B,)
        am = jnp.argmax(cvals, axis=-1)  # (B,)
        sel = col == am[:, None]
        picked_idx = jnp.sum(jnp.where(sel, cand_idx, 0), axis=-1)
        # one-hot column writes (Mosaic has no dynamic_update_slice on values)
        write = out_col == j
        out_vals = jnp.where(write, m[:, None], out_vals)
        out_idx = jnp.where(write, picked_idx[:, None], out_idx)
        cvals = jnp.where(sel, NEG_INF, cvals)
        return cvals, out_vals, out_idx

    out_vals = jnp.full((B, k), NEG_INF, jnp.float32)
    out_idx = jnp.zeros((B, k), jnp.int32)
    _, out_vals, out_idx = jax.lax.fori_loop(0, k, body, (cand_vals, out_vals, out_idx))
    return out_vals, out_idx


def _fused_kernel(n_valid_ref, q_ref, idx_tile_ref, vals_ref, idx_ref, k: int, tile_n: int):
    """Grid step over index tiles: matmul on MXU, running top-k in VMEM."""
    t = pl.program_id(0)
    n_valid = n_valid_ref[0]

    @pl.when(t == 0)
    def _init():
        vals_ref[:] = jnp.full_like(vals_ref, NEG_INF)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # (B, D) x (T, D)^T -> (B, T)
    scores = jax.lax.dot_general(
        q_ref[:],
        idx_tile_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    B = scores.shape[0]
    global_idx = t * tile_n + jax.lax.broadcasted_iota(jnp.int32, (B, tile_n), 1)
    scores = jnp.where(global_idx < n_valid, scores, NEG_INF)

    # threshold gate: the expensive k-pass merge only runs when this tile can
    # actually displace a current top-k entry somewhere in the batch — for a
    # large index nearly all tiles fail the test and cost just the matmul +
    # one comparison sweep.
    thresholds = vals_ref[:, k - 1 : k]  # (B, 1) current k-th best
    improves = jnp.any(scores > thresholds)

    @pl.when(improves)
    def _merge():
        cand_vals = jnp.concatenate([vals_ref[:], scores], axis=-1)
        cand_idx = jnp.concatenate([idx_ref[:], global_idx], axis=-1)
        new_vals, new_idx = _topk_merge(cand_vals, cand_idx, k)
        vals_ref[:] = new_vals
        idx_ref[:] = new_idx


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def cosine_topk_pallas(
    index: jax.Array,  # (N, D) pre-normalized, N % tile_n == 0 (pad upstream)
    queries: jax.Array,  # (B, D)
    n_valid: jax.Array,  # () int32 — entries >= n_valid are padding
    k: int,
    tile_n: int = 512,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused scoring + top-k. Returns (values, indices, valid) like masked_topk."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D = index.shape
    B = queries.shape[0]
    assert N % tile_n == 0, f"pad index length {N} to a multiple of tile_n={tile_n}"

    # queries stay f32 (mixed f32 x bf16 dots measured faster than casting
    # q down); scores accumulate in f32 via preferred_element_type
    q = l2_normalize(queries.astype(jnp.float32))
    grid = (N // tile_n,)
    kernel = functools.partial(_fused_kernel, k=k, tile_n=tile_n)

    vals, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # n_valid scalar
            pl.BlockSpec((B, D), lambda t: (0, 0), memory_space=pltpu.VMEM),  # queries (replicated)
            pl.BlockSpec((tile_n, D), lambda t: (t, 0), memory_space=pltpu.VMEM),  # index tile
        ],
        out_specs=(
            pl.BlockSpec((B, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, k), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, k), jnp.float32),
            jax.ShapeDtypeStruct((B, k), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * index.dtype.itemsize + B * D * 4 + 2 * B * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1), q, index)

    valid = vals > NEG_INF / 2
    return vals, idx, valid


# --------------------------------------------------------------------------- #
# two-phase hierarchical top-k (exact)
# --------------------------------------------------------------------------- #
def _segmax_kernel(n_valid_ref, q_ref, idx_tile_ref, segmax_ref, *supermax_ref,
                   tile_n: int, group: int, sgroups: int = 1):
    """Per index tile: fused matmul + segment-max reduction (+ optional
    second-level supergroup maxima when sgroups > 1).

    The contraction is issued as (tile_n, D) x (B, D)^T so scores land
    directly in (tile_n, B) orientation: the per-`group` max is then a
    MAJOR-dim reshape (Mosaic rejects lane splits for G < 128, and an
    in-kernel transpose of the score tile made the whole kernel VPU-bound —
    that transpose was why the int8 variant ran no faster than bf16).
    Output is (S, B); the wrapper transposes once outside the kernel.
    """
    t = pl.program_id(0)
    n_valid = n_valid_ref[0]
    scores = jax.lax.dot_general(
        idx_tile_ref[:],
        q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tile_n, B)
    B = scores.shape[1]
    global_idx = t * tile_n + jax.lax.broadcasted_iota(jnp.int32, (tile_n, B), 0)
    scores = jnp.where(global_idx < n_valid, scores, NEG_INF)
    segs = jnp.max(scores.reshape(tile_n // group, group, B), axis=1)
    segmax_ref[:] = segs
    if supermax_ref:
        supermax_ref[0][:] = jnp.max(
            segs.reshape(tile_n // (group * sgroups), sgroups, B), axis=1
        )


@functools.partial(jax.jit, static_argnames=("k", "tile_n", "group", "sgroups", "interpret"))
def cosine_topk_twophase(
    index: jax.Array,  # (N, D) pre-normalized, N % tile_n == 0
    queries: jax.Array,  # (B, D)
    n_valid: jax.Array,  # () int32
    k: int,
    tile_n: int = 2048,
    group: int = 8,
    sgroups: int = 16,  # groups per supergroup (1 disables the hierarchy)
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Exact top-k via (hierarchical) segment-max pre-selection.

    Phase 1 (Pallas): fused matmul + per-`group` segment maxima, plus
                      per-`group*sgroups` SUPERGROUP maxima in the same pass.
    Phase 2 (XLA):    lax.top_k over the (B, N/(group*sgroups)) supermaxima
                      selects k supergroups; a take_along_axis gathers their
                      k*sgroups segment maxima and a second (tiny) top_k
                      selects the k winning segments. At the defaults
                      (group=8, sgroups=16, N=512k) the big top_k runs over
                      4096 lanes vs the flat group=16 variant's 32768 (8x);
                      combined with group=8 halving the phase-3 gather:
                      measured 5.14 -> 4.65 ms/batch at B=256 (PERF.md §1).
    Phase 3 (XLA):    re-score only the k winning segments' k*group
                      candidates and take the final top-k.

    Exactness (incl. lax.top_k's lowest-index tie rule) holds at BOTH
    levels by the same covering argument: if a true top-k element's
    supergroup (segment) were not selected, the k selected supergroups
    (segments) would each contain an element >= it — k elements beating a
    top-k element, contradiction. Ascending-index candidate order at every
    level keeps the first-match tie behavior of single lax.top_k.

    Backend caveat: phase 3 re-accumulates the k*group candidate scores in a
    separate contraction; on TPU its f32 accumulation order can differ from a
    monolithic matmul by ~1e-4 on bf16 data, so adjacent ranks whose scores
    are closer than that may swap relative to cosine_topk_xla (the selected
    index SET matches; verified on a 512k-row index). Interpret/CPU mode is
    bit-identical. Measured on TPU v5e vs 512k x 768 bf16 (ms/batch, flat
    phase 2):
      B=8: 4.06 (pallas 3.93, xla 4.14) | B=64: 4.18 (4.77, 5.43)
      B=256: 5.59 (11.85, 9.99)         | B=512: 8.27 (pallas OOM, 15.68)
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, D = index.shape
    B = queries.shape[0]
    assert N % tile_n == 0 and tile_n % group == 0
    S = N // group
    if k * group >= N:  # tiny index: selection saves nothing
        row = jnp.arange(N)
        return cosine_topk_xla(index, queries, k, index_mask=row < n_valid)
    # hierarchy pays only when the supergroup level is a real reduction;
    # Mosaic also requires the per-tile supermax block's sublane dim (rows
    # per tile) to be divisible by 8
    S2 = N // (group * sgroups)
    hier = (
        sgroups > 1
        and tile_n % (group * sgroups) == 0
        and (tile_n // (group * sgroups)) % 8 == 0
        and S2 > 2 * k
    )

    q = l2_normalize(queries.astype(jnp.float32))
    grid = (N // tile_n,)
    kernel = functools.partial(_segmax_kernel, tile_n=tile_n, group=group,
                               sgroups=sgroups if hier else 1)
    seg_blk = pl.BlockSpec((tile_n // group, B), lambda t: (t, 0), memory_space=pltpu.VMEM)
    out_specs, out_shape = seg_blk, jax.ShapeDtypeStruct((S, B), jnp.float32)
    if hier:
        sup_blk = pl.BlockSpec((tile_n // (group * sgroups), B), lambda t: (t, 0),
                               memory_space=pltpu.VMEM)
        out_specs = [seg_blk, sup_blk]
        out_shape = [out_shape, jax.ShapeDtypeStruct((S2, B), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((B, D), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, D), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * D,
            bytes_accessed=N * D * index.dtype.itemsize + B * D * 4 + B * S * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.asarray([n_valid], jnp.int32).reshape(1), q, index)

    if hier:
        segmax, supermax = outs[0].T, outs[1].T  # (B, S), (B, S2)
        # level 1: supergroup selection (ties -> lowest index, like top_k)
        _, sup_idx = jax.lax.top_k(supermax, k)  # (B, k)
        sup_idx = jnp.sort(sup_idx, axis=1)
        # level 2: the selected supergroups' segment maxima, ascending order
        g_flat = (sup_idx[:, :, None] * sgroups
                  + jnp.arange(sgroups)[None, None, :]).reshape(B, k * sgroups)
        seg_cand = jnp.take_along_axis(segmax, g_flat, axis=1)
        _, pos2 = jax.lax.top_k(seg_cand, k)
        seg_idx = jnp.take_along_axis(g_flat, pos2, axis=1)
        seg_idx = jnp.sort(seg_idx, axis=1)
    else:
        segmax = outs.T  # (B, S)
        # phase 2: segment selection (ties -> lowest segment index, like top_k)
        _, seg_idx = jax.lax.top_k(segmax, k)  # (B, k)
        seg_idx = jnp.sort(seg_idx, axis=1)  # ascending global order for tie parity

    # phase 3: exact re-score of the k*group surviving candidates
    cand_idx = seg_idx[:, :, None] * group + jnp.arange(group)[None, None, :]  # (B, k, G)
    cand_vecs = index[cand_idx]  # (B, k, G, D)
    cand_scores = jnp.einsum(
        "bkgd,bd->bkg", cand_vecs.astype(jnp.float32), q, preferred_element_type=jnp.float32
    )
    flat_idx = cand_idx.reshape(B, k * group)
    flat = jnp.where(flat_idx < n_valid, cand_scores.reshape(B, k * group), NEG_INF)
    vals, pos = jax.lax.top_k(flat, k)
    idx = jnp.take_along_axis(flat_idx, pos, axis=1)
    valid = vals > NEG_INF / 2
    return vals, idx.astype(jnp.int32), valid


# Measured on TPU v5e, 512k x 768 bf16 index (numbers above): the
# running-merge kernel edges ahead only at tiny batch; the two-phase kernel
# is MXU/HBM-bound at every batch size and replaces the old B<=128 crossover
# (XLA top_k no longer wins anywhere).
PALLAS_BATCH_CROSSOVER = 16


def cosine_topk_auto(
    index: jax.Array,  # (N, D) pre-normalized, padded to tile_n
    queries: jax.Array,  # (B, D)
    n_valid,
    k: int,
    tile_n: int = 512,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick the faster implementation by batch size."""
    if jax.default_backend() != "tpu" or index.shape[0] % tile_n != 0:
        # off-TPU, or an unpadded index (callers that care pad via pad_index)
        row = jnp.arange(index.shape[0])
        return cosine_topk_xla(index, queries, k, index_mask=row < n_valid)
    if queries.shape[0] <= 16:
        return cosine_topk_pallas(index, queries, n_valid, k, tile_n=tile_n)
    two_tile = max(tile_n, 2048)
    if index.shape[0] % two_tile != 0:
        two_tile = tile_n
    return cosine_topk_twophase(index, queries, n_valid, k, tile_n=two_tile)


def pad_index(embeddings: jax.Array, tile_n: int = 512) -> Tuple[jax.Array, jax.Array]:
    """Pad an (N, D) index to a tile multiple; returns (padded, n_valid)."""
    N = embeddings.shape[0]
    target = ((N + tile_n - 1) // tile_n) * tile_n
    if target != N:
        pad = jnp.zeros((target - N, embeddings.shape[1]), embeddings.dtype)
        embeddings = jnp.concatenate([embeddings, pad], axis=0)
    return embeddings, jnp.int32(N)
