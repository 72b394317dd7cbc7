"""ColBERT-style late-interaction (MaxSim) scoring.

Reference: src/utils.py:442-458 — L2-normalize query and patch token
embeddings, per-token cosine matrix, max over patch tokens, sum over query
tokens. Two implementations:

  * ``late_interaction`` — batched jnp with validity masks (the reference has
    no masks because it loops per sample; here padded patch rows must not
    contribute, so masked patch tokens score -inf before the max and masked
    query tokens are dropped from the sum).
  * ``late_interaction_pallas`` — fused Pallas kernel tiling over the patch
    axis: each grid step computes the (Tq, Tp) token-similarity block on the
    MXU and reduces it in VMEM, so the (N, Tq, Tp) tensor never exists in HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def late_interaction(
    query: jax.Array,  # (Tq, D) or (B, Tq, D)
    patches: jax.Array,  # (N, Tp, D) or (B, N, Tp, D)
    query_mask: Optional[jax.Array] = None,  # (..., Tq)
    patch_mask: Optional[jax.Array] = None,  # (..., N, Tp)
) -> jax.Array:
    """MaxSim scores over the patch axis; returns (N,) / (B, N)."""
    q = _normalize(query.astype(jnp.float32))
    p = _normalize(patches.astype(jnp.float32))
    sims = jnp.einsum("...qd,...ntd->...nqt", q, p)
    if patch_mask is not None:
        sims = jnp.where(patch_mask[..., None, :], sims, -jnp.inf)
    max_sim = jnp.max(sims, axis=-1)  # (..., N, Tq)
    max_sim = jnp.where(jnp.isfinite(max_sim), max_sim, 0.0)  # all-masked patches
    if query_mask is not None:
        max_sim = max_sim * query_mask[..., None, :]
    return jnp.sum(max_sim, axis=-1)


# --------------------------------------------------------------------------- #
# Pallas fused kernel
# --------------------------------------------------------------------------- #
PATCH_BLOCK = 8  # patches per grid step (sublane-aligned output rows)


def _maxsim_kernel(q_ref, p_ref, pm_ref, out_ref):
    """PATCH_BLOCK patches per grid step: score_n = sum_q max_t (q . p_nt)."""
    g = pl.program_id(0)
    q = q_ref[:]  # (Tq, D) pre-normalized
    p = p_ref[:]  # (PB, Tp, D) pre-normalized
    pm = pm_ref[:]  # (PB, Tp)
    # batched contraction: sims[n, t, j] = p[n, t, :] . q[j, :]
    sims = jax.lax.dot_general(
        p, q, dimension_numbers=(((2,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (PB, Tp, Tq)
    sims = jnp.where(pm[:, :, None] > 0, sims, -1e30)
    max_sim = jnp.max(sims, axis=1)  # (PB, Tq)
    max_sim = jnp.where(max_sim > -1e29, max_sim, 0.0)
    out_ref[g, :] = jnp.sum(max_sim, axis=1)


def _pad_to(x: jax.Array, axis: int, mult: int) -> jax.Array:
    size = x.shape[axis]
    target = ((size + mult - 1) // mult) * mult
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads)


@functools.partial(jax.jit, static_argnames=("interpret",))
def late_interaction_pallas(
    query: jax.Array,  # (Tq, D)
    patches: jax.Array,  # (N, Tp, D)
    patch_mask: Optional[jax.Array] = None,  # (N, Tp)
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, Tp, D = patches.shape
    q = _normalize(query.astype(jnp.float32))
    p = _normalize(patches.astype(jnp.float32))
    pm = (
        patch_mask.astype(jnp.float32)
        if patch_mask is not None
        else jnp.ones((N, Tp), jnp.float32)
    )
    # Mosaic tiling: pad N to the patch block, Tp to sublane (8), D to lane
    # (128); padded tokens/patches are masked out, padded feature dims
    # contribute zeros.
    PB = PATCH_BLOCK
    p = _pad_to(_pad_to(_pad_to(p, 0, PB), 1, 8), 2, 128)
    pm = _pad_to(_pad_to(pm, 0, PB), 1, 8)
    q = _pad_to(_pad_to(q, 0, 8), 1, 128)
    N_p, Tp_p, D_p = p.shape
    Tq_p = q.shape[0]
    NB = N_p // PB

    out = pl.pallas_call(
        _maxsim_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((Tq_p, D_p), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, Tp_p, D_p), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PB, Tp_p), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        # full-array output block: each step writes its PB-row slice
        out_specs=pl.BlockSpec((NB, PB), lambda n: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, PB), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N_p * Tq_p * Tp_p * D_p,
            bytes_accessed=N_p * Tp_p * D_p * 4 + Tq_p * D_p * 4 + N_p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, p, pm)
    return out.reshape(N_p)[:N]
