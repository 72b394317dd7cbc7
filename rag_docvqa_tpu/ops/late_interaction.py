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
def _maxsim_kernel(q_ref, p_ref, pm_ref, out_ref):
    """One patch per grid step: score = sum_q max_t (q . p_t)."""
    q = q_ref[:]  # (Tq, D) pre-normalized
    p = p_ref[0]  # (Tp, D) pre-normalized
    pm = pm_ref[0]  # (Tp,) float 1/0
    sims = jax.lax.dot_general(
        q, p, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tq, Tp)
    sims = jnp.where(pm[None, :] > 0, sims, -1e30)
    max_sim = jnp.max(sims, axis=-1)  # (Tq,)
    max_sim = jnp.where(max_sim > -1e29, max_sim, 0.0)
    out_ref[0, 0] = jnp.sum(max_sim)


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
    out = pl.pallas_call(
        _maxsim_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((query.shape[0], D), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D), lambda n: (n, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda n: (n, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * query.shape[0] * Tp * D,
            bytes_accessed=N * Tp * D * 4 + query.shape[0] * D * 4 + N * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, p, pm)
    return out[:, 0]
