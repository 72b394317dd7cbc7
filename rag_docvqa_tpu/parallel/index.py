"""HBM-resident, chip-sharded embedding index with global top-k queries.

This is the north-star component (BASELINE.json): the reference scores chunks
per sample in a Python loop on one GPU (src/_modules.py:1978-2016); here the
chunk embedding matrix lives sharded across the mesh's "data" axis, every chip
scores its shard with the fused Pallas matmul+top-k kernel, and the global
top-k is produced by an all-gather of (k per shard) candidates followed by an
on-chip merge — the only cross-chip traffic is O(devices * B * k) scalars.

Sharded-vs-single-device equivalence (including tie behavior via ascending
global candidate index order) is property-tested in tests/test_index.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rag_docvqa_tpu.ops.topk import (
    cosine_topk_pallas,
    cosine_topk_twophase,
    cosine_topk_xla,
    l2_normalize,
    masked_topk,
)


@dataclass
class ShardedIndex:
    """A pre-normalized (N_pad, D) embedding matrix sharded over `axis`.

    dtype options: "f32" / "bf16" (halved HBM) / "int8" (quartered HBM via
    symmetric per-row quantization, ~98% top-10 agreement) / "int4"
    (eighth HBM, packed nibbles — the capacity extreme; agreement is
    corpus-dependent, see ops/quant.py::quantize_rows_int4).
    """

    embeddings: jax.Array  # (N_pad, D), sharded P(axis, None)
    n_valid: int  # true number of rows
    mesh: Mesh
    axis: str = "data"
    tile_n: int = 512
    use_pallas: bool = True
    scales: Optional[jax.Array] = None  # (N_pad, 1) f32, int8/int4 modes
    packed: bool = False  # int4 mode: embeddings hold packed nibble pairs
    # per-shard kernel: "merge" = running-merge Pallas (bit-exact ties, best
    # at tiny batch); "twophase" = segment-max preselect kernel (fastest for
    # B > ~16 on TPU; on-TPU adjacent ranks may swap within float-accumulation
    # epsilon — see ops/topk.py)
    kernel: str = "merge"
    # refined int4 tier: full-precision rows in HOST RAM. The device keeps
    # only the 8x-capacity int4 stream; queries take the exact-int4 top-k'
    # shortlist on device and rescore those k' rows per query on host —
    # top-10 agreement becomes shortlist recall (~0.998 at k'=48) instead of
    # int4 ordering (~0.78). See ops/quant.py refined-int4 block.
    host_rows: Optional["object"] = None  # np.ndarray (n_valid, D) float
    refine_kprime: int = 48

    # ------------------------------------------------------------------ #
    @staticmethod
    def build(
        embeddings: jax.Array,  # (N, D) raw (unnormalized) chunk embeddings
        mesh: Mesh,
        axis: str = "data",
        tile_n: int = 512,
        use_pallas: bool = True,
        dtype: str = "f32",  # "f32" | "bf16" | "int8" | "int4"
        refine: bool = False,  # int4/int8: keep host rows + rescore queries
        refine_dtype: str = "float32",  # host-copy precision. f32 default:
        # the f16->f32 astype of the gathered block costs 25 ms/batch vs the
        # 6.8 ms f32 gather (ops/quant.py::normalize_host_rows) — pass
        # "float16" only when host RAM is the binding constraint
        refine_kprime: int = 48,
    ) -> "ShardedIndex":
        """Normalize once, pad to shard x tile multiples, lay out over the mesh."""
        n, d = embeddings.shape
        n_shards = mesh.shape[axis]
        mult = n_shards * tile_n
        n_pad = ((n + mult - 1) // mult) * mult
        sharding = NamedSharding(mesh, P(axis, None))

        if dtype in ("int8", "int4"):
            import numpy as np

            from rag_docvqa_tpu.ops.quant import quantize_rows, quantize_rows_int4

            qfn = quantize_rows_int4 if dtype == "int4" else quantize_rows

            @functools.partial(jax.jit, out_shardings=(sharding, sharding))
            def _prepare_q(x):
                q, s = qfn(l2_normalize(x.astype(jnp.float32)))
                return (
                    jnp.pad(q, ((0, n_pad - n), (0, 0))),
                    jnp.pad(s, ((0, n_pad - n), (0, 0))),
                )

            q, s = _prepare_q(embeddings)
            host_rows = None
            if refine:
                from rag_docvqa_tpu.ops.quant import normalize_host_rows

                host_rows = normalize_host_rows(
                    np.asarray(jax.device_get(embeddings))).astype(refine_dtype)
            return ShardedIndex(
                embeddings=q, scales=s, n_valid=n, mesh=mesh, axis=axis,
                tile_n=tile_n, use_pallas=False, packed=dtype == "int4",
                host_rows=host_rows, refine_kprime=refine_kprime,
            )

        out_dtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32

        @functools.partial(jax.jit, out_shardings=sharding)
        def _prepare(x):
            x = l2_normalize(x.astype(jnp.float32)).astype(out_dtype)
            return jnp.pad(x, ((0, n_pad - n), (0, 0)))

        return ShardedIndex(
            embeddings=_prepare(embeddings),
            n_valid=n,
            mesh=mesh,
            axis=axis,
            tile_n=tile_n,
            use_pallas=use_pallas,
        )

    # ------------------------------------------------------------------ #
    def query(self, queries: jax.Array, k: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Global top-k for a replicated (B, D) query batch.

        Returns (values, indices, valid) with indices into the original
        (unpadded) row space, sorted descending, replicated on every device.
        """
        if self.scales is not None:
            if self.host_rows is not None:
                import numpy as np

                from rag_docvqa_tpu.ops.quant import _rescore_host

                # per-shard top-k' caps at the shard length (the merge then
                # covers the global top-k' by the usual per-shard argument)
                shard_len = self.embeddings.shape[0] // self.mesh.shape[self.axis]
                kprime = max(min(self.refine_kprime, self.n_valid, shard_len), k)
                sv, si, sok = _sharded_query_quant(
                    self.embeddings, self.scales, queries,
                    mesh=self.mesh, axis=self.axis, n_valid=self.n_valid,
                    k=kprime, packed=self.packed,
                )
                return _rescore_host(np.asarray(si), np.asarray(sok),
                                     np.asarray(queries), self.host_rows, k,
                                     rows_normalized=True)
            return _sharded_query_quant(
                self.embeddings, self.scales, queries,
                mesh=self.mesh, axis=self.axis, n_valid=self.n_valid, k=k,
                packed=self.packed,
            )
        return _sharded_query(
            self.embeddings,
            queries,
            mesh=self.mesh,
            axis=self.axis,
            n_valid=self.n_valid,
            k=k,
            tile_n=self.tile_n,
            use_pallas=self.use_pallas,
            kernel=self.kernel,
        )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "n_valid", "k", "tile_n", "use_pallas", "kernel"),
)
def _sharded_query(index, queries, *, mesh, axis, n_valid, k, tile_n, use_pallas, kernel="merge"):
    n_shards = mesh.shape[axis]
    shard_len = index.shape[0] // n_shards

    def local(index_shard, q):
        # index_shard: (shard_len, D); q: (B, D) replicated
        sid = jax.lax.axis_index(axis)
        # rows valid on this shard: global row id in [sid*shard_len, n_valid)
        local_valid = jnp.clip(n_valid - sid * shard_len, 0, shard_len)
        if use_pallas and kernel == "twophase":
            vals, idx, _ = cosine_topk_twophase(index_shard, q, local_valid, k, tile_n=tile_n)
        elif use_pallas:
            vals, idx, _ = cosine_topk_pallas(index_shard, q, local_valid, k, tile_n=tile_n)
        else:
            row = jax.lax.broadcasted_iota(jnp.int32, (1, shard_len), 1)
            mask = (row < local_valid)[0]
            vals, idx, _ = cosine_topk_xla(index_shard, q, k, index_mask=mask)
        gidx = idx + sid * shard_len
        # all-gather the per-shard candidates; merge identically everywhere.
        cand_vals = jax.lax.all_gather(vals, axis)  # (S, B, k)
        cand_idx = jax.lax.all_gather(gidx, axis)  # (S, B, k)
        # order candidates by ascending shard id so ties resolve to the lowest
        # global index, matching single-device lax.top_k.
        B = q.shape[0]
        cand_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(B, n_shards * k)
        cand_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(B, n_shards * k)
        out_vals, pos = jax.lax.top_k(cand_vals, k)
        out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
        valid = out_vals > -1e29
        return out_vals, out_idx, valid

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(index, queries)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_valid", "k", "packed"))
def _sharded_query_quant(index_q, scales, queries, *, mesh, axis, n_valid, k,
                         packed: bool = False):
    from rag_docvqa_tpu.ops.quant import cosine_topk_int4_auto, cosine_topk_int8_auto

    score_auto = cosine_topk_int4_auto if packed else cosine_topk_int8_auto
    n_shards = mesh.shape[axis]
    shard_len = index_q.shape[0] // n_shards

    def local(iq, sc, q):
        sid = jax.lax.axis_index(axis)
        local_valid = jnp.clip(n_valid - sid * shard_len, 0, shard_len)
        # auto-dispatch: flat at tiny batch, two-phase beyond (one policy
        # shared with the single-device path)
        vals, idx, _ = score_auto(iq, sc, q, local_valid, k)
        gidx = idx + sid * shard_len
        cand_vals = jax.lax.all_gather(vals, axis)
        cand_idx = jax.lax.all_gather(gidx, axis)
        B = q.shape[0]
        cand_vals = jnp.transpose(cand_vals, (1, 0, 2)).reshape(B, n_shards * k)
        cand_idx = jnp.transpose(cand_idx, (1, 0, 2)).reshape(B, n_shards * k)
        out_vals, pos = jax.lax.top_k(cand_vals, k)
        out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
        return out_vals, out_idx, out_vals > -1e29

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(index_q, scales, queries)


def single_device_query(
    embeddings: jax.Array,  # (N, D) unnormalized
    queries: jax.Array,
    k: int,
    index_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Unsharded reference for property tests: normalize + matmul + top-k."""
    index = l2_normalize(embeddings.astype(jnp.float32))
    return cosine_topk_xla(index, queries, k, index_mask=index_mask)


# --------------------------------------------------------------------------- #
# sharded late-interaction (MaxSim) retrieval
# --------------------------------------------------------------------------- #
@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_valid", "k"))
def sharded_maxsim_topk(
    patches: jax.Array,  # (N_pad, Tp, D) patch-token embeddings, sharded P(axis)
    patch_mask: jax.Array,  # (N_pad, Tp) bool, sharded P(axis)
    query: jax.Array,  # (Tq, D) replicated query token embeddings
    *,
    mesh: Mesh,
    axis: str = "data",
    n_valid: int,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Visual-retriever collective: MaxSim late interaction over a patch
    index sharded across the mesh (the VisualRetriever's crop scoring,
    src/_modules.py MaxSim path, at beyond-one-chip index sizes).

    Each chip scores its (shard_len, Tp, D) rows with
    ops/late_interaction.late_interaction and takes a local top-k; the
    global top-k merges the all-gathered (devices * k) candidates ordered by
    ascending shard id, so ties resolve to the lowest global row exactly
    like single-device lax.top_k. Cross-chip traffic is O(devices * k).
    Returns (vals (k,), idx (k,), valid (k,))."""
    from rag_docvqa_tpu.ops.late_interaction import late_interaction

    n_shards = mesh.shape[axis]
    shard_len = patches.shape[0] // n_shards

    def local(p_shard, pm_shard, q):
        sid = jax.lax.axis_index(axis)
        scores = late_interaction(q, p_shard, patch_mask=pm_shard)  # (shard_len,)
        local_valid = jnp.clip(n_valid - sid * shard_len, 0, shard_len)
        scores = jnp.where(jnp.arange(shard_len) < local_valid, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, min(k, shard_len))
        gidx = idx + sid * shard_len
        cand_vals = jax.lax.all_gather(vals, axis).reshape(-1)
        cand_idx = jax.lax.all_gather(gidx, axis).reshape(-1)
        out_vals, pos = jax.lax.top_k(cand_vals, k)
        out_idx = jnp.take_along_axis(cand_idx, pos, axis=-1)
        return out_vals, out_idx, jnp.isfinite(out_vals)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(patches, patch_mask, query)
