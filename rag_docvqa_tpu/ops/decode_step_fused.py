"""Monolithic greedy-decode step: ALL decoder layers in one Pallas kernel.

The split-dispatch decode loop (ops/decode.py) already unrolls the layer
loop, but each step still lowers to ~110 separate XLA matmul ops; measured
per-op overhead on the tunneled v5e is ~9.5 µs (PERF.md §3), so ~1 ms of
the 3.3 ms/step is pure op dispatch, and the unfused glue keeps the step
~3x over its HBM floor (the cross-attention KV read).

This kernel runs one full decode step — for every decoder layer: RMS
norms, self-attention with in-place KV-cache append, cross-attention over
the precomputed encoder KV (bf16 or int8 with channel scales folded in),
and the ReLU/gated FFN — in ONE pallas_call on a (L, B/rows) grid:

  * the (B, d) activation vector lives in VMEM scratch across all layers;
  * grid order is layer-outer/batch-inner, so each layer's weights stream
    from HBM once per step (constant block index across the inner loop);
  * the self K/V caches are input_output-aliased blocks — the kernel
    writes the new position into the resident block and Mosaic writes the
    whole (rows, H, Tmax, dk) tile back (the unwritten positions keep
    their input values);
  * the cross K/V stream per (layer, batch-block) in their stored dtype
    and dequantize on-chip (int8 channel scales multiply the query and
    the output, exactly like the XLA path).

The LM head + argmax stay outside (2 XLA ops). Layouts match
models/t5.py::DecodeCache exactly.

STATUS: EXPERIMENTAL, NOT WIRED INTO THE DECODE LOOP. The kernel is
bit-exact against decode_step in interpret mode (tests/
test_decode_step_fused.py, bf16 and int8, multi-step cache append), but
Mosaic cannot practically compile it at production shapes: at t5-base
(B=128, Te=512) the TPU compile did not finish within 25 minutes, and at
small head dims it fails layout inference ("unsupported shape cast") — the
per-head single-query attention produces many (rows, 1, dk) tiles whose
singleton/sub-lane dims Mosaic's layout system handles badly. A practical
version needs a different in-kernel data layout (2-D tiles throughout,
heads packed along lanes), which conflicts with the lane-split reshape
restrictions; see PERF.md §3 for the measured op-overhead analysis that
motivated this and the cost/benefit of continuing. The XLA split-dispatch
loop (ops/decode.py) remains the production path at 3.3 ms/step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_step_kernel(
    # scalar-prefetch
    t_ref,        # (1,) int32 in SMEM: current position
    # inputs
    x0_ref,       # (rows, d) token embeddings for this step
    emask_ref,    # (rows, Te) bool encoder key mask
    sbias_ref,    # (H, Tmax) f32 decoder rel-pos bias row for query pos t
    wqkv_s_ref,   # (1, d, 3*inner) self qkv
    wo_s_ref,     # (1, inner, d)
    wq_c_ref,     # (1, d, inner) cross q
    wo_c_ref,     # (1, inner, d)
    ln0_ref,      # (1, 1, d)
    ln1_ref,      # (1, 1, d)
    ln2_ref,      # (1, 1, d)
    wi_ref,       # (1, d, d_ff)   (plain-ReLU FFN; t5-base)
    wof_ref,      # (1, d_ff, d)
    sk_in_ref,    # (1, rows, H, Tmax, dk) self K cache (aliased)
    sv_in_ref,    # (1, rows, H, Tmax, dk)
    ck_ref,       # (1, rows, H, Te, dk) cross K (bf16 or int8)
    cv_ref,       # (1, rows, H, Te, dk)
    ks_ref,       # (1, rows, H, 1, dk) or None (int8 scales)
    vs_ref,       # (1, rows, H, 1, dk) or None
    # outputs
    xout_ref,     # (rows, d) final hidden (written at l == L-1)
    sk_out_ref,   # aliased with sk_in
    sv_out_ref,   # aliased with sv_in
    # scratch
    x_scr,        # (B, d) activations, persistent across grid steps
    qkv_scr,      # (rows, 3*inner)
    attn_scr,     # (rows, inner)
    *,
    rows: int,
    d: int,
    inner: int,
    H: int,
    dk: int,
    Tmax: int,
    Te: int,
    eps: float,
    int8_kv: bool,
):
    l, b = pl.program_id(0), pl.program_id(1)
    nl = pl.num_programs(0)
    t = t_ref[0]
    cdt = x0_ref.dtype

    @pl.when(l == 0)
    def _seed():
        x_scr[pl.ds(b * rows, rows)] = x0_ref[...]

    x = x_scr[pl.ds(b * rows, rows)]

    def _rms(y, ln_ref):
        y32 = y.astype(jnp.float32)
        var = jnp.mean(jnp.square(y32), axis=-1, keepdims=True)
        return ((y32 * jax.lax.rsqrt(var + eps))
                * ln_ref[0].astype(jnp.float32)).astype(cdt)

    # ---- self-attention --------------------------------------------------
    h = _rms(x, ln0_ref)
    qkv_scr[...] = jax.lax.dot_general(
        h, wqkv_s_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    kpos = jax.lax.broadcasted_iota(jnp.int32, (1, Tmax), 1)
    self_valid = kpos <= t  # (1, Tmax)
    for hh in range(H):
        q = qkv_scr[:, pl.ds(hh * dk, dk)]                       # (rows, dk)
        k_new = qkv_scr[:, pl.ds(inner + hh * dk, dk)]           # (rows, dk)
        v_new = qkv_scr[:, pl.ds(2 * inner + hh * dk, dk)]
        # append at position t (output block aliases the input cache)
        sk_out_ref[0, :, hh, pl.ds(t, 1), :] = k_new[:, None, :]
        sv_out_ref[0, :, hh, pl.ds(t, 1), :] = v_new[:, None, :]
        sk = sk_in_ref[0, :, hh]                                  # (rows, Tmax, dk)
        sv = sv_in_ref[0, :, hh]
        # the just-written row: read back through the OUTPUT ref so the new
        # position participates (input ref may be a distinct buffer)
        sk = jax.lax.select(
            jnp.broadcast_to((kpos == t)[..., None], sk.shape),
            jnp.broadcast_to(k_new[:, None, :], sk.shape), sk)
        sv = jax.lax.select(
            jnp.broadcast_to((kpos == t)[..., None], sv.shape),
            jnp.broadcast_to(v_new[:, None, :], sv.shape), sv)
        s = jax.lax.dot_general(
            q[:, None, :], sk, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (rows, 1, Tmax)
        s = s + sbias_ref[hh][None, None, :].astype(jnp.float32)
        s = jnp.where(self_valid[None], s, -1e9)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        o = jax.lax.dot_general(
            p, sv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (rows, 1, dk)
        attn_scr[:, pl.ds(hh * dk, dk)] = o[:, 0, :].astype(cdt)

    x = x + jax.lax.dot_general(
        attn_scr[...], wo_s_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    # ---- cross-attention -------------------------------------------------
    h = _rms(x, ln1_ref)
    qc = jax.lax.dot_general(
        h, wq_c_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (rows, inner) f32
    emask = emask_ref[...]  # (rows, Te)
    for hh in range(H):
        q = qc[:, hh * dk:(hh + 1) * dk]  # (rows, dk) f32
        if int8_kv:
            q = q * ks_ref[0, :, hh, 0, :].astype(jnp.float32)
        ck = ck_ref[0, :, hh].astype(jnp.float32)  # (rows, Te, dk)
        s = jax.lax.dot_general(
            q[:, None, :], ck, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (rows, 1, Te)
        s = jnp.where(emask[:, None, :], s, -1e9)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        cv = cv_ref[0, :, hh].astype(jnp.float32)
        o = jax.lax.dot_general(
            p, cv, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]  # (rows, dk)
        if int8_kv:
            o = o * vs_ref[0, :, hh, 0, :].astype(jnp.float32)
        attn_scr[:, pl.ds(hh * dk, dk)] = o.astype(cdt)

    x = x + jax.lax.dot_general(
        attn_scr[...], wo_c_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    # ---- FFN -------------------------------------------------------------
    h = _rms(x, ln2_ref)
    f = jax.lax.dot_general(
        h, wi_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    f = jnp.maximum(f, 0.0).astype(cdt)
    x = x + jax.lax.dot_general(
        f, wof_ref[0], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt)

    x_scr[pl.ds(b * rows, rows)] = x

    @pl.when(l == nl - 1)
    def _emit():
        xout_ref[...] = x


def _pick_rows_decode(B: int, H: int, Te: int, dk: int, ck_itemsize: int,
                      budget: int = 40 * 2**20) -> int:
    for rows in (16, 8, 4, 2, 1):
        if B % rows:
            continue
        est = (
            2 * 2 * rows * H * Te * dk * ck_itemsize  # cross K+V blocks, dbl-buffered
            + 2 * rows * H * Te * 4 * 2               # per-head f32 dequant + probs
        )
        if est <= budget:
            return rows
    return 0


def decode_step_fused(
    x0: jax.Array,            # (B, d) current-token embeddings
    encoder_mask: jax.Array,  # (B, Te) bool
    self_bias_row: jax.Array,  # (H, Tmax) additive self-attn bias for pos t
    t: jax.Array,             # () int32
    weights: dict,            # pre-fused stacked decoder weights (see fuse)
    self_k: jax.Array,        # (L, B, H, Tmax, dk)
    self_v: jax.Array,
    cross_k: jax.Array,       # (L, B, H, Te, dk) bf16|int8
    cross_v: jax.Array,
    k_scale: Optional[jax.Array] = None,  # (L, B, H, 1, dk)
    v_scale: Optional[jax.Array] = None,
    *,
    eps: float,
    interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (x_final (B, d) pre-final-LN hidden, new self_k, new self_v)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, d = x0.shape
    L, _, H, Tmax, dk = self_k.shape
    Te = cross_k.shape[3]
    inner = H * dk
    int8_kv = k_scale is not None
    rows = _pick_rows_decode(B, H, Te, dk, cross_k.dtype.itemsize)
    if not rows:
        raise ValueError(f"decode step does not fit VMEM at (B={B}, Te={Te})")
    d_ff = weights["wi"].shape[2]

    full = lambda *shape: pl.BlockSpec(shape, lambda l, b, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    lyr = lambda *shape: pl.BlockSpec((1,) + shape, lambda l, b, *_: (l,) + (0,) * len(shape), memory_space=pltpu.VMEM)
    cache = lambda itemsize_shape: pl.BlockSpec(
        (1, rows) + itemsize_shape, lambda l, b, *_: (l, b, 0, 0, 0), memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((rows, d), lambda l, b, *_: (b, 0), memory_space=pltpu.VMEM),   # x0
        pl.BlockSpec((rows, Te), lambda l, b, *_: (b, 0), memory_space=pltpu.VMEM),  # emask
        full(H, Tmax),                                                            # sbias
        lyr(d, 3 * inner), lyr(inner, d), lyr(d, inner), lyr(inner, d),
        lyr(1, d), lyr(1, d), lyr(1, d),
        lyr(d, d_ff), lyr(d_ff, d),
        cache((H, Tmax, dk)), cache((H, Tmax, dk)),                               # self k/v
        cache((H, Te, dk)), cache((H, Te, dk)),                                   # cross k/v
    ]
    args = [
        x0, encoder_mask, self_bias_row,
        weights["wqkv_s"], weights["wo_s"], weights["wq_c"], weights["wo_c"],
        weights["ln0"], weights["ln1"], weights["ln2"],
        weights["wi"], weights["wof"],
        self_k, self_v, cross_k, cross_v,
    ]
    if int8_kv:
        in_specs += [cache((H, 1, dk)), cache((H, 1, dk))]
        args += [k_scale, v_scale]

    n_in = len(args)
    kernel = functools.partial(
        _decode_step_kernel if int8_kv else _decode_step_kernel_nokscale,
        rows=rows, d=d, inner=inner, H=H, dk=dk, Tmax=Tmax, Te=Te, eps=eps,
        int8_kv=int8_kv,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, B // rows),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rows, d), lambda l, b, *_: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H, Tmax, dk), lambda l, b, *_: (l, b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, H, Tmax, dk), lambda l, b, *_: (l, b, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((B, d), x0.dtype),
            pltpu.VMEM((rows, 3 * inner), x0.dtype),
            pltpu.VMEM((rows, inner), x0.dtype),
        ],
    )
    x_final, sk_new, sv_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, d), x0.dtype),
            jax.ShapeDtypeStruct(self_k.shape, self_k.dtype),
            jax.ShapeDtypeStruct(self_v.shape, self_v.dtype),
        ),
        # self caches update in place (operand indices INCLUDE the scalar
        # prefetch: t=0, x0=1, emask=2, sbias=3, 9 weight arrays = 4..12,
        # sk=13, sv=14)
        input_output_aliases={13: 1, 14: 2},
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(jnp.atleast_1d(t).astype(jnp.int32), *args)
    return x_final, sk_new, sv_new


def _decode_step_kernel_nokscale(t_ref, x0_ref, emask_ref, sbias_ref,
                                 wqkv_s_ref, wo_s_ref, wq_c_ref, wo_c_ref,
                                 ln0_ref, ln1_ref, ln2_ref, wi_ref, wof_ref,
                                 sk_in_ref, sv_in_ref, ck_ref, cv_ref,
                                 xout_ref, sk_out_ref, sv_out_ref,
                                 x_scr, qkv_scr, attn_scr, **kw):
    _decode_step_kernel(t_ref, x0_ref, emask_ref, sbias_ref,
                        wqkv_s_ref, wo_s_ref, wq_c_ref, wo_c_ref,
                        ln0_ref, ln1_ref, ln2_ref, wi_ref, wof_ref,
                        sk_in_ref, sv_in_ref, ck_ref, cv_ref, None, None,
                        xout_ref, sk_out_ref, sv_out_ref,
                        x_scr, qkv_scr, attn_scr, **kw)


def fuse_decoder_weights(dec: dict) -> dict:
    """Pre-fuse the stacked (L, ...) decoder params for the kernel (once per
    decode, outside the step loop): self qkv concat; cross q/o and FFN pass
    through."""
    sa, ca = dec["self_attn"], dec["cross_attn"]
    return {
        "wqkv_s": jnp.concatenate([sa["q"], sa["k"], sa["v"]], axis=2),
        "wo_s": sa["o"],
        "wq_c": ca["q"],
        "wo_c": ca["o"],
        "ln0": dec["ln0"][:, None, :],
        "ln1": dec["ln1"][:, None, :],
        "ln2": dec["ln2"][:, None, :],
        "wi": dec["ffn"]["wi"],
        "wof": dec["ffn"]["wo"],
    }
