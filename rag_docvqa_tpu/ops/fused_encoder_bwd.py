"""Handwritten backward kernels for the fused whole-layer T5 encoder.

Round-3 measurement (PERF.md §4): the VT5 train step is BACKWARD-bound —
bwd/fwd = 2.7x vs the ~2.2x a recompute-based flash VJP should cost; the
residual is the unfused dLN/dFFN glue the XLA backward round-trips through
HBM (every elementwise/matmul backward stage re-reads and re-writes a
(B, T, d) activation). These kernels close that gap the same way the
forward whole-layer kernel did (ops/fused_encoder.py): keep the entire
layer backward resident in VMEM.

Structure (the full-layer backward needs ~92 MB VMEM at t5-base shapes —
over budget — so it splits at the attention/FFN residual boundary):

  * `_ffn_bwd_kernel`   — given the saved attention-residual sum x1 and the
    output cotangent g, recomputes h2 = RMS(x1) and the FFN activations and
    produces dx1 (incl. the residual path), dln1, dwi[/dwi0,dwi1], dwof.
  * `_attn_bwd_kernel`  — given the saved layer input x and the cotangent at
    x1, recomputes h = RMS(x), QKV and the per-head softmax (flash-style
    recompute; probs are kept in a bf16 VMEM scratch exactly as the forward
    casts them before the p@v dot) and produces dx, dln0, dwqkv, dwo, dbias.

Weight/bias gradients accumulate across the row-block grid in f32 resident
output blocks (constant index maps; init at program_id 0). The forward saves
x1 via `save_x1=True` on the forward kernel — one extra (B, T, d) bf16 HBM
write per layer, far cheaper than recomputing attention inside the FFN
backward.

`make_fused_t5_layer_train` wraps forward + backward into a layer-level
custom_vjp; models/t5.py scans it over the stacked layers (encode(...,
fused="train")). The reference trains this exact model
(/root/reference/train.py:87-102) with torch autograd; this is the TPU
equivalent with the backward hand-scheduled.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b):
    """(R, K) @ (K, N) -> (R, N), f32 accumulation."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """(R, K) x (N, K) -> (R, N): contract the trailing dims (b transposed)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _outer(a, b):
    """(R, M) x (R, N) -> (M, N): contract the row dim (a^T @ b)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _rms_parts(x32, w32, eps):
    """T5 RMSNorm forward pieces: rstd, normalized n, output h = n * w."""
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = x32 * rstd
    return rstd, n


def _rms_bwd(dh, x32, n, rstd, w32, d):
    """Backward of h = (x * rstd) * w. Returns (dx, dw_rowsum).

    dx_i = rstd * dn_i - x_i * rstd^3 / d * sum_j(dn_j * x_j), dn = dh * w.
    """
    dw = jnp.sum(dh * n, axis=0, keepdims=True)  # (1, d)
    dn = dh * w32
    s = jnp.sum(dn * x32, axis=-1, keepdims=True)  # (R, 1)
    dx = rstd * dn - x32 * (rstd * rstd * rstd) * (s * (1.0 / d))
    return dx, dw


def _gelu_tanh_and_grad(g32):
    """gelu_new (tanh approx) value and derivative, f32."""
    c = (2.0 / jnp.pi) ** 0.5
    a = 0.044715
    u = c * (g32 + a * g32 * g32 * g32)
    t = jnp.tanh(u)
    ge = 0.5 * g32 * (1.0 + t)
    dge = 0.5 * (1.0 + t) + 0.5 * g32 * (1.0 - t * t) * c * (1.0 + 3.0 * a * g32 * g32)
    return ge, dge


# --------------------------------------------------------------------------- #
# FFN (+ LN1) backward
# --------------------------------------------------------------------------- #
def _ffn_bwd_kernel(
    x1_ref,    # (rows, T, d) saved attention-residual sum
    g_ref,     # (rows, T, d) output cotangent
    ln1_ref,   # (1, d)
    *ws_and_out,  # gated: wi0, wi1, wof | plain: wi, wof; then outputs
    rows: int, T: int, d: int, eps: float, gated: bool,
):
    if gated:
        (wi0_ref, wi1_ref, wof_ref,
         dx1_ref, dln1_ref, dwi0_ref, dwi1_ref, dwof_ref) = ws_and_out
        grad_refs = (dln1_ref, dwi0_ref, dwi1_ref, dwof_ref)
    else:
        wi_ref, wof_ref, dx1_ref, dln1_ref, dwi_ref, dwof_ref = ws_and_out
        grad_refs = (dln1_ref, dwi_ref, dwof_ref)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    R = rows * T
    cdt = x1_ref.dtype
    x1 = x1_ref[...].reshape(R, d)
    g = g_ref[...].reshape(R, d)
    x32 = x1.astype(jnp.float32)
    w32 = ln1_ref[...].astype(jnp.float32)
    rstd, n = _rms_parts(x32, w32, eps)
    h2 = (n * w32).astype(cdt)

    df = _dot_t(g, wof_ref[...]).astype(cdt)  # (R, d_ff)
    if gated:
        gl = _dot(h2, wi0_ref[...])  # f32 (R, d_ff)
        u = _dot(h2, wi1_ref[...]).astype(cdt)
        # forward computes gelu from the bf16-cast pre-activation; match it
        ge, dge = _gelu_tanh_and_grad(gl.astype(cdt).astype(jnp.float32))
        f = (ge.astype(cdt) * u).astype(cdt)
        df32 = df.astype(jnp.float32)
        du = (df32 * ge).astype(cdt)
        dgl = (df32 * u.astype(jnp.float32) * dge).astype(cdt)
        dwi0_ref[...] += _outer(h2, dgl)
        dwi1_ref[...] += _outer(h2, du)
        dh2 = _dot_t(dgl, wi0_ref[...]) + _dot_t(du, wi1_ref[...])  # f32 (R, d)
    else:
        pre = _dot(h2, wi_ref[...])  # f32 (R, d_ff)
        f = jnp.maximum(pre, 0.0).astype(cdt)
        dpre = jnp.where(pre > 0.0, df.astype(jnp.float32), 0.0).astype(cdt)
        dwi_ref[...] += _outer(h2, dpre)
        dh2 = _dot_t(dpre, wi_ref[...])  # f32 (R, d)
    dwof_ref[...] += _outer(f, g)

    dx_ln, dw = _rms_bwd(dh2, x32, n, rstd, w32, d)
    dln1_ref[...] += dw
    dx1_ref[...] = (g.astype(jnp.float32) + dx_ln).astype(cdt).reshape(rows, T, d)


def _pick_rows_ffn_bwd(B, T, d, d_ff, gated, itemsize: int = 2,
                       budget: int = 64 * 2**20) -> int:
    n_wi = 2 if gated else 1

    def est(rows):
        R = rows * T
        return (
            3 * R * d * itemsize            # x1, g in; dx1 out
            + (n_wi + 1) * d * d_ff * itemsize  # resident weights
            + (n_wi + 1) * d * d_ff * 4     # f32 grad accumulators
            + (n_wi + 2) * R * d_ff * 4     # pre/gl/u + df + dpre f32 temporaries
            + 4 * R * d * 4                 # n, dh2, dn, dx f32
        )

    for rows in (8, 4, 2, 1):
        if B % rows == 0 and est(rows) <= budget:
            return rows
    return 0


def t5_ffn_bwd(x1, g, ln1, ffn_ws, *, eps: float, gated: bool,
               interpret: bool | None = None):
    """FFN + LN1 backward. Returns (dx1_total, dln1, dffn_grads tuple) —
    dx1_total includes the residual path (out = x1 + FFN(LN(x1)))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if _auto_partition_wanted():
        outs = _make_ffn_bwd_cp(eps, gated, interpret)(x1, g, ln1, *ffn_ws)
    else:
        outs = _t5_ffn_bwd_impl(x1, g, ln1, *ffn_ws, eps=eps, gated=gated,
                                interpret=interpret)
    return outs[0], outs[1], tuple(outs[2:])


def _t5_ffn_bwd_impl(x1, g, ln1, *ffn_ws, eps: float, gated: bool,
                     interpret: bool):
    B, T, d = x1.shape
    d_ff = ffn_ws[0].shape[1]
    rows = _pick_rows_ffn_bwd(B, T, d, d_ff, gated, x1.dtype.itemsize)
    if not rows:
        raise ValueError(
            f"fused FFN backward does not fit VMEM at (B={B}, T={T}, d={d}, "
            f"d_ff={d_ff}, dtype={x1.dtype})")

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [blk, blk, full(1, d)]
    out_specs = [blk, full(1, d)]
    out_shape = [jax.ShapeDtypeStruct((B, T, d), x1.dtype),
                 jax.ShapeDtypeStruct((1, d), jnp.float32)]
    if gated:
        in_specs += [full(d, d_ff), full(d, d_ff), full(d_ff, d)]
        out_specs += [full(d, d_ff), full(d, d_ff), full(d_ff, d)]
        out_shape += [jax.ShapeDtypeStruct((d, d_ff), jnp.float32),
                      jax.ShapeDtypeStruct((d, d_ff), jnp.float32),
                      jax.ShapeDtypeStruct((d_ff, d), jnp.float32)]
    else:
        in_specs += [full(d, d_ff), full(d_ff, d)]
        out_specs += [full(d, d_ff), full(d_ff, d)]
        out_shape += [jax.ShapeDtypeStruct((d, d_ff), jnp.float32),
                      jax.ShapeDtypeStruct((d_ff, d), jnp.float32)]

    outs = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, rows=rows, T=T, d=d, eps=eps,
                          gated=gated),
        grid=(B // rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (2 * (1 + (2 if gated else 1)) * d * d_ff),
            bytes_accessed=3 * B * T * d * x1.dtype.itemsize,
            transcendentals=B * T * d_ff if gated else 0,
        ),
        interpret=interpret,
    )(x1, g, ln1, *ffn_ws)
    return tuple(outs)  # (dx1, dln1, *dffn) — flat for the GSPMD wrapper


# --------------------------------------------------------------------------- #
# attention (+ LN0) backward
# --------------------------------------------------------------------------- #
def _attn_bwd_kernel(
    x_ref,     # (rows, T, d) saved layer input
    dy_ref,    # (rows, T, d) cotangent at x1 (attention-residual sum)
    mask_ref,  # (rows, 1, T) bool key mask
    bias_ref,  # (H, T, T) batch-shared rel-pos bias, or None
    wqkv_ref,  # (d, 3*inner)
    wo_ref,    # (inner, d)
    ln0_ref,   # (1, d)
    dx_ref,    # (rows, T, d) out
    dln0_ref,  # (1, d) f32 accumulator
    dwqkv_ref,  # (d, 3*inner) f32 accumulator
    dwo_ref,   # (inner, d) f32 accumulator
    *dbias_and_scratch,  # [dbias (H, T, T) f32 accumulator] + 4 scratch refs
    rows: int, T: int, d: int, H: int, dk: int, eps: float,
):
    if bias_ref is not None:
        dbias_ref, qkv_scr, p_scr, a_scr, dqkv_scr = dbias_and_scratch
    else:
        dbias_ref = None
        qkv_scr, p_scr, a_scr, dqkv_scr = dbias_and_scratch

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dln0_ref[...] = jnp.zeros_like(dln0_ref)
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        if dbias_ref is not None:
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    R = rows * T
    inner = H * dk
    cdt = x_ref.dtype
    x = x_ref[...].reshape(R, d)
    dy = dy_ref[...].reshape(R, d)
    x32 = x.astype(jnp.float32)
    w32 = ln0_ref[...].astype(jnp.float32)
    rstd, n = _rms_parts(x32, w32, eps)
    h = (n * w32).astype(cdt)
    qkv_scr[...] = _dot(h, wqkv_ref[...]).astype(cdt)

    valid = jnp.broadcast_to(
        mask_ref[...][:, :, None, :], (rows, 1, T, T)).reshape(rows, T, T)

    # forward recompute: per-head softmax probs (stored in compute dtype —
    # the forward casts p before the p@v dot, so backward matches) + the
    # attention output a (needed for dwo).
    # NUMERICS CONTRACT shared by all four attention loops — this recompute,
    # fused_encoder.py::_t5_layer_kernel (materialized + attn_stream paths)
    # and _t5_layer_kernel_qtiled: scores accumulate f32, masked keys fill
    # with -1e9, max/sum run in f32, and p casts to the compute dtype BEFORE
    # the p@v dot. A cast-order change in any copy desynchronizes this
    # backward from its forward; the grad-parity tests in
    # tests/test_fused_encoder_bwd.py pin the pairing.
    for hh in range(H):
        q = qkv_scr[:, pl.ds(hh * dk, dk)].reshape(rows, T, dk)
        k = qkv_scr[:, pl.ds(inner + hh * dk, dk)].reshape(rows, T, dk)
        v = qkv_scr[:, pl.ds(2 * inner + hh * dk, dk)].reshape(rows, T, dk)
        s = jax.lax.dot_general(q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if bias_ref is not None:
            s = s + jnp.broadcast_to(bias_ref[hh][None].astype(jnp.float32),
                                     (rows, T, T))
        s = jnp.where(valid, s, -1e9)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        p_scr[hh] = p.reshape(R, T)
        o = jax.lax.dot_general(p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        a_scr[:, pl.ds(hh * dk, dk)] = o.reshape(R, dk).astype(cdt)

    # x1 = x + a @ wo: cotangent at the attention projection output is dy
    dwo_ref[...] += _outer(a_scr[...], dy)
    da = _dot_t(dy, wo_ref[...]).astype(cdt)  # (R, inner)

    for hh in range(H):
        p = p_scr[hh].reshape(rows, T, T)
        da_h = da[:, hh * dk:(hh + 1) * dk].reshape(rows, T, dk)
        q = qkv_scr[:, pl.ds(hh * dk, dk)].reshape(rows, T, dk)
        k = qkv_scr[:, pl.ds(inner + hh * dk, dk)].reshape(rows, T, dk)
        v = qkv_scr[:, pl.ds(2 * inner + hh * dk, dk)].reshape(rows, T, dk)
        dp = jax.lax.dot_general(da_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (rows, T, T)
        dv = jax.lax.dot_general(p, da_h, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (rows, T, dk)
        p32 = p.astype(jnp.float32)
        srow = jnp.sum(dp * p32, axis=-1, keepdims=True)
        dsc32 = p32 * (dp - srow)  # softmax backward; masked keys have p=0
        if dbias_ref is not None:
            dbias_ref[hh] += jnp.sum(dsc32, axis=0)
        dsc = dsc32.astype(cdt)
        dq = jax.lax.dot_general(dsc, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dkk = jax.lax.dot_general(dsc, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dqkv_scr[:, pl.ds(hh * dk, dk)] = dq.reshape(R, dk).astype(cdt)
        dqkv_scr[:, pl.ds(inner + hh * dk, dk)] = dkk.reshape(R, dk).astype(cdt)
        dqkv_scr[:, pl.ds(2 * inner + hh * dk, dk)] = dv.reshape(R, dk).astype(cdt)

    dqkv = dqkv_scr[...]
    dwqkv_ref[...] += _outer(h, dqkv)
    dh = _dot_t(dqkv, wqkv_ref[...])  # f32 (R, d)

    dx_ln, dw = _rms_bwd(dh, x32, n, rstd, w32, d)
    dln0_ref[...] += dw
    dx_ref[...] = (dy.astype(jnp.float32) + dx_ln).astype(cdt).reshape(rows, T, d)


def _attn_bwd_kernel_nobias(x_ref, dy_ref, mask_ref, *rest, **kw):
    _attn_bwd_kernel(x_ref, dy_ref, mask_ref, None, *rest, **kw)


def _pick_rows_attn_bwd(B, T, d, inner, H, itemsize: int = 2,
                        budget: int = 64 * 2**20, has_bias: bool = True) -> int:
    Tl = max(T, 128)

    def est(rows):
        R = rows * T
        return (
            3 * R * d * itemsize                  # x, dy in; dx out
            + (3 * d * inner + inner * d) * itemsize  # resident weights
            + (3 * d * inner + inner * d) * 4     # f32 grad accumulators
            + (H * T * Tl * (2 + 4) if has_bias else 0)  # bias + f32 dbias
            + 2 * R * 3 * inner * itemsize        # qkv + dqkv scratch
            + H * R * Tl * itemsize               # stored per-head probs
            + R * inner * itemsize * 2            # a scratch + da
            + 4 * rows * T * Tl * 4               # per-head dp/dsc/p32 f32 temps
            + 5 * R * d * 4                       # n, dh, dn, dx, h f32-ish
        )

    for rows in (8, 4, 2, 1):
        if B % rows == 0 and est(rows) <= budget:
            return rows
    return 0


def t5_attn_bwd(x, dy, key_mask, bias, wqkv, wo, ln0, *,
                num_heads: int, eps: float, interpret: bool | None = None):
    """Attention + LN0 backward. Returns (dx_total, dln0, dwqkv, dwo, dbias)
    — dx_total includes the residual path (x1 = x + attn(LN(x)));
    dbias is None when bias is None."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if _auto_partition_wanted():
        cp = _make_attn_bwd_cp(bias is not None, num_heads, eps, interpret)
        args = (x, dy, key_mask) + ((bias,) if bias is not None else ()) + (wqkv, wo, ln0)
        outs = cp(*args)
    else:
        outs = _t5_attn_bwd_impl(x, dy, key_mask, bias, wqkv, wo, ln0,
                                 num_heads=num_heads, eps=eps, interpret=interpret)
    return tuple(outs) if bias is not None else (*outs, None)


def _t5_attn_bwd_impl(x, dy, key_mask, bias, wqkv, wo, ln0, *,
                      num_heads: int, eps: float, interpret: bool):
    B, T, d = x.shape
    inner = wo.shape[0]
    dk = inner // num_heads
    rows = _pick_rows_attn_bwd(B, T, d, inner, num_heads, x.dtype.itemsize,
                               has_bias=bias is not None)
    if not rows:
        raise ValueError(
            f"fused attention backward does not fit VMEM at (B={B}, T={T}, "
            f"d={d}, inner={inner}, dtype={x.dtype})")

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [blk, blk,
                pl.BlockSpec((rows, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    if bias is not None:
        in_specs.append(full(num_heads, T, T))
    in_specs += [full(d, 3 * inner), full(inner, d), full(1, d)]
    out_specs = [blk, full(1, d), full(d, 3 * inner), full(inner, d)]
    out_shape = [jax.ShapeDtypeStruct((B, T, d), x.dtype),
                 jax.ShapeDtypeStruct((1, d), jnp.float32),
                 jax.ShapeDtypeStruct((d, 3 * inner), jnp.float32),
                 jax.ShapeDtypeStruct((inner, d), jnp.float32)]
    if bias is not None:
        out_specs.append(full(num_heads, T, T))
        out_shape.append(jax.ShapeDtypeStruct((num_heads, T, T), jnp.float32))

    kernel = _attn_bwd_kernel if bias is not None else _attn_bwd_kernel_nobias
    args = (x, dy, key_mask[:, None, :]) + ((bias,) if bias is not None else ()) \
        + (wqkv, wo, ln0)
    outs = pl.pallas_call(
        functools.partial(kernel, rows=rows, T=T, d=d, H=num_heads, dk=dk, eps=eps),
        grid=(B // rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows * T, 3 * inner), x.dtype),   # qkv
            pltpu.VMEM((num_heads, rows * T, T), x.dtype),  # per-head probs
            pltpu.VMEM((rows * T, inner), x.dtype),        # attention output a
            pltpu.VMEM((rows * T, 3 * inner), x.dtype),    # dqkv
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (8 * d * inner) + 10 * B * num_heads * T * T * dk,
            bytes_accessed=3 * B * T * d * x.dtype.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        interpret=interpret,
    )(*args)
    # (dx, dln0, dwqkv, dwo[, dbias]) — flat arrays only (GSPMD-wrappable);
    # t5_attn_bwd appends the None dbias in the bias-free case
    return tuple(outs)


# --------------------------------------------------------------------------- #
# GSPMD batch partitioning for the backward kernels: each device runs the
# pallas call on its local batch shard; the weight/LN/bias gradients (which
# the kernels reduce over their LOCAL batch in resident f32 blocks) complete
# with ONE psum per output. Tensor-parallel weight shardings replicate here
# — the fused-train path targets data-parallel meshes.
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=None)
def _make_ffn_bwd_cp(eps, gated, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.ops.fused_encoder import _batch_axis_of

    n_wi = 2 if gated else 1
    kw = dict(eps=eps, gated=gated, interpret=interpret)
    fn = custom_partitioning(
        lambda x1, g, ln1, *ws: _t5_ffn_bwd_impl(x1, g, ln1, *ws, **kw))
    w_rule = ", ".join(f"c{i} e{i}" for i in range(n_wi + 1))
    rule = f"b t d, b t d, o d, {w_rule} -> b t d, o d, {w_rule}"

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        bt = NamedSharding(mesh, P(b, None, None))
        rep = NamedSharding(mesh, P(None, None))
        args = (bt, bt, rep) + (rep,) * (n_wi + 1)
        outs = (bt, rep) + (rep,) * (n_wi + 1)
        return b, args, outs

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[2]

    def part(mesh, arg_infos, result_infos):
        b, arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(x1, g, ln1, *ws):
            res = _t5_ffn_bwd_impl(x1, g, ln1, *ws, **kw)
            if b is not None:
                res = (res[0],) + tuple(jax.lax.psum(r, b) for r in res[1:])
            return res

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def _make_attn_bwd_cp(has_bias, num_heads, eps, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.ops.fused_encoder import _batch_axis_of

    kw = dict(num_heads=num_heads, eps=eps, interpret=interpret)
    if has_bias:
        fn = custom_partitioning(
            lambda x, dy, km, bias, wqkv, wo, ln0:
                _t5_attn_bwd_impl(x, dy, km, bias, wqkv, wo, ln0, **kw))
        rule = ("b t d, b t d, b t, h q k, d w, i d, o d -> "
                "b t d, o d, d w, i d, h q k")
    else:
        fn = custom_partitioning(
            lambda x, dy, km, wqkv, wo, ln0:
                _t5_attn_bwd_impl(x, dy, km, None, wqkv, wo, ln0, **kw))
        rule = "b t d, b t d, b t, d w, i d, o d -> b t d, o d, d w, i d"

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        bt = NamedSharding(mesh, P(b, None, None))
        bm = NamedSharding(mesh, P(b, None))
        rep2 = NamedSharding(mesh, P(None, None))
        rep3 = NamedSharding(mesh, P(None, None, None))
        args = (bt, bt, bm) + ((rep3,) if has_bias else ()) + (rep2, rep2, rep2)
        outs = (bt, rep2, rep2, rep2) + ((rep3,) if has_bias else ())
        return b, args, outs

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[2]

    def part(mesh, arg_infos, result_infos):
        b, arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            if has_bias:
                res = _t5_attn_bwd_impl(*args, **kw)
            else:
                x, dy, km, wqkv, wo, ln0 = args
                res = _t5_attn_bwd_impl(x, dy, km, None, wqkv, wo, ln0, **kw)
            if b is not None:
                res = (res[0],) + tuple(jax.lax.psum(r, b) for r in res[1:])
            return res

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


# --------------------------------------------------------------------------- #
# layer-level custom VJP: fused forward (saving x1) + fused backward
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=None)
def make_fused_t5_layer_train(num_heads: int, eps: float, gated: bool,
                              interpret: bool | None = None):
    """Returns layer(x, key_mask, bias, parts) -> out with a handwritten
    Pallas backward (parts: the fuse_t5_blocks per-layer dict). Gradients
    flow to x, bias, and every weight in parts; key_mask gets float0."""
    from rag_docvqa_tpu.ops.fused_encoder import fused_t5_layer_parts

    def _ffn_ws(l):
        return (l["wi_0"], l["wi_1"], l["wof"]) if gated else (l["wi"], l["wof"])

    @jax.custom_vjp
    def layer(x, key_mask, bias, l):
        return fused_t5_layer_parts(x, key_mask, bias, l, num_heads=num_heads,
                                    eps=eps, gated=gated, interpret=interpret)

    def fwd(x, key_mask, bias, l):
        out, x1 = fused_t5_layer_parts(x, key_mask, bias, l, num_heads=num_heads,
                                       eps=eps, gated=gated, interpret=interpret,
                                       save_x1=True)
        return out, (x, x1, key_mask, bias, l)

    def bwd(res, g):
        x, x1, key_mask, bias, l = res
        dx1, dln1, dffn = t5_ffn_bwd(x1, g, l["ln1"], _ffn_ws(l), eps=eps,
                                     gated=gated, interpret=interpret)
        dx, dln0, dwqkv, dwo, dbias = t5_attn_bwd(
            x, dx1, key_mask, bias, l["wqkv"], l["wo"], l["ln0"],
            num_heads=num_heads, eps=eps, interpret=interpret)
        dl = {
            "wqkv": dwqkv.astype(l["wqkv"].dtype),
            "wo": dwo.astype(l["wo"].dtype),
            "ln0": dln0.astype(l["ln0"].dtype),
            "ln1": dln1.astype(l["ln1"].dtype),
        }
        if gated:
            dl["wi_0"] = dffn[0].astype(l["wi_0"].dtype)
            dl["wi_1"] = dffn[1].astype(l["wi_1"].dtype)
            dl["wof"] = dffn[2].astype(l["wof"].dtype)
        else:
            dl["wi"] = dffn[0].astype(l["wi"].dtype)
            dl["wof"] = dffn[1].astype(l["wof"].dtype)
        dmask = np.zeros(key_mask.shape, dtype=jax.dtypes.float0)
        dbias = None if bias is None else dbias.astype(bias.dtype)
        return dx, dmask, dbias, dl

    layer.defvjp(fwd, bwd)
    return layer


def fused_t5_train_wanted(cfg, B: int, T: int, itemsize: int = 2) -> bool:
    """Whether the fused whole-layer TRAIN path (forward kernel + handwritten
    backward kernels) applies: TPU backend and every kernel's working set
    fits VMEM. Under GSPMD auto-partitioning the forward and both backward
    kernels carry custom_partitioning wrappers that shard the batch and
    psum the weight gradients, so data-parallel train steps keep this path
    (tensor-parallel weight shardings replicate through it — prefer flash
    for TP-dominant meshes)."""
    if jax.default_backend() != "tpu":
        return False
    from rag_docvqa_tpu.ops.fused_encoder import _pick_rows_t5

    inner = cfg.num_heads * cfg.d_kv
    Tp = -(-T // 8) * 8
    return (
        _pick_rows_t5(B, Tp, cfg.d_model, inner, cfg.d_ff, cfg.num_heads,
                      cfg.gated_ffn, itemsize, save_x1=True)[0] > 0
        and _pick_rows_ffn_bwd(B, Tp, cfg.d_model, cfg.d_ff, cfg.gated_ffn,
                               itemsize) > 0
        and _pick_rows_attn_bwd(B, Tp, cfg.d_model, inner, cfg.num_heads,
                                itemsize) > 0
    )


# =========================================================================== #
# BERT (post-LN) whole-layer backward — the contrastive embedder's train path
# =========================================================================== #
# Same design as the T5 pair above, adapted to the vanilla-BERT block the
# forward kernel implements (ops/fused_encoder.py::_layer_kernel):
#
#   x1  = LN1(x + Attn(x))          # post-norm; attention input is x itself
#   out = LN2(x1 + FFN(x1))         # exact-erf GELU; biases everywhere
#
# The split point is x1 (post-LN1), which the train forward saves
# (save_x1=True). The reference fine-tunes this exact model family as its
# retriever (/root/reference/train_CL_embs.py:15-50); round 4 measured the
# XLA backward at 0.14 MFU — the same inter-op HBM round-trips the forward
# fusion removed (PERF.md §2), now removed from the backward too.


def _ln_parts(y32, eps):
    mean = jnp.mean(y32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (y32 - mean) * rstd
    return n, rstd


def _ln_bwd(dh, n, rstd, w32, d):
    """Backward of out = n * w + b, n = (y - mean) * rstd.
    Returns (dy, dw_rowsum, db_rowsum)."""
    dn = dh * w32
    dy = rstd * (dn - jnp.mean(dn, axis=-1, keepdims=True)
                 - n * jnp.mean(dn * n, axis=-1, keepdims=True))
    dw = jnp.sum(dh * n, axis=0, keepdims=True)
    db = jnp.sum(dh, axis=0, keepdims=True)
    return dy, dw, db


def _gelu_erf_and_grad(x32):
    """Exact-erf GELU value and derivative, f32 — matches the forward
    kernel's _erf32 rational (fused_encoder.py)."""
    from rag_docvqa_tpu.ops.fused_encoder import _erf32

    inv_sqrt2 = 2.0 ** -0.5
    cdf = 0.5 * (1.0 + _erf32(x32 * inv_sqrt2))
    pdf = jnp.exp(-0.5 * x32 * x32) * (2.0 * jnp.pi) ** -0.5
    return x32 * cdf, cdf + x32 * pdf


def _bert_ffn_bwd_kernel(
    x1_ref,   # (rows, T, d) saved post-LN1 activation
    g_ref,    # (rows, T, d) output cotangent
    ln2_ref,  # (2, d) [scale; bias]
    w1_ref,   # (d, d_ff)
    b1_ref,   # (1, d_ff)
    w2_ref,   # (d_ff, d)
    b2_ref,   # (1, d)
    dx1_ref,  # (rows, T, d) out
    dln2_ref,  # (2, d) f32 accumulator [dscale; dbias]
    dw1_ref,  # (d, d_ff) f32 accumulator
    db1_ref,  # (1, d_ff) f32 accumulator
    dw2_ref,  # (d_ff, d) f32 accumulator
    db2_ref,  # (1, d) f32 accumulator
    *, rows: int, T: int, d: int, eps: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            r[...] = jnp.zeros_like(r)

    R = rows * T
    cdt = x1_ref.dtype
    x1 = x1_ref[...].reshape(R, d)
    g = g_ref[...].reshape(R, d)
    x132 = x1.astype(jnp.float32)
    w32 = ln2_ref[0, :].astype(jnp.float32)[None, :]

    # forward recompute (numerics contract with _layer_kernel: h1 pre-act and
    # GELU in f32; the second dot consumes the GELU output cast to cdt)
    h1 = _dot(x1, w1_ref[...]) + b1_ref[...].astype(jnp.float32)
    ge, dge = _gelu_erf_and_grad(h1)
    ge_c = ge.astype(cdt)
    x2 = _dot(ge_c, w2_ref[...]) + b2_ref[...].astype(jnp.float32)
    y2 = x132 + x2
    n2, rstd2 = _ln_parts(y2, eps)

    g32 = g.astype(jnp.float32)
    dy2, dw_ln2, db_ln2 = _ln_bwd(g32, n2, rstd2, w32, d)
    dln2_ref[...] += jnp.concatenate([dw_ln2, db_ln2], axis=0)

    dy2_c = dy2.astype(cdt)
    dw2_ref[...] += _outer(ge_c, dy2_c)
    db2_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)
    dge32 = _dot_t(dy2_c, w2_ref[...])  # f32 (R, d_ff)
    dpre = (dge32 * dge).astype(cdt)
    dw1_ref[...] += _outer(x1, dpre)
    db1_ref[...] += jnp.sum(dge32 * dge, axis=0, keepdims=True)
    dx1 = dy2 + _dot_t(dpre, w1_ref[...])  # residual + FFN input path
    dx1_ref[...] = dx1.astype(cdt).reshape(rows, T, d)


def _pick_rows_bert_ffn_bwd(B, T, d, d_ff, itemsize: int = 2,
                            budget: int = 64 * 2**20) -> int:
    def est(rows):
        R = rows * T
        return (
            3 * R * d * itemsize          # x1, g in; dx1 out
            + 2 * d * d_ff * itemsize     # resident weights
            + 2 * d * d_ff * 4            # f32 grad accumulators
            + 4 * R * d_ff * 4            # h1/ge/dge/dge32 f32
            + 5 * R * d * 4               # y2/n2/dy2/dx1 + LN temporaries
        )

    for rows in (8, 4, 2, 1):
        if B % rows == 0 and est(rows) <= budget:
            return rows
    return 0


def bert_ffn_bwd(x1, g, ln2, w1, b1, w2, b2, *, eps: float,
                 interpret: bool | None = None):
    """FFN + LN2 backward. Returns (dx1, dln2 (2, d), dw1, db1, dw2, db2) —
    dx1 includes the residual path (out = LN2(x1 + FFN(x1)))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if _auto_partition_wanted():
        return tuple(_make_bert_ffn_bwd_cp(eps, interpret)(x1, g, ln2, w1, b1, w2, b2))
    return _bert_ffn_bwd_impl(x1, g, ln2, w1, b1, w2, b2, eps=eps,
                              interpret=interpret)


def _bert_ffn_bwd_impl(x1, g, ln2, w1, b1, w2, b2, *, eps: float,
                       interpret: bool):
    B, T, d = x1.shape
    d_ff = w1.shape[1]
    rows = _pick_rows_bert_ffn_bwd(B, T, d, d_ff, x1.dtype.itemsize)
    if not rows:
        raise ValueError(
            f"fused BERT FFN backward does not fit VMEM at (B={B}, T={T}, "
            f"d={d}, d_ff={d_ff}, dtype={x1.dtype})")

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bert_ffn_bwd_kernel, rows=rows, T=T, d=d, eps=eps),
        grid=(B // rows,),
        in_specs=[blk, blk, full(2, d), full(d, d_ff), full(1, d_ff),
                  full(d_ff, d), full(1, d)],
        out_specs=[blk, full(2, d), full(d, d_ff), full(1, d_ff),
                   full(d_ff, d), full(1, d)],
        out_shape=[jax.ShapeDtypeStruct((B, T, d), x1.dtype),
                   jax.ShapeDtypeStruct((2, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, d_ff), jnp.float32),
                   jax.ShapeDtypeStruct((1, d_ff), jnp.float32),
                   jax.ShapeDtypeStruct((d_ff, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (4 * d * d_ff),
            bytes_accessed=3 * B * T * d * x1.dtype.itemsize,
            transcendentals=2 * B * T * d_ff,
        ),
        interpret=interpret,
    )(x1, g, ln2, w1, b1, w2, b2)
    return tuple(outs)


def _bert_attn_bwd_kernel(
    x_ref,     # (rows, T, d) saved layer input
    dy_ref,    # (rows, T, d) cotangent at x1 (the LN1 OUTPUT)
    mask_ref,  # (rows, 1, T) bool key mask
    wqkv_ref,  # (d, 3d)
    bqkv_ref,  # (1, 3d)
    wo_ref,    # (d, d)
    bo_ref,    # (1, d)
    ln1_ref,   # (2, d)
    dx_ref,    # (rows, T, d) out
    dln1_ref,  # (2, d) f32 accumulator
    dwqkv_ref,  # (d, 3d) f32 accumulator
    dbqkv_ref,  # (1, 3d) f32 accumulator
    dwo_ref,   # (d, d) f32 accumulator
    dbo_ref,   # (1, d) f32 accumulator
    qkv_scr,   # (R, 3d) cdt
    p_scr,     # (H, R, T) cdt
    a_scr,     # (R, d) cdt
    dqkv_scr,  # (R, 3d) cdt
    *, rows: int, T: int, d: int, H: int, scale: float, eps: float,
):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in (dln1_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref):
            r[...] = jnp.zeros_like(r)

    R = rows * T
    dh_dim = d // H
    cdt = x_ref.dtype
    x = x_ref[...].reshape(R, d)
    dy = dy_ref[...].reshape(R, d)
    x32 = x.astype(jnp.float32)
    w32 = ln1_ref[0, :].astype(jnp.float32)[None, :]

    # forward recompute — same numerics as _layer_kernel: qkv f32 + bias cast
    # to cdt; scores f32 scaled with -1e30 fill; p cast to cdt before p@v
    qkv_scr[...] = (_dot(x, wqkv_ref[...])
                    + bqkv_ref[...].astype(jnp.float32)).astype(cdt)
    valid = jnp.broadcast_to(
        mask_ref[...][:, :, None, :], (rows, 1, T, T)).reshape(rows, T, T)
    for hh in range(H):
        q = qkv_scr[:, pl.ds(hh * dh_dim, dh_dim)].reshape(rows, T, dh_dim)
        k = qkv_scr[:, pl.ds(d + hh * dh_dim, dh_dim)].reshape(rows, T, dh_dim)
        v = qkv_scr[:, pl.ds(2 * d + hh * dh_dim, dh_dim)].reshape(rows, T, dh_dim)
        s = jax.lax.dot_general(q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = jnp.where(valid, s, -1e30)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(cdt)
        p_scr[hh] = p.reshape(R, T)
        o = jax.lax.dot_general(p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        a_scr[:, pl.ds(hh * dh_dim, dh_dim)] = o.reshape(R, dh_dim).astype(cdt)

    ao = _dot(a_scr[...], wo_ref[...]) + bo_ref[...].astype(jnp.float32)
    y1 = x32 + ao
    n1, rstd1 = _ln_parts(y1, eps)

    dy32 = dy.astype(jnp.float32)
    dy1, dw_ln1, db_ln1 = _ln_bwd(dy32, n1, rstd1, w32, d)
    dln1_ref[...] += jnp.concatenate([dw_ln1, db_ln1], axis=0)

    dao = dy1.astype(cdt)
    dwo_ref[...] += _outer(a_scr[...], dao)
    dbo_ref[...] += jnp.sum(dy1, axis=0, keepdims=True)
    da = _dot_t(dao, wo_ref[...]).astype(cdt)  # (R, d)

    for hh in range(H):
        p = p_scr[hh].reshape(rows, T, T)
        da_h = da[:, hh * dh_dim:(hh + 1) * dh_dim].reshape(rows, T, dh_dim)
        q = qkv_scr[:, pl.ds(hh * dh_dim, dh_dim)].reshape(rows, T, dh_dim)
        k = qkv_scr[:, pl.ds(d + hh * dh_dim, dh_dim)].reshape(rows, T, dh_dim)
        v = qkv_scr[:, pl.ds(2 * d + hh * dh_dim, dh_dim)].reshape(rows, T, dh_dim)
        dp = jax.lax.dot_general(da_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(p, da_h, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        p32 = p.astype(jnp.float32)
        srow = jnp.sum(dp * p32, axis=-1, keepdims=True)
        # softmax backward; the score scale folds in HERE so dq/dk are plain
        # dots of the scaled dsc (s = scale * q.k)
        dsc = (p32 * (dp - srow) * scale).astype(cdt)
        dq = jax.lax.dot_general(dsc, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dkk = jax.lax.dot_general(dsc, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dqkv_scr[:, pl.ds(hh * dh_dim, dh_dim)] = dq.reshape(R, dh_dim).astype(cdt)
        dqkv_scr[:, pl.ds(d + hh * dh_dim, dh_dim)] = dkk.reshape(R, dh_dim).astype(cdt)
        dqkv_scr[:, pl.ds(2 * d + hh * dh_dim, dh_dim)] = dv.reshape(R, dh_dim).astype(cdt)

    dqkv = dqkv_scr[...]
    dwqkv_ref[...] += _outer(x, dqkv)
    dbqkv_ref[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dx = dy1 + _dot_t(dqkv, wqkv_ref[...])  # residual + qkv input path
    dx_ref[...] = dx.astype(cdt).reshape(rows, T, d)


def _pick_rows_bert_attn_bwd(B, T, d, H, itemsize: int = 2,
                             budget: int = 64 * 2**20) -> int:
    Tl = max(T, 128)

    def est(rows):
        R = rows * T
        return (
            3 * R * d * itemsize            # x, dy in; dx out
            + 4 * d * d * itemsize          # resident weights
            + 4 * d * d * 4                 # f32 grad accumulators
            + 2 * R * 3 * d * itemsize      # qkv + dqkv scratch
            + H * R * Tl * itemsize         # stored per-head probs
            + R * d * itemsize * 2          # a scratch + da
            + 4 * rows * T * Tl * 4         # per-head dp/dsc/p32 f32 temps
            + 6 * R * d * 4                 # y1/n1/dy1/ao/dx f32
        )

    for rows in (8, 4, 2, 1):
        if B % rows == 0 and est(rows) <= budget:
            return rows
    return 0


def bert_attn_bwd(x, dy, key_mask, wqkv, bqkv, wo, bo, ln1, *,
                  num_heads: int, eps: float, interpret: bool | None = None):
    """Attention + LN1 backward. Returns (dx, dln1 (2, d), dwqkv, dbqkv,
    dwo, dbo) — dx includes the residual path (x1 = LN1(x + attn(x)))."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from rag_docvqa_tpu.ops.flash_attention import _auto_partition_wanted

    if _auto_partition_wanted():
        return tuple(_make_bert_attn_bwd_cp(num_heads, eps, interpret)(
            x, dy, key_mask, wqkv, bqkv, wo, bo, ln1))
    return _bert_attn_bwd_impl(x, dy, key_mask, wqkv, bqkv, wo, bo, ln1,
                               num_heads=num_heads, eps=eps, interpret=interpret)


def _bert_attn_bwd_impl(x, dy, key_mask, wqkv, bqkv, wo, bo, ln1, *,
                        num_heads: int, eps: float, interpret: bool):
    B, T, d = x.shape
    rows = _pick_rows_bert_attn_bwd(B, T, d, num_heads, x.dtype.itemsize)
    if not rows:
        raise ValueError(
            f"fused BERT attention backward does not fit VMEM at (B={B}, "
            f"T={T}, d={d}, dtype={x.dtype})")
    dh = d // num_heads

    full = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows, T, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bert_attn_bwd_kernel, rows=rows, T=T, d=d,
                          H=num_heads, scale=dh**-0.5, eps=eps),
        grid=(B // rows,),
        in_specs=[blk, blk,
                  pl.BlockSpec((rows, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                  full(d, 3 * d), full(1, 3 * d), full(d, d), full(1, d),
                  full(2, d)],
        out_specs=[blk, full(2, d), full(d, 3 * d), full(1, 3 * d),
                   full(d, d), full(1, d)],
        out_shape=[jax.ShapeDtypeStruct((B, T, d), x.dtype),
                   jax.ShapeDtypeStruct((2, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),
                   jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),
                   jax.ShapeDtypeStruct((d, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((rows * T, 3 * d), x.dtype),
            pltpu.VMEM((num_heads, rows * T, T), x.dtype),
            pltpu.VMEM((rows * T, d), x.dtype),
            pltpu.VMEM((rows * T, 3 * d), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * (8 * d * d) + 10 * B * num_heads * T * T * dh,
            bytes_accessed=3 * B * T * d * x.dtype.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
        interpret=interpret,
    )(x, dy, key_mask[:, None, :], wqkv, bqkv, wo, bo, ln1)
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _make_bert_ffn_bwd_cp(eps, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.ops.fused_encoder import _batch_axis_of

    kw = dict(eps=eps, interpret=interpret)
    fn = custom_partitioning(
        lambda x1, g, ln2, w1, b1, w2, b2:
            _bert_ffn_bwd_impl(x1, g, ln2, w1, b1, w2, b2, **kw))
    rule = ("b t d, b t d, l d, c0 c1, u0 c1, c2 c3, u1 c3 -> "
            "b t d, l d, c0 c1, u0 c1, c2 c3, u1 c3")

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        bt = NamedSharding(mesh, P(b, None, None))
        rep = NamedSharding(mesh, P(None, None))
        return b, (bt, bt) + (rep,) * 5, (bt,) + (rep,) * 5

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[2]

    def part(mesh, arg_infos, result_infos):
        b, arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            res = _bert_ffn_bwd_impl(*args, **kw)
            if b is not None:
                res = (res[0],) + tuple(jax.lax.psum(r, b) for r in res[1:])
            return res

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def _make_bert_attn_bwd_cp(num_heads, eps, interpret):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rag_docvqa_tpu.ops.fused_encoder import _batch_axis_of

    kw = dict(num_heads=num_heads, eps=eps, interpret=interpret)
    fn = custom_partitioning(
        lambda x, dy, km, wqkv, bqkv, wo, bo, ln1:
            _bert_attn_bwd_impl(x, dy, km, wqkv, bqkv, wo, bo, ln1, **kw))
    rule = ("b t d, b t d, b t, c0 c1, u0 c1, c2 c3, u1 c3, l d -> "
            "b t d, l d, c0 c1, u0 c1, c2 c3, u1 c3")

    def _shardings(mesh, arg_infos):
        b = _batch_axis_of(mesh, arg_infos[0])
        bt = NamedSharding(mesh, P(b, None, None))
        bm = NamedSharding(mesh, P(b, None))
        rep = NamedSharding(mesh, P(None, None))
        return b, (bt, bt, bm) + (rep,) * 5, (bt,) + (rep,) * 5

    def infer(mesh, arg_infos, result_infos):
        return _shardings(mesh, arg_infos)[2]

    def part(mesh, arg_infos, result_infos):
        b, arg_sh, out_sh = _shardings(mesh, arg_infos)

        def lower(*args):
            res = _bert_attn_bwd_impl(*args, **kw)
            if b is not None:
                res = (res[0],) + tuple(jax.lax.psum(r, b) for r in res[1:])
            return res

        return mesh, lower, out_sh, arg_sh

    fn.def_partition(infer_sharding_from_operands=infer, partition=part,
                     sharding_rule=rule)
    return fn


@functools.lru_cache(maxsize=None)
def make_fused_bert_layer_train(num_heads: int, eps: float,
                                interpret: bool | None = None):
    """Returns layer(x, key_mask, l) -> out with a handwritten Pallas
    backward (l: the fuse_bert_blocks per-layer dict). Gradients flow to x
    and every weight in l; key_mask gets float0."""
    from rag_docvqa_tpu.ops.fused_encoder import fused_bert_layer_parts

    @jax.custom_vjp
    def layer(x, key_mask, l):
        return fused_bert_layer_parts(x, key_mask, l, num_heads=num_heads,
                                      eps=eps, interpret=interpret)

    def fwd(x, key_mask, l):
        out, x1 = fused_bert_layer_parts(x, key_mask, l, num_heads=num_heads,
                                         eps=eps, interpret=interpret,
                                         save_x1=True)
        return out, (x, x1, key_mask, l)

    def bwd(res, g):
        x, x1, key_mask, l = res
        dx1, dln2, dw1, db1, dw2, db2 = bert_ffn_bwd(
            x1, g, l["ln2"], l["w1"], l["b1"], l["w2"], l["b2"], eps=eps,
            interpret=interpret)
        dx, dln1, dwqkv, dbqkv, dwo, dbo = bert_attn_bwd(
            x, dx1, key_mask, l["wqkv"], l["bqkv"], l["wo"], l["bo"], l["ln1"],
            num_heads=num_heads, eps=eps, interpret=interpret)
        dl = {
            "wqkv": dwqkv.astype(l["wqkv"].dtype),
            "bqkv": dbqkv.astype(l["bqkv"].dtype),
            "wo": dwo.astype(l["wo"].dtype),
            "bo": dbo.astype(l["bo"].dtype),
            "ln1": dln1.astype(l["ln1"].dtype),
            "w1": dw1.astype(l["w1"].dtype),
            "b1": db1.astype(l["b1"].dtype),
            "w2": dw2.astype(l["w2"].dtype),
            "b2": db2.astype(l["b2"].dtype),
            "ln2": dln2.astype(l["ln2"].dtype),
        }
        dmask = np.zeros(key_mask.shape, dtype=jax.dtypes.float0)
        return dx, dmask, dl

    layer.defvjp(fwd, bwd)
    return layer


def fused_bert_train_wanted(cfg, B: int, T: int, itemsize: int = 2) -> bool:
    """Whether the fused whole-layer BERT TRAIN path applies: TPU backend,
    vanilla-BERT block (no ALiBi/GLU), and every kernel fits VMEM."""
    if jax.default_backend() != "tpu":
        return False
    if getattr(cfg, "use_alibi", False) or getattr(cfg, "glu_mlp", False):
        return False
    from rag_docvqa_tpu.ops.fused_encoder import _pick_rows

    Tp = -(-T // 8) * 8
    d, d_ff = cfg.hidden_size, cfg.intermediate_size
    return (
        _pick_rows(B, Tp, d, d_ff, itemsize, save_x1=True) > 0
        and _pick_rows_bert_ffn_bwd(B, Tp, d, d_ff, itemsize) > 0
        and _pick_rows_bert_attn_bwd(B, Tp, d, cfg.num_heads, itemsize) > 0
    )
