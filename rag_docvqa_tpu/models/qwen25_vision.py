"""Faithful Qwen2.5-VL vision tower (HF weight-compatible).

The reference feeds retrieved patch images through Qwen2.5-VL's vision
encoder (src/QwenVLInstruct.py:85-160). models/qwen_vision.py provides a
tower-SHAPED stand-in; this module is the real architecture, convertible
from `Qwen/Qwen2.5-VL-*-Instruct` checkpoints:

  * Conv3d patch embed (temporal 2 x 14 x 14, images duplicate the frame)
  * 2-D rotary position embeddings over (h, w) patch indices
  * window attention (8x8-patch windows) with full attention at
    fullatt_block_indexes, RMSNorm blocks, gated-SiLU MLPs with bias
  * spatial-merge patch reordering + RMSNorm + 2-layer GELU merger to the
    LM width, un-permuted back to row-major merged cells

TPU design: our crops are fixed-size, so the window permutation, rotary
tables, and block-diagonal window mask are all STATIC (computed in numpy at
trace time) — HF's dynamic cu_seqlens machinery disappears and the whole
tower jits as dense masked attention over a (B, seq) batch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rag_docvqa_tpu.models.layers import dense, normal_init, rms_norm


@dataclass(frozen=True)
class Qwen25VisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 3420
    num_heads: int = 16
    depth: int = 32
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112  # pixels; merger window = ws / merge / patch cells
    out_hidden_size: int = 2048
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    in_channels: int = 3
    rms_eps: float = 1e-6
    rope_theta: float = 10000.0
    image_size: int = 112  # crop size the engine feeds (must be a patch multiple)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def tokens_per_image(self) -> int:
        g = self.image_size // self.patch_size
        return (g // self.spatial_merge_size) ** 2


def init_qwen25_vision_params(rng: jax.Array, cfg: Qwen25VisionConfig) -> Dict[str, Any]:
    D, L, I = cfg.hidden_size, cfg.depth, cfg.intermediate_size
    ks = iter(jax.random.split(rng, 12))

    def lin(k, din, dout):
        return {"kernel": normal_init(k, (L, din, dout), din**-0.5), "bias": jnp.zeros((L, dout))}

    merged = D * cfg.spatial_merge_size**2
    return {
        "patch_embed": {"kernel": normal_init(next(ks), (cfg.patch_dim, D), cfg.patch_dim**-0.5)},
        "blocks": {
            "ln1": jnp.ones((L, D)),
            "ln2": jnp.ones((L, D)),
            "qkv": lin(next(ks), D, 3 * D),
            "proj": lin(next(ks), D, D),
            "gate": lin(next(ks), D, I),
            "up": lin(next(ks), D, I),
            "down": lin(next(ks), I, D),
        },
        "merger": {
            "ln_q": jnp.ones((D,)),
            "fc1": {"kernel": normal_init(next(ks), (merged, merged), merged**-0.5),
                    "bias": jnp.zeros((merged,))},
            "fc2": {"kernel": normal_init(next(ks), (merged, cfg.out_hidden_size), merged**-0.5),
                    "bias": jnp.zeros((cfg.out_hidden_size,))},
        },
    }


# --------------------------------------------------------------------------- #
# static grid geometry (numpy, trace time)
# --------------------------------------------------------------------------- #
def _merge_order_indices(h: int, w: int, s: int) -> np.ndarray:
    """Patch sequence order: spatial-merge blocks row-major, s*s patches
    row-major inside each block (the Qwen2VL processor layout / rot_pos_emb
    reshape-permute, modeling_qwen2_5_vl rot_pos_emb)."""
    idx = np.arange(h * w).reshape(h // s, s, w // s, s)
    return np.transpose(idx, (0, 2, 1, 3)).reshape(-1)


def _pos_ids(h: int, w: int, s: int) -> np.ndarray:
    """(seq, 2) (h_idx, w_idx) per patch in merge order."""
    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
    order = _merge_order_indices(h, w, s)
    return np.stack([hpos.reshape(-1)[order], wpos.reshape(-1)[order]], axis=-1)


def _window_index(h: int, w: int, cfg: Qwen25VisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(merged-cell permutation, per-cell window id) — get_window_index with
    padding cells dropped, static for a fixed grid."""
    s = cfg.spatial_merge_size
    mw = cfg.window_size // s // cfg.patch_size  # merger window, in merged cells
    lh, lw = h // s, w // s
    pad_h = (-lh) % mw
    pad_w = (-lw) % mw
    index = np.full((lh + pad_h, lw + pad_w), -100, np.int64)
    index[:lh, :lw] = np.arange(lh * lw).reshape(lh, lw)
    nwh, nww = (lh + pad_h) // mw, (lw + pad_w) // mw
    index = index.reshape(nwh, mw, nww, mw).transpose(0, 2, 1, 3).reshape(nwh * nww, mw * mw)
    win_id = np.broadcast_to(np.arange(nwh * nww)[:, None], index.shape)
    keep = index.reshape(-1) != -100
    return index.reshape(-1)[keep], win_id.reshape(-1)[keep]


def _rotary_tables(h: int, w: int, cfg: Qwen25VisionConfig) -> Tuple[np.ndarray, np.ndarray]:
    """(seq, head_dim) cos/sin in merge order, 2-D rope (h then w halves)."""
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos = _pos_ids(h, w, cfg.spatial_merge_size)  # (seq, 2)
    freqs = pos[:, :, None].astype(np.float64) * inv_freq[None, None, :]  # (seq, 2, dim/2)
    rpe = freqs.reshape(pos.shape[0], -1)  # (seq, head_dim/2)
    emb = np.concatenate([rpe, rpe], axis=-1)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def extract_qwen_patches(pixels: jax.Array, cfg: Qwen25VisionConfig) -> jax.Array:
    """(B, H, W, 3) -> (B, seq, patch_dim) flattened patches in merge order,
    (C, T, ph, pw) feature layout with the frame duplicated temporally (the
    Qwen2VL image processor's single-image behavior)."""
    B, H, W, C = pixels.shape
    p, s = cfg.patch_size, cfg.spatial_merge_size
    h, w = H // p, W // p
    x = pixels.reshape(B, h, p, w, p, C)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))  # (B, h, w, C, ph, pw)
    x = x.reshape(B, h * w, C, p, p)
    order = jnp.asarray(_merge_order_indices(h, w, s))
    x = x[:, order]  # merge-order sequence
    # temporal duplication: (C, T=2, ph, pw) flatten
    x = jnp.broadcast_to(x[:, :, :, None], (B, h * w, C, cfg.temporal_patch_size, p, p))
    return x.reshape(B, h * w, cfg.patch_dim)


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #
def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "grid"))
def encode_features(
    params: Dict[str, Any],
    cfg: Qwen25VisionConfig,
    feats: jax.Array,  # (B, seq, patch_dim) merge-order patches
    grid: Tuple[int, int],  # (h, w) patch grid
) -> jax.Array:
    """-> (B, seq / merge^2, out_hidden_size) merged visual tokens,
    row-major merged-cell order (post reverse permutation)."""
    h, w = grid
    B, seq, _ = feats.shape
    s2 = cfg.spatial_merge_size**2
    H, hd = cfg.num_heads, cfg.head_dim

    win_perm, win_id = _window_index(h, w, cfg)  # merged-cell permutation
    cos, sin = _rotary_tables(h, w, cfg)

    x = dense(feats, params["patch_embed"]["kernel"])  # (B, seq, D)

    # reorder sequence (and rotary) by window permutation at cell granularity
    x = x.reshape(B, seq // s2, s2, -1)[:, win_perm].reshape(B, seq, -1)
    cos = jnp.asarray(cos.reshape(seq // s2, s2, -1)[win_perm].reshape(seq, -1))
    sin = jnp.asarray(sin.reshape(seq // s2, s2, -1)[win_perm].reshape(seq, -1))

    # per-patch window ids after reorder; block-diagonal window mask
    patch_win = np.repeat(win_id, s2)
    window_mask = jnp.asarray(patch_win[:, None] == patch_win[None, :])  # (seq, seq)
    is_full = np.zeros((cfg.depth,), bool)
    is_full[list(cfg.fullatt_block_indexes)] = True
    is_full = jnp.asarray(is_full)

    def block(x, layer_flag):
        layer, full = layer_flag
        hn = rms_norm(x, layer["ln1"], cfg.rms_eps)
        qkv = dense(hn, layer["qkv"]["kernel"], layer["qkv"]["bias"])  # (B, seq, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, seq, H, hd)
        k = k.reshape(B, seq, H, hd)
        v = v.reshape(B, seq, H, hd)
        c = cos[None, :, None, :].astype(jnp.float32)
        si = sin[None, :, None, :].astype(jnp.float32)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * c + _rotate_half(qf) * si).astype(x.dtype)
        k = (kf * c + _rotate_half(kf) * si).astype(x.dtype)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * hd**-0.5
        mask = window_mask | full  # full-attention layers: all True
        scores = jnp.where(mask[None, None], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, seq, -1)
        x = x + dense(a, layer["proj"]["kernel"], layer["proj"]["bias"])
        hn = rms_norm(x, layer["ln2"], cfg.rms_eps)
        g = jax.nn.silu(dense(hn, layer["gate"]["kernel"], layer["gate"]["bias"]))
        u = dense(hn, layer["up"]["kernel"], layer["up"]["bias"])
        x = x + dense(g * u, layer["down"]["kernel"], layer["down"]["bias"])
        return x, None

    x, _ = jax.lax.scan(block, x, (params["blocks"], is_full))

    # merger: RMSNorm, group merge^2 cells, MLP, un-permute
    m = params["merger"]
    x = rms_norm(x, m["ln_q"], cfg.rms_eps)
    x = x.reshape(B, seq // s2, -1)  # (B, cells, merged_dim)
    x = jax.nn.gelu(dense(x, m["fc1"]["kernel"], m["fc1"]["bias"]), approximate=False)
    x = dense(x, m["fc2"]["kernel"], m["fc2"]["bias"])
    reverse = jnp.asarray(np.argsort(win_perm))
    return x[:, reverse]


def encode_image(params: Dict[str, Any], cfg: Qwen25VisionConfig, pixels: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, (H/14)*(W/14)/4, out_hidden)."""
    H, W = pixels.shape[1], pixels.shape[2]
    grid = (H // cfg.patch_size, W // cfg.patch_size)
    feats = extract_qwen_patches(pixels, cfg)
    return encode_features(params, cfg, feats, grid)


# --------------------------------------------------------------------------- #
# HF conversion (Qwen2_5_VisionTransformerPretrainedModel, prefix "visual.")
# --------------------------------------------------------------------------- #
def convert_qwen25_vision_state_dict(sd: Dict[str, np.ndarray], cfg: Qwen25VisionConfig) -> Dict[str, Any]:
    # hub checkpoints use "visual.*"; transformers>=4.54 re-saves as
    # "model.visual.*" — accept both
    for prefix in ("visual.", "model.visual."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break
    L = cfg.depth

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    def stack(fmt, transpose=True):
        mats = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
        if transpose:
            mats = [np.ascontiguousarray(m.T) for m in mats]
        return np.stack(mats)

    def lin(base):
        return {"kernel": stack(base + ".weight"), "bias": stack(base + ".bias", transpose=False)}

    pe = a("patch_embed.proj.weight")  # (D, C, T, ph, pw)
    return {
        "patch_embed": {"kernel": np.ascontiguousarray(pe.reshape(pe.shape[0], -1).T)},
        "blocks": {
            "ln1": stack("blocks.{}.norm1.weight", transpose=False),
            "ln2": stack("blocks.{}.norm2.weight", transpose=False),
            "qkv": lin("blocks.{}.attn.qkv"),
            "proj": lin("blocks.{}.attn.proj"),
            "gate": lin("blocks.{}.mlp.gate_proj"),
            "up": lin("blocks.{}.mlp.up_proj"),
            "down": lin("blocks.{}.mlp.down_proj"),
        },
        "merger": {
            "ln_q": a("merger.ln_q.weight"),
            "fc1": {"kernel": t("merger.mlp.0.weight"), "bias": a("merger.mlp.0.bias")},
            "fc2": {"kernel": t("merger.mlp.2.weight"), "bias": a("merger.mlp.2.bias")},
        },
    }
