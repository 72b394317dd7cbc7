"""ViT image encoder (HF ViTModel weight-compatible).

Serves as the visual token encoder for VT5 (the reference uses
`microsoft/dit-base-finetuned-rvlcdip` via AutoModel, src/_modules.py:104-144:
page image -> 197 tokens = CLS + 14x14 patches). Patch embedding is expressed
as reshape + one matmul (MXU) instead of a conv; attention/softmax accumulate
in f32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layers import dense, layer_norm, normal_init


@dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    patch_size: int = 16
    image_size: int = 224
    layer_norm_eps: float = 1e-12

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS


def _linear(rng, din, dout):
    return {"kernel": normal_init(rng, (din, dout), din**-0.5), "bias": jnp.zeros((dout,))}


def init_vit_params(rng: jax.Array, cfg: ViTConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 10)
    d, L = cfg.hidden_size, cfg.num_layers
    patch_dim = cfg.patch_size * cfg.patch_size * 3

    def stack_linear(rng, din, dout):
        return {
            "kernel": normal_init(rng, (L, din, dout), din**-0.5),
            "bias": jnp.zeros((L, dout)),
        }

    return {
        "patch_embed": _linear(ks[0], patch_dim, d),
        "cls_token": normal_init(ks[1], (1, 1, d), 0.02),
        "pos_embed": normal_init(ks[2], (1, cfg.seq_len, d), 0.02),
        "blocks": {
            "ln1_w": jnp.ones((L, d)),
            "ln1_b": jnp.zeros((L, d)),
            "q": stack_linear(ks[3], d, d),
            "k": stack_linear(ks[4], d, d),
            "v": stack_linear(ks[5], d, d),
            "o": stack_linear(ks[6], d, d),
            "ln2_w": jnp.ones((L, d)),
            "ln2_b": jnp.zeros((L, d)),
            "fc1": stack_linear(ks[7], d, cfg.mlp_dim),
            "fc2": stack_linear(ks[8], cfg.mlp_dim, d),
        },
        "final_ln_w": jnp.ones((d,)),
        "final_ln_b": jnp.zeros((d,)),
    }


def extract_patches(pixels: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, patch*patch*3), row-major patch order,
    (kh, kw, c) flattening (converter transposes the torch conv kernel to
    match)."""
    B, H, W, C = pixels.shape
    h, w = H // patch, W // patch
    x = pixels.reshape(B, h, patch, w, patch, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (B, h, w, kh, kw, C)
    return x.reshape(B, h * w, patch * patch * C)


def vit_encode(params: Dict[str, Any], cfg: ViTConfig, pixels: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, 1+N, D) hidden states."""
    B = pixels.shape[0]
    patches = extract_patches(pixels, cfg.patch_size)
    x = dense(patches, params["patch_embed"]["kernel"], params["patch_embed"]["bias"])
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(x.dtype)

    H, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    scale = dh**-0.5

    def block(x, layer):
        h = layer_norm(x, layer["ln1_w"], layer["ln1_b"], cfg.layer_norm_eps)
        q = dense(h, layer["q"]["kernel"], layer["q"]["bias"]).reshape(B, -1, H, dh)
        k = dense(h, layer["k"]["kernel"], layer["k"]["bias"]).reshape(B, -1, H, dh)
        v = dense(h, layer["v"]["kernel"], layer["v"]["bias"]).reshape(B, -1, H, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, cfg.hidden_size)
        x = x + dense(a, layer["o"]["kernel"], layer["o"]["bias"])
        h = layer_norm(x, layer["ln2_w"], layer["ln2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(dense(h, layer["fc1"]["kernel"], layer["fc1"]["bias"]), approximate=False)
        x = x + dense(h, layer["fc2"]["kernel"], layer["fc2"]["bias"])
        return x, None

    x, _ = jax.lax.scan(block, x, params["blocks"])
    return layer_norm(x, params["final_ln_w"], params["final_ln_b"], cfg.layer_norm_eps)
