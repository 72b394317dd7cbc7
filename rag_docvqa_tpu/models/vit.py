"""ViT image encoder (HF ViTModel weight-compatible).

Serves as the visual token encoder for VT5 (the reference uses
`microsoft/dit-base-finetuned-rvlcdip` via AutoModel, src/_modules.py:104-144:
page image -> 197 tokens = CLS + 14x14 patches). Patch embedding is expressed
as reshape + one matmul (MXU) instead of a conv; attention/softmax accumulate
in f32.
"""

from __future__ import annotations

import functools as _functools
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
    # BEiT options (the DiT visual backbone is BEiT: k-proj without bias,
    # per-layer relative position bias, layer-scale residuals; abs-pos
    # embeddings configurable — HF BeitConfig flags)
    arch: str = "vit"  # "vit" | "beit"
    use_abs_pos: bool = True
    use_rel_pos_bias: bool = False
    layer_scale_init: float = 0.0  # >0 enables lambda_1/lambda_2
    # BEiT with use_mean_pooling=True replaces the final LayerNorm with
    # Identity (HF BeitModel)
    use_final_layernorm: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.num_patches + 1  # + CLS

    @property
    def num_relative_distance(self) -> int:
        g = self.grid
        return (2 * g - 1) * (2 * g - 1) + 3


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

    params = {
        "patch_embed": _linear(ks[0], patch_dim, d),
        "cls_token": normal_init(ks[1], (1, 1, d), 0.02),
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
    if cfg.use_abs_pos:
        params["pos_embed"] = normal_init(ks[2], (1, cfg.seq_len, d), 0.02)
    if cfg.arch == "beit":
        del params["blocks"]["k"]["bias"]  # BEiT key projection has no bias
        if cfg.use_rel_pos_bias:
            params["blocks"]["rel_bias_table"] = jnp.zeros(
                (L, cfg.num_relative_distance, cfg.num_heads)
            )
        if cfg.layer_scale_init > 0:
            params["blocks"]["lambda_1"] = jnp.full((L, d), cfg.layer_scale_init)
            params["blocks"]["lambda_2"] = jnp.full((L, d), cfg.layer_scale_init)
    return params


def beit_relative_position_index(grid: int):
    """Relative position index incl. CLS specials (HF BeitRelativePositionBias,
    modeling_beit.py)."""
    import numpy as np

    num_rel = (2 * grid - 1) * (2 * grid - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += grid - 1
    rel[:, :, 1] += grid - 1
    rel[:, :, 0] *= 2 * grid - 1
    n = grid * grid
    index = np.zeros((n + 1, n + 1), np.int32)
    index[1:, 1:] = rel.sum(-1)
    index[0, :] = num_rel - 3
    index[:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


def extract_patches(pixels: jax.Array, patch: int) -> jax.Array:
    """(B, H, W, 3) -> (B, N, patch*patch*3), row-major patch order,
    (kh, kw, c) flattening (converter transposes the torch conv kernel to
    match)."""
    B, H, W, C = pixels.shape
    h, w = H // patch, W // patch
    x = pixels.reshape(B, h, patch, w, patch, C)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # (B, h, w, kh, kw, C)
    return x.reshape(B, h * w, patch * patch * C)


def vit_encode(
    params: Dict[str, Any], cfg: ViTConfig, pixels: jax.Array,
    return_hidden_states: bool = False,
    fused: bool | None = None,  # None = auto (whole-layer TPU kernel when eligible)
) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, 1+N, D) hidden states.

    With return_hidden_states, also returns the raw per-block outputs
    (L, B, 1+N, D) — the backbone taps BeitForSemanticSegmentation needs
    (HF collects hidden_states at config.out_indices)."""
    B = pixels.shape[0]
    patches = extract_patches(pixels, cfg.patch_size)
    # compute in the parameter dtype: host pixels arrive f32, and f32 @ bf16
    # promotes the whole tower to f32 (2x MXU cost downstream)
    pk = params["patch_embed"]["kernel"]
    x = dense(patches.astype(pk.dtype), pk, params["patch_embed"]["bias"])
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    if cfg.use_abs_pos:
        x = x + params["pos_embed"].astype(x.dtype)

    if fused is None and not return_hidden_states:
        from rag_docvqa_tpu.ops.fused_encoder import fused_vit_encoder_wanted

        T0 = x.shape[1]
        fused = fused_vit_encoder_wanted(cfg, B, -(-T0 // 8) * 8, x.dtype.itemsize)
    if fused and not return_hidden_states:
        x = _fused_vit_stack(cfg)(params["blocks"], x)
        if cfg.use_final_layernorm:
            x = layer_norm(x, params["final_ln_w"], params["final_ln_b"], cfg.layer_norm_eps)
        return x

    H, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    scale = dh**-0.5
    rel_index = None
    if cfg.arch == "beit" and cfg.use_rel_pos_bias:
        rel_index = jnp.asarray(beit_relative_position_index(cfg.grid))

    def block(x, layer):
        h = layer_norm(x, layer["ln1_w"], layer["ln1_b"], cfg.layer_norm_eps)
        q = dense(h, layer["q"]["kernel"], layer["q"]["bias"]).reshape(B, -1, H, dh)
        k = dense(h, layer["k"]["kernel"], layer["k"].get("bias")).reshape(B, -1, H, dh)
        v = dense(h, layer["v"]["kernel"], layer["v"]["bias"]).reshape(B, -1, H, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if rel_index is not None:
            bias = layer["rel_bias_table"][rel_index]  # (T, T, H)
            s = s + jnp.transpose(bias, (2, 0, 1))[None].astype(s.dtype)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, cfg.hidden_size)
        a = dense(a, layer["o"]["kernel"], layer["o"]["bias"])
        if "lambda_1" in layer:
            a = a * layer["lambda_1"].astype(a.dtype)
        x = x + a
        h = layer_norm(x, layer["ln2_w"], layer["ln2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(dense(h, layer["fc1"]["kernel"], layer["fc1"]["bias"]), approximate=False)
        h = dense(h, layer["fc2"]["kernel"], layer["fc2"]["bias"])
        if "lambda_2" in layer:
            h = h * layer["lambda_2"].astype(h.dtype)
        x = x + h
        # stack per-block states only when asked: eager callers (engine visual
        # towers) must not materialize the (L, N, T, D) stack just to drop it
        return x, (x if return_hidden_states else None)

    x, per_layer = jax.lax.scan(block, x, params["blocks"])
    if cfg.use_final_layernorm:
        x = layer_norm(x, params["final_ln_w"], params["final_ln_b"], cfg.layer_norm_eps)
    if return_hidden_states:
        return x, per_layer
    return x


@_functools.lru_cache(maxsize=None)
def _fused_vit_stack(cfg: ViTConfig):
    """Layer stack through the whole-layer ViT/BEiT kernel (inference path).
    Pads the 1+N sequence to a multiple of 8 internally (padded keys masked,
    padded query rows sliced away). custom_vjp backward recomputes through
    the XLA blocks."""
    import numpy as _np

    from rag_docvqa_tpu.ops.fused_encoder import fuse_vit_blocks, fused_vit_layer_parts

    rel_index = (
        jnp.asarray(beit_relative_position_index(cfg.grid))
        if cfg.arch == "beit" and cfg.use_rel_pos_bias
        else None
    )

    @jax.custom_vjp
    def run(blocks, x):
        B, T0, d = x.shape
        Tp = -(-T0 // 8) * 8
        pad = Tp - T0
        pre = fuse_vit_blocks(blocks, rel_index)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
            if "bias" in pre:
                pre["bias"] = jnp.pad(pre["bias"], ((0, 0), (0, 0), (0, pad), (0, pad)))
        mask = jnp.arange(Tp)[None, :] < T0
        mask = jnp.broadcast_to(mask, (B, Tp))

        def body(x, layer):
            return fused_vit_layer_parts(
                x, mask, layer, num_heads=cfg.num_heads, eps=cfg.layer_norm_eps
            ), None

        x, _ = jax.lax.scan(body, x, pre)
        return x[:, :T0] if pad else x

    def fwd(blocks, x):
        return run(blocks, x), (blocks, x)

    def bwd(res, g):
        blocks, x = res
        _, vjp = jax.vjp(lambda b, x_: _vit_xla_blocks(b, cfg, x_), blocks, x)
        return vjp(g)

    run.defvjp(fwd, bwd)
    return run


def _vit_xla_blocks(blocks, cfg: ViTConfig, x: jax.Array) -> jax.Array:
    """XLA layer stack on pre-embedded inputs (no final LN) — the fused
    path's VJP recompute target."""
    B = x.shape[0]
    H, dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    scale = dh**-0.5
    rel_index = None
    if cfg.arch == "beit" and cfg.use_rel_pos_bias:
        rel_index = jnp.asarray(beit_relative_position_index(cfg.grid))

    def block(x, layer):
        h = layer_norm(x, layer["ln1_w"], layer["ln1_b"], cfg.layer_norm_eps)
        q = dense(h, layer["q"]["kernel"], layer["q"]["bias"]).reshape(B, -1, H, dh)
        k = dense(h, layer["k"]["kernel"], layer["k"].get("bias")).reshape(B, -1, H, dh)
        v = dense(h, layer["v"]["kernel"], layer["v"]["bias"]).reshape(B, -1, H, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        if rel_index is not None:
            bias = layer["rel_bias_table"][rel_index]
            s = s + jnp.transpose(bias, (2, 0, 1))[None].astype(s.dtype)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        a = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, -1, cfg.hidden_size)
        a = dense(a, layer["o"]["kernel"], layer["o"]["bias"])
        if "lambda_1" in layer:
            a = a * layer["lambda_1"].astype(a.dtype)
        x = x + a
        h = layer_norm(x, layer["ln2_w"], layer["ln2_b"], cfg.layer_norm_eps)
        h = jax.nn.gelu(dense(h, layer["fc1"]["kernel"], layer["fc1"]["bias"]), approximate=False)
        h = dense(h, layer["fc2"]["kernel"], layer["fc2"]["bias"])
        if "lambda_2" in layer:
            h = h * layer["lambda_2"].astype(h.dtype)
        x = x + h
        return x, None

    x, _ = jax.lax.scan(block, x, blocks)
    return x


# --------------------------------------------------------------------------- #
# HF conversion (ViTModel / BeitModel — the DiT checkpoints are BEiT)
# --------------------------------------------------------------------------- #
def convert_vit_state_dict(sd, cfg: ViTConfig):
    import numpy as np

    L = cfg.num_layers
    beit = cfg.arch == "beit"
    lyr = "encoder.layer.{}."

    def t(name):
        return np.ascontiguousarray(np.asarray(sd[name]).T)

    def a(name):
        return np.asarray(sd[name])

    def stack(fmt, transpose=True):
        mats = [np.asarray(sd[fmt.format(i)]) for i in range(L)]
        if transpose:
            mats = [np.ascontiguousarray(m.T) for m in mats]
        return np.stack(mats)

    # conv patch kernel (D, 3, ph, pw) -> flattened (ph*pw*3, D) matching
    # extract_patches' (kh, kw, c) order
    conv = a("embeddings.patch_embeddings.projection.weight")
    D = conv.shape[0]
    kernel = conv.transpose(2, 3, 1, 0).reshape(-1, D)

    attn = "attention.attention." if not beit else "attention.attention."
    params = {
        "patch_embed": {"kernel": kernel, "bias": a("embeddings.patch_embeddings.projection.bias")},
        "cls_token": a("embeddings.cls_token"),
        "blocks": {
            "ln1_w": stack(lyr + "layernorm_before.weight", False),
            "ln1_b": stack(lyr + "layernorm_before.bias", False),
            "q": {"kernel": stack(lyr + attn + "query.weight"), "bias": stack(lyr + attn + "query.bias", False)},
            "k": {"kernel": stack(lyr + attn + "key.weight")},
            "v": {"kernel": stack(lyr + attn + "value.weight"), "bias": stack(lyr + attn + "value.bias", False)},
            "o": {"kernel": stack(lyr + "attention.output.dense.weight"), "bias": stack(lyr + "attention.output.dense.bias", False)},
            "ln2_w": stack(lyr + "layernorm_after.weight", False),
            "ln2_b": stack(lyr + "layernorm_after.bias", False),
            "fc1": {"kernel": stack(lyr + "intermediate.dense.weight"), "bias": stack(lyr + "intermediate.dense.bias", False)},
            "fc2": {"kernel": stack(lyr + "output.dense.weight"), "bias": stack(lyr + "output.dense.bias", False)},
        },
        # BEiT with use_mean_pooling=True has an Identity final layernorm
        "final_ln_w": a("layernorm.weight") if "layernorm.weight" in sd else np.ones((D,), np.float32),
        "final_ln_b": a("layernorm.bias") if "layernorm.bias" in sd else np.zeros((D,), np.float32),
    }
    if not beit:
        params["blocks"]["k"]["bias"] = stack(lyr + attn + "key.bias", False)
    if cfg.use_abs_pos and "embeddings.position_embeddings" in sd:
        params["pos_embed"] = a("embeddings.position_embeddings")
    if beit and cfg.use_rel_pos_bias:
        params["blocks"]["rel_bias_table"] = stack(
            lyr + "attention.attention.relative_position_bias.relative_position_bias_table", False
        )
    if beit and cfg.layer_scale_init > 0:
        params["blocks"]["lambda_1"] = stack(lyr + "lambda_1", False)
        params["blocks"]["lambda_2"] = stack(lyr + "lambda_2", False)
    return params
