"""VT5: T5 + spatial + visual token embeddings (reference src/VT5.py).

The reference assembles inputs on CPU per batch (tokenize loop, padding) and
calls HF T5. Here input token/box tensors arrive pre-assembled on device
(ops/gather.py builds them from retrieval output), and this module only does
the math:

  input_embeds = shared[ids] + spatial(boxes) [+ layout_emb * scale]
  input_embeds = concat([input_embeds, visual_tokens], axis=1)
                                       (src/VT5.py:195-206)

Training uses teacher forcing with shift-right (src/VT5.py:243-259); inference
uses fixed-length cached greedy decoding with the reference's confidence
product (ops/decode.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.data.contract import GeneratorInputs
from rag_docvqa_tpu.models import t5 as t5m
from rag_docvqa_tpu.models.embeddings import SpatialConfig, init_spatial_params, spatial_embed
from rag_docvqa_tpu.models.layers import normal_init
from rag_docvqa_tpu.models.vit import ViTConfig, init_vit_params, vit_encode
from rag_docvqa_tpu.ops.decode import greedy_decode


@dataclass(frozen=True)
class VT5Config:
    t5: t5m.T5Config = field(default_factory=t5m.T5Config)
    spatial: SpatialConfig = field(default_factory=SpatialConfig)
    vit: ViTConfig = field(default_factory=ViTConfig)
    use_layout_labels: str = "Default"  # "Default" | "Embed" | "Text"
    n_layout_labels: int = 5  # len(layout_map) + 1 (src/VT5.py:31-34)
    n_layout_classes: int = 12  # LayoutT5 classifier head width (LayoutT5.py:23)
    layout_loss_weight: float = 1.0  # LayoutT5.py:188
    max_source_length: int = 512
    use_visual: bool = True


def init_vt5_params(rng: jax.Array, cfg: VT5Config) -> Dict[str, Any]:
    ks = jax.random.split(rng, 5)
    d = cfg.t5.d_model
    params: Dict[str, Any] = {
        "t5": t5m.init_t5_params(ks[0], cfg.t5),
        "spatial": init_spatial_params(ks[1], cfg.spatial),
    }
    if cfg.use_visual:
        params["visual"] = {
            "vit": init_vit_params(ks[2], cfg.vit),
            "matcher": {
                "kernel": normal_init(ks[3], (cfg.vit.hidden_size, d), cfg.vit.hidden_size**-0.5),
                "bias": jnp.zeros((d,)),
            },
        }
    if cfg.use_layout_labels == "Embed":
        params["layout_emb"] = normal_init(ks[4], (cfg.n_layout_labels, d), 0.02)
        params["layout_scale"] = jnp.asarray(1.0, jnp.float32)
    if cfg.use_layout_labels != "Default":
        # LayoutT5 per-token layout classifier: LayerNorm + Linear
        # (src/LayoutT5.py:23-24,110-129; xavier init src/VT5.py:58-61)
        params["layout_head"] = {
            "ln_w": jnp.ones((d,)),
            "ln_b": jnp.zeros((d,)),
            "kernel": normal_init(jax.random.fold_in(rng, 7), (d, cfg.n_layout_classes), (2.0 / (d + cfg.n_layout_classes)) ** 0.5),
            "bias": jnp.zeros((cfg.n_layout_classes,)),
        }
    return params


def visual_features(params: Dict[str, Any], cfg: VT5Config, images: jax.Array) -> jax.Array:
    """(B, H, W, 3) normalized pixels -> (B, 197, d_model) visual tokens
    (src/_modules.py:132-144: image model + matcher)."""
    hidden = vit_encode(params["visual"]["vit"], cfg.vit, images)
    m = params["visual"]["matcher"]
    return jnp.dot(hidden, m["kernel"].astype(hidden.dtype)) + m["bias"].astype(hidden.dtype)


def input_embeds(
    params: Dict[str, Any],
    cfg: VT5Config,
    gen: GeneratorInputs,
    visual: Optional[jax.Array] = None,  # (B, Tv, d_model) precomputed tokens
    visual_mask: Optional[jax.Array] = None,  # (B, Tv) bool
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (embeds (B, S[+Tv], D), attention mask)."""
    semantic = params["t5"]["shared"][gen.input_ids]
    spatial = spatial_embed(params["spatial"], cfg.spatial, gen.input_boxes, deterministic, rng)
    x = semantic + spatial
    if cfg.use_layout_labels == "Embed":
        x = x + params["layout_emb"][gen.input_labels] * params["layout_scale"]
    mask = gen.attention_mask
    if visual is not None:
        x = jnp.concatenate([x, visual.astype(x.dtype)], axis=1)
        if visual_mask is None:
            visual_mask = jnp.ones(visual.shape[:2], bool)
        mask = jnp.concatenate([mask, visual_mask], axis=1)
    return x, mask


def forward_train(
    params: Dict[str, Any],
    cfg: VT5Config,
    gen: GeneratorInputs,
    labels: jax.Array,  # (B, Td) int32 with -100 at padding
    visual: Optional[jax.Array] = None,
    visual_mask: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Teacher-forced loss; returns (scalar CE loss, (B, Td, V) logits).

    Loss matches HF: mean CE over all non-ignored label positions.
    """
    deterministic = rng is None
    embeds, mask = input_embeds(params, cfg, gen, visual, visual_mask, deterministic, rng)
    # fused="train": whole-layer forward + handwritten Pallas backward
    # (ops/fused_encoder_bwd.py) — t5m.encode itself falls back to the
    # flash fwd+bwd pair when the kernels don't fit (the fused-INFERENCE
    # kernel's VJP would recompute the whole forward through flash —
    # strictly slower than flash alone, hence never fused=None here)
    enc = t5m.encode(params["t5"], cfg.t5, embeds, mask, deterministic, rng, fused="train")
    dec_in = t5m.shift_tokens_right(labels, cfg.t5.pad_id, cfg.t5.decoder_start_token_id)
    logits = t5m.decode_train(params["t5"], cfg.t5, dec_in, enc, mask, deterministic, rng)
    valid = labels != -100
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    loss = jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    if "layout_head" in params:
        # LayoutT5 auxiliary loss: per-token layout CE over encoder text
        # positions (src/LayoutT5.py:110-129,182-190)
        from rag_docvqa_tpu.models.layers import layer_norm

        S = gen.input_ids.shape[1]
        h = params["layout_head"]
        text_hidden = layer_norm(enc[:, :S, :], h["ln_w"], h["ln_b"], 1e-12)
        lay_logits = jnp.dot(text_hidden, h["kernel"]) + h["bias"]
        lay_valid = gen.attention_mask[:, :S]
        lay_labels = jnp.clip(gen.input_labels[:, :S], 0, cfg.n_layout_classes - 1)
        lay_logp = jax.nn.log_softmax(lay_logits.astype(jnp.float32), axis=-1)
        lay_nll = -jnp.take_along_axis(lay_logp, lay_labels[..., None], axis=-1)[..., 0]
        lay_loss = jnp.sum(lay_nll * lay_valid) / jnp.maximum(jnp.sum(lay_valid), 1)
        loss = loss + cfg.layout_loss_weight * lay_loss
    return loss, logits


def generate(
    params: Dict[str, Any],
    cfg: VT5Config,
    gen: GeneratorInputs,
    visual: Optional[jax.Array] = None,
    visual_mask: Optional[jax.Array] = None,
    max_new_tokens: int = 100,
) -> Tuple[jax.Array, jax.Array]:
    """Greedy generation; returns (tokens (B, T), confidence (B,))."""
    embeds, mask = input_embeds(params, cfg, gen, visual, visual_mask)
    enc = t5m.encode(params["t5"], cfg.t5, embeds, mask)
    return greedy_decode(params["t5"], cfg.t5, enc, mask, max_new_tokens)
