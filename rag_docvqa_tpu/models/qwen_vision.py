"""Qwen2-VL-shaped vision tower: ViT backbone + 2x2 patch merger -> LM width.

The reference feeds retrieved patch images to Qwen2.5-VL's vision tower
(src/QwenVLInstruct.py:85-160: resize to >=28px, chat-template image entries,
processor splices visual embeddings at <|image_pad|> positions). Qwen2-VL's
tower is a ViT whose output patches are merged 2x2 spatially and projected to
the language model's hidden size by a two-layer MLP (the "merger"); this
module reproduces that shape on top of models/vit.py so retrieved crops reach
the generator as visual tokens through the visual_embeds/visual_mask splice
hook in models/causal_lm.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layers import dense, layer_norm, normal_init
from rag_docvqa_tpu.models.vit import ViTConfig, init_vit_params, vit_encode


@dataclass(frozen=True)
class QwenVisionConfig:
    vit: ViTConfig = field(default_factory=ViTConfig)
    out_dim: int = 1024  # language model d_model
    merge_size: int = 2  # Qwen2-VL spatial_merge_size

    @property
    def tokens_per_image(self) -> int:
        g = self.vit.image_size // self.vit.patch_size
        return (g // self.merge_size) ** 2


def init_qwen_vision_params(rng: jax.Array, cfg: QwenVisionConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 3)
    d_in = cfg.vit.hidden_size * cfg.merge_size * cfg.merge_size
    hidden = d_in
    return {
        "vit": init_vit_params(ks[0], cfg.vit),
        "merger": {
            "ln_w": jnp.ones((cfg.vit.hidden_size,)),
            "ln_b": jnp.zeros((cfg.vit.hidden_size,)),
            "fc1": {"kernel": normal_init(ks[1], (d_in, hidden), d_in**-0.5),
                    "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": normal_init(ks[2], (hidden, cfg.out_dim), hidden**-0.5),
                    "bias": jnp.zeros((cfg.out_dim,))},
        },
    }


def encode_images(params: Dict[str, Any], cfg: QwenVisionConfig, images: jax.Array) -> jax.Array:
    """(N, H, W, 3) normalized pixels -> (N, tokens_per_image, out_dim).

    ViT encode -> drop CLS -> LayerNorm -> group 2x2 neighboring patches ->
    MLP(GELU) to the LM width (the Qwen2-VL merger shape)."""
    hidden = vit_encode(params["vit"], cfg.vit, images)  # (N, 1+g*g, D)
    m = params["merger"]
    g = cfg.vit.image_size // cfg.vit.patch_size
    s = cfg.merge_size
    N, D = hidden.shape[0], hidden.shape[-1]
    x = layer_norm(hidden[:, 1:, :], m["ln_w"], m["ln_b"], cfg.vit.layer_norm_eps)
    x = x.reshape(N, g // s, s, g // s, s, D)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(N, (g // s) ** 2, s * s * D)
    x = jax.nn.gelu(dense(x, m["fc1"]["kernel"], m["fc1"]["bias"]), approximate=False)
    return dense(x, m["fc2"]["kernel"], m["fc2"]["bias"])
