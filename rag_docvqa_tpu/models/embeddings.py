"""Spatial (2-D box) and layout embeddings for VT5.

Port of SpatialEmbeddings (src/_modules.py:48-86): x/y embedding tables over
[0, max_2d_position_embeddings) bucketed coordinates, summed over
(x0, y0, x1, y1), LayerNorm(eps=1e-12), dropout, then a single-linear
"matcher" (the reference's MLP(hidden, 0, hidden, 1) collapses to one Linear,
src/_modules.py:66,89-101).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layers import dropout, layer_norm, normal_init


@dataclass(frozen=True)
class SpatialConfig:
    max_2d_positions: int = 1024
    hidden_size: int = 768
    layer_norm_eps: float = 1e-12
    dropout_rate: float = 0.1


def init_spatial_params(rng: jax.Array, cfg: SpatialConfig) -> Dict[str, Any]:
    ks = jax.random.split(rng, 3)
    d = cfg.hidden_size
    return {
        "x_emb": normal_init(ks[0], (cfg.max_2d_positions, d), 0.02),
        "y_emb": normal_init(ks[1], (cfg.max_2d_positions, d), 0.02),
        "ln_w": jnp.ones((d,)),
        "ln_b": jnp.zeros((d,)),
        "matcher": {
            "kernel": normal_init(ks[2], (d, d), d**-0.5),
            "bias": jnp.zeros((d,)),
        },
    }


def spatial_embed(
    params: Dict[str, Any],
    cfg: SpatialConfig,
    bbox: jax.Array,  # (B, T, 4) int32 in [0, max_2d_positions)
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    bbox = jnp.clip(bbox, 0, cfg.max_2d_positions - 1)
    emb = (
        params["x_emb"][bbox[..., 0]]
        + params["y_emb"][bbox[..., 1]]
        + params["x_emb"][bbox[..., 2]]
        + params["y_emb"][bbox[..., 3]]
    )
    emb = layer_norm(emb, params["ln_w"], params["ln_b"], cfg.layer_norm_eps)
    emb = dropout(emb, cfg.dropout_rate, rng, deterministic)
    return jnp.dot(emb, params["matcher"]["kernel"]) + params["matcher"]["bias"]


def get_visual_boxes(num_pages: int = 1, scale: float = 1.0, grid: int = 14) -> jax.Array:
    """Box grid for visual tokens: CLS box [0,0,1,1] + 14x14 cells
    (src/_modules.py:126-130)."""
    cells = [[0.0, 0.0, 1.0, 1.0]] + [
        [x / grid, y / grid, (x + 1) / grid, (y + 1) / grid]
        for y in range(grid)
        for x in range(grid)
    ]
    boxes = jnp.asarray(cells, jnp.float32)[None].repeat(num_pages, axis=0)
    return boxes * scale
