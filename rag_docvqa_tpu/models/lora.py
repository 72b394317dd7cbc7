"""LoRA adapters (reference train_lora.py:267-275: r=8, q/v projections).

Pure-functional: adapters live in a separate pytree mirroring the target
kernels; `merge_lora` folds `scale * A @ B` into the kernels for the forward
pass, so any model in the zoo gains LoRA without code changes — train with
gradients flowing only through the adapter tree.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layers import normal_init


def init_lora(
    rng: jax.Array,
    params: Dict[str, Any],
    targets: Sequence[str] = ("q", "v"),  # q_proj/v_proj like the reference
    rank: int = 8,
    key_name: str = "kernel",
) -> Dict[str, Any]:
    """Create A/B factors for every `targets`-named kernel in the tree.

    Kernels may be (din, dout) or stacked (L, din, dout). A ~ N(0, 1/r),
    B = 0 (standard LoRA init: adapter starts as identity)."""
    counter = [0]

    def visit(node) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in node.items():
            if not isinstance(v, dict):
                continue
            if k in targets and key_name in v and not isinstance(v[key_name], dict):
                kern = v[key_name]
                counter[0] += 1
                sub = jax.random.fold_in(rng, counter[0])
                if kern.ndim == 3:
                    L, din, dout = kern.shape
                    out[k] = {
                        "a": normal_init(sub, (L, din, rank), rank**-0.5),
                        "b": jnp.zeros((L, rank, dout)),
                    }
                else:
                    din, dout = kern.shape
                    out[k] = {
                        "a": normal_init(sub, (din, rank), rank**-0.5),
                        "b": jnp.zeros((rank, dout)),
                    }
            else:
                inner = visit(v)
                if inner:
                    out[k] = inner
        return out

    return visit(params)


def merge_lora(
    params: Dict[str, Any],
    lora: Dict[str, Any],
    scale: float = 2.0,  # alpha / r with alpha = 16, r = 8
    key_name: str = "kernel",
) -> Dict[str, Any]:
    """Return params with kernels += scale * A @ B wherever lora has factors."""

    def visit(p, l):
        out = {}
        for k, v in p.items():
            lv = l.get(k) if isinstance(l, dict) else None
            if isinstance(v, dict):
                if lv is not None and "a" in lv and key_name in v:
                    delta = jnp.einsum("...ir,...ro->...io", lv["a"], lv["b"]) * scale
                    merged = dict(v)
                    merged[key_name] = v[key_name] + delta.astype(v[key_name].dtype)
                    # also merge deeper structure if any
                    out[k] = merged
                elif lv is not None:
                    out[k] = visit(v, lv)
                else:
                    out[k] = v
            else:
                out[k] = v
        return out

    return visit(params, lora)


def lora_param_count(lora: Dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
