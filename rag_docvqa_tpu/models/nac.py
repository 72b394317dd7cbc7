"""Not-answerable classifier (reference src/_modules.py:2467-2507).

MLP over [mean(generator input embeddings); mean(answer embeddings)] ->
sigmoid probability of "not answerable"; predictions with p > 0.5 get their
answer blanked and confidence zeroed (update_results, :2495-2507). Trained
with weighted BCE on DUDE (src/train.py:72-86).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from rag_docvqa_tpu.models.layers import mlp_relu_stack, normal_init


@dataclass(frozen=True)
class NACConfig:
    emb_dim: int = 768
    hidden_dim: int = 256
    num_layers: int = 2


def init_nac_params(rng: jax.Array, cfg: NACConfig) -> Dict[str, Any]:
    dims = [cfg.emb_dim * 2] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [1]
    ks = jax.random.split(rng, len(dims) - 1)
    return {
        "mlp": [
            {"kernel": normal_init(k, (din, dout), din**-0.5), "bias": jnp.zeros((dout,))}
            for k, din, dout in zip(ks, dims[:-1], dims[1:])
        ]
    }


def nac_prob(
    params: Dict[str, Any],
    input_embeddings: jax.Array,  # (B, S, D)
    answer_embeddings: jax.Array,  # (B, T, D)
    input_mask: Optional[jax.Array] = None,  # (B, S) — reference uses plain
    answer_mask: Optional[jax.Array] = None,  # mean over padded rows too
) -> jax.Array:
    def mean(x, mask):
        if mask is None:
            return jnp.mean(x, axis=1)
        m = mask.astype(x.dtype)[..., None]
        return jnp.sum(x * m, axis=1) / jnp.clip(jnp.sum(m, axis=1), 1e-9, None)

    feats = jnp.concatenate([mean(input_embeddings, input_mask), mean(answer_embeddings, answer_mask)], axis=-1)
    return jax.nn.sigmoid(mlp_relu_stack(params["mlp"], feats)[..., 0])  # (B,)


def nac_bce_loss(probs: jax.Array, labels: jax.Array, pos_weight: float = 1.0) -> jax.Array:
    """Weighted binary cross entropy (src/train.py:72-86: class-weighted BCE
    balancing answerable vs not-answerable on DUDE)."""
    eps = 1e-7
    p = jnp.clip(probs, eps, 1 - eps)
    per = -(pos_weight * labels * jnp.log(p) + (1 - labels) * jnp.log(1 - p))
    return jnp.mean(per)


def update_results(
    probs: jax.Array,  # (B,)
    pred_answers: List[Optional[str]],
    confidences: List[Optional[float]],
    threshold: float = 0.5,
) -> Tuple[List[Optional[str]], List[Optional[float]], List[float]]:
    """Blank answers predicted not-answerable (src/_modules.py:2495-2507)."""
    probs_l = [float(p) for p in probs]
    answers, confs = [], []
    for p, a, c in zip(probs_l, pred_answers, confidences):
        if p > threshold:
            answers.append("")
            confs.append(0.0)
        else:
            answers.append(a)
            confs.append(c)
    return answers, confs, probs_l
