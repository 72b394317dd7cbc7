"""Optimizer construction (reference build_optimizer, src/build_utils.py:13-24
+ grad clip src/train.py:88).

AdamW with a linear warmup -> linear decay schedule
(transformers.get_linear_schedule_with_warmup semantics) and global-norm
clipping at 3.0. Selective trainability (the reference's train_* flags,
src/RAGVT5.py:61-69 / frozen submodules src/VT5.py:41-53) is an optax mask:
frozen subtrees get zero updates.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import optax


def linear_warmup_decay(lr: float, warmup_steps: int, total_steps: int) -> optax.Schedule:
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
            optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
        ],
        [max(warmup_steps, 1)],
    )


def trainable_mask(params: Dict[str, Any], trainable_roots: Sequence[str]) -> Dict[str, Any]:
    """True for subtrees under any of `trainable_roots` (top-level keys).

    e.g. trainable_roots=("t5",) mirrors the reference's default of training
    the language backbone only (src/build_utils.py:17-19 passes generator
    params to AdamW).
    """

    def mark(root_key):
        t = params[root_key]
        val = root_key in trainable_roots
        return jax.tree.map(lambda _: val, t)

    return {k: mark(k) for k in params}


def build_optimizer(
    lr: float = 2e-4,
    warmup_steps: int = 1000,
    total_steps: int = 100_000,
    clip_norm: float = 3.0,
    weight_decay: float = 0.01,
    mask: Optional[Dict[str, Any]] = None,
) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(
            linear_warmup_decay(lr, warmup_steps, total_steps),
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=weight_decay,
        ),
    )
    if mask is not None:
        # NOTE: optax.masked would pass frozen leaves' updates through as raw
        # gradients; multi_transform + set_to_zero actually freezes them.
        labels = jax.tree.map(lambda t: "train" if t else "freeze", mask)
        tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
