"""Shared neural-net building blocks (pure functions over param pytrees)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """T5-style LayerNorm: no mean subtraction, no bias, f32 accumulation."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight).astype(dtype)


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-12
) -> jax.Array:
    """Standard LayerNorm (BERT/ViT/SpatialEmbeddings use eps=1e-12)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * weight + bias).astype(dtype)


def dense(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """x @ kernel (+ bias). Kernel layout is (in, out)."""
    y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def dropout(
    x: jax.Array,
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jax.Array:
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def mlp_relu_stack(params: list, x: jax.Array) -> jax.Array:
    """The reference's generic MLP: ReLU between layers, none after the last
    (src/_modules.py:89-101). `params` is a list of {'kernel','bias'}."""
    n = len(params)
    for i, p in enumerate(params):
        x = dense(x, p["kernel"], p["bias"])
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def uniform_init(rng, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(rng, shape, dtype, -scale, scale)


def normal_init(rng, shape, stddev, dtype=jnp.float32):
    return jax.random.normal(rng, shape, dtype) * stddev
