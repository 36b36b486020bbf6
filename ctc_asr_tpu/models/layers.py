"""Primitive functional layers: dense, conv2d, dropout.

TPU-first numerics policy (SURVEY.md §7 M3): parameters are stored in
float32; matmuls/convs run in the configured compute dtype (bfloat16 by
default) with float32 accumulation via ``preferred_element_type`` so the
MXU runs at full rate without losing the CTC loss's f32 precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def glorot(rng, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    if len(shape) > 2:  # conv kernels: receptive field multiplies fan
        rf = int(np.prod(shape[:-2]))
        fan_in, fan_out = fan_in * rf, fan_out * rf
    scale = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -scale, scale)


def dense_init(rng, in_dim: int, out_dim: int) -> dict:
    return {"w": glorot(rng, (in_dim, out_dim)),
            "b": jnp.zeros((out_dim,), jnp.float32)}


def dense_apply(params: dict, x: jnp.ndarray,
                compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ w + b with bf16 inputs, f32 accumulation. Output f32."""
    y = jnp.dot(x.astype(compute_dtype), params["w"].astype(compute_dtype),
                preferred_element_type=jnp.float32)
    return y + params["b"]


def conv2d_init(rng, kh: int, kw: int, cin: int, cout: int) -> dict:
    return {"w": glorot(rng, (kh, kw, cin, cout)),
            "b": jnp.zeros((cout,), jnp.float32)}


def conv2d_apply(params: dict, x: jnp.ndarray, strides,
                 compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """NHWC conv with SAME padding, bf16 compute, f32 accumulation.

    For the DS2-style frontend H = time and W = frequency; SAME padding
    keeps output length = ceil(in_len / stride) (see
    ``encoder.output_lengths``).
    """
    # No preferred_element_type here: conv's transpose (grad) rule
    # requires operand/cotangent dtypes to match, so we keep the conv
    # uniformly in compute dtype and upcast after (the TPU MXU still
    # accumulates bf16 products in f32 internally).
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), params["w"].astype(compute_dtype),
        window_strides=tuple(strides), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.astype(jnp.float32) + params["b"]


def clipped_relu(x: jnp.ndarray, clip: float = 20.0) -> jnp.ndarray:
    """min(max(x, 0), clip) — the reference's frontend nonlinearity."""
    return jnp.clip(x, 0.0, clip)


def dropout(rng, x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
