"""Primitive functional layers: dense, conv2d, dropout.

TPU-first numerics policy (SURVEY.md §7 M3): parameters are stored in
float32; matmuls/convs run in the configured compute dtype (bfloat16 by
default) with float32 accumulation via ``preferred_element_type`` so the
MXU runs at full rate without losing the CTC loss's f32 precision.
"""

from __future__ import annotations

import functools

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


# ---------------------------------------------------------------------------
# Conv-as-matmul: the DS2 frontend convs have tiny channel counts (1 and
# 32), which XLA lane-pads to 128 on TPU — measured ~25x off roofline as
# a 2-D NHWC conv. Reformulation: fold the FREQUENCY kernel into a dense
# banded matrix [F*cin -> f_out*cout] (one zero-padded shifted kernel
# copy per output-frequency column), which turns the 2-D conv into a
# 1-D TIME conv over MXU-sized channels (1280-wide for the DS2 shapes).
# More FLOPs on paper (F/kf overlap waste ~1.9x) but fully MXU-dense and
# nothing replicates in HBM. Measured on v5e (B=16, T=800, F=80, both
# DS2 convs, fwd+bwd): XLA 2-D 21.9 ms; im2col-concat banded matmul
# 8.7 ms (the concat materializes a kt-times replicated ~180 MB
# intermediate); this 1-D banded conv 4.6 ms (scripts/diag_conv.py).
# Gradients flow through the pad/stack that builds the banded matrix.
# ---------------------------------------------------------------------------

def _same_pad(in_size: int, k: int, s: int):
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    return out, total // 2, total - total // 2


def _band_matrices(w: jnp.ndarray, F: int, sf: int) -> jnp.ndarray:
    """[kt, kf, cin, cout] -> per-time-tap banded [kt, F*cin, f_out*cout]."""
    kt, kf, cin, cout = w.shape
    f_out, pf_lo, _pf_hi = _same_pad(F, kf, sf)
    cols = []
    for fo in range(f_out):
        lo = fo * sf - pf_lo
        k_lo = max(0, -lo)
        k_hi = min(kf, F - lo)
        wk = w[:, k_lo:k_hi]                          # [kt, keff, cin, cout]
        cols.append(jnp.pad(wk, ((0, 0), (lo + k_lo, F - (lo + k_hi)),
                                 (0, 0), (0, 0))))
    Wb = jnp.stack(cols, axis=3)                      # [kt, F, cin, fo, co]
    return Wb.reshape(kt, F * cin, f_out * cout)


def conv2d_matmul_apply(params: dict, x: jnp.ndarray, strides,
                        compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Equivalent of conv2d_apply (NHWC, SAME) as a 1-D banded conv."""
    w = params["w"]                                   # [kt, kf, cin, cout]
    cout = w.shape[3]
    B, T, F, C = x.shape
    st, sf = strides
    Wb = _band_matrices(w, F, sf)                     # [kt, F*cin, fo*co]
    f_out = Wb.shape[2] // cout
    y = jax.lax.conv_general_dilated(
        x.reshape(B, T, F * C).astype(compute_dtype),
        Wb.astype(compute_dtype),
        window_strides=(st,), padding="SAME",
        dimension_numbers=("NHC", "HIO", "NHC"))
    t_out = y.shape[1]
    return y.astype(jnp.float32).reshape(B, t_out, f_out, cout) \
        + params["b"]
