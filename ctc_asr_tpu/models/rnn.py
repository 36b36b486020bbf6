"""Recurrent layers: LSTM / GRU via lax.scan, uni- and bidirectional.

Replaces the reference's cuDNN RNN dependency (SURVEY.md §2b: fused
multi-layer (bi)LSTM/GRU in CUDA) with an XLA-native design shaped for
the TPU (SURVEY.md §7 "BiLSTM throughput" hard part):

- **Input projections hoisted out of the recurrence**: ``x @ Wx`` for all
  T steps runs as ONE large [T*B, F] x [F, 4H] matmul on the MXU before
  the scan; the scan body only does the unavoidable ``h @ Wh`` per step.
- **All 4 gates in one matmul** per step ([B, H] x [H, 4H]).
- Time-major [T, B, H] layout so the scan carries contiguous blocks.
- bf16 matmul inputs / f32 accumulation; the recurrent state itself is
  kept in f32 for stability over long utterances.
- Length masking: steps past a sequence's length pass state through
  unchanged and emit zeros, so bucket padding never contaminates state.
- Bidirectional = reverse-sequence -> same scan -> reverse back -> concat
  (the "reverse valid region" trick, SURVEY.md §7 M3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import glorot


def lstm_init(rng, in_dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(rng)
    b = jnp.zeros((4 * hidden,), jnp.float32)
    # forget-gate bias = 1 (gate order: i, f, g, o)
    b = b.at[hidden:2 * hidden].set(1.0)
    return {"wx": glorot(k1, (in_dim, 4 * hidden)),
            "wh": glorot(k2, (hidden, 4 * hidden)),
            "b": b}


def gru_init(rng, in_dim: int, hidden: int) -> dict:
    k1, k2 = jax.random.split(rng)
    return {"wx": glorot(k1, (in_dim, 3 * hidden)),
            "wh": glorot(k2, (hidden, 3 * hidden)),
            "b": jnp.zeros((3 * hidden,), jnp.float32)}


def reverse_sequence(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse the valid prefix of each sequence; padding stays in place.

    x: [T, B, ...] time-major; lengths: [B].
    """
    T = x.shape[0]
    t = jnp.arange(T)[:, None]                      # [T, 1]
    src = jnp.where(t < lengths[None, :], lengths[None, :] - 1 - t, t)  # [T,B]
    src = src.reshape((T, x.shape[1]) + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, jnp.broadcast_to(src, x.shape), axis=0)


def _mask_tb(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """[T, B] float mask of valid steps."""
    return (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)


def lstm_apply(params: dict, x: jnp.ndarray, lengths: jnp.ndarray,
               compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x: [T, B, F] -> [T, B, H]."""
    T, B, _ = x.shape
    H = params["wh"].shape[0]
    # One big MXU matmul for all input projections.
    xproj = jnp.dot(x.astype(compute_dtype),
                    params["wx"].astype(compute_dtype),
                    preferred_element_type=jnp.float32) + params["b"]
    mask = _mask_tb(lengths, T)[..., None]          # [T, B, 1]
    wh = params["wh"].astype(compute_dtype)

    def step(carry, inp):
        h, c = carry
        xp, m = inp
        gates = xp + jnp.dot(h.astype(compute_dtype), wh,
                             preferred_element_type=jnp.float32)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        c = m * c_new + (1.0 - m) * c
        h = m * h_new + (1.0 - m) * h
        return (h, c), h * m

    init = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
    _, out = jax.lax.scan(step, init, (xproj, mask))
    return out


def gru_apply(params: dict, x: jnp.ndarray, lengths: jnp.ndarray,
              compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x: [T, B, F] -> [T, B, H]. Gate order: r, z, n."""
    T, B, _ = x.shape
    H = params["wh"].shape[0]
    xproj = jnp.dot(x.astype(compute_dtype),
                    params["wx"].astype(compute_dtype),
                    preferred_element_type=jnp.float32) + params["b"]
    mask = _mask_tb(lengths, T)[..., None]
    wh = params["wh"].astype(compute_dtype)

    def step(carry, inp):
        h = carry
        xp, m = inp
        hproj = jnp.dot(h.astype(compute_dtype), wh,
                        preferred_element_type=jnp.float32)
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hproj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        h = m * h_new + (1.0 - m) * h
        return h, h * m

    init = jnp.zeros((B, H), jnp.float32)
    _, out = jax.lax.scan(step, init, (xproj, mask))
    return out


def rnn_apply(params: dict, x: jnp.ndarray, lengths: jnp.ndarray,
              rnn_type: str, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    fn = {"lstm": lstm_apply, "gru": gru_apply}[rnn_type]
    return fn(params, x, lengths, compute_dtype)


def birnn_apply(params: dict, x: jnp.ndarray, lengths: jnp.ndarray,
                rnn_type: str, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """params = {"fwd": ..., "bwd": ...}; output [T, B, 2H]."""
    fwd = rnn_apply(params["fwd"], x, lengths, rnn_type, compute_dtype)
    x_rev = reverse_sequence(x, lengths)
    bwd = rnn_apply(params["bwd"], x_rev, lengths, rnn_type, compute_dtype)
    bwd = reverse_sequence(bwd, lengths)
    return jnp.concatenate([fwd, bwd], axis=-1)
