"""Greedy (best-path) CTC decoding — fully vectorized, on device.

Replaces ``tf.nn.ctc_greedy_decoder`` (C++ CPU, per-utterance sequential;
SURVEY.md §2b row 2 / §3.2 "decode leaving the accelerator is a core
weakness the build removes"). Argmax -> collapse repeats -> drop blanks,
expressed as masked cumsum + scatter so the whole batch decodes in one
fused XLA program with static output shape [B, U_max].
"""

from __future__ import annotations

import jax.numpy as jnp

from ..text import BLANK_ID, PAD_ID


def greedy_decode(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
                  blank_id: int = BLANK_ID, pad_id: int = PAD_ID):
    """[B, T, C] logits -> (ids [B, T] padded with pad_id, lengths [B]).

    Output width is T (decoded length can never exceed frames); callers
    slice with the returned lengths.
    """
    B, T, C = logits.shape
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)     # [B, T]
    t = jnp.arange(T)[None, :]
    valid = t < logit_lengths[:, None]
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), ids[:, :-1]], axis=1)
    keep = valid & (ids != blank_id) & (ids != prev)        # [B, T]
    # Compact kept ids to the front: target column = exclusive cumsum of
    # keep; dropped entries scatter to column T (out of bounds), which
    # mode="drop" discards (kept entries have unique in-bounds columns).
    pos = jnp.cumsum(keep, axis=1) - 1                      # [B, T]
    pos_w = jnp.where(keep, pos, T)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
    out = jnp.full((B, T), pad_id, jnp.int32)
    out = out.at[b_idx, pos_w].set(ids, mode="drop")
    lengths = jnp.sum(keep, axis=1).astype(jnp.int32)
    return out, lengths
