"""Pallas beam-search kernel vs the XLA implementation + oracle
(interpret mode on CPU; tiny sizes — the kernel's top-K loop is O(K*T))."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_asr_tpu.ops.beam import beam_search_decode
from ctc_asr_tpu.ops.beam_pallas import beam_search_decode_pallas


def _decode_lists(ids, lens):
    ids, lens = np.asarray(ids), np.asarray(lens)
    return [list(ids[b, :int(lens[b])]) for b in range(ids.shape[0])]


@pytest.mark.parametrize("seed,B,T,C,K", [
    (0, 2, 8, 6, 8),
    (1, 1, 12, 6, 8),
    (2, 3, 10, 5, 16),
])
def test_matches_xla_beam(seed, B, T, C, K):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, C)).astype(np.float32) * 2.0
    lens = rng.integers(T // 2, T + 1, B).astype(np.int32)
    want_ids, want_lens = beam_search_decode(
        jnp.asarray(logits), jnp.asarray(lens), beam_width=K,
        blank_id=C - 1, space_id=0)
    got_ids, got_lens = beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray(lens), beam_width=K,
        blank_id=C - 1, interpret=True)
    assert _decode_lists(got_ids, got_lens) == \
        _decode_lists(want_ids, want_lens)


def test_peaked_matches_greedy():
    from ctc_asr_tpu.ops.greedy import greedy_decode
    rng = np.random.default_rng(3)
    B, T, C = 2, 10, 6
    path = rng.integers(0, C, (B, T))
    logits = np.full((B, T, C), -8.0, np.float32)
    for b in range(B):
        for t in range(T):
            logits[b, t, path[b, t]] = 8.0
    lens = jnp.asarray([T, T])
    g_ids, g_lens = greedy_decode(jnp.asarray(logits), lens,
                                  blank_id=C - 1)
    p_ids, p_lens = beam_search_decode_pallas(jnp.asarray(logits), lens,
                                              beam_width=8,
                                              blank_id=C - 1,
                                              interpret=True)
    assert _decode_lists(p_ids, p_lens) == _decode_lists(g_ids, g_lens)


def test_respects_lengths():
    rng = np.random.default_rng(4)
    T, C = 10, 5
    logits = rng.standard_normal((2, T, C)).astype(np.float32) * 2.0
    ids, lens = beam_search_decode_pallas(
        jnp.asarray(logits), jnp.asarray([T, 4]), beam_width=8,
        blank_id=C - 1, interpret=True)
    want_ids, want_lens = beam_search_decode(
        jnp.asarray(logits[1:, :4]), jnp.asarray([4]), beam_width=8,
        blank_id=C - 1)
    assert _decode_lists(ids, lens)[1] == \
        _decode_lists(want_ids, want_lens)[0]


def test_blank_not_last_raises():
    logits = jnp.zeros((1, 4, 6))
    with pytest.raises(ValueError):
        beam_search_decode_pallas(logits, jnp.asarray([4]), blank_id=2,
                                  interpret=True)
