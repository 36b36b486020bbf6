"""Prefix beam search vs a slow Python oracle (SURVEY.md §4.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctc_asr_tpu.ops.beam import beam_search_decode, make_beam_decoder
from ctc_asr_tpu.ops.greedy import greedy_decode


def _logaddexp(a, b):
    return np.logaddexp(a, b)


def oracle_prefix_beam(log_probs, K, blank):
    """Textbook dict-based prefix beam search. log_probs [T, C] numpy."""
    T, C = log_probs.shape
    NEG = -1e30
    beams = {(): (0.0, NEG)}  # prefix -> (p_b, p_nb)
    for t in range(T):
        lp = log_probs[t]
        new = {}

        def upd(prefix, pb=None, pnb=None):
            cpb, cpnb = new.get(prefix, (NEG, NEG))
            if pb is not None:
                cpb = _logaddexp(cpb, pb)
            if pnb is not None:
                cpnb = _logaddexp(cpnb, pnb)
            new[prefix] = (cpb, cpnb)

        for prefix, (pb, pnb) in beams.items():
            total = _logaddexp(pb, pnb)
            # stay: blank path
            upd(prefix, pb=total + lp[blank])
            # stay: repeat-collapse path
            if prefix:
                upd(prefix, pnb=pnb + lp[prefix[-1]])
            # extend
            for c in range(C - 1):
                p = (pb + lp[c]) if (prefix and c == prefix[-1]) \
                    else (total + lp[c])
                upd(prefix + (c,), pnb=p)
        beams = dict(sorted(new.items(),
                            key=lambda kv: -_logaddexp(*kv[1]))[:K])
    best = max(beams.items(), key=lambda kv: _logaddexp(*kv[1]))
    return list(best[0]), _logaddexp(*best[1])


@pytest.mark.parametrize("seed,T,C,K", [(0, 8, 5, 4), (1, 12, 6, 8),
                                        (2, 15, 4, 16), (3, 10, 8, 8)])
def test_matches_oracle(seed, T, C, K):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((1, T, C)).astype(np.float32) * 2.0
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), -1))
    want_ids, want_score = oracle_prefix_beam(lp, K, blank=C - 1)
    ids, lens = beam_search_decode(jnp.asarray(logits), jnp.asarray([T]),
                                   beam_width=K, blank_id=C - 1,
                                   space_id=0)
    got = list(np.asarray(ids)[0, :int(lens[0])])
    assert got == want_ids, (got, want_ids)


def test_respects_logit_lengths():
    rng = np.random.default_rng(5)
    C, T = 5, 10
    logits = rng.standard_normal((2, T, C)).astype(np.float32) * 2.0
    # batch 0 full length; batch 1 truncated to 4 frames
    ids, lens = beam_search_decode(jnp.asarray(logits),
                                   jnp.asarray([T, 4]), beam_width=6,
                                   blank_id=C - 1)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[1, :4]), -1))
    want_ids, _ = oracle_prefix_beam(lp, 6, blank=C - 1)
    got = list(np.asarray(ids)[1, :int(lens[1])])
    assert got == want_ids


def test_peaked_logits_match_greedy():
    """With near-one-hot posteriors, beam must equal greedy collapse."""
    rng = np.random.default_rng(7)
    B, T, C = 3, 20, 29
    path = rng.integers(0, C, (B, T))
    logits = np.full((B, T, C), -8.0, np.float32)
    for b in range(B):
        for t in range(T):
            logits[b, t, path[b, t]] = 8.0
    lens = jnp.asarray([T, T, T])
    g_ids, g_lens = greedy_decode(jnp.asarray(logits), lens)
    b_ids, b_lens = beam_search_decode(jnp.asarray(logits), lens,
                                       beam_width=8)
    for b in range(B):
        assert list(np.asarray(b_ids)[b, :int(b_lens[b])]) == \
            list(np.asarray(g_ids)[b, :int(g_lens[b])])


def test_beam_improves_on_greedy_score():
    """Beam's best path posterior sum >= greedy's (on soft posteriors)."""
    rng = np.random.default_rng(11)
    T, C, K = 14, 5, 16
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[0]), -1))
    _, beam_score = oracle_prefix_beam(lp, K, C - 1)
    ids, lens = beam_search_decode(jnp.asarray(logits), jnp.asarray([T]),
                                   beam_width=K, blank_id=C - 1)
    got = list(np.asarray(ids)[0, :int(lens[0])])
    want_ids, _ = oracle_prefix_beam(lp, K, C - 1)
    assert got == want_ids


def test_lm_fusion_biases_decode():
    """An LM that loves one char must flip a near-tie toward it."""
    from ctc_asr_tpu.ops import lm as lm_mod
    # train a tiny LM that has only ever seen "bbbb..."
    lm = lm_mod.train_char_lm(["bbbbbb bbbb", "bbb bbbbb"], order=2)
    C = 29
    T = 6
    a_id, b_id = 1, 2  # 'a', 'b'
    logits = np.full((1, T, C), -5.0, np.float32)
    # acoustically near-tied between 'a' and 'b' every frame
    logits[0, :, a_id] = 2.0
    logits[0, :, b_id] = 1.9
    no_lm = make_beam_decoder(beam_width=8)
    with_lm = make_beam_decoder(beam_width=8, lm=lm, lm_weight=3.0)
    ids0, l0 = no_lm(jnp.asarray(logits), jnp.asarray([T]))
    ids1, l1 = with_lm(jnp.asarray(logits), jnp.asarray([T]))
    dec0 = list(np.asarray(ids0)[0, :int(l0[0])])
    dec1 = list(np.asarray(ids1)[0, :int(l1[0])])
    # acoustics slightly prefer 'a'; the b-only LM must push decode to 'b'
    assert dec0.count(a_id) >= dec0.count(b_id), dec0
    assert dec1.count(b_id) > dec1.count(a_id), dec1


def test_batch_vectorization_consistent():
    """Batched decode == per-utterance decode."""
    rng = np.random.default_rng(13)
    B, T, C, K = 4, 10, 6, 8
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lens = np.array([10, 7, 10, 3], np.int32)
    ids_b, lens_b = beam_search_decode(jnp.asarray(logits),
                                       jnp.asarray(lens), beam_width=K,
                                       blank_id=C - 1)
    for b in range(B):
        ids_1, lens_1 = beam_search_decode(jnp.asarray(logits[b:b + 1]),
                                           jnp.asarray(lens[b:b + 1]),
                                           beam_width=K, blank_id=C - 1)
        assert list(np.asarray(ids_b)[b, :int(lens_b[b])]) == \
            list(np.asarray(ids_1)[0, :int(lens_1[0])])
