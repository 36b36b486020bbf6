"""Pallas TPU kernel: CTC prefix beam search (acoustic scoring).

The kernelized counterpart of ``ops/beam.py`` (which replaces
``tf.nn.ctc_beam_search_decoder``, SURVEY.md §2b row 2) — the beam state
never leaves VMEM across the whole utterance (BASELINE.json:5
"beam-search kernels ... at speed-of-light roofline"). Parity-tested
against the XLA implementation and the Python oracle in
tests/test_beam_pallas.py (interpret mode on CPU).

Kernel shape dictionary (K = beam width on sublanes, C = classes on
lanes, U = max decode length on lanes):

- Beam state in VMEM scratch, persistent across the time grid:
  ``pfx [K, U]`` (f32-coded small ints), ``plen/last/pb/pnb [K, 1]``,
  dual rolling hashes ``h1/h2 [K, 1]`` (wrapping int32).
- One timestep = one grid step (grid (B, T), t minor) consuming a
  ``[1, C]`` log-prob row; all work is VPU/MXU ops on [K, C], [K, K]
  and [K, U] tiles — NO sorts, NO gathers, NO dynamic indexing
  (Mosaic-safe by construction):

  * **Merge** (identical prefixes): with unique beam strings, a merge
    can only pair beam k's "stay" with beam j's "extend by k's last
    char" — an O(K^2) *pairwise-beam* hash test
    ``h(j)*M + c_k == h(k)``, not an O((K*C)^2) candidate sort like the
    XLA path. A parent column j may match several stay rows k (they are
    distinct extend cells (j, c_k)); every match is a real merge.
    Merged extends are killed via a [K,K] x [K,C] one-hot matmul.
  * **Top-K**: K iterations of global-max -> first-index one-hot ->
    mask-out over the [K, C] candidate score matrix; each iteration
    accumulates the new beam row as an outer-product add
    ``(sublane==i) * selected_row`` — dynamic row writes without
    dynamic indexing.
  * Beams created from exhausted (NEG-score) candidates get poisoned,
    step-unique hashes so they can never merge with live beams.

LM shallow fusion (BASELINE.json:10) IS kernelized: the dense char
n-gram table (ops/lm.py) rides in VMEM as a grid-constant input block
(bf16 above 4096 contexts — order-4 is 22016 rows = 5.6 MB padded), and
per-beam rows are fetched with K dynamic sublane slices (``pl.ds`` on a
masked-reduce scalar context id) per timestep — the TPU analog of the
XLA path's ``table[ctx]`` gather. Per-beam LM state (context id,
accumulated log P, word-bonus count) lives in three more [K, 1]
scratches; ranking adds ``lm_weight * lm + word_bonus * bonus`` exactly
as ops/beam.py does, while pb/pnb stay purely acoustic. Order-5 tables
(614k contexts) exceed VMEM and fall back to the XLA decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..text import BLANK_ID, PAD_ID

NEG = -1.0e30
import numpy as np


def _i32(v: int) -> np.int32:
    # Constant as wrapping int32: Mosaic lacks uint32 reductions, and
    # int32 two-complement mul/add are bitwise identical mod 2**32.
    return np.int32(((v + 2**31) % 2**32) - 2**31)


_M1, _A1 = _i32(1000003), _i32(0x9E3779B9)
_M2, _A2 = _i32(69069), _i32(0x85EBCA6B)
_POISON = _i32(0xD0000000)


def _lse2(a, b):
    m = jnp.maximum(jnp.maximum(a, b), NEG)
    return jnp.maximum(m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m)), NEG)


def _beam_kernel(lp_ref, len_ref, *refs,
                 K: int, C: int, U: int, T: int, blank: int, space: int,
                 has_lm: bool, lm_weight: float, word_bonus: float,
                 lm_vocab: int, ctx_size: int, init_ctx: int,
                 emit_nbest: bool = False):
    if has_lm:
        table_ref, refs = refs[0], refs[1:]
    if emit_nbest:
        score_ref, refs = refs[2], refs[:2] + refs[3:]
    (ids_ref, outlen_ref, pfx, plen, last, pb, pnb, h1, h2,
     ctx, lmacc, bon) = refs
    t = pl.program_id(1)
    lp_row = lp_ref[0, 0]                                # [1, C]
    seq_len = len_ref[0, 0, 0]

    subl = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)        # [K,1]
    laneC = jax.lax.broadcasted_iota(jnp.int32, (K, C), 1)       # [K,C]
    laneU = jax.lax.broadcasted_iota(jnp.int32, (K, U), 1)       # [K,U]

    @pl.when(t == 0)
    def _init():
        pfx[...] = jnp.full((K, U), float(PAD_ID), jnp.float32)
        plen[...] = jnp.zeros((K, 1), jnp.float32)
        last[...] = jnp.full((K, 1), -1.0, jnp.float32)
        pb[...] = jnp.where(subl == 0, 0.0, NEG).astype(jnp.float32)
        pnb[...] = jnp.full((K, 1), NEG, jnp.float32)
        sub_u = subl
        h1[...] = jnp.where(subl == 0, jnp.int32(17), _POISON + sub_u)
        h2[...] = jnp.where(subl == 0, jnp.int32(29), _POISON + sub_u)
        ctx[...] = jnp.full((K, 1), init_ctx, jnp.int32)
        lmacc[...] = jnp.zeros((K, 1), jnp.float32)
        bon[...] = jnp.zeros((K, 1), jnp.float32)

    valid = t < seq_len

    lastv = last[...]                                    # [K,1] f32
    pbv, pnbv = pb[...], pnb[...]
    total = _lse2(pbv, pnbv)                             # [K,1]
    lanef = laneC.astype(jnp.float32)

    # lp gathered at each beam's last char (one-hot row-sum; -1 -> 0)
    onehot_last = (lanef == lastv).astype(jnp.float32)   # [K,C]
    lp_last = jnp.sum(onehot_last * lp_row, axis=1, keepdims=True)

    # ---- stay candidates ------------------------------------------------
    # lp[blank]: blank is a static column
    lp_blank = lp_row[0, blank]
    stay_pb = total + lp_blank                           # [K,1]
    stay_pnb = jnp.where(lastv >= 0, pnbv + lp_last, NEG)

    # ---- extend candidates [K, C] (cols 0..C-2; blank col = stay slot) --
    is_rep = lanef == lastv
    ext_pnb = jnp.where(is_rep, pbv, total) + lp_row     # [K,C]
    ext_pnb = jnp.where(laneC < C - 1, ext_pnb, NEG)

    # ---- pairwise merge: stay(k) vs extend(j, last_k) -------------------
    h1r = h1[...]                                        # [K,1] int32
    h2r = h2[...]
    c_k = lastv                                          # [K,1]
    c_k_u = jnp.where(c_k >= 0, c_k, 0).astype(jnp.int32)
    # hash of (prefix_j + c_k): rows k, cols j
    h1_j = jnp.broadcast_to(h1r.reshape(1, K), (K, K))
    h2_j = jnp.broadcast_to(h2r.reshape(1, K), (K, K))
    h1_ext = h1_j * _M1 + (c_k_u + _A1)                  # [K,K]
    h2_ext = h2_j * _M2 + (c_k_u + _A2)
    match = (h1_ext == h1r) & (h2_ext == h2r) & (c_k >= 0)
    # A column j may match SEVERAL stay rows k — those are different
    # extend cells (j, c_k1), (j, c_k2): every one is a real merge.
    # (An earlier "first matching stay only" guard here dropped the
    # second merge and bootstrapped duplicate beams; with unique beam
    # strings one extend CELL can only ever match one stay, so no
    # double-merge guard is needed.)

    pb_j = jnp.broadcast_to(pbv.reshape(1, K), (K, K))
    tot_j = jnp.broadcast_to(total.reshape(1, K), (K, K))
    last_j = jnp.broadcast_to(lastv.reshape(1, K), (K, K))
    base_j = jnp.where(last_j == c_k, pb_j, tot_j)       # [K,K]
    val = jnp.where(match, base_j + lp_last, NEG)
    mval = jnp.max(val, axis=1, keepdims=True)
    mval = jnp.maximum(mval, NEG)
    merged_in = mval + jnp.log(
        jnp.sum(jnp.exp(val - mval), axis=1, keepdims=True) + 1e-38)
    stay_pnb = _lse2(stay_pnb, jnp.maximum(merged_in, NEG))

    # kill merged extends: ext (j, c) dies iff some k merged (j, c_k=c)
    # kill[j, c] = any_k match[k, j] & (last_k == c):
    # one-hot matmul (match^T [j,k]) @ (onehot_last [k,c]) on the MXU.
    killed = jax.lax.dot_general(
        jnp.where(match, 1.0, 0.0), onehot_last,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [j(K), C]
    ext_pnb = jnp.where(killed > 0.5, NEG, ext_pnb)

    # ---- LM fusion state [K, C] (see module docstring) ------------------
    lmv, bonv, ctxv = lmacc[...], bon[...], ctx[...]
    if has_lm:
        # per-beam table row via K dynamic sublane slices: the context
        # id is a masked-reduce scalar; Mosaic requires the dynamic row
        # index to be provably 8-aligned, so load the aligned 8-row
        # block at (ctx//8)*8 and mask-select the row (host side pads
        # n_ctx to a multiple of 8). The row lands on beam i's sublane
        # through an outer-product add (no dynamic row writes).
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)

        def _gather_row(i, acc):
            ctx_i = jnp.sum(jnp.where(subl == i, ctxv, 0))
            base = (ctx_i // 8) * 8
            blk = table_ref[pl.ds(base, 8), :].astype(jnp.float32)
            row = jnp.sum(jnp.where(sub8 == ctx_i - base, blk, 0.0),
                          axis=0, keepdims=True)          # [1, C]
            return acc + jnp.where(subl == i, 1.0, 0.0) * row
        lm_rows = jax.lax.fori_loop(
            0, K, _gather_row, jnp.zeros((K, C), jnp.float32))
        # stay (blank col) keeps the accumulated LM score; extends add
        # log P(c | ctx). The table's blank column is zero-padded, but
        # the where keeps the stay slot exact even for bf16 tables.
        cand_lm = lmv + jnp.where(laneC == blank, 0.0, lm_rows)
        cand_bon = bonv + jnp.where(
            (laneC == space) & (laneC != blank), 1.0, 0.0)
        cand_ctx = jnp.where(
            laneC == blank, ctxv,
            (ctxv * lm_vocab + laneC) % ctx_size).astype(jnp.int32)
    else:
        cand_lm = jnp.zeros((K, C), jnp.float32)
        cand_bon = jnp.zeros((K, C), jnp.float32)
        cand_ctx = jnp.zeros((K, C), jnp.int32)

    # ---- candidate matrices [K, C] -------------------------------------
    cand_pb = jnp.where(laneC == blank, stay_pb, NEG)
    cand_pnb = jnp.where(laneC == blank, stay_pnb, ext_pnb)
    scores = _lse2(cand_pb, cand_pnb)
    if has_lm:
        scores = scores + lm_weight * cand_lm + word_bonus * cand_bon

    # ---- top-K selection + state rebuild -------------------------------
    # The K-iteration argmax loop tracks only [K,1]/[K,K] state; the
    # O(K*U) prefix work is DEFERRED out of the loop (VERDICT r4 next
    # #2): the loop accumulates a one-hot parent matrix P [K,K] and the
    # new chars/write-positions, then ONE [K,K]x[K,U] f32 matmul on the
    # MXU rebuilds all K parent prefixes at once (exact: one-hot times
    # small ints), followed by a single masked lane write. This removes
    # the per-iteration [K,U] masked reduce + outer-product accumulate
    # that made the loop O(K^2*U) on the VPU — measured 2.0x at the
    # contract shape (K=64, U=256) and 4.8x at U=1024.
    idx2d = jax.lax.broadcasted_iota(jnp.int32, (K, C), 0) * C + laneC

    pfx_f = pfx[...]
    plen_f = plen[...]

    def sel_body(i, carry):
        (sc, n_par, n_char, n_ext, n_plen, n_last, n_pb, n_pnb,
         n_h1, n_h2, n_lm, n_bon, n_ctx) = carry
        m = jnp.max(sc)
        eq = sc >= m                                     # [K,C]
        pick = jnp.min(jnp.where(eq, idx2d, K * C))
        sel = idx2d == pick                              # [K,C] one-hot
        selrow = jnp.sum(jnp.where(sel, 1.0, 0.0), axis=1,
                         keepdims=True)                  # [K,1] parent
        c_sel = jnp.sum(jnp.where(sel, lanef, 0.0))      # scalar char
        is_stay = c_sel == float(blank)
        is_dead = m <= NEG / 2

        pb_i = jnp.sum(jnp.where(sel, cand_pb, 0.0))
        pnb_i = jnp.sum(jnp.where(sel, cand_pnb, 0.0))
        # A dead pick re-selects an already-taken cell (all remaining
        # scores are NEG-tied, min-index wins): it must NOT inherit that
        # cell's original finite probabilities.
        pb_i = jnp.where(is_dead, NEG, pb_i)
        pnb_i = jnp.where(is_dead, NEG, pnb_i)
        lm_i = jnp.where(is_dead, 0.0, jnp.sum(jnp.where(sel, cand_lm, 0.0)))
        bon_i = jnp.where(is_dead, 0.0,
                          jnp.sum(jnp.where(sel, cand_bon, 0.0)))
        ctx_i = jnp.where(is_dead, 0, jnp.sum(jnp.where(sel, cand_ctx, 0)))

        # parent scalar state ([K,1] cross-sublane masked reduces; the
        # [K,U] prefix row itself is NOT touched here)
        par_len = jnp.sum(plen_f * selrow)
        par_last = jnp.sum(lastv * selrow)
        selrow_u = selrow.astype(jnp.int32)
        par_h1 = jnp.sum(h1r * selrow_u)
        par_h2 = jnp.sum(h2r * selrow_u)

        ext = jnp.logical_not(is_stay)
        extf = jnp.where(ext, 1.0, 0.0)
        # clamp at U (matches ops/beam.py): a full prefix buffer makes
        # the deferred lane write below a no-op, so the length must not
        # grow past the ids width either
        new_len = jnp.minimum(par_len + extf, float(U))
        new_last = jnp.where(ext, c_sel, par_last)
        c_u = c_sel.astype(jnp.int32)
        nh1 = jnp.where(ext, par_h1 * _M1 + (c_u + _A1), par_h1)
        nh2 = jnp.where(ext, par_h2 * _M2 + (c_u + _A2), par_h2)
        # exhausted candidates become poisoned, step-unique dead beams
        poison_tag = (_POISON + jnp.int32(1)
                      + jnp.asarray(t).astype(jnp.int32) * jnp.int32(K)
                      + jnp.asarray(i).astype(jnp.int32))
        nh1 = jnp.where(is_dead, poison_tag, nh1)
        nh2 = jnp.where(is_dead, poison_tag ^ jnp.int32(0xABCD), nh2)

        rowsel = (subl == i).astype(jnp.float32)         # [K,1]
        rowsel_u = rowsel.astype(jnp.int32)
        # P[i, j] = 1 iff new beam i's parent is old beam j
        n_par = n_par + rowsel * selrow.reshape(1, K)    # [K,K] outer
        n_char = n_char + rowsel * c_sel
        # write position: the TRUE parent length (pre-increment, not
        # new_len - 1: a clamped new_len == U must produce NO write,
        # exactly like the old per-iteration (laneU == par_len) mask)
        n_ext = n_ext + rowsel * (extf * (1.0 + par_len))
        n_plen = n_plen + rowsel * new_len
        n_last = n_last + rowsel * jnp.where(is_dead, -1.0, new_last)
        n_pb = n_pb + rowsel * pb_i
        n_pnb = n_pnb + rowsel * pnb_i
        n_h1 = n_h1 + rowsel_u * nh1
        n_h2 = n_h2 + rowsel_u * nh2
        n_lm = n_lm + rowsel * lm_i
        n_bon = n_bon + rowsel * bon_i
        n_ctx = n_ctx + rowsel_u * ctx_i
        sc = jnp.where(sel, NEG, sc)
        return (sc, n_par, n_char, n_ext, n_plen, n_last, n_pb, n_pnb,
                n_h1, n_h2, n_lm, n_bon, n_ctx)

    init = (scores,
            jnp.zeros((K, K), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.int32),
            jnp.zeros((K, 1), jnp.int32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.float32),
            jnp.zeros((K, 1), jnp.int32))
    (_, n_par, n_char, n_ext, n_plen, n_last, n_pb, n_pnb, n_h1, n_h2,
     n_lm, n_bon, n_ctxs) = \
        jax.lax.fori_loop(0, K, sel_body, init)

    # deferred prefix rebuild: all K parent rows in one MXU matmul
    # (P is one-hot, pfx holds small ints as f32 -> exact), then one
    # masked lane write of the new chars at each beam's parent length.
    par_pfx_all = jax.lax.dot_general(
        n_par, pfx_f, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [K, U]
    # n_ext encodes 0 = stay, 1 + parent_length = extend; a parent at
    # the U clamp yields wpos == U, which no lane matches (no write)
    wpos = n_ext.astype(jnp.int32) - 1
    writem = (laneU == wpos) & (n_ext > 0.5)             # [K, U]
    n_pfx = jnp.where(writem, n_char, par_pfx_all)

    # ---- commit (frozen once t >= seq_len) -----------------------------
    def W(ref, new):
        ref[...] = jnp.where(valid, new, ref[...])

    W(pfx, n_pfx)
    W(plen, n_plen)
    W(last, n_last)
    W(pb, n_pb)
    W(pnb, n_pnb)
    W(lmacc, n_lm)
    W(bon, n_bon)
    h1[...] = jnp.where(valid, n_h1, h1[...])
    h2[...] = jnp.where(valid, n_h2, h2[...])
    ctx[...] = jnp.where(valid, n_ctxs, ctx[...])

    # ---- emit current best (the t == seq_len-1 write survives) ---------
    fscore = _lse2(pb[...], pnb[...])                    # [K,1]
    if has_lm:
        fscore = fscore + lm_weight * lmacc[...] + word_bonus * bon[...]
    if emit_nbest:
        # whole beam, unsorted (host side argsorts by score): pfx rows
        # masked to their lengths, plus per-beam fused scores.
        lenk = plen[...].astype(jnp.int32)               # [K,1]
        ids_k = jnp.where(laneU < lenk, pfx[...], float(PAD_ID))
        ids_ref[0] = ids_k.astype(jnp.int32)
        outlen_ref[0] = lenk
        score_ref[0] = fscore
        return
    best = jnp.max(fscore)
    bidx = jnp.min(jnp.where(fscore >= best, subl, K))
    brow = (subl == bidx).astype(jnp.float32)
    ids = jnp.sum(pfx[...] * brow, axis=0, keepdims=True)  # [1,U]
    blen = jnp.sum(plen[...] * brow)
    ids = jnp.where(laneU[0:1] < blen.astype(jnp.int32), ids,
                    float(PAD_ID))
    ids_ref[0] = ids.astype(jnp.int32)
    outlen_ref[0] = blen.astype(jnp.int32).reshape(1, 1)


# LM tables above this many contexts ride in VMEM as bf16 (order-4 =
# 21952 rows: 5.6 MB lane-padded vs 11.3 MB f32); beyond _LM_MAX_CTX
# (order-5 = 614k rows) the table cannot fit and callers must use the
# XLA decoder.
_LM_F32_MAX_CTX = 4096
_LM_MAX_CTX = 65536

# Decode-buffer lanes bound: pfx [K,U] f32 plus the top-K rebuild's
# [K,U] temporaries stay well inside VMEM at K=64, U=1024 (~0.5 MB);
# past that, per-step [K,U] work dominates and the XLA decoder is the
# right tool. Configs that derive a larger U fail loudly (VERDICT r1 #6).
_MAX_U = 1024


def beam_search_decode_pallas(logits, logit_lengths, beam_width: int = 64,
                              blank_id: int = BLANK_ID,
                              max_decode_len: int | None = None,
                              interpret: bool = False,
                              lm_table=None, lm_weight: float = 0.0,
                              word_bonus: float = 0.0, init_ctx: int = 0,
                              lm_vocab: int = 28, space_id: int = 0,
                              return_nbest: bool = False):
    """[B, T, C] logits -> (ids [B, U], lengths [B]), or with
    ``return_nbest`` the whole beam best-first
    (ids [B, K, U], lengths [B, K], scores [B, K]) for host N-best
    rescoring — same surface as ops.beam.beam_search_decode.

    With ``lm_table`` ([n_ctx, V] dense char-LM log-probs, ops/lm.py),
    scoring matches ops.beam.beam_search_decode's shallow fusion."""
    B, T, C = logits.shape
    K = beam_width
    # CTC emits at most one char per frame, so min(max_decode_len, T) is
    # an exact bound, not a truncation.
    U = min(max_decode_len, max(T, 8)) if max_decode_len \
        else min(max(T, 8), 256)
    U = ((U + 127) // 128) * 128
    if U > _MAX_U:
        raise ValueError(
            f"beam kernel decode buffer U={U} lanes (from "
            f"max_decode_len={max_decode_len}) exceeds the VMEM-bounded "
            f"limit of {_MAX_U}; lower decode.max_decode_len / "
            "data.max_audio_seconds or use the XLA beam decoder "
            "(decode.use_pallas=False)")
    if blank_id != C - 1:
        raise ValueError("kernel assumes blank is the last class")
    has_lm = lm_table is not None and (lm_weight != 0.0 or word_bonus != 0.0)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # Singleton axes keep every block dim either full-size or size-1 of
    # a size-1 array dim (Mosaic block-shape divisibility rule).
    lp_t = jnp.moveaxis(log_probs, 0, 1)[:, :, None, :]  # [T, B, 1, C]

    inputs = [lp_t, logit_lengths.reshape(-1, 1, 1).astype(jnp.int32)]
    in_specs = [
        pl.BlockSpec((1, 1, 1, C), lambda b, t: (t, b, 0, 0)),
        pl.BlockSpec((1, 1, 1), lambda b, t: (b, 0, 0)),
    ]
    ctx_size = 1
    if has_lm:
        n_ctx, V = lm_table.shape
        if V > C - 1:
            raise ValueError(f"LM vocab {V} exceeds non-blank classes")
        if n_ctx > _LM_MAX_CTX:
            raise NotImplementedError(
                f"LM table with {n_ctx} contexts exceeds VMEM; use the "
                "XLA beam decoder (decode.use_pallas=False)")
        ctx_size = n_ctx
        tdt = jnp.float32 if n_ctx <= _LM_F32_MAX_CTX else jnp.bfloat16
        # pad vocab -> C columns so table rows align with candidate
        # lanes (the blank column is zero and never read through the
        # fusion where-mask), and rows -> multiple of 8 so the kernel's
        # aligned 8-row block loads stay in bounds.
        n_pad = (-n_ctx) % 8
        table = jnp.pad(jnp.asarray(lm_table, tdt),
                        ((0, n_pad), (0, C - V)))
        # grid-constant block: fetched once, VMEM-resident across (b, t)
        inputs.append(table)
        in_specs.append(
            pl.BlockSpec((n_ctx + n_pad, C), lambda b, t: (0, 0)))

    kernel = functools.partial(
        _beam_kernel, K=K, C=C, U=U, T=T, blank=blank_id, space=space_id,
        has_lm=has_lm, lm_weight=lm_weight, word_bonus=word_bonus,
        lm_vocab=lm_vocab, ctx_size=ctx_size, init_ctx=init_ctx,
        emit_nbest=return_nbest)
    kout = K if return_nbest else 1
    out_specs = [
        pl.BlockSpec((1, kout, U), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((1, kout, 1), lambda b, t: (b, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, kout, U), jnp.int32),
        jax.ShapeDtypeStruct((B, kout, 1), jnp.int32),
    ]
    if return_nbest:
        out_specs.append(pl.BlockSpec((1, K, 1), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((B, K, 1), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((K, U), jnp.float32),   # pfx
            pltpu.VMEM((K, 1), jnp.float32),   # plen
            pltpu.VMEM((K, 1), jnp.float32),   # last
            pltpu.VMEM((K, 1), jnp.float32),   # pb
            pltpu.VMEM((K, 1), jnp.float32),   # pnb
            pltpu.VMEM((K, 1), jnp.int32),     # h1
            pltpu.VMEM((K, 1), jnp.int32),     # h2
            pltpu.VMEM((K, 1), jnp.int32),     # ctx (LM context id)
            pltpu.VMEM((K, 1), jnp.float32),   # lmacc (sum log P_lm)
            pltpu.VMEM((K, 1), jnp.float32),   # bon (word-bonus count)
        ],
        interpret=interpret,
    )(*inputs)
    if return_nbest:
        ids, lens, scores = outs
        scores = scores[..., 0]                          # [B, K]
        order = jnp.argsort(-scores, axis=1)
        ids = jnp.take_along_axis(ids, order[..., None], axis=1)
        lens = jnp.take_along_axis(lens[..., 0], order, axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        return ids, lens, scores
    ids, lens = outs
    return ids[:, 0], lens[:, 0, 0]


def make_beam_decoder_pallas(beam_width: int, table, lm_weight: float,
                             word_bonus: float, init_ctx: int,
                             lm_vocab: int,
                             max_decode_len: int | None = None):
    """Factory used by ops.beam.make_beam_decoder(use_pallas=True)."""
    if callable(table):
        raise NotImplementedError(
            "sharded LM lookup is XLA-only; use decode.use_pallas=False")
    if table is not None and table.shape[0] > _LM_MAX_CTX:
        raise NotImplementedError(
            f"LM table with {table.shape[0]} contexts exceeds VMEM; use "
            "the XLA beam decoder (decode.use_pallas=False)")
    if max_decode_len and ((max_decode_len + 127) // 128) * 128 > _MAX_U:
        raise ValueError(
            f"decode buffer of {max_decode_len} chars exceeds the beam "
            f"kernel's {_MAX_U}-lane limit; lower decode.max_decode_len / "
            "data.max_audio_seconds or use the XLA beam decoder "
            "(decode.use_pallas=False)")

    @jax.jit
    def decode(logits, logit_lens):
        return beam_search_decode_pallas(
            logits, logit_lens, beam_width=beam_width, lm_table=table,
            lm_weight=lm_weight, word_bonus=word_bonus, init_ctx=init_ctx,
            lm_vocab=lm_vocab, max_decode_len=max_decode_len)

    return decode
