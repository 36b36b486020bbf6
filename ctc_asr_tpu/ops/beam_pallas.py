"""Pallas TPU kernel: CTC prefix beam search (acoustic scoring).

The kernelized counterpart of ``ops/beam.py`` (which replaces
``tf.nn.ctc_beam_search_decoder``, SURVEY.md §2b row 2) — the beam state
never leaves VMEM across the whole utterance (BASELINE.json:5
"beam-search kernels ... at speed-of-light roofline"). Parity-tested
against the XLA implementation and the Python oracle in
tests/test_beam_pallas.py (interpret mode on CPU).

Kernel shape dictionary (G = batch rows per grid step, K = beam width
on sublanes, C = classes on lanes, U = max decode length on lanes):

- Beam state in VMEM scratch, persistent across the time grid:
  ``pfx [G, K, U]`` (f32-coded small ints), ``plen/last/pb/pnb
  [G, K, 1]``, dual rolling hashes ``h1/h2 [G, K, 1]`` (wrapping
  int32).
- One timestep = one grid step (grid (B/G, T), t minor) consuming a
  ``[G, C]`` log-prob slab; all work is VPU/MXU ops on [G, K, C],
  [G, K, K] and [G, K, U] tiles — NO sorts, NO gathers, NO dynamic
  indexing (Mosaic-safe by construction):

  * **Merge** (identical prefixes): with unique beam strings, a merge
    can only pair beam k's "stay" with beam j's "extend by k's last
    char" — an O(K^2) *pairwise-beam* hash test
    ``h(j)*M + c_k == h(k)``, not an O((K*C)^2) candidate sort like the
    XLA path. A parent column j may match several stay rows k (they are
    distinct extend cells (j, c_k)); every match is a real merge.
    Merged extends are killed via a batched [G,K,K] x [G,K,C] one-hot
    matmul.
  * **Top-K**: THRESHOLD selection, no serial pop loop. The selected
    set under the pop order (value desc, row asc, col asc) equals the
    top-K under (key desc, flat-index asc), so the kernel
    binary-searches the K-th largest key (monotone f32->int32 bit
    map; 31 fixed steps of one [G,K,C] compare+count), breaks
    key==theta ties by flat index with exact integer-count prefixes,
    and derives each new beam's parent row CLOSED-FORM: a row's
    selected cells hold contiguous flat ranks, so the parent one-hot
    is P[g,i,k] = (base_k <= i < base_k + m_k). State rebuilding
    happens ONCE per step: P gathers parent prefixes/state via
    batched MXU matmuls, and candidate values gather BIT-EXACTLY via
    8-bit chunked one-hot matmuls (the Mosaic in-kernel f32 dot is a
    single bf16 pass — only 8-bit ints survive exactly; measured:
    12-bit err 4, 16-bit err 64).
  * Beams created from exhausted (NEG-score) candidates get poisoned,
    step-unique hashes so they can never merge with live beams.

- **Why a G dimension and threshold selection** (measured,
  scripts/diag_decode_roofline.py + DESIGN.md §4c): at G=1 the
  round-4 pop loop's per-iteration cost was CONSTANT in K
  (op-issue-latency-bound) and the (B, T) grid serializes independent
  batch rows — G=8 rows per grid step amortize the issue latency
  (G=16 remeasured with the threshold kernel: 1.03x for a 100 s
  compile — not taken at K=64; K<=16 keeps G=16). Replacing the
  K-iteration lazy row-best pop loop with threshold selection
  (binary-searched K-th key + closed-form parent one-hot) then cut
  the contract shape another **3.04x** (941 -> 309 ms at
  B=128/T=400/K=64; LM fusion 1869 -> 1022 ms; bit-identical outputs
  on hardware). Cumulative vs the round-4 kernel: **8.2x** at the
  contract K=64 (2542 -> 309 ms), **11.2x** at K=16 (562 -> 50 ms),
  **3.1x** on the LM-fusion path (3219 -> 1022 ms; it keeps G=1
  because its per-beam table gather is a K-iteration dynamic-slice
  loop that G would multiply).

LM shallow fusion (BASELINE.json:10) IS kernelized: the dense char
n-gram table (ops/lm.py) rides in VMEM as a grid-constant input block
(bf16 above 4096 contexts — order-4 is 22016 rows = 5.6 MB padded), and
per-beam rows are fetched with K dynamic sublane slices (``pl.ds`` on a
masked-reduce scalar context id) per timestep — the TPU analog of the
XLA path's ``table[ctx]`` gather. Per-beam LM state (context id,
accumulated log P, word-bonus count) lives in three more [1, K, 1]
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
                 G: int, K: int, C: int, U: int, T: int, blank: int,
                 space: int, has_lm: bool, lm_weight: float,
                 word_bonus: float, lm_vocab: int, ctx_size: int,
                 init_ctx: int, emit_nbest: bool = False):
    if has_lm:
        table_ref, refs = refs[0], refs[1:]
    if emit_nbest:
        score_ref, refs = refs[2], refs[:2] + refs[3:]
    (ids_ref, outlen_ref, pfx, plen, last, pb, pnb, h1, h2,
     ctx, lmacc, bon) = refs
    t = pl.program_id(1)
    # lp block is [1, G, 1, C] (G rides a LEADING dim: Mosaic constrains
    # only the last two block dims); len block is [G, 1, 1]
    lp = lp_ref[0]                                       # [G,1,C]
    seq_len = len_ref[...]                               # [G,1,1]

    subl = jax.lax.broadcasted_iota(jnp.int32, (G, K, 1), 1)
    laneC = jax.lax.broadcasted_iota(jnp.int32, (G, K, C), 2)
    laneU = jax.lax.broadcasted_iota(jnp.int32, (G, K, U), 2)

    @pl.when(t == 0)
    def _init():
        pfx[...] = jnp.full((G, K, U), float(PAD_ID), jnp.float32)
        plen[...] = jnp.zeros((G, K, 1), jnp.float32)
        last[...] = jnp.full((G, K, 1), -1.0, jnp.float32)
        pb[...] = jnp.where(subl == 0, 0.0, NEG).astype(jnp.float32)
        pnb[...] = jnp.full((G, K, 1), NEG, jnp.float32)
        h1[...] = jnp.where(subl == 0, jnp.int32(17), _POISON + subl)
        h2[...] = jnp.where(subl == 0, jnp.int32(29), _POISON + subl)
        ctx[...] = jnp.full((G, K, 1), init_ctx, jnp.int32)
        lmacc[...] = jnp.zeros((G, K, 1), jnp.float32)
        bon[...] = jnp.zeros((G, K, 1), jnp.float32)

    valid = t < seq_len                                  # [G,1,1]

    lastv = last[...]                                    # [G,K,1] f32
    pbv, pnbv = pb[...], pnb[...]
    total = _lse2(pbv, pnbv)                             # [G,K,1]
    lanef = laneC.astype(jnp.float32)

    # lp gathered at each beam's last char (one-hot row-sum; -1 -> 0)
    onehot_last = (lanef == lastv).astype(jnp.float32)   # [G,K,C]
    lp_last = jnp.sum(onehot_last * lp, axis=2, keepdims=True)

    # ---- stay candidates ------------------------------------------------
    lp_blank = lp[:, :, blank][:, :, None]               # [G,1,1]
    stay_pb = total + lp_blank                           # [G,K,1]
    stay_pnb = jnp.where(lastv >= 0, pnbv + lp_last, NEG)

    # ---- extend candidates [G,K,C] (cols 0..C-2; blank col = stay) -----
    is_rep = lanef == lastv
    ext_pnb = jnp.where(is_rep, pbv, total) + lp          # [G,K,C]
    ext_pnb = jnp.where(laneC < C - 1, ext_pnb, NEG)

    # ---- pairwise merge: stay(k) vs extend(j, last_k) -------------------
    h1r = h1[...]                                        # [G,K,1] int32
    h2r = h2[...]
    c_k = lastv                                          # [G,K,1]
    c_k_u = jnp.where(c_k >= 0, c_k, 0).astype(jnp.int32)
    # hash of (prefix_j + c_k): rows k, cols j
    h1_j = jnp.broadcast_to(jnp.reshape(h1r, (G, 1, K)), (G, K, K))
    h2_j = jnp.broadcast_to(jnp.reshape(h2r, (G, 1, K)), (G, K, K))
    h1_ext = h1_j * _M1 + (c_k_u + _A1)                  # [G,K,K]
    h2_ext = h2_j * _M2 + (c_k_u + _A2)
    match = (h1_ext == h1r) & (h2_ext == h2r) & (c_k >= 0)
    # A column j may match SEVERAL stay rows k — those are different
    # extend cells (j, c_k1), (j, c_k2): every one is a real merge.
    # (An earlier "first matching stay only" guard here dropped the
    # second merge and bootstrapped duplicate beams; with unique beam
    # strings one extend CELL can only ever match one stay, so no
    # double-merge guard is needed.)

    pb_j = jnp.broadcast_to(jnp.reshape(pbv, (G, 1, K)), (G, K, K))
    tot_j = jnp.broadcast_to(jnp.reshape(total, (G, 1, K)), (G, K, K))
    last_j = jnp.broadcast_to(jnp.reshape(lastv, (G, 1, K)), (G, K, K))
    base_j = jnp.where(last_j == c_k, pb_j, tot_j)       # [G,K,K]
    val = jnp.where(match, base_j + lp_last, NEG)
    mval = jnp.max(val, axis=2, keepdims=True)
    mval = jnp.maximum(mval, NEG)
    merged_in = mval + jnp.log(
        jnp.sum(jnp.exp(val - mval), axis=2, keepdims=True) + 1e-38)
    stay_pnb = _lse2(stay_pnb, jnp.maximum(merged_in, NEG))

    # kill merged extends: ext (j, c) dies iff some k merged (j, c_k=c)
    # kill[g, j, c] = any_k match[g, k, j] & (last_k == c): batched
    # one-hot matmul (contract k) on the MXU.
    killed = jax.lax.dot_general(
        jnp.where(match, 1.0, 0.0), onehot_last,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [G, j(K), C]
    ext_pnb = jnp.where(killed > 0.5, NEG, ext_pnb)

    # ---- LM fusion state [G(=1),K,C] (see module docstring) -------------
    lmv, bonv, ctxv = lmacc[...], bon[...], ctx[...]
    if has_lm:
        # per-beam table row via K dynamic sublane slices: the context
        # id is a masked-reduce scalar; Mosaic requires the dynamic row
        # index to be provably 8-aligned, so load the aligned 8-row
        # block at (ctx//8)*8 and mask-select the row (host side pads
        # n_ctx to a multiple of 8). The row lands on beam i's sublane
        # through an outer-product add (no dynamic row writes).
        # G is pinned to 1 on this path (see module docstring).
        sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, C), 0)

        def _gather_row(i, acc):
            ctx_i = jnp.sum(jnp.where(subl == i, ctxv, 0))
            base = (ctx_i // 8) * 8
            blk = table_ref[pl.ds(base, 8), :].astype(jnp.float32)
            row = jnp.sum(jnp.where(sub8 == ctx_i - base, blk, 0.0),
                          axis=0, keepdims=True)          # [1, C]
            return acc + jnp.where(subl == i, 1.0, 0.0) * row[None]
        lm_rows = jax.lax.fori_loop(
            0, K, _gather_row, jnp.zeros((G, K, C), jnp.float32))
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
        cand_lm = jnp.zeros((G, K, C), jnp.float32)
        cand_bon = jnp.zeros((G, K, C), jnp.float32)
        cand_ctx = jnp.zeros((G, K, C), jnp.int32)

    # ---- candidate matrices [G,K,C] ------------------------------------
    cand_pb = jnp.where(laneC == blank, stay_pb, NEG)
    cand_pnb = jnp.where(laneC == blank, stay_pnb, ext_pnb)
    scores = _lse2(cand_pb, cand_pnb)
    if has_lm:
        scores = scores + lm_weight * cand_lm + word_bonus * cand_bon

    # ---- top-K selection (per group): threshold + flat-order ranks -----
    # The selected SET under the pop order (value desc, row asc, col
    # asc) equals the top-K under the total order (key desc, flat asc),
    # flat = row*C + col — so selection needs NO serial pop loop at all:
    #
    #  1. map scores to int32 keys with a monotone bit twiddle,
    #  2. binary-search the K-th largest key theta (31 fixed steps of
    #     one [G,K,C] compare+count — the only O(log range) part),
    #  3. break key==theta ties by flat index via EXACT integer-count
    #     prefixes (in-row prefix = one-hot [C,C] MXU matmul, counts
    #     <= C so the MXU's single-bf16 pass is exact; cross-row base =
    #     f32 masked [G,K,K] reduce, exact to 2^24),
    #  4. new beam i's parent row falls out closed-form: selected cells
    #     of a row hold CONTIGUOUS flat ranks, so P[g,i,k] =
    #     (base_k <= i < base_k + m_k) — no scatter, no loop.
    #
    # Beams land on sublanes in flat order rather than score order; the
    # selected set, every per-beam state, and the emitted best/N-best
    # (max / host argsort by score) are unchanged — only exact
    # cross-beam score ties (measure-zero for continuous logits; dead
    # NEG beams are poisoned either way) could reorder. Replaced the
    # K-iteration lazy row-best pop loop after hardware A/B (DESIGN.md
    # §4c): ~2x fewer [G,K,C]-class ops at the contract K=64.
    pfx_f = pfx[...]
    plen_f = plen[...]

    sbits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.bitwise_xor(
        sbits,
        jnp.bitwise_and(jax.lax.shift_right_arithmetic(sbits, 31),
                        jnp.int32(0x7FFFFFFF)))              # [G,K,C]

    def _cnt(pred):
        s = jnp.sum(jnp.where(pred, 1.0, 0.0), axis=2, keepdims=True)
        return jnp.sum(s, axis=1, keepdims=True)             # [G,1,1]

    kmax = jnp.max(jnp.max(key, axis=2, keepdims=True), axis=1,
                   keepdims=True)                            # [G,1,1]
    kmin = jnp.min(jnp.min(key, axis=2, keepdims=True), axis=1,
                   keepdims=True)

    def bs_body(_, carry):
        lo, hi = carry
        d = hi - lo                                          # >= 0
        mid = lo + jax.lax.shift_right_logical(d, 1) \
            + jnp.bitwise_and(d, 1)                          # ceil split
        ok = _cnt(key >= mid) >= float(K)
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid - 1)

    # span < 2^31 halves every step: 31 fixed iterations pin theta,
    # the K-th largest key (largest theta with count(key >= theta) >= K)
    theta, _ = jax.lax.fori_loop(0, 31, bs_body, (kmin, kmax))
    ties_needed = float(K) - _cnt(key > theta)               # [G,1,1]

    laneK = jax.lax.broadcasted_iota(jnp.int32, (G, K, K), 2)
    row_before = (laneK < subl).astype(jnp.float32)          # [G,K,K]
    mstrict = (jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
               < jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
               ).astype(jnp.float32)                         # [C,C]

    def _inrow_excl(mask_f):
        # exclusive in-row prefix count: one-hot [C,C] matmul, exact
        # on the MXU's single-bf16 pass because counts are <= C < 256
        return jax.lax.dot_general(
            mask_f, mstrict, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [G,K,C]

    def _rows_before(rowcnt):
        # exclusive cross-row prefix of per-row counts (f32-exact)
        cl = jnp.broadcast_to(jnp.reshape(rowcnt, (G, 1, K)), (G, K, K))
        return jnp.sum(row_before * cl, axis=2, keepdims=True)

    tiem = (key == theta).astype(jnp.float32)                # [G,K,C]
    tie_rank = _rows_before(jnp.sum(tiem, axis=2, keepdims=True)) \
        + _inrow_excl(tiem)                                  # flat order
    selm = jnp.where(key > theta, 1.0,
                     tiem * jnp.where(tie_rank < ties_needed, 1.0, 0.0))

    m_k = jnp.sum(selm, axis=2, keepdims=True)               # [G,K,1]
    base_k = _rows_before(m_k)                               # [G,K,1]
    rank = base_k + _inrow_excl(selm)                        # [G,K,C]

    # parent one-hot P[g, i, kp] = (base_kp <= i < base_kp + m_kp)
    sublf = subl.astype(jnp.float32)                         # [G,K,1]
    base_l = jnp.broadcast_to(jnp.reshape(base_k, (G, 1, K)), (G, K, K))
    m_l = jnp.broadcast_to(jnp.reshape(m_k, (G, 1, K)), (G, K, K))
    Pb = (sublf >= base_l) & (sublf < base_l + m_l)          # [G,K,K]
    P = Pb.astype(jnp.float32)

    def _pgather_kc(mat):
        # row kp(i) of a [G,K,C] matrix for each new beam i (one-hot
        # MXU matmul; exact for 0/1 masks and integer counts < 256)
        return jax.lax.dot_general(
            P, mat, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [G,K,C]

    # char one-hot: the cell of parent row kp(i) whose flat rank == i
    cone = _pgather_kc(selm) * \
        jnp.where(_pgather_kc(rank) == sublf, 1.0, 0.0)      # [G,K,C]
    n_char = jnp.sum(cone * lanef, axis=2, keepdims=True)    # [G,K,1]
    n_char_i = n_char.astype(jnp.int32)
    # dead = the selected cell is NEG-class; the bf16-rounded matmul
    # gather is classification-safe (|NEG| dwarfs any live score)
    deadb = jnp.sum(_pgather_kc(scores) * cone, axis=2,
                    keepdims=True) <= NEG / 2                # [G,K,1]

    def extract(cand):
        """cand[g, parent_i, char_i] per new beam, via one batched
        one-hot matmul (MXU) + a char-mask lane reduce. EXACT only for
        values with <= 16 significant integer bits (the MXU's f32 path
        is bf16-decomposed); floats go through extract_f32_exact."""
        rows = jax.lax.dot_general(
            P, cand, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # [G,K,C]
        return jnp.sum(rows * cone, axis=2, keepdims=True)   # [G,K,1]

    def extract_int_exact(v_int, n_chunks):
        """BIT-EXACT int32 gather via 8-bit chunks: the Mosaic
        in-kernel f32 dot is a SINGLE bf16 pass (measured: 8-bit ints
        gather exactly, 12-bit err 4, 16-bit err 64), so each byte is
        gathered separately and OR-reassembled (two's-complement safe:
        the top byte's shift_left overflow reproduces the sign bits)."""
        acc = jnp.zeros((G, K, 1), jnp.int32)
        for s8 in range(n_chunks):
            chunk = jnp.bitwise_and(
                jax.lax.shift_right_logical(v_int, 8 * s8),
                jnp.int32(0xFF))
            g = extract(chunk.astype(jnp.float32)).astype(jnp.int32)
            acc = jnp.bitwise_or(acc, jax.lax.shift_left(g, 8 * s8))
        return acc

    def extract_f32_exact(cand):
        """BIT-EXACT float gather through the int-chunk path."""
        bits = jax.lax.bitcast_convert_type(cand, jnp.int32)
        return jax.lax.bitcast_convert_type(
            extract_int_exact(bits, 4), jnp.float32)

    # A dead pick re-selects an already-taken cell (all remaining
    # scores are NEG-tied, min-index wins): it must NOT inherit that
    # cell's original finite probabilities.
    n_pb = jnp.where(deadb, NEG, extract_f32_exact(cand_pb))
    n_pnb = jnp.where(deadb, NEG, extract_f32_exact(cand_pnb))
    if has_lm:
        n_lm = jnp.where(deadb, 0.0, extract_f32_exact(cand_lm))
        n_bon = jnp.where(deadb, 0.0, extract_f32_exact(cand_bon))
        # ctx ids are < 2^16: two 8-bit chunks gather exactly
        n_ctxs = jnp.where(deadb, 0, extract_int_exact(cand_ctx, 2))
    else:
        n_lm = jnp.zeros((G, K, 1), jnp.float32)
        n_bon = jnp.zeros((G, K, 1), jnp.float32)
        n_ctxs = jnp.zeros((G, K, 1), jnp.int32)

    # parent scalar state: [G,K,K] masked reduces (exact for any value;
    # plen can exceed the MXU's single-bf16-pass exact-int range)
    def par_gather(v):                                       # v [G,K,1]
        vj = jnp.broadcast_to(jnp.reshape(v, (G, 1, K)), (G, K, K))
        return jnp.sum(jnp.where(Pb, vj, jnp.zeros_like(vj)),
                       axis=2, keepdims=True)                # [G,K,1]
    par_len = par_gather(plen_f)
    par_last = par_gather(lastv)
    par_h1 = par_gather(h1r)
    par_h2 = par_gather(h2r)

    extb = n_char_i != blank                                 # [G,K,1]
    extf = jnp.where(extb, 1.0, 0.0)
    # clamp at U (matches ops/beam.py): a full prefix buffer makes the
    # deferred lane write below a no-op, so the length must not grow
    # past the ids width either
    n_plen = jnp.minimum(par_len + extf, float(U))
    n_last = jnp.where(deadb, -1.0,
                       jnp.where(extb, n_char, par_last))
    nh1 = jnp.where(extb, par_h1 * _M1 + (n_char_i + _A1), par_h1)
    nh2 = jnp.where(extb, par_h2 * _M2 + (n_char_i + _A2), par_h2)
    # exhausted candidates become poisoned, step-unique dead beams
    # (the selection-order index IS the new beam's row index)
    poison_tag = (_POISON + jnp.int32(1)
                  + jnp.asarray(t).astype(jnp.int32) * jnp.int32(K)
                  + subl)
    n_h1 = jnp.where(deadb, poison_tag, nh1)
    n_h2 = jnp.where(deadb, poison_tag ^ jnp.int32(0xABCD), nh2)

    # deferred prefix rebuild: all G*K parent rows in one batched MXU
    # matmul (P is one-hot, pfx holds small ints as f32 -> exact), then
    # one masked lane write of the new chars at each parent length
    # (a parent at the U clamp yields wpos == par_len == U, which no
    # lane matches — no write, exactly like a (laneU == par_len) mask).
    par_pfx_all = jax.lax.dot_general(
        P, pfx_f, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [G,K,U]
    writem = (laneU == par_len.astype(jnp.int32)) & extb  # [G,K,U]
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
    fscore = _lse2(pb[...], pnb[...])                    # [G,K,1]
    if has_lm:
        fscore = fscore + lm_weight * lmacc[...] + word_bonus * bon[...]
    if emit_nbest:
        # whole beam, unsorted (host side argsorts by score): pfx rows
        # masked to their lengths, plus per-beam fused scores.
        lenk = plen[...].astype(jnp.int32)               # [G,K,1]
        ids_k = jnp.where(laneU < lenk, pfx[...], float(PAD_ID))
        ids_ref[...] = ids_k.astype(jnp.int32)
        outlen_ref[...] = lenk
        score_ref[...] = fscore
        return
    best = jnp.max(fscore, axis=1, keepdims=True)        # [G,1,1]
    bidx = jnp.min(jnp.where(fscore >= best, subl, K), axis=1,
                   keepdims=True)
    brow = (subl == bidx).astype(jnp.float32)            # [G,K,1]
    ids = jnp.sum(pfx[...] * brow, axis=1, keepdims=True)  # [G,1,U]
    blen = jnp.sum(plen[...] * brow, axis=1, keepdims=True)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (G, 1, U), 2)
    ids = jnp.where(lane1 < blen.astype(jnp.int32), ids,
                    float(PAD_ID))
    ids_ref[...] = ids.astype(jnp.int32)
    outlen_ref[...] = blen.astype(jnp.int32)


# LM tables above this many contexts ride in VMEM as bf16 (order-4 =
# 21952 rows: 5.6 MB lane-padded vs 11.3 MB f32); beyond _LM_MAX_CTX
# (order-5 = 614k rows) the table cannot fit and callers must use the
# XLA decoder.
_LM_F32_MAX_CTX = 4096
_LM_MAX_CTX = 65536

# Decode-buffer lanes bound: pfx [G,K,U] f32 plus the top-K rebuild's
# [G,K,U] temporaries stay well inside VMEM at G=8, K=64, U=1024
# (~4 MB across the live buffers); past that, per-step [K,U] work
# dominates and the XLA decoder is the right tool. Configs that derive
# a larger U fail loudly (VERDICT r1 #6).
_MAX_U = 1024
# Scoped-VMEM budget for the G pick. The round-4 pop loop's unrolled
# per-iteration temporaries sized this model (~4.9 MB per row group at
# K=64/U=256); the threshold kernel's scoped stack is far smaller (its
# only loop carries [G,1,1] scalars), so the estimate is now
# conservative — kept as-is because the measured-best G (8 at K=64,
# 16 at K<=16) already sits inside it and G=16 at K=64 was remeasured
# at 1.03x for a 100 s compile (not worth it). The grouped kernel
# still compiles with the raised vmem_limit_bytes (lstm_pallas
# pattern, 100M on v5-class parts).
_G_VMEM_BUDGET = 80 * 1024 * 1024
_G_VMEM_LIMIT = 100 * 1024 * 1024


def _g_stack_bytes(g: int, K: int, U: int) -> int:
    """Scoped-stack estimate for one grid step at G=g, calibrated to
    the compiler's report (39.1 MB at G=8, K=64, U=256): the unrolled
    K-iteration loop holds ~[K,C]+[K,K]+[K,1] temporaries per
    iteration plus the [G,K,U] prefix buffers."""
    per_iter = K * (128 + K + 16) * 4          # [K,C~128]+[K,K]+[K,1]s
    return g * (K * per_iter + 8 * K * U * 4)


def _pick_rows_per_step(B: int, K: int, U: int, has_lm: bool) -> int:
    """Batch rows per grid step (see module docstring). LM fusion pins
    G=1 (its table gather is a per-beam dynamic-slice loop). Narrow
    beams are still issue-latency-bound at G=8 and gain from G=16
    (measured K=16 B=128 T=400: 78 -> 67 ms); wide beams are
    throughput/VMEM-bound and REGRESS past G=8 (K=64 at G=16:
    941 -> 1602 ms), so the start point is K-dependent."""
    if has_lm:
        return 1
    g = 16 if K <= 16 else 8
    while g > 1 and (_g_stack_bytes(g, K, U) > _G_VMEM_BUDGET or g > B):
        g //= 2
    return max(g, 1)


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
    G = _pick_rows_per_step(B, K, U, has_lm)
    Bp = ((B + G - 1) // G) * G
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # Singleton axes keep every CONSTRAINED block dim (the last two)
    # either full-size or size-1 of a size-1 array dim; the G rows ride
    # leading dims, which Mosaic leaves unconstrained.
    lp_t = jnp.moveaxis(log_probs, 0, 1)[:, :, None, :]  # [T, B, 1, C]
    lens = logit_lengths.reshape(-1, 1, 1).astype(jnp.int32)
    if Bp != B:
        # pad rows decode nothing (length 0) and are cropped below
        lp_t = jnp.pad(lp_t, ((0, 0), (0, Bp - B), (0, 0), (0, 0)))
        lens = jnp.pad(lens, ((0, Bp - B), (0, 0), (0, 0)))

    inputs = [lp_t, lens]
    in_specs = [
        pl.BlockSpec((1, G, 1, C), lambda b, t: (t, b, 0, 0)),
        pl.BlockSpec((G, 1, 1), lambda b, t: (b, 0, 0)),
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
        _beam_kernel, G=G, K=K, C=C, U=U, T=T, blank=blank_id,
        space=space_id, has_lm=has_lm, lm_weight=lm_weight,
        word_bonus=word_bonus, lm_vocab=lm_vocab, ctx_size=ctx_size,
        init_ctx=init_ctx, emit_nbest=return_nbest)
    kout = K if return_nbest else 1
    out_specs = [
        pl.BlockSpec((G, kout, U), lambda b, t: (b, 0, 0)),
        pl.BlockSpec((G, kout, 1), lambda b, t: (b, 0, 0)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Bp, kout, U), jnp.int32),
        jax.ShapeDtypeStruct((Bp, kout, 1), jnp.int32),
    ]
    if return_nbest:
        out_specs.append(
            pl.BlockSpec((G, K, 1), lambda b, t: (b, 0, 0)))
        out_shape.append(jax.ShapeDtypeStruct((Bp, K, 1), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(Bp // G, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((G, K, U), jnp.float32),   # pfx
            pltpu.VMEM((G, K, 1), jnp.float32),   # plen
            pltpu.VMEM((G, K, 1), jnp.float32),   # last
            pltpu.VMEM((G, K, 1), jnp.float32),   # pb
            pltpu.VMEM((G, K, 1), jnp.float32),   # pnb
            pltpu.VMEM((G, K, 1), jnp.int32),     # h1
            pltpu.VMEM((G, K, 1), jnp.int32),     # h2
            pltpu.VMEM((G, K, 1), jnp.int32),     # ctx (LM context id)
            pltpu.VMEM((G, K, 1), jnp.float32),   # lmacc (sum log P_lm)
            pltpu.VMEM((G, K, 1), jnp.float32),   # bon (word-bonus ct)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_G_VMEM_LIMIT) if G > 1 else None,
        interpret=interpret,
    )(*inputs)
    if return_nbest:
        ids, lens_o, scores = outs
        ids, lens_o, scores = ids[:B], lens_o[:B], scores[:B]
        scores = scores[..., 0]                          # [B, K]
        order = jnp.argsort(-scores, axis=1)
        ids = jnp.take_along_axis(ids, order[..., None], axis=1)
        lens_o = jnp.take_along_axis(lens_o[..., 0], order, axis=1)
        scores = jnp.take_along_axis(scores, order, axis=1)
        return ids, lens_o, scores
    ids, lens_o = outs
    return ids[:B, 0], lens_o[:B, 0, 0]


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
