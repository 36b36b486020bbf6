"""Pallas TPU kernel: CTC forward-backward (α/β) with custom VJP.

Replaces ``tf.nn.ctc_loss`` (the reference's C++/CUDA native kernel,
SURVEY.md §2b row 1) with a first-party TPU kernel (BASELINE.json:5
"custom Pallas log-space forward-backward with custom VJP"). Parity-
tested against the pure-JAX reference ``ctc_ref.py`` (forever-reference,
SURVEY.md §7 M2b) in tests/test_ctc_pallas.py, including interpret mode
so the tests run on CPU.

Design (TPU-first, see pallas_guide.md):

- The DP state lives as a ``[8, S]`` tile: **batch on sublanes, extended
  label states on lanes** — the (8, 128) VPU native shape. The time
  recursion is the pallas grid's minor dimension; the α (resp. β) carry
  persists in VMEM scratch across grid steps while lp_z/α blocks stream
  HBM→VMEM double-buffered by the pallas pipeline.
- Work is split at the right altitude: XLA computes log_softmax and the
  label gather ``lp_z[b,t,s] = log_probs[b,t,z_s]`` (and their gradients
  by autodiff); the custom-VJP boundary wraps ONLY the sequential DP,
  whose backward emits the standard posterior gradient
  ``d(-logP)/d lp_z[t,s] = -exp(α_t(s)+β_t(s)-logP)``.
- Arrays are laid out time-major ``[T, B, S]`` so each grid step's block
  is a perfectly tiled (8, S_pad) slab; S pads to a lane multiple, B to
  a sublane multiple.
- All log-space arithmetic uses a large-but-finite NEG sentinel and
  max-clamped logsumexp (no inf-inf NaNs), matching ctc_ref.py.

Transition structure: states s are the blank-interleaved extended label
(blank, l1, blank, l2, ..., blank), self/next transitions always
allowed, skip (s-2 -> s) allowed iff s is a label state and
z_s != z_{s-2} ("can_skip", precomputed per sample outside).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..text import BLANK_ID
from .ctc_ref import NEG_INF, extended_labels

TB = 8          # minimum batch tile (f32 sublanes)
# Batch rows per grid step. The DP's serial chain is over TIME only;
# batch tiles are independent, and iterating them in the grid's MAJOR
# dimension (the original (B/8, T) grid) serializes them — at the
# contract shape (B=128, T=400, S=256) that was 6400 grid steps of a
# tiny [8, 256] block, and the measured wall was per-grid-step
# overhead (scripts/diag_decode_roofline.py). Processing the whole
# padded batch in one block (grid (T,), [128, 256] blocks) cuts the
# step count 16x and amortizes each VPU op over 64 tiles — measured
# (v5e, scan-chained protocol): alpha 2.21 -> 1.25 ms, beta
# 2.72 -> 1.60 ms, full fwd+bwd 4.84 -> 2.60 ms (1.7-1.9x). The new
# alpha runs at 0.91x the XLA same-op-mix elementwise ceiling for the
# footprint, i.e. at the transcendental (exp/log) wall: the 3-way
# log-sum-exp costs ~4 transcendentals/element, so the kernel is
# exp-throughput-bound, NOT HBM-bound (the same-footprint XLA
# elementwise pass itself reaches only ~76 GB/s). Capped so the
# streamed blocks + carries stay well inside VMEM; batches beyond the
# cap tile the grid exactly as before.
TB_MAX = 256
LANE = 128      # lane width


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    m = jnp.maximum(m, NEG_INF)
    out = m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m) + jnp.exp(c - m))
    return jnp.maximum(out, NEG_INF)


def _shift_right(x, k, fill=NEG_INF):
    """Shift lanes right by k (x[..., s] <- x[..., s-k]); fill start."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where(lane < k, fill, pltpu.roll(x, k, axis=x.ndim - 1))


def _shift_left(x, k, fill=NEG_INF):
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    S = x.shape[-1]
    # pltpu.roll requires non-negative shifts: left-by-k == right-by-(S-k)
    return jnp.where(lane >= S - k, fill,
                     pltpu.roll(x, S - k, axis=x.ndim - 1))


# ---------------------------------------------------------------------------
# Forward (alpha) kernel
# ---------------------------------------------------------------------------

def _alpha_kernel(lpz_ref, skip_ref, len_ref, end_ref,
                  alphas_ref, nll_ref, alpha_c):
    """Grid (B//TB, T), t minor (the batch dim is 1 wide whenever the
    padded batch fits one TB_MAX block). Blocks:
    lpz [1, TB, S]; skip [TB, S]; len/end [TB, 1];
    out alphas [1, TB, S]; nll [TB, 1]; scratch alpha_c [TB, S]."""
    t = pl.program_id(1)
    T = pl.num_programs(1)
    lpz = lpz_ref[0]                      # [TB, S]
    lens = len_ref[:, 0]                  # [TB]
    TB_, S = lpz.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB_, S), 1)

    @pl.when(t == 0)
    def _init():
        # alpha_0: state 0 = lp(blank@0); state 1 = lp(l1@0) if U>0.
        # end==0 means the empty label: state 1 is invalid then.
        valid1 = (end_ref[:, 0] > 0)[:, None]
        a0 = jnp.where(lane == 0, lpz,
                       jnp.where((lane == 1) & valid1, lpz, NEG_INF))
        alpha_c[...] = a0

    @pl.when(t > 0)
    def _step():
        prev = alpha_c[...]
        stay = prev
        diag = _shift_right(prev, 1)
        skip = jnp.where(skip_ref[...] > 0.5, _shift_right(prev, 2),
                         NEG_INF)
        new = _lse3(stay, diag, skip) + lpz
        new = jnp.maximum(new, NEG_INF)
        valid = (t < lens)[:, None]
        alpha_c[...] = jnp.where(valid, new, prev)

    alphas_ref[0] = alpha_c[...]

    @pl.when(t == T - 1)
    def _final():
        a = alpha_c[...]
        end = end_ref[:, 0][:, None]      # [TB, 1] = 2*U_b
        sel = (lane == end) | ((lane == end - 1) & (end > 0))
        masked = jnp.where(sel, a, NEG_INF)
        m = jnp.maximum(jnp.max(masked, axis=1, keepdims=True), NEG_INF)
        total = m + jnp.log(jnp.sum(jnp.exp(masked - m), axis=1,
                                    keepdims=True))
        nll_ref[...] = -jnp.maximum(total, NEG_INF)


# ---------------------------------------------------------------------------
# Backward (beta + gradient) kernel
# ---------------------------------------------------------------------------

def _beta_kernel(lpz_ref, alphas_ref, skip_ref, len_ref, end_ref, nll_ref,
                 grad_ref, beta_c, plpz_c):
    """Grid (B//TB, T) with REVERSED time (index maps give t = T-1-it).
    Carries beta_{t+1} and lp_z[t+1] in scratch."""
    it = pl.program_id(1)
    lpz = lpz_ref[0]
    alpha = alphas_ref[0]
    lens = len_ref[:, 0]
    T = pl.num_programs(1)
    t = T - 1 - it
    TB_, S = lpz.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB_, S), 1)

    @pl.when(it == 0)
    def _reset():
        beta_c[...] = jnp.full((TB_, S), NEG_INF, jnp.float32)
        plpz_c[...] = jnp.full((TB_, S), NEG_INF, jnp.float32)

    # Recursion from the carry (valid when t < len-1):
    x = plpz_c[...] + beta_c[...]
    x = jnp.maximum(x, NEG_INF)
    stay = x
    diag = _shift_left(x, 1)
    # skip s -> s+2 allowed iff can_skip[s+2]
    skip_ok = _shift_left(skip_ref[...], 2, fill=0.0)
    skip = jnp.where(skip_ok > 0.5, _shift_left(x, 2), NEG_INF)
    rec = _lse3(stay, diag, skip)

    # End-state init (rows where t == len-1): beta = 0 at s in {2U, 2U-1}.
    end = end_ref[:, 0][:, None]
    endsel = (lane == end) | ((lane == end - 1) & (end > 0))
    init_row = jnp.where(endsel, 0.0, NEG_INF)

    is_last = (t == lens - 1)[:, None]
    in_range = (t < lens - 1)[:, None]
    beta = jnp.where(is_last, init_row,
                     jnp.where(in_range, rec, NEG_INF))
    beta_c[...] = beta
    plpz_c[...] = lpz

    # Gradient wrt lp_z: -exp(alpha + beta + nll) (nll = -logP).
    logp = -nll_ref[:, 0][:, None]
    g = -jnp.exp(jnp.maximum(alpha + beta, NEG_INF) - logp)
    valid = (t < lens)[:, None]
    grad_ref[0] = jnp.where(valid, g, 0.0)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _batch_tile(B: int) -> int:
    """Batch rows per grid step: the whole padded batch up to TB_MAX,
    then grid-tiled (see TB_MAX rationale)."""
    Bp = _round_up(max(B, TB), TB)
    return Bp if Bp <= TB_MAX else TB_MAX


def _pad_inputs(lpz_t, can_skip, lens, ends):
    """Pad B to a batch-tile multiple and S to a LANE multiple."""
    T, B, S = lpz_t.shape
    Bp = _round_up(max(B, TB), _batch_tile(B))
    Sp = _round_up(S, LANE)
    if (Bp, Sp) != (B, S):
        lpz_t = jnp.pad(lpz_t, ((0, 0), (0, Bp - B), (0, Sp - S)),
                        constant_values=NEG_INF)
        can_skip = jnp.pad(can_skip, ((0, Bp - B), (0, Sp - S)))
        lens = jnp.pad(lens, (0, Bp - B))       # padded rows: len 0
        ends = jnp.pad(ends, (0, Bp - B))
    return lpz_t, can_skip, lens, ends, B, Bp, Sp


def _run_alpha(lpz_t, can_skip, lens, ends, interpret: bool):
    T, Bp, Sp = lpz_t.shape
    TBe = _batch_tile(Bp)
    grid = (Bp // TBe, T)
    alphas, nll = pl.pallas_call(
        _alpha_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TBe, Sp), lambda ib, it: (it, ib, 0)),
            pl.BlockSpec((TBe, Sp), lambda ib, it: (ib, 0)),
            pl.BlockSpec((TBe, 1), lambda ib, it: (ib, 0)),
            pl.BlockSpec((TBe, 1), lambda ib, it: (ib, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TBe, Sp), lambda ib, it: (it, ib, 0)),
            pl.BlockSpec((TBe, 1), lambda ib, it: (ib, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((TBe, Sp), jnp.float32)],
        interpret=interpret,
    )(lpz_t, can_skip,
      lens.reshape(-1, 1).astype(jnp.int32),
      ends.reshape(-1, 1).astype(jnp.int32))
    return alphas, nll


def _run_beta(lpz_t, alphas, can_skip, lens, ends, nll, interpret: bool):
    T, Bp, Sp = lpz_t.shape
    TBe = _batch_tile(Bp)
    grid = (Bp // TBe, T)
    rev = lambda ib, it: (T - 1 - it, ib, 0)  # noqa: E731
    grad = pl.pallas_call(
        _beta_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TBe, Sp), rev),
            pl.BlockSpec((1, TBe, Sp), rev),
            pl.BlockSpec((TBe, Sp), lambda ib, it: (ib, 0)),
            pl.BlockSpec((TBe, 1), lambda ib, it: (ib, 0)),
            pl.BlockSpec((TBe, 1), lambda ib, it: (ib, 0)),
            pl.BlockSpec((TBe, 1), lambda ib, it: (ib, 0)),
        ],
        out_specs=pl.BlockSpec((1, TBe, Sp), rev),
        out_shape=jax.ShapeDtypeStruct((T, Bp, Sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TBe, Sp), jnp.float32),
                        pltpu.VMEM((TBe, Sp), jnp.float32)],
        interpret=interpret,
    )(lpz_t, alphas, can_skip,
      lens.reshape(-1, 1).astype(jnp.int32),
      ends.reshape(-1, 1).astype(jnp.int32), nll)
    return grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_nll_from_lpz(lpz_t, can_skip, lens, ends, interpret=False):
    nll, _ = _ctc_nll_fwd_impl(lpz_t, can_skip, lens, ends, interpret)
    return nll


def _ctc_nll_fwd_impl(lpz_t, can_skip, lens, ends, interpret):
    S_real = lpz_t.shape[-1]
    lpz_p, skip_p, lens_p, ends_p, B, Bp, Sp = _pad_inputs(
        lpz_t, can_skip, lens, ends)
    alphas, nll_p = _run_alpha(lpz_p, skip_p, lens_p, ends_p, interpret)
    nll = nll_p[:B, 0]
    return nll, (lpz_p, alphas, skip_p, lens_p, ends_p, nll_p, B, S_real)


def _ctc_nll_fwd(lpz_t, can_skip, lens, ends, interpret=False):
    return _ctc_nll_fwd_impl(lpz_t, can_skip, lens, ends, interpret)


def _ctc_nll_bwd(interpret, res, g):
    lpz_p, alphas, skip_p, lens_p, ends_p, nll_p, B, S_real = res
    grad_p = _run_beta(lpz_p, alphas, skip_p, lens_p, ends_p, nll_p,
                       interpret)
    # scale by incoming cotangent per sample; crop B/S padding back to
    # the caller's true shapes
    grad = grad_p[:, :B, :S_real] * g[None, :, None]
    import numpy as np
    zero_skip = jnp.zeros((B, S_real), jnp.float32)
    zero_int = np.zeros((B,), jax.dtypes.float0)  # int inputs: float0
    return (grad, zero_skip, zero_int, zero_int)


_ctc_nll_from_lpz.defvjp(_ctc_nll_fwd, _ctc_nll_bwd)


def ctc_loss_pallas(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
                    labels: jnp.ndarray, label_lengths: jnp.ndarray,
                    blank_id: int = BLANK_ID,
                    interpret: bool = False) -> jnp.ndarray:
    """Per-utterance CTC NLL [B] — Pallas kernel path.

    Same contract as ``ctc_ref.ctc_loss_ref`` (infeasible -> +inf).
    log_softmax and the z-gather stay in XLA (their grads chain by
    autodiff around the custom-VJP DP core).
    """
    logits = logits.astype(jnp.float32)
    B, T, C = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    z = extended_labels(labels, blank_id)                  # [B, S]
    lp_z = jnp.take_along_axis(log_probs, z[:, None, :].astype(jnp.int32),
                               axis=2)                      # [B, T, S]
    lpz_t = jnp.moveaxis(lp_z, 0, 1)                        # [T, B, S]

    s_idx = jnp.arange(S)[None, :]
    z_prev2 = jnp.concatenate(
        [jnp.full((B, 2), blank_id, z.dtype), z[:, :-2]], axis=1)
    can_skip = (((s_idx % 2) == 1) & (z != z_prev2) & (s_idx >= 2)
                ).astype(jnp.float32)

    ends = (2 * label_lengths).astype(jnp.int32)
    # Crop lpz_t's padded S inside the vjp boundary: pass the real-S
    # arrays; padding happens inside.
    nll = _ctc_nll_from_lpz(lpz_t, can_skip,
                            logit_lengths.astype(jnp.int32), ends,
                            interpret)
    # Infeasible -> +inf (parity with ctc_ref).
    return jnp.where(nll >= -NEG_INF / 2, jnp.inf, nll)
