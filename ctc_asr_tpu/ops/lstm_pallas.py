"""Pallas TPU kernel: fused LSTM sequence (forward + custom BPTT).

The TPU-native replacement for cuDNN's fused LSTM (SURVEY.md §2b row 3
"optional fused Pallas LSTM cell"; §7 hard parts "BiLSTM throughput").
The XLA ``lax.scan`` path (models/rnn.py) pays per-iteration while-loop
overhead and materializes loop state through HBM every step; this kernel
runs the WHOLE time loop on-core:

- grid (T,): time is the pallas grid; the recurrent state (h, c) lives
  in VMEM scratch across grid steps; ``xproj`` blocks stream HBM->VMEM
  double-buffered by the pipeline; the gate weights ``wh`` stay
  VMEM-resident (constant block index).
- Both directions of a BiLSTM run fused: rows [0:B) are forward, rows
  [B:2B) the (statically flipped) backward direction — one kernel, one
  grid, MXU matmuls at 2B rows. Direction-specific weights apply via
  static row slices (no batched-dot lowering surprises).
- Masking uses per-row [start, end) windows computed in-kernel from
  ``t = program_id`` (forward rows: [0, len); flipped backward rows:
  [T-len, T)) — the same semantics as models/rnn.py.
- **Custom VJP**: the forward saves (h_seq, c_seq, activated gates);
  the backward kernel runs the standard BPTT recurrence in reverse grid
  order, carrying (dh, dc) in scratch, streaming two shifted views of
  h_seq/c_seq (same array, two BlockSpecs), emitting dxproj per step
  and accumulating dwh in VMEM scratch written out at the last step.
  d(bias)/d(wx)/d(input) chain through dxproj in XLA (xproj = x@wx + b
  stays outside the kernel).

Parity-tested against the scan implementation (values AND gradients) in
tests/test_lstm_pallas.py via interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(xproj_ref, wh_ref, start_ref, end_ref,
                h_out_ref, c_out_ref, gates_out_ref,
                h_c, c_c, *, R: int, B: int, H: int, nd: int):
    """Grid (T,). Blocks: xproj [1, R, 4H]; wh [nd, H, 4H] resident;
    start/end [R, 1] resident; outs per-step [1, R, *]; scratch h/c
    [R, H] carried."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_c[...] = jnp.zeros((R, H), jnp.float32)
        c_c[...] = jnp.zeros((R, H), jnp.float32)

    h = h_c[...]
    c = c_c[...]
    xp = xproj_ref[0]                                    # [R, 4H]
    # direction-specific recurrent matmul via static row slices
    parts = []
    for d in range(nd):
        parts.append(jnp.dot(h[d * B:(d + 1) * B].astype(jnp.bfloat16),
                             wh_ref[d].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32))
    hproj = jnp.concatenate(parts, axis=0) if nd > 1 else parts[0]
    gates = xp + hproj                                   # [R, 4H]
    gi = jax.nn.sigmoid(gates[:, 0 * H:1 * H])
    gf = jax.nn.sigmoid(gates[:, 1 * H:2 * H])
    gg = jnp.tanh(gates[:, 2 * H:3 * H])
    go = jax.nn.sigmoid(gates[:, 3 * H:4 * H])
    c_new = gf * c + gi * gg
    h_new = go * jnp.tanh(c_new)

    m = ((t >= start_ref[:, 0]) & (t < end_ref[:, 0]))[:, None]
    mf = m.astype(jnp.float32)
    c2 = mf * c_new + (1.0 - mf) * c
    h2 = mf * h_new + (1.0 - mf) * h
    h_c[...] = h2
    c_c[...] = c2
    h_out_ref[0] = h2 * mf
    c_out_ref[0] = c2
    gates_out_ref[0] = jnp.concatenate([gi, gf, gg, go], axis=1)


# ---------------------------------------------------------------------------
# Backward kernel (reverse grid order)
# ---------------------------------------------------------------------------

def _bwd_kernel(gout_ref, gates_ref, c_ref, cprev_ref, hprev_ref,
                wh_ref, start_ref, end_ref,
                dxproj_ref,
                dh_c, dc_c, *, R: int, B: int, H: int, nd: int):
    """Grid (T,) with index maps reversed (t = T-1-it). cprev/hprev are
    the same arrays as c_seq/h_seq with a t-1 index map (clamped at 0;
    the t==0 contribution is zeroed explicitly)."""
    it = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - it

    @pl.when(it == 0)
    def _init():
        dh_c[...] = jnp.zeros((R, H), jnp.float32)
        dc_c[...] = jnp.zeros((R, H), jnp.float32)

    m = ((t >= start_ref[:, 0]) & (t < end_ref[:, 0]))[:, None]
    mf = m.astype(jnp.float32)
    not_first = (t > 0)

    gts = gates_ref[0]                                   # [R, 4H]
    gi, gf = gts[:, 0 * H:1 * H], gts[:, 1 * H:2 * H]
    gg, go = gts[:, 2 * H:3 * H], gts[:, 3 * H:4 * H]
    c_t = c_ref[0]
    c_prev = jnp.where(not_first, cprev_ref[0], 0.0)
    h_prev = jnp.where(not_first, hprev_ref[0], 0.0)
    tanh_c = jnp.tanh(c_t)

    dh_total = dh_c[...] + mf * gout_ref[0]
    dh_new = mf * dh_total
    dh_prev_direct = (1.0 - mf) * dh_total
    do = dh_new * tanh_c
    dc_from_h = dh_new * go * (1.0 - tanh_c * tanh_c)
    dc_total = mf * dc_c[...] + dc_from_h
    dc_prev_direct = (1.0 - mf) * dc_c[...]
    df = dc_total * c_prev
    di = dc_total * gg
    dg = dc_total * gi
    dc_prev_from_new = dc_total * gf

    dpre_i = di * gi * (1.0 - gi)
    dpre_f = df * gf * (1.0 - gf)
    dpre_g = dg * (1.0 - gg * gg)
    dpre_o = do * go * (1.0 - go)
    dgates = jnp.concatenate([dpre_i, dpre_f, dpre_g, dpre_o], axis=1)

    dxproj_ref[0] = dgates

    # dh_prev += dgates @ wh^T per direction. dwh is NOT accumulated in
    # the kernel: an [nd*H, 4H] f32 accumulator overflows VMEM at H=800
    # (measured 20.25M > 16M); instead the host computes it as ONE large
    # matmul over the whole sequence (h_prev_seq^T @ dxproj_seq) where
    # the MXU is far more efficient anyway.
    dh_parts = []
    for d in range(nd):
        rows = slice(d * B, (d + 1) * B)
        dh_parts.append(jax.lax.dot_general(
            dgates[rows].astype(jnp.bfloat16),
            wh_ref[d].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))         # [B, H]
    dh_prev = (jnp.concatenate(dh_parts, axis=0) if nd > 1
               else dh_parts[0])

    dh_c[...] = dh_prev_direct + dh_prev
    dc_c[...] = dc_prev_direct + dc_prev_from_new


# ---------------------------------------------------------------------------
# Host wrappers + custom VJP
# ---------------------------------------------------------------------------

def _run_fwd(xproj, wh, start, end, interpret):
    T, R, G = xproj.shape
    nd, H, _ = wh.shape
    B = R // nd
    kernel = functools.partial(_fwd_kernel, R=R, B=B, H=H, nd=nd)
    const = lambda t: (0, 0, 0)  # noqa: E731
    const2 = lambda t: (0, 0)    # noqa: E731
    h_seq, c_seq, gates = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, G), lambda t: (t, 0, 0)),
            pl.BlockSpec((nd, H, G), const),
            pl.BlockSpec((R, 1), const2),
            pl.BlockSpec((R, 1), const2),
        ],
        out_specs=[
            pl.BlockSpec((1, R, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, R, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, R, G), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, H), jnp.float32),
            jax.ShapeDtypeStruct((T, R, H), jnp.float32),
            jax.ShapeDtypeStruct((T, R, G), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R, H), jnp.float32),
                        pltpu.VMEM((R, H), jnp.float32)],
        interpret=interpret,
    )(xproj, wh, start, end)
    return h_seq, c_seq, gates


def _run_bwd(g_out, gates, c_seq, h_seq, wh, start, end, interpret):
    T, R, G = gates.shape
    nd, H, _ = wh.shape
    B = R // nd
    kernel = functools.partial(_bwd_kernel, R=R, B=B, H=H, nd=nd)
    rev = lambda it: (T - 1 - it, 0, 0)                   # noqa: E731
    # t-1 view, clamped at 0 (kernel zeroes the t==0 contribution)
    revm1 = lambda it: (jnp.maximum(T - 2 - it, 0), 0, 0)  # noqa: E731
    const = lambda it: (0, 0, 0)  # noqa: E731
    const2 = lambda it: (0, 0)    # noqa: E731
    dxproj = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, H), rev),        # g_out
            pl.BlockSpec((1, R, G), rev),        # gates
            pl.BlockSpec((1, R, H), rev),        # c_seq  (t)
            pl.BlockSpec((1, R, H), revm1),      # c_seq  (t-1)
            pl.BlockSpec((1, R, H), revm1),      # h_seq  (t-1)
            pl.BlockSpec((nd, H, G), const),
            pl.BlockSpec((R, 1), const2),
            pl.BlockSpec((R, 1), const2),
        ],
        out_specs=pl.BlockSpec((1, R, G), rev),
        out_shape=jax.ShapeDtypeStruct((T, R, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, H), jnp.float32),
                        pltpu.VMEM((R, H), jnp.float32)],
        interpret=interpret,
    )(g_out, gates, c_seq, c_seq, h_seq, wh, start, end)
    return dxproj


def _dwh_from_seq(h_seq, dhproj, B, nd):
    """dwh[d] = sum_t h_prev[t]^T @ dhproj[t] as one large matmul
    (h_prev = h_seq shifted by one step, zeros at t=0)."""
    T, R, H = h_seq.shape
    G = dhproj.shape[-1]
    hp = jnp.concatenate(
        [jnp.zeros((1, R, H), h_seq.dtype), h_seq[:-1]], axis=0)
    parts = []
    for d in range(nd):
        rows = slice(d * B, (d + 1) * B)
        lhs = hp[:, rows].reshape(-1, H).astype(jnp.bfloat16)
        rhs = dhproj[:, rows].reshape(-1, G).astype(jnp.bfloat16)
        parts.append(jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    return jnp.stack(parts, axis=0)                      # [nd, H, G]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def lstm_seq_pallas(xproj, wh, start, end, interpret=False):
    """Fused LSTM over a whole sequence.

    xproj: [T, R, 4H] f32 input projections (x@wx + b, precomputed);
    wh: [nd, H, 4H] recurrent weights, bf16 recommended — it stays
    VMEM-resident in both kernels and f32 + the f32 dwh scratch
    overflows VMEM (nd=1 uni, nd=2 fused bi; rows
    [d*B:(d+1)*B) of the R=nd*B row axis use wh[d]);
    start/end: [R, 1] int32 valid windows per row.
    Returns masked hidden outputs [T, R, H] f32.
    """
    h_seq, _, _ = _run_fwd(xproj, wh, start, end, interpret)
    return h_seq


def _fwd_rule(xproj, wh, start, end, interpret=False):
    h_seq, c_seq, gates = _run_fwd(xproj, wh, start, end, interpret)
    return h_seq, (gates, c_seq, h_seq, wh, start, end)


def _bwd_rule(interpret, res, g_out):
    gates, c_seq, h_seq, wh, start, end = res
    nd, H, _ = wh.shape
    B = h_seq.shape[1] // nd
    dxproj = _run_bwd(g_out, gates, c_seq, h_seq, wh, start, end,
                      interpret)
    # For the LSTM, d(hproj) == dxproj (same pre-activation gates).
    dwh = _dwh_from_seq(h_seq, dxproj, B, nd)
    import numpy as np
    zero_int = np.zeros(start.shape, jax.dtypes.float0)
    # cotangent dtype must match the (possibly bf16) wh input
    return dxproj, dwh.astype(wh.dtype), zero_int, zero_int


lstm_seq_pallas.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# GRU sequence kernels (same architecture as the LSTM pair; gate order
# r, z, n matching models/rnn.py; the h-projection's n-third ``hn`` is
# saved alongside the activated gates because BPTT needs it:
# n = tanh(xn + r*hn) => dr = dn_pre*hn, and the wh-gradient row for the
# n gate is d(hproj_n) = dn_pre*r).
# ---------------------------------------------------------------------------

def _gru_fwd_kernel(xproj_ref, wh_ref, start_ref, end_ref,
                    h_out_ref, gates_out_ref,
                    h_c, *, R: int, B: int, H: int, nd: int):
    """Blocks: xproj [1, R, 3H]; wh [nd, H, 3H]; outs h [1, R, H],
    gates [1, R, 4H] = (r, z, n, hn); scratch h [R, H]."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _init():
        h_c[...] = jnp.zeros((R, H), jnp.float32)

    h = h_c[...]
    xp = xproj_ref[0]                                    # [R, 3H]
    parts = []
    for d in range(nd):
        parts.append(jnp.dot(h[d * B:(d + 1) * B].astype(jnp.bfloat16),
                             wh_ref[d].astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32))
    hproj = jnp.concatenate(parts, axis=0) if nd > 1 else parts[0]
    hr, hz, hn = (hproj[:, 0 * H:1 * H], hproj[:, 1 * H:2 * H],
                  hproj[:, 2 * H:3 * H])
    xr, xz, xn = (xp[:, 0 * H:1 * H], xp[:, 1 * H:2 * H],
                  xp[:, 2 * H:3 * H])
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    h_new = (1.0 - z) * n + z * h

    m = ((t >= start_ref[:, 0]) & (t < end_ref[:, 0]))[:, None]
    mf = m.astype(jnp.float32)
    h2 = mf * h_new + (1.0 - mf) * h
    h_c[...] = h2
    h_out_ref[0] = h2 * mf
    gates_out_ref[0] = jnp.concatenate([r, z, n, hn], axis=1)


def _gru_bwd_kernel(gout_ref, gates_ref, hprev_ref, wh_ref,
                    start_ref, end_ref,
                    dxproj_ref, dh_c,
                    *, R: int, B: int, H: int, nd: int):
    it = pl.program_id(0)
    T = pl.num_programs(0)
    t = T - 1 - it

    @pl.when(it == 0)
    def _init():
        dh_c[...] = jnp.zeros((R, H), jnp.float32)

    m = ((t >= start_ref[:, 0]) & (t < end_ref[:, 0]))[:, None]
    mf = m.astype(jnp.float32)
    not_first = (t > 0)

    gts = gates_ref[0]
    r, z = gts[:, 0 * H:1 * H], gts[:, 1 * H:2 * H]
    n, hn = gts[:, 2 * H:3 * H], gts[:, 3 * H:4 * H]
    h_prev = jnp.where(not_first, hprev_ref[0], 0.0)

    dh_total = dh_c[...] + mf * gout_ref[0]
    dh_new = mf * dh_total
    dh_prev_direct = (1.0 - mf) * dh_total
    dz = dh_new * (h_prev - n)
    dn = dh_new * (1.0 - z)
    dh_prev_from_new = dh_new * z
    dn_pre = dn * (1.0 - n * n)
    dr = dn_pre * hn
    dhn = dn_pre * r
    dr_pre = dr * r * (1.0 - r)
    dz_pre = dz * z * (1.0 - z)

    dxproj_ref[0] = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=1)
    dhproj = jnp.concatenate([dr_pre, dz_pre, dhn], axis=1)  # [R, 3H]

    # dwh accumulates OUTSIDE the kernel (see _dwh_from_seq).
    dh_parts = []
    for d in range(nd):
        rows = slice(d * B, (d + 1) * B)
        dh_parts.append(jax.lax.dot_general(
            dhproj[rows].astype(jnp.bfloat16),
            wh_ref[d].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    dh_prev = (jnp.concatenate(dh_parts, axis=0) if nd > 1
               else dh_parts[0])
    dh_c[...] = dh_prev_direct + dh_prev_from_new + dh_prev


def _gru_run_fwd(xproj, wh, start, end, interpret):
    T, R, G = xproj.shape          # G = 3H
    nd, H, _ = wh.shape
    B = R // nd
    kernel = functools.partial(_gru_fwd_kernel, R=R, B=B, H=H, nd=nd)
    const = lambda t: (0, 0, 0)  # noqa: E731
    const2 = lambda t: (0, 0)    # noqa: E731
    h_seq, gates = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, G), lambda t: (t, 0, 0)),
            pl.BlockSpec((nd, H, G), const),
            pl.BlockSpec((R, 1), const2),
            pl.BlockSpec((R, 1), const2),
        ],
        out_specs=[
            pl.BlockSpec((1, R, H), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, R, 4 * H), lambda t: (t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, R, H), jnp.float32),
            jax.ShapeDtypeStruct((T, R, 4 * H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((R, H), jnp.float32)],
        interpret=interpret,
    )(xproj, wh, start, end)
    return h_seq, gates


def _gru_run_bwd(g_out, gates, h_seq, wh, start, end, interpret):
    T, R, G4 = gates.shape
    nd, H, G = wh.shape
    B = R // nd
    kernel = functools.partial(_gru_bwd_kernel, R=R, B=B, H=H, nd=nd)
    rev = lambda it: (T - 1 - it, 0, 0)                   # noqa: E731
    revm1 = lambda it: (jnp.maximum(T - 2 - it, 0), 0, 0)  # noqa: E731
    const = lambda it: (0, 0, 0)  # noqa: E731
    const2 = lambda it: (0, 0)    # noqa: E731
    dxproj = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, R, H), rev),        # g_out
            pl.BlockSpec((1, R, G4), rev),       # gates (r,z,n,hn)
            pl.BlockSpec((1, R, H), revm1),      # h_seq (t-1)
            pl.BlockSpec((nd, H, G), const),
            pl.BlockSpec((R, 1), const2),
            pl.BlockSpec((R, 1), const2),
        ],
        out_specs=pl.BlockSpec((1, R, G), rev),
        out_shape=jax.ShapeDtypeStruct((T, R, G), jnp.float32),
        scratch_shapes=[pltpu.VMEM((R, H), jnp.float32)],
        interpret=interpret,
    )(g_out, gates, h_seq, wh, start, end)
    return dxproj


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gru_seq_pallas(xproj, wh, start, end, interpret=False):
    """Fused GRU over a whole sequence (see lstm_seq_pallas; xproj is
    [T, R, 3H], wh [nd, H, 3H] bf16 recommended)."""
    h_seq, _ = _gru_run_fwd(xproj, wh, start, end, interpret)
    return h_seq


def _gru_fwd_rule(xproj, wh, start, end, interpret=False):
    h_seq, gates = _gru_run_fwd(xproj, wh, start, end, interpret)
    return h_seq, (gates, h_seq, wh, start, end)


def _gru_bwd_rule(interpret, res, g_out):
    gates, h_seq, wh, start, end = res
    nd, H, _ = wh.shape
    B = h_seq.shape[1] // nd
    dxproj = _gru_run_bwd(g_out, gates, h_seq, wh, start, end,
                          interpret)
    # The wh-cotangent n-column uses d(hproj_n) = dn_pre * r, not
    # dn_pre (n = tanh(xn + r*hn)); reconstruct from saved r.
    r = gates[:, :, 0 * H:1 * H]
    dhproj = jnp.concatenate(
        [dxproj[:, :, 0:2 * H], dxproj[:, :, 2 * H:3 * H] * r], axis=-1)
    dwh = _dwh_from_seq(h_seq, dhproj, B, nd)
    import numpy as np
    zero_int = np.zeros(start.shape, jax.dtypes.float0)
    return dxproj, dwh.astype(wh.dtype), zero_int, zero_int


gru_seq_pallas.defvjp(_gru_fwd_rule, _gru_bwd_rule)
