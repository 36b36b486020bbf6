"""Pallas TPU kernel: banded 1-D conv — the DS2 conv frontend.

Replaces the reference's frontend convs (``asr/model.py``-style conv2d
stack running on TF's cuDNN kernels, SURVEY.md §2b) with a first-party
MXU kernel (BASELINE.json:5 names the conv frontend as one of the four
Pallas kernels). Parity-tested against ``conv2d_matmul_apply`` and
``jax.lax.conv_general_dilated`` in tests/test_conv_pallas.py
(interpret mode on CPU).

Design (TPU-first; SURVEY.md §7 M2c):

- **Frequency fold** (shared with models/layers.py): the tiny-channel
  2-D conv becomes a 1-D TIME conv over MXU-sized channels by folding
  the frequency kernel into a dense banded matrix per time tap. Here
  the fold is a single einsum against a precomputed 0/1 placement
  tensor (one traced op; the per-column pad/stack assembly in
  layers.py traces ~60 tiny ops).
- **Stride-2 time fold**: a stride-2 banded conv becomes a stride-1
  conv over PAIRED rows — x2[r] = concat(x[2r], x[2r+1]) is a free
  reshape, and tap pairs concatenate along the contraction dim:
  ``y[t] = sum_j x2[t+j] @ W2[j]`` with ``W2[j] = [W[2j]; W[2j+1]]``.
  (An XLA formulation of this fold was rejected — the weight
  re-assembly lowered to scatters in the backward pass; with a custom
  VJP the assembly is sliced, not scattered.)
- **Kernel**: grid (N-blocks, batch, time-tiles), weights
  VMEM-resident across the whole (batch x time) sweep of each N
  block; per tile one aligned, double-buffered DMA fetches
  TILE+halo input rows from HBM and the kt taps are realized as
  in-VMEM sublane rolls feeding f32-accumulated MXU matmuls (the
  roll-decomposition pattern of stft_pallas.py).
- **Backward**: dx is the SAME kernel with flipped taps and
  transposed bands (a valid banded conv of the padded cotangent);
  dW is kt dense [K, B*T] x [B*T, N] matmuls in XLA.

Measured v5e (B=16, T=800, F=80, both DS2 convs, RTT-corrected chained
timing, scripts/diag_conv.py --mode kernels): raw kernels run at roofline (conv1
0.23 ms, conv2 0.79 ms fwd vs 0.23/0.74 ms speed-of-light), but
end-to-end the XLA banded conv still wins (1.62 vs 2.23 ms fwd+bwd) —
the fold/pad/cast wrapper and the XLA-side dW matmuls cost more than
the kernel saves. Kept flag-gated (ModelConfig.use_pallas_conv,
default off) as the contract's conv-frontend kernel and for shapes
XLA's conv lowering handles poorly; dispatch picks the XLA twin by
default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TIME_TILE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _same_pad(in_size: int, k: int, s: int):
    out = -(-in_size // s)
    total = max((out - 1) * s + k - in_size, 0)
    return out, total // 2, total - total // 2


@functools.lru_cache(maxsize=16)
def _placement(F: int, kf: int, sf: int) -> np.ndarray:
    """[kf, F, f_out] 0/1 tensor: input row f feeds tap kf of column fo."""
    f_out, pf_lo, _ = _same_pad(F, kf, sf)
    A = np.zeros((kf, F, f_out), np.float32)
    for fo in range(f_out):
        for k in range(kf):
            f = fo * sf - pf_lo + k
            if 0 <= f < F:
                A[k, f, fo] = 1.0
    return A


def band_matrices(w: jnp.ndarray, F: int, sf: int) -> jnp.ndarray:
    """[kt, kf, cin, cout] -> per-time-tap banded [kt, F*cin, f_out*cout].

    Equivalent to layers._band_matrices but assembled with ONE einsum so
    both directions trace as a single op.
    """
    kt, kf, cin, cout = w.shape
    A = jnp.asarray(_placement(F, kf, sf))
    Wb = jnp.einsum("kfio,fFg->kFigo", w, A)
    return Wb.reshape(kt, F * cin, A.shape[2] * cout)


# ---------------------------------------------------------------------------
# The valid banded 1-D conv primitive: y[b,t] = sum_k x[b,t+k] @ w[k]
# ---------------------------------------------------------------------------

def _conv_kernel(x_hbm, w_ref, out_ref, buf, sem, *, kt: int, n_tiles: int,
                 n_b: int, buf_rows: int):
    """Grid (nN, B, n_tiles); x_hbm [B, R, K] in HBM; w block resident.

    One aligned DMA per (b, tile) fetches TIME_TILE+halo rows into the
    double buffer; the next grid step's DMA is issued before this
    step's compute so the fetch rides under the matmuls."""
    nblk = pl.program_id(0)
    b = pl.program_id(1)
    tile = pl.program_id(2)
    step = (nblk * n_b + b) * n_tiles + tile
    total = pl.num_programs(0) * n_b * n_tiles
    slot = jax.lax.rem(step, 2)

    def _dma(bb, tt, s):
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(tt * TIME_TILE, buf_rows), :],
            buf.at[s], sem.at[s])

    is_last = step == total - 1
    nxt = jnp.minimum(step + 1, total - 1)
    nb = jax.lax.rem(nxt // n_tiles, n_b)
    ntile = jax.lax.rem(nxt, n_tiles)

    for s in (0, 1):  # static slots: dynamic scratch indices defeat Mosaic
        @pl.when(jnp.logical_and(step == 0, slot == s))
        def _first(s=s):
            _dma(b, tile, s).start()

        @pl.when(jnp.logical_and(jnp.logical_not(is_last), slot == s))
        def _prefetch(s=s):
            _dma(nb, ntile, 1 - s).start()

    def _compute(s):
        _dma(b, tile, s).wait()
        # Tap windows are STATIC sublane-offset reads (bf16 has no
        # dynamic_rotate lowering, so the roll decomposition that
        # stft_pallas.py uses for f32 is unavailable here).
        acc = jnp.dot(buf[s, 0:TIME_TILE], w_ref[0],
                      preferred_element_type=jnp.float32)
        for k in range(1, kt):
            acc = acc + jnp.dot(buf[s, k:k + TIME_TILE], w_ref[k],
                                preferred_element_type=jnp.float32)
        out_ref[0] = acc

    for s in (0, 1):
        @pl.when(slot == s)
        def _run(s=s):
            _compute(s)


def _pick_nb(kt: int, K: int, N: int, budget: int = 4 << 20) -> int:
    """Largest 128-multiple divisor of N w/ a <= budget-byte w block."""
    for nb in range(N, 127, -128):
        if N % nb == 0 and kt * K * nb * 2 <= budget:
            return nb
    return 128


def _conv_fwd_pallas(x: jnp.ndarray, w: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """x [B, Tin, K] compute-dtype, w [kt, K, N] -> y [B, Tin-kt+1, N] f32.

    K and N must be 128-multiples (callers pad); Tin anything >= kt.
    """
    B, Tin, K = x.shape
    kt, Kw, N = w.shape
    assert K == Kw and K % 128 == 0 and N % 128 == 0, (K, Kw, N)
    out_len = Tin - kt + 1
    assert out_len >= 1, (Tin, kt)

    n_tiles = -(-out_len // TIME_TILE)
    # buffer rows must be a multiple of the dtype's sublane tile or the
    # per-tap rolls fail to vectorize (f32: 8, bf16: 16, int8/fp8: 32)
    sublane = {2: 16, 1: 32}.get(jnp.dtype(x.dtype).itemsize, 8)
    halo = _round_up(kt - 1, sublane)
    buf_rows = TIME_TILE + halo
    R = n_tiles * TIME_TILE + halo  # rows the last tile's DMA touches
    if R > Tin:
        x = jnp.pad(x, ((0, 0), (0, R - Tin), (0, 0)))

    NB = _pick_nb(kt, K, N)
    n_nb = N // NB
    kernel = functools.partial(_conv_kernel, kt=kt, n_tiles=n_tiles,
                               n_b=B, buf_rows=buf_rows)
    out = pl.pallas_call(
        kernel,
        grid=(n_nb, B, n_tiles),
        in_specs=[
            # x stays in HBM: tile windows overlap by kt-1 rows, which a
            # BlockSpec cannot express; HBM is untiled so the halo'd DMA
            # offsets are legal.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((kt, K, NB), lambda n, b, t: (0, 0, n)),
        ],
        out_specs=pl.BlockSpec((1, TIME_TILE, NB),
                               lambda n, b, t: (b, t, n)),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * TIME_TILE, N),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, buf_rows, K), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, w)
    return out[:, :out_len]


def _conv_valid_ref(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA twin of _conv_fwd_pallas (tap matmuls); CPU/test path."""
    kt = w.shape[0]
    out_len = x.shape[1] - kt + 1
    acc = None
    for k in range(kt):
        yk = jnp.dot(x[:, k:k + out_len], w[k],
                     preferred_element_type=jnp.float32)
        acc = yk if acc is None else acc + yk
    return acc


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def banded_conv_valid(x, w, use_pallas: bool = True,
                      interpret: bool = False):
    """Valid banded conv: x [B,Tin,K], w [kt,K,N] -> [B,Tin-kt+1,N] f32.

    K, N must be 128-multiples. Inputs are cast to w.dtype's compute
    precision by the caller; accumulation is always f32.
    """
    if use_pallas:
        return _conv_fwd_pallas(x, w, interpret=interpret)
    return _conv_valid_ref(x, w)


def _bcv_fwd(x, w, use_pallas, interpret):
    return banded_conv_valid(x, w, use_pallas, interpret), (x, w)


def _bcv_bwd(use_pallas, interpret, res, g):
    x, w = res
    kt = w.shape[0]
    out_len = x.shape[1] - kt + 1
    gc = g.astype(x.dtype)
    # dW[k] = sum_{b,t} x[b, t+k]^T g[b, t]  — kt dense matmuls.
    dw = jnp.stack([
        jnp.einsum("btk,btn->kn", x[:, k:k + out_len], gc,
                   preferred_element_type=jnp.float32)
        for k in range(kt)
    ]).astype(w.dtype)
    # dx = valid banded conv of the padded cotangent with flipped,
    # transposed taps: dx[s] = sum_j gp[s + j] @ w[kt-1-j]^T.
    w_rev = jnp.flip(w, axis=0).swapaxes(1, 2)        # [kt, N, K]
    gp = jnp.pad(gc, ((0, 0), (kt - 1, kt - 1), (0, 0)))
    dx_full = banded_conv_valid(gp, w_rev, use_pallas, interpret)
    dx = dx_full[:, :x.shape[1]].astype(x.dtype)
    return dx, dw


banded_conv_valid.defvjp(_bcv_fwd, _bcv_bwd)


# ---------------------------------------------------------------------------
# conv2d_apply drop-in: NHWC SAME conv via freq fold + time fold + kernel
# ---------------------------------------------------------------------------

def conv2d_pallas_apply(params: dict, x: jnp.ndarray, strides,
                        compute_dtype=jnp.bfloat16, use_pallas: bool = True,
                        interpret: bool = False) -> jnp.ndarray:
    """Drop-in for layers.conv2d_apply (NHWC, SAME, f32 out + bias).

    Time stride must be 1 or 2 (the DS1/DS2 frontend space).
    """
    w = params["w"]                                  # [kt, kf, cin, cout]
    kt, kf, cin, cout = w.shape
    B, T, F, C = x.shape
    st, sf = strides
    assert C == cin and st in (1, 2), (C, cin, st)
    f_out, _, _ = _same_pad(F, kf, sf)
    t_out, pt_lo, pt_hi = _same_pad(T, kt, st)
    N = f_out * cout

    Wb = band_matrices(w, F, sf)                     # [kt, F*cin, N]
    xb = x.reshape(B, T, F * C)
    xb = jnp.pad(xb, ((0, 0), (pt_lo, pt_hi), (0, 0)))

    if st == 2:
        # pair rows; tap pairs concatenate along the contraction dim
        if xb.shape[1] % 2:
            xb = jnp.pad(xb, ((0, 0), (0, 1), (0, 0)))
        xb = xb.reshape(B, xb.shape[1] // 2, 2 * F * C)
        if kt % 2:
            Wb = jnp.pad(Wb, ((0, 1), (0, 0), (0, 0)))
        Wb = jnp.concatenate([Wb[0::2], Wb[1::2]], axis=1)

    K = xb.shape[2]
    Kp = _round_up(K, 128)
    if Kp != K:
        xb = jnp.pad(xb, ((0, 0), (0, 0), (0, Kp - K)))
        Wb = jnp.pad(Wb, ((0, 0), (0, Kp - K), (0, 0)))
    Np = _round_up(N, 128)
    if Np != N:
        Wb = jnp.pad(Wb, ((0, 0), (0, 0), (0, Np - N)))
    # valid-conv input must cover out rows t + k, t < t_out
    need = t_out + Wb.shape[0] - 1
    if xb.shape[1] < need:
        xb = jnp.pad(xb, ((0, 0), (0, need - xb.shape[1]), (0, 0)))

    y = banded_conv_valid(xb.astype(compute_dtype),
                          Wb.astype(compute_dtype), use_pallas, interpret)
    y = y[:, :t_out, :N].reshape(B, t_out, f_out, cout)
    return y + params["b"]
