"""Pallas TPU kernel: fused STFT -> mel -> log (-> DCT) feature frontend.

Replaces the reference's ``tf.signal`` / python_speech_features DSP stack
(SURVEY.md §2b row 4; BASELINE.json:5 "tf.signal feature pipeline ->
Pallas STFT/filterbank"). Parity-tested against the pure-jnp reference
in ``features.py`` (tests/test_stft_pallas.py, interpret mode on CPU).

Design (TPU-first; SURVEY.md §7 M2a):

- **Hop-block DFT decomposition.** A 25ms/10ms frame overlaps its
  neighbors, and Mosaic cannot vector-load at dynamic lane offsets that
  aren't 128-aligned (hop=160 samples). Instead of gathering frames we
  use linearity of the DFT: with the signal reshaped to hop-sized rows
  ``A[r, :] = samples[r*hop : (r+1)*hop]``, frame t is the
  concatenation ``[A[t], A[t+1], ..., A[t+K-1][:rem]]`` and

      rfft(win * frame_t) = sum_k  A[t+k] @ C_k,

  where ``C_k = diag(win)[k*hop:(k+1)*hop] @ DFT_rows[k*hop:(k+1)*hop]``
  are precomputed [hop, bins] matrices (window folded in, zero rows past
  the window length). Each term is a dense MXU matmul over an *aligned*
  row-block — no gathers, no unaligned loads, and the [B, T, W] frames
  tensor never exists in any memory.
- Row blocks ``A[t+k]`` for a 128-frame tile are fetched with K small
  async DMAs at arbitrary row offsets (DMA has no lane-alignment
  constraint, unlike vector loads).
- Power, mel projection, log (and the MFCC DCT) fuse behind the
  matmuls; constants stay VMEM-resident across the whole grid (their
  block index never changes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import features as feat_mod
from ..config import FeatureConfig

FRAME_TILE = 128

# A bf16 SPLIT-FLOAT DFT variant (x = xh+xl, W = Wh+Wl bf16 splits;
# xh@Wh + xh@Wl + xl@Wh — the round-3 "projected 0.5-1 ms" candidate,
# VERDICT r3 next #4) was implemented, parity-verified, A/B'd on
# hardware and DELETED: at B=128 x 8 s the split kernel measured
# 2.916 ms vs 1.470 ms for the straight f32 matmuls — 2x SLOWER.
# Mosaic's f32 MXU lowering is already near its multi-pass optimum
# (a single bf16 pass is only ~1.5x faster than the full f32 matmul
# here), so three explicit bf16 matmuls plus per-segment VPU splits
# cost more than the f32 form. Numbers + conclusion: DESIGN.md §4b.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _segment_dft(win_length: int, hop: int, n_fft: int):
    """Windowed DFT bases split into hop-row segments.

    Returns (cos_segs, msin_segs): [n_seg, hop_pad, bins] with the Hann
    window folded in; rows beyond the window (and the 128-lane padding
    of each hop row) are zero, so padded sample lanes contribute
    nothing to the matmuls.
    """
    n_seg = -(-win_length // hop)
    hop_pad = _round_up(hop, 128)
    n_bins = n_fft // 2 + 1
    cos_m, msin_m = feat_mod.dft_matrices(win_length, n_fft)
    win = feat_mod.hann_window(win_length)
    wc = win[:, None] * cos_m
    ws = win[:, None] * msin_m
    cos_segs = np.zeros((n_seg, hop_pad, n_bins), np.float32)
    msin_segs = np.zeros((n_seg, hop_pad, n_bins), np.float32)
    for k in range(n_seg):
        lo, hi = k * hop, min((k + 1) * hop, win_length)
        cos_segs[k, :hi - lo] = wc[lo:hi]
        msin_segs[k, :hi - lo] = ws[lo:hi]
    return cos_segs, msin_segs


def _buf_rows(n_seg: int) -> int:
    """Tile rows + halo, 8-row aligned. The halo must cover the
    n_seg-1 row shifts (frame 127 of a tile reads rows up to
    127 + n_seg - 1); a fixed 8-row halo silently fed uninitialized
    VMEM into the matmuls for n_seg > 9 (window/hop ratio > 9)."""
    return FRAME_TILE + _round_up(max(n_seg - 1, 1), 8)


def _dma_tile(rows_hbm, buf, sem, b, tile, slot, buf_rows):
    """Async copy of tile's rows+halo into buffer slot ``slot``."""
    return pltpu.make_async_copy(
        rows_hbm.at[b, pl.ds(tile * FRAME_TILE, buf_rows), :],
        buf.at[slot, pl.ds(0, buf_rows)], sem.at[slot])


def _stft_kernel(rows_hbm, cos_ref, msin_ref, mel_ref, dct_ref,
                 out_ref, buf, sem, *, n_seg: int, use_dct: bool,
                 log_floor: float, num_tiles: int, n_b: int,
                 buf_rows: int):
    """Grid (B, num_tiles). rows_hbm: [B, R, hop_pad] in HBM; buf: VMEM
    scratch [2, buf_rows, hop_pad] (double-buffered); constants
    VMEM-resident.

    One 8-row-aligned DMA fetches the tile's rows plus halo (Mosaic
    requires DMA offsets/sizes aligned to the (8,128) tiling, so the
    k-row segment shifts are realized with in-VMEM sublane rolls, not
    shifted DMAs). The DMA for step s+1 is issued before step s's
    compute so the fetch rides under the matmuls — without this the
    kernel serializes on ~B*num_tiles blocking DMAs (measured 3.1 ms
    for B=16 x 8 s; overlapped: see BASELINE.md)."""
    b = pl.program_id(0)
    tile = pl.program_id(1)
    step = b * num_tiles + tile
    slot = jax.lax.rem(step, 2)

    # prefetch the NEXT grid step's rows into the other slot
    is_last = step == n_b * num_tiles - 1
    nxt = jnp.minimum(step + 1, n_b * num_tiles - 1)
    nb, ntile = nxt // num_tiles, jax.lax.rem(nxt, num_tiles)

    for s in (0, 1):  # static slots: dynamic scratch indices defeat Mosaic
        @pl.when(jnp.logical_and(step == 0, slot == s))
        def _first(s=s):
            _dma_tile(rows_hbm, buf, sem, b, tile, s, buf_rows).start()

        @pl.when(jnp.logical_and(jnp.logical_not(is_last), slot == s))
        def _prefetch(s=s):
            _dma_tile(rows_hbm, buf, sem, nb, ntile, 1 - s,
                      buf_rows).start()

    def _compute(s):
        _dma_tile(rows_hbm, buf, sem, b, tile, s, buf_rows).wait()
        cur = buf[s]
        re = jnp.dot(cur[0:FRAME_TILE], cos_ref[0],
                     preferred_element_type=jnp.float32)
        im = jnp.dot(cur[0:FRAME_TILE], msin_ref[0],
                     preferred_element_type=jnp.float32)
        for k in range(1, n_seg):
            # rows k..k+127 == roll up by k, take the first 128 rows
            seg = pltpu.roll(cur, buf_rows - k, axis=0)[0:FRAME_TILE]
            re = re + jnp.dot(seg, cos_ref[k],
                              preferred_element_type=jnp.float32)
            im = im + jnp.dot(seg, msin_ref[k],
                              preferred_element_type=jnp.float32)
        power = re * re + im * im                            # [TT, bins]
        mel = jnp.dot(power, mel_ref[...],
                      preferred_element_type=jnp.float32)
        feats = jnp.log(jnp.maximum(mel, log_floor))
        if use_dct:
            feats = jnp.dot(feats, dct_ref[...],
                            preferred_element_type=jnp.float32)
        out_ref[0] = feats

    for s in (0, 1):
        @pl.when(slot == s)
        def _run(s=s):
            _compute(s)


def features_pallas(samples: jnp.ndarray, cfg: FeatureConfig,
                    log_floor: float = 1e-6,
                    interpret: bool = False) -> jnp.ndarray:
    """[B, S] float32 samples -> [B, T, F] features (mel or mfcc).

    Matches ``features._jnp_features`` (un-normalized); caller applies
    masking/normalization. Frame count T matches the reference path.
    """
    B, S = samples.shape
    W, hop = cfg.win_length, cfg.hop_length
    T = max(1, feat_mod.num_frames(S, cfg))
    use_dct = cfg.feature_type == "mfcc"
    F = cfg.n_mfcc if use_dct else cfg.n_mels
    n_seg = -(-W // hop)

    num_tiles = -(-T // FRAME_TILE)
    T_pad = num_tiles * FRAME_TILE
    buf_rows = _buf_rows(n_seg)
    # Rows needed: the last tile DMAs buf_rows rows from r0 = T_pad -
    # FRAME_TILE; pad samples to that many whole hops.
    R = T_pad + (buf_rows - FRAME_TILE)
    S_need = R * hop
    if S_need > S:
        samples = jnp.pad(samples, ((0, 0), (0, S_need - S)))
    # Each hop row pads to a 128-lane multiple: DMA slices (and the VMEM
    # scratch) must be lane-aligned; the matching DFT-segment rows are
    # zero so the padding is numerically inert.
    hop_pad = _round_up(hop, 128)
    rows = samples[:, :S_need].reshape(B, R, hop)
    if hop_pad != hop:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, hop_pad - hop)))

    cos_segs, msin_segs = _segment_dft(W, hop, cfg.n_fft)
    fb = feat_mod.mel_filterbank(cfg.n_fft, cfg.n_mels, cfg.sample_rate,
                                 cfg.fmin, cfg.fmax)
    # Bin truncation: FFT bins above the top mel filter's edge (fmax <
    # Nyquist) have all-zero filterbank rows, so the DFT can stop at
    # the last used bin, rounded up to a full 128-lane tile — EXACT
    # (the kept partial sums are unchanged) and it removes the lane
    # padding of the bins axis (257 -> 384 padded vs 256 exact for the
    # 16 kHz/512-FFT/7.6 kHz default: one third of the DFT matmul).
    nz = np.nonzero((fb != 0).any(axis=1))[0]
    used = int(nz[-1]) + 1 if nz.size else fb.shape[0]
    n_bins_used = min(fb.shape[0], _round_up(used, 128))
    if n_bins_used < fb.shape[0]:
        cos_segs = np.ascontiguousarray(cos_segs[:, :, :n_bins_used])
        msin_segs = np.ascontiguousarray(msin_segs[:, :, :n_bins_used])
        fb = np.ascontiguousarray(fb[:n_bins_used])
    dct = feat_mod.dct_matrix(cfg.n_mels, cfg.n_mfcc) if use_dct else \
        np.zeros((cfg.n_mels, 1), np.float32)

    kernel = functools.partial(_stft_kernel, n_seg=n_seg, use_dct=use_dct,
                               log_floor=log_floor, num_tiles=num_tiles,
                               n_b=B, buf_rows=buf_rows)
    const3 = lambda *_: (0, 0, 0)  # noqa: E731
    const2 = lambda *_: (0, 0)     # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(B, num_tiles),
        in_specs=[
            # Rows MUST stay in HBM: VMEM memrefs are (8,128)-tiled and
            # the per-segment DMA offsets r0+k (k=1..n_seg-1) are not
            # 8-row aligned; HBM is untiled so arbitrary offsets are
            # legal DMA sources.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(cos_segs.shape, const3),
            pl.BlockSpec(msin_segs.shape, const3),
            pl.BlockSpec(fb.shape, const2),
            pl.BlockSpec(dct.shape, const2),
        ],
        out_specs=pl.BlockSpec((1, FRAME_TILE, F), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, buf_rows, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(rows, jnp.asarray(cos_segs), jnp.asarray(msin_segs),
      jnp.asarray(fb), jnp.asarray(dct))
    return out[:, :T, :]
