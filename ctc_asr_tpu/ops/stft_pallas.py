"""Pallas TPU kernel: fused STFT -> mel -> log (-> DCT) feature frontend.

Replaces the reference's ``tf.signal`` / python_speech_features DSP stack
(SURVEY.md §2b row 4; BASELINE.json:5 "tf.signal feature pipeline ->
Pallas STFT/filterbank"). Parity-tested against the pure-jnp reference
in ``features.py`` (tests/test_stft_pallas.py, interpret mode on CPU).

Design (SURVEY.md §7 M2a):
- One fused kernel per (utterance, frame-tile): raw samples stream
  HBM->VMEM once (the frames tensor — a 2.5x overlap inflation at
  25ms/10ms — is never materialized in HBM, unlike the XLA path which
  gathers [B, T, W] first).
- Framing uses an explicit async DMA of the overlapping sample span
  (overlapping reads are not expressible as BlockSpec tiling) followed
  by an in-VMEM strided unpack loop.
- The rFFT is two MXU matmuls against precomputed DFT cosine/sine bases
  (matmul-formulated FFT: for W=400, n_fft=512 the dense [W, 257]
  matmul beats a butterfly network on the MXU and needs no complex
  dtype); mel projection and the MFCC DCT are further matmuls; window
  multiply, |.|^2 and log fuse in between on the VPU.
- Tile size: 128 frames per grid step -> [128, W] x [W, 257] matmuls,
  fully tiled on the 128x128 MXU.
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _stft_kernel(samples_hbm, win_ref, cos_ref, msin_ref, mel_ref,
                 dct_ref, out_ref, span_buf, frames_buf, sem,
                 *, hop: int, W: int, span: int, use_dct: bool,
                 log_floor: float):
    """Grid (B, num_tiles). samples stay in HBM (ANY); the overlapping
    span for this tile is DMA'd manually; constants stay VMEM-resident
    (their block index never changes)."""
    b = pl.program_id(0)
    tile = pl.program_id(1)
    start = tile * FRAME_TILE * hop

    dma = pltpu.make_async_copy(
        samples_hbm.at[b, pl.ds(start, span)],
        span_buf.at[0, pl.ds(0, span)],
        sem)
    dma.start()
    dma.wait()

    # Unpack overlapping frames: frames[t, :] = span[t*hop : t*hop+W].
    def unpack(t, _):
        frames_buf[t, :] = span_buf[0, pl.ds(t * hop, W)]
        return 0

    jax.lax.fori_loop(0, FRAME_TILE, unpack, 0)

    frames = frames_buf[...] * win_ref[0, :]            # [TT, W]
    re = jnp.dot(frames, cos_ref[...], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, msin_ref[...], preferred_element_type=jnp.float32)
    power = re * re + im * im                           # [TT, bins]
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32)
    feats = jnp.log(jnp.maximum(mel, log_floor))        # [TT, n_mels]
    if use_dct:
        feats = jnp.dot(feats, dct_ref[...],
                        preferred_element_type=jnp.float32)
    out_ref[0] = feats


def features_pallas(samples: jnp.ndarray, cfg: FeatureConfig,
                    log_floor: float = 1e-10,
                    interpret: bool = False) -> jnp.ndarray:
    """[B, S] float32 samples -> [B, T, F] features (mel or mfcc).

    Matches ``features._jnp_features`` (un-normalized); the caller
    applies length masking/normalization. T is the same frame count as
    the reference path.
    """
    B, S = samples.shape
    W, hop = cfg.win_length, cfg.hop_length
    T = max(1, feat_mod.num_frames(S, cfg))
    use_dct = cfg.feature_type == "mfcc"
    F = cfg.n_mfcc if use_dct else cfg.n_mels

    num_tiles = -(-T // FRAME_TILE)
    T_pad = num_tiles * FRAME_TILE
    span = (FRAME_TILE - 1) * hop + W
    # Pad samples so the last tile's span DMA stays in bounds.
    S_need = (T_pad - 1) * hop + W
    span_pad = _round_up(span, 128)
    if S_need + (span_pad - span) > S:
        samples = jnp.pad(samples,
                          ((0, 0), (0, S_need + span_pad - span - S)))

    cos_m, msin_m = feat_mod.dft_matrices(W, cfg.n_fft)
    win = feat_mod.hann_window(W).reshape(1, -1)
    fb = feat_mod.mel_filterbank(cfg.n_fft, cfg.n_mels, cfg.sample_rate,
                                 cfg.fmin, cfg.fmax)
    dct = feat_mod.dct_matrix(cfg.n_mels, cfg.n_mfcc) if use_dct else \
        np.zeros((cfg.n_mels, 1), np.float32)

    kernel = functools.partial(
        _stft_kernel, hop=hop, W=W, span=span, use_dct=use_dct,
        log_floor=log_floor)

    const_spec = lambda *_: (0, 0)  # noqa: E731 — resident constants
    out = pl.pallas_call(
        kernel,
        grid=(B, num_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # samples (HBM)
            pl.BlockSpec(win.shape, const_spec),
            pl.BlockSpec(cos_m.shape, const_spec),
            pl.BlockSpec(msin_m.shape, const_spec),
            pl.BlockSpec(fb.shape, const_spec),
            pl.BlockSpec(dct.shape, const_spec),
        ],
        out_specs=pl.BlockSpec((1, FRAME_TILE, F),
                               lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, F), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, span_pad), jnp.float32),
            pltpu.VMEM((FRAME_TILE, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(samples, jnp.asarray(win), jnp.asarray(cos_m), jnp.asarray(msin_m),
      jnp.asarray(fb), jnp.asarray(dct))
    return out[:, :T, :]
