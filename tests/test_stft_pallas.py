"""Pallas STFT/mel/MFCC kernel vs the pure-jnp reference (interpret)."""

import numpy as np
import pytest

import jax.numpy as jnp

from ctc_asr_tpu import features as feat_mod
from ctc_asr_tpu.config import FeatureConfig
from ctc_asr_tpu.ops.stft_pallas import features_pallas


def _signal(B, seconds, sr, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    sig = np.stack([
        np.sin(2 * np.pi * (300 + 200 * b) * t)
        + 0.3 * rng.standard_normal(len(t))
        for b in range(B)]).astype(np.float32)
    return jnp.asarray(sig)


@pytest.mark.parametrize("feature_type", ["mel", "mfcc"])
def test_parity_with_jnp(feature_type):
    cfg = FeatureConfig(feature_type=feature_type, n_mels=40, n_mfcc=13,
                        use_pallas=False)
    x = _signal(2, 1.5, cfg.sample_rate)
    want = np.asarray(feat_mod._jnp_features(x, cfg))
    got = np.asarray(features_pallas(x, cfg, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_parity_fmax_nyquist_no_truncation():
    """fmax = Nyquist keeps every mel row nonzero near the top, so the
    bin-truncation fast path must fall back to the full DFT and still
    match the reference."""
    cfg = FeatureConfig(feature_type="mel", n_mels=40, fmax=8000.0,
                        use_pallas=False)
    x = _signal(2, 1.0, cfg.sample_rate)
    want = np.asarray(feat_mod._jnp_features(x, cfg))
    got = np.asarray(features_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_parity_non_tile_multiple_frames():
    """T not a multiple of 128 exercises the padded-tile path."""
    cfg = FeatureConfig(use_pallas=False)
    # 0.7 s -> ~68 frames (single partial tile)
    x = _signal(1, 0.7, cfg.sample_rate, seed=1)
    want = np.asarray(feat_mod._jnp_features(x, cfg))
    got = np.asarray(features_pallas(x, cfg, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_multi_tile():
    """>128 frames spans multiple grid tiles per utterance."""
    cfg = FeatureConfig(n_mels=32, use_pallas=False)
    x = _signal(1, 2.2, cfg.sample_rate, seed=2)  # ~218 frames
    want = np.asarray(feat_mod._jnp_features(x, cfg))
    got = np.asarray(features_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_extract_features_dispatches_pallas(monkeypatch):
    """cfg.use_pallas=True routes through the kernel when the platform
    supports it (forced here; kernel runs in interpret mode on CPU)."""
    calls = {}
    import ctc_asr_tpu.ops.dispatch as dispatch
    import ctc_asr_tpu.ops.stft_pallas as sp

    real = sp.features_pallas

    def spy(samples, cfg, **kw):
        calls["hit"] = True
        return real(samples, cfg, interpret=True)

    monkeypatch.setattr(sp, "features_pallas", spy)
    monkeypatch.setattr(dispatch, "resolve_use_pallas", lambda f: bool(f))
    cfg = FeatureConfig(use_pallas=True, n_mels=32)
    x = _signal(1, 0.5, cfg.sample_rate)
    lens = jnp.asarray([x.shape[1]])
    feats, flens = feat_mod.extract_features(x, lens, cfg)
    assert calls.get("hit")
    assert feats.shape[2] == 32


def test_parity_many_segments():
    """win/hop ratio > 9 (n_seg=11) exercises the halo sizing: the
    fixed 8-row halo fed uninitialized VMEM into frames near each
    tile edge for n_seg > 9."""
    cfg = FeatureConfig(win_ms=32.0, hop_ms=3.0, n_mels=40,
                        use_pallas=False)
    assert -(-cfg.win_length // cfg.hop_length) == 11
    x = _signal(2, 1.0, cfg.sample_rate, seed=3)
    want = np.asarray(feat_mod._jnp_features(x, cfg))
    got = np.asarray(features_pallas(x, cfg, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
