"""Synthetic speech-like corpus for tests, smoke training, and benches.

The reference validated end-to-end on LibriSpeech; this environment has no
corpus on disk and no network (SURVEY.md §7 env facts), so we provide a
deterministic synthetic corpus with a *learnable* audio->text mapping:
each character is rendered as a held two-tone chord with a character-
specific frequency pair plus noise, so a CTC model genuinely has to learn
frame->char alignment. Used by tests/ (loss decreases, WER < 100%) and as
the fallback bench dataset.
"""

from __future__ import annotations

import os

import numpy as np

from .. import audio as audio_mod
from .. import text as text_mod
from .manifest import Manifest, Utterance, write_manifest

_WORDS = ("the quick brown fox jumps over a lazy dog while she sells sea "
          "shells by the shore and we all know that time flies when you "
          "are having fun with speech models on big machines").split()


def char_frequencies(ch: str) -> tuple[float, float]:
    """Two deterministic formant-like frequencies for a character."""
    i = text_mod.ALPHABET.index(ch)
    f1 = 220.0 + 55.0 * i           # 220..1705 Hz
    f2 = 2200.0 + 90.0 * i          # 2200..4630 Hz
    return f1, f2


def render_transcript(transcript: str, sr: int = 16000,
                      char_seconds: float = 0.09,
                      noise: float = 0.05,
                      seed: int = 0) -> np.ndarray:
    """Transcript -> float32 waveform. Spaces render as near-silence."""
    rng = np.random.default_rng(seed)
    n_char = max(1, int(char_seconds * sr))
    pieces = []
    for ch in transcript:
        t = np.arange(n_char) / sr
        if ch == " ":
            seg = np.zeros(n_char, np.float32)
        else:
            f1, f2 = char_frequencies(ch)
            seg = (0.5 * np.sin(2 * np.pi * f1 * t)
                   + 0.3 * np.sin(2 * np.pi * f2 * t)).astype(np.float32)
            # attack/decay envelope so adjacent identical chars are separable
            env = np.minimum(1.0, np.minimum(np.arange(n_char),
                                             n_char - np.arange(n_char))
                             / (0.15 * n_char))
            seg = seg * env.astype(np.float32)
        pieces.append(seg)
    sig = np.concatenate(pieces) if pieces else np.zeros(n_char, np.float32)
    sig = sig + noise * rng.standard_normal(len(sig)).astype(np.float32)
    return (0.8 * sig / max(1e-6, np.abs(sig).max())).astype(np.float32)


def random_transcript(rng: np.random.Generator, min_words: int = 2,
                      max_words: int = 7) -> str:
    n = int(rng.integers(min_words, max_words + 1))
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def generate_corpus(out_dir: str, num_utterances: int = 64,
                    seed: int = 0, sr: int = 16000,
                    min_words: int = 2, max_words: int = 7) -> str:
    """Write wavs + manifest; returns the manifest path."""
    wav_dir = os.path.join(out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    utts = []
    for i in range(num_utterances):
        transcript = random_transcript(rng, min_words, max_words)
        sig = render_transcript(transcript, sr=sr, seed=seed * 100003 + i)
        path = os.path.join(wav_dir, f"utt{i:05d}.wav")
        audio_mod.write_wav(path, sig, sr)
        utts.append(Utterance(path, len(sig) / sr, transcript))
    manifest_path = os.path.join(out_dir, "manifest.csv")
    write_manifest(manifest_path, Manifest(utts))
    return manifest_path
