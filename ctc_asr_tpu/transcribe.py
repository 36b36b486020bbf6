"""Transcription driver: wav file(s) -> text.

Capability parity with the reference's ``asr/predict.py`` (SURVEY.md
§2a/§3.3: load wav -> features -> restore checkpoint -> decode -> print
transcript), as a reusable function + CLI surface.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import audio as audio_mod
from .config import Config
from .evaluate import make_decoder
from .text import decode_ids
from .train import make_eval_step


class Transcriber:
    """Holds jitted model + decoder; pads inputs to a small set of fixed
    lengths so repeated calls don't retrace."""

    def __init__(self, cfg: Config, params):
        self.cfg = cfg
        self.params = params
        self._eval_step = make_eval_step(cfg)
        self._decoder = make_decoder(cfg)
        sr = cfg.features.sample_rate
        # Pad targets: powers-of-two seconds up to the data config max.
        self._pad_lengths = [int(sr * s) for s in (1, 2, 4, 8, 16, 32)]

    def _padded_length(self, n: int) -> int:
        for p in self._pad_lengths:
            if n <= p:
                return p
        return n

    def transcribe_samples(self, samples: np.ndarray) -> str:
        """Mono float32 samples at cfg sample rate -> transcript."""
        n = len(samples)
        S = self._padded_length(n)
        buf = np.zeros((1, S), np.float32)
        buf[0, :n] = samples[:S]
        logits, logit_lens = self._eval_step(
            self.params, jnp.asarray(buf), jnp.asarray([min(n, S)]))
        ids, lens = self._decoder(logits, logit_lens)
        return decode_ids(np.asarray(ids)[0, :int(np.asarray(lens)[0])])

    def transcribe_file(self, path: str) -> str:
        samples, _ = audio_mod.read_wav(path, self.cfg.features.sample_rate)
        return self.transcribe_samples(samples)
