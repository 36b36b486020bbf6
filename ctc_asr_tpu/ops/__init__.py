"""Numeric ops: CTC loss, decoders, beam search, n-gram LM, Pallas kernels.

This package is the TPU-native replacement for the reference's native-code
dependencies (SURVEY.md §2b): ``tf.nn.ctc_loss`` -> ``ctc_ref``/
``ctc_pallas``; ``tf.nn.ctc_greedy_decoder`` / ``ctc_beam_search_decoder``
-> ``decode_greedy`` / ``beam``/``beam_pallas``; ``tf.signal`` DSP ->
``stft_pallas`` (pure-jnp reference in ``features.py``); KenLM-style LM ->
``lm``.
"""

from .ctc_ref import ctc_loss_ref, ctc_loss

__all__ = ["ctc_loss_ref", "ctc_loss"]
