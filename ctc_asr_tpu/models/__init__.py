"""Acoustic models: functional (pytree-param) conv/(bi)RNN CTC encoders.

Replaces the reference's TF-1.x graph builder ``asr/model.py``
(SURVEY.md §2a: dense or 2-D-conv frontend with clipped ReLU + dropout,
multi-layer (bi)RNN, dense projection to vocab) with pure-function JAX
models: ``init(rng, cfg, feat_dim) -> params`` and
``apply(params, feats, lengths, ...) -> (logits, logit_lengths)``.
"""

from .encoder import init_params, apply_encoder, output_lengths

__all__ = ["init_params", "apply_encoder", "output_lengths"]
