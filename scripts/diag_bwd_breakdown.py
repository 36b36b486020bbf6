"""Honest BACKWARD-inclusive component timing (axon RTT-corrected).

diag_step_breakdown.py's fwd+bwd row consumes only one gradient leaf,
which lets XLA DCE most of the backward (see memory/axon notes). Here
every row chains the FULL gradient tree into the carry, so nothing is
deleted. Rows are model-ablation diffs: conv-only vs +BiRNN vs +CTC.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.config import FeatureConfig, ModelConfig
from ctc_asr_tpu import features as feat_mod
from ctc_asr_tpu.models import apply_encoder, init_params
from ctc_asr_tpu.ops.ctc_ref import ctc_loss

from diag_common import timed  # noqa: E402  (shared protocol)


def main():
    B, sec = 16, 8.0
    rng = np.random.default_rng(0)
    S = int(sec * 16000)
    U = 96
    fcfg = FeatureConfig(use_pallas=True)
    samples = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, S)) * 0.1).astype(np.float32)))
    slens = jax.device_put(jnp.asarray(np.full(B, S, np.int32)))
    labels = jax.device_put(jnp.asarray(
        rng.integers(0, 28, (B, U)).astype(np.int32)))
    llens = jax.device_put(jnp.asarray(np.full(B, U, np.int32)))

    feats, flens = jax.jit(
        lambda s, l: feat_mod.extract_features(s, l, fcfg))(samples, slens)
    feats, flens = jax.device_put(feats), jax.device_put(flens)

    full = ModelConfig(frontend="conv", rnn_layers=3, rnn_units=512,
                       bidirectional=True, dropout=0.0)
    conv_only = ModelConfig(frontend="conv", rnn_layers=0, rnn_units=512,
                            bidirectional=True, dropout=0.0)
    one_bi = ModelConfig(frontend="conv", rnn_layers=1, rnn_units=512,
                         bidirectional=True, dropout=0.0)

    def mk(model):
        return init_params(jax.random.PRNGKey(0), model, feats.shape[2]), \
            model

    def sum_loss(model):
        def body(p):
            l, g = jax.value_and_grad(lambda pp: jnp.sum(
                apply_encoder(pp, feats, flens, model)[0]
                .astype(jnp.float32) * 1e-3))(p)
            return l, g
        return body

    def ctc_body(model, use_pallas):
        def body(p):
            def loss_fn(pp):
                logits, ll = apply_encoder(pp, feats, flens, model)
                return ctc_loss(logits, ll, labels, llens,
                                use_pallas=use_pallas)
            return jax.value_and_grad(loss_fn)(p)
        return body

    for name, (params, model), body in [
        ("conv+head fwd+FULLbwd", mk(conv_only), sum_loss(conv_only)),
        ("conv+1xBiLSTM fwd+FULLbwd", mk(one_bi), sum_loss(one_bi)),
        ("conv+3xBiLSTM fwd+FULLbwd", mk(full), sum_loss(full)),
        ("conv+3xBiLSTM+ctc(pallas) FULL", mk(full), ctc_body(full, True)),
        ("conv+3xBiLSTM+ctc(ref) FULL", mk(full), ctc_body(full, False)),
    ]:
        timed(name, params, body)


if __name__ == "__main__":
    main()
