"""Honest per-component timing on the axon TPU.

block_until_ready is unreliable through the tunnel and host fetches pay
full-array transfers, so each component is timed as N dependency-chained
iterations inside ONE jitted scan (output perturbs the params by
sum(out)*1e-30, preventing DCE), with a single scalar fetch at the end.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.config import Config, FeatureConfig, ModelConfig, TrainConfig
from ctc_asr_tpu import features as feat_mod
from ctc_asr_tpu.models import apply_encoder, init_params
from ctc_asr_tpu.ops.ctc_ref import ctc_loss

N_CHAIN = 10


def timed_chain(name, params, body):
    """body(params) -> scalar-ish output; returns seconds per iteration."""

    @jax.jit
    def run(p):
        def step(carry, _):
            out = body(carry)
            eps = (out * 1e-30).astype(jnp.float32)
            carry = jax.tree.map(lambda a: a + eps.astype(a.dtype), carry)
            return carry, None
        p2, _ = jax.lax.scan(step, p, None, length=N_CHAIN)
        return jax.tree_util.tree_leaves(p2)[0].ravel()[0]

    float(run(params))  # compile + settle
    t0 = time.perf_counter()
    s = float(run(params))
    dt = (time.perf_counter() - t0) / N_CHAIN
    print(f"{name:34s} {dt*1000:9.2f} ms/iter", flush=True)
    return dt


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
    feats = jax.device_put(feats)

    def mk(model):
        return init_params(jax.random.PRNGKey(0), model, 80), model

    full = ModelConfig(frontend="conv", rnn_layers=3, rnn_units=512,
                       bidirectional=True, dropout=0.0)
    conv_only = ModelConfig(frontend="conv", rnn_layers=0, rnn_units=512,
                            bidirectional=True, dropout=0.0)
    uni = ModelConfig(frontend="conv", rnn_layers=3, rnn_units=512,
                      bidirectional=False, dropout=0.0)
    one_bi = ModelConfig(frontend="conv", rnn_layers=1, rnn_units=512,
                         bidirectional=True, dropout=0.0)

    # features
    timed_chain("features(pallas)", {"w": jnp.ones((8, 128))},
                lambda p: jnp.sum(feat_mod.extract_features(
                    samples * (1 + p["w"][0, 0] * 0), slens, fcfg)[0]))

    for name, (params, model) in [
        ("enc fwd conv-only", mk(conv_only)),
        ("enc fwd 1xBiLSTM", mk(one_bi)),
        ("enc fwd 3xuniLSTM", mk(uni)),
        ("enc fwd full 3xBiLSTM", mk(full)),
    ]:
        timed_chain(name, params, lambda p, m=model: jnp.sum(
            apply_encoder(p, feats, flens, m)[0]))

    # fwd + bwd (loss grad) on full model
    params, model = mk(full)

    def fwd_bwd(p):
        def loss_fn(pp):
            logits, logit_lens = apply_encoder(pp, feats, flens, model)
            return ctc_loss(logits, logit_lens, labels, llens,
                            use_pallas=True)
        l, g = jax.value_and_grad(loss_fn)(p)
        return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]

    timed_chain("full fwd+bwd (pallas ctc)", params, fwd_bwd)

    def fwd_bwd_ref(p):
        def loss_fn(pp):
            logits, logit_lens = apply_encoder(pp, feats, flens, model)
            return ctc_loss(logits, logit_lens, labels, llens,
                            use_pallas=False)
        l, g = jax.value_and_grad(loss_fn)(p)
        return l + jax.tree_util.tree_leaves(g)[0].ravel()[0]

    timed_chain("full fwd+bwd (ref ctc)", params, fwd_bwd_ref)


if __name__ == "__main__":
    main()
