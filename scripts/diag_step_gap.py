"""Bisect the gap: full train step 12.1 ms vs fwd+bwd+opt parts ~8.2 ms."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ctc_asr_tpu.config import Config, DataConfig, FeatureConfig, \
    ModelConfig, TrainConfig
from ctc_asr_tpu import features as feat_mod
from ctc_asr_tpu.models import apply_encoder
from ctc_asr_tpu.ops.ctc_ref import ctc_loss
from ctc_asr_tpu.train import build_optimizer, init_train_state

N_CHAIN = 50
RTT = None


def _rtt():
    x = jax.device_put(jnp.float32(1.0))
    for _ in range(2):
        float(x + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(x + 1)
    return (time.perf_counter() - t0) / 5


def timed_state_chain(name, state, body):
    global RTT

    @jax.jit
    def run(st):
        def step(carry, _):
            return body(carry), None
        st2, _ = jax.lax.scan(step, st, None, length=N_CHAIN)
        return jax.tree_util.tree_leaves(st2["params"])[0].ravel()[0]

    float(run(state))
    if RTT is None:
        RTT = _rtt()
    t0 = time.perf_counter()
    float(run(state))
    dt = (time.perf_counter() - t0 - RTT) / N_CHAIN
    print(f"{name:44s} {dt*1000:9.3f} ms/iter", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sec, U = 8.0, 96
    rng = np.random.default_rng(0)
    S = int(sec * 16000)
    fcfg = FeatureConfig(use_pallas=True)
    model = ModelConfig(frontend="conv", rnn_layers=3, rnn_units=512,
                        bidirectional=True, dropout=0.0)
    cfg = Config(features=fcfg, model=model, data=DataConfig(batch_size=B),
                 train=TrainConfig(learning_rate=1e-4, seed=0))
    samples = jax.device_put(jnp.asarray(
        (rng.standard_normal((B, S)) * 0.1).astype(np.float32)))
    slens = jax.device_put(jnp.asarray(np.full(B, S, np.int32)))
    labels = jax.device_put(jnp.asarray(
        rng.integers(0, 28, (B, U)).astype(np.int32)))
    llens = jax.device_put(jnp.asarray(np.full(B, U, np.int32)))

    feats, flens = jax.jit(lambda s, l: feat_mod.extract_features(
        s, l, fcfg))(samples, slens)
    feats = jax.device_put(feats)
    flens = jax.device_put(flens)

    state = init_train_state(cfg)
    tx = build_optimizer(cfg.train)

    def loss_from_feats(params, fts, fls, train, drng):
        logits, logit_lens = apply_encoder(params, fts, fls, model,
                                           train=train, dropout_rng=drng)
        return ctc_loss(logits, logit_lens, labels, llens, use_pallas=True)

    def v_a(st):  # fwd+bwd+opt, precomputed feats, train=False
        loss, grads = jax.value_and_grad(
            lambda p: loss_from_feats(p, feats, flens, False, None)
        )(st["params"])
        updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
        params = optax.apply_updates(st["params"], updates)
        return {**st, "params": params, "opt_state": opt_state}

    def v_b(st):  # + features inside
        fts, fls = feat_mod.extract_features(samples, slens, cfg.features)
        loss, grads = jax.value_and_grad(
            lambda p: loss_from_feats(p, fts, fls, False, None)
        )(st["params"])
        updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
        params = optax.apply_updates(st["params"], updates)
        return {**st, "params": params, "opt_state": opt_state}

    def v_c(st):  # + train=True path w/ dropout rng plumbing
        rng2, drng = jax.random.split(st["rng"])
        fts, fls = feat_mod.extract_features(samples, slens, cfg.features)
        loss, grads = jax.value_and_grad(
            lambda p: loss_from_feats(p, fts, fls, True, drng)
        )(st["params"])
        updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
        params = optax.apply_updates(st["params"], updates)
        return {**st, "params": params, "opt_state": opt_state,
                "rng": rng2}

    def v_d(st):  # + grad norm metric
        rng2, drng = jax.random.split(st["rng"])
        fts, fls = feat_mod.extract_features(samples, slens, cfg.features)
        loss, grads = jax.value_and_grad(
            lambda p: loss_from_feats(p, fts, fls, True, drng)
        )(st["params"])
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, st["opt_state"], st["params"])
        params = optax.apply_updates(st["params"], updates)
        params = jax.tree.map(
            lambda a: a + (gnorm * 0).astype(a.dtype), params)
        return {**st, "params": params, "opt_state": opt_state,
                "rng": rng2}

    timed_state_chain("a: fwd+bwd+opt (feats precomputed)", state, v_a)
    timed_state_chain("b: + features inside", state, v_b)
    timed_state_chain("c: + train=True/dropout-rng", state, v_c)
    timed_state_chain("d: + grad-norm metric", state, v_d)


if __name__ == "__main__":
    main()
