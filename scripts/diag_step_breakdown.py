"""Honest per-component timing on the axon TPU (RTT-corrected).

block_until_ready is unreliable through the tunnel and host fetches pay
full-array transfers, so each component is timed as N dependency-chained
iterations inside ONE jitted scan (output perturbs the params by
sum(out)*1e-30, preventing DCE), with a single scalar fetch at the end
whose round-trip latency is SUBTRACTED (the tunnel RTT is ~25 ms; at
N_CHAIN=10 without subtraction every row was inflated by ~2.5 ms/iter,
which mis-attributed most of the step budget — see BASELINE.md
measurement-protocol note).
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ctc_asr_tpu.config import Config, DataConfig, FeatureConfig, \
    ModelConfig, TrainConfig
from ctc_asr_tpu import features as feat_mod
from ctc_asr_tpu.models import apply_encoder, init_params
from ctc_asr_tpu.ops.ctc_ref import ctc_loss

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


def timed_chain(name, params, body):
    """body(params) -> scalar-ish output; returns seconds per iteration."""
    global RTT

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
    if RTT is None:
        RTT = _rtt()
    t0 = time.perf_counter()
    float(run(params))
    dt = (time.perf_counter() - t0 - RTT) / N_CHAIN
    print(f"{name:34s} {dt*1000:9.3f} ms/iter", flush=True)
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sec = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
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

    def mk_fwd_bwd(use_pallas):
        def fwd_bwd(p):
            def loss_fn(pp):
                logits, logit_lens = apply_encoder(pp, feats, flens, model)
                return ctc_loss(logits, logit_lens, labels, llens,
                                use_pallas=use_pallas)
            l, g = jax.value_and_grad(loss_fn)(p)
            # consume EVERY grad leaf: reading only one let XLA
            # dead-code-eliminate the dw matmuls of the other layers
            # (measured 43.7 vs 62.8 ms at B=128 — diag_step_gap.py),
            # which mis-attributed ~19 ms to "step glue"
            gsq = sum(jnp.sum(jnp.square(x))
                      for x in jax.tree_util.tree_leaves(g))
            return l + gsq * 1e-20
        return fwd_bwd

    timed_chain("full fwd+bwd (pallas ctc)", params, mk_fwd_bwd(True))
    timed_chain("full fwd+bwd (ref ctc)", params, mk_fwd_bwd(False))

    # optimizer alone (Adam update on the full param tree)
    from ctc_asr_tpu.train import build_optimizer, init_train_state, \
        make_step_fn
    cfg = Config(features=fcfg, model=full,
                 data=DataConfig(batch_size=B),
                 train=TrainConfig(learning_rate=1e-4, seed=0))
    state = init_train_state(cfg)
    tx = build_optimizer(cfg.train)
    grads = jax.tree.map(lambda a: (a * 1e-6).astype(a.dtype),
                         state["params"])

    def opt_only(st):
        updates, opt_state = tx.update(grads, st["opt_state"],
                                       st["params"])
        import optax
        params2 = optax.apply_updates(st["params"], updates)
        return {**st, "params": params2, "opt_state": opt_state}, None

    def opt_body(st):
        st2, _ = opt_only(st)
        return jax.tree_util.tree_leaves(st2["params"])[0].ravel()[0] * 0

    # chain via the state itself
    global RTT

    @jax.jit
    def opt_run(st):
        def step(carry, _):
            c2, _ = opt_only(carry)
            return c2, None
        st2, _ = jax.lax.scan(step, st, None, length=N_CHAIN)
        return jax.tree_util.tree_leaves(st2["params"])[0].ravel()[0]

    float(opt_run(state))
    t0 = time.perf_counter()
    float(opt_run(state))
    dt = (time.perf_counter() - t0 - RTT) / N_CHAIN
    print(f"{'optimizer(Adam) only':34s} {dt*1000:9.3f} ms/iter", flush=True)

    # FULL train step (features + fwd + bwd + Adam) chained via state
    step_fn = make_step_fn(cfg)

    @jax.jit
    def step_run(st):
        def step(carry, _):
            c2, _m = step_fn(carry, samples, slens, labels, llens)
            return c2, None
        st2, _ = jax.lax.scan(step, st, None, length=N_CHAIN)
        return jax.tree_util.tree_leaves(st2["params"])[0].ravel()[0]

    float(step_run(state))
    t0 = time.perf_counter()
    float(step_run(state))
    dt = (time.perf_counter() - t0 - RTT) / N_CHAIN
    print(f"{'FULL train step (scan-chained)':34s} {dt*1000:9.3f} ms/iter",
          flush=True)


if __name__ == "__main__":
    main()
