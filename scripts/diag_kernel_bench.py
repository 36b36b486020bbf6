"""Honest Pallas-vs-XLA kernel timings (chained-dependency protocol
with the scalar-fetch RTT subtracted — see diag_step_breakdown.py)."""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


RTT = None


def _rtt():
    x = jax.device_put(jnp.float32(1.0))
    for _ in range(2):
        float(x + 1)
    t0 = time.perf_counter()
    for _ in range(5):
        float(x + 1)
    return (time.perf_counter() - t0) / 5


def chain_time(name, fn, x, iters=50):
    """fn(x)->(x-like chained value). One jit'd scan, one fetch."""
    global RTT

    @jax.jit
    def run(x0):
        def step(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(step, x0, None, length=iters)
        return jax.tree_util.tree_leaves(out)[0].ravel()[0]

    float(run(x))
    if RTT is None:
        RTT = _rtt()
    t0 = time.perf_counter()
    float(run(x))
    dt = (time.perf_counter() - t0 - RTT) / iters
    print(f"{name:40s} {dt*1000:9.3f} ms/iter", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # ---- CTC fwd+bwd --------------------------------------------------
    from ctc_asr_tpu.ops.ctc_pallas import ctc_loss_pallas
    from ctc_asr_tpu.ops.ctc_ref import ctc_loss_ref
    B, T, C, U = 16, 400, 29, 48
    logits = jax.device_put(jnp.asarray(
        rng.standard_normal((B, T, C)).astype(np.float32)))
    lens = jnp.asarray(np.full(B, T, np.int32))
    labels = jnp.asarray(rng.integers(0, 28, (B, U)).astype(np.int32))
    llens = jnp.asarray(np.full(B, U, np.int32))

    def ctc_chain(loss_fn):
        def f(lg):
            g = jax.grad(lambda z: jnp.sum(loss_fn(z)))(lg)
            return lg + g * 1e-30
        return f

    chain_time("ctc fwd+bwd pallas", ctc_chain(
        lambda lg: ctc_loss_pallas(lg, lens, labels, llens)), logits)
    chain_time("ctc fwd+bwd xla-ref", ctc_chain(
        lambda lg: ctc_loss_ref(lg, lens, labels, llens)), logits)

    # ---- STFT ----------------------------------------------------------
    from ctc_asr_tpu.config import FeatureConfig
    from ctc_asr_tpu import features as feat_mod
    from ctc_asr_tpu.ops.stft_pallas import features_pallas
    fcfg = FeatureConfig(use_pallas=False)
    samples = jax.device_put(jnp.asarray(
        rng.standard_normal((16, 8 * 16000)).astype(np.float32)))

    chain_time("stft/mel pallas", lambda s: s + jnp.sum(
        features_pallas(s, fcfg)) * 1e-30, samples)
    chain_time("stft/mel xla", lambda s: s + jnp.sum(
        feat_mod._jnp_features(s, fcfg)) * 1e-30, samples)

    # ---- beam search ---------------------------------------------------
    from ctc_asr_tpu.ops.beam import beam_search_decode
    from ctc_asr_tpu.ops.beam_pallas import beam_search_decode_pallas
    Bb, Tb, K = 8, 200, 16
    blogits = jax.device_put(jnp.asarray(
        rng.standard_normal((Bb, Tb, C)).astype(np.float32) * 2))
    blens = jnp.asarray(np.full(Bb, Tb, np.int32))

    def beam_chain(decode):
        def f(lg):
            ids, lns = decode(lg)
            return lg + jnp.sum(lns).astype(jnp.float32) * 1e-30
        return f

    chain_time("beam pallas (B=8,T=200,K=16)", beam_chain(
        lambda lg: beam_search_decode_pallas(lg, blens, beam_width=K)),
        blogits, iters=10)
    chain_time("beam xla    (B=8,T=200,K=16)", beam_chain(
        lambda lg: beam_search_decode(lg, blens, beam_width=K)),
        blogits, iters=10)


if __name__ == "__main__":
    main()
